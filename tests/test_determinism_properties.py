"""Property-based tests (hypothesis) for the determinism layer —
the invariants every graded float aggregate relies on."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datums_warehouse_spark.testing.compare import canonical_rows

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@given(st.lists(finite_doubles, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_decimal_sum_is_permutation_invariant(xs):
    """The core dsum claim: quantized-decimal sums are associative, so any
    partitioning/order produces the identical value."""
    q = Decimal("0.000001")

    def dec_sum(vals):
        return sum(Decimal(v).quantize(q, ROUND_HALF_UP) for v in vals)

    assert dec_sum(xs) == dec_sum(list(reversed(xs)))
    mid = len(xs) // 2
    assert dec_sum(xs) == dec_sum(xs[mid:]) + dec_sum(xs[:mid])


@given(st.lists(finite_doubles, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_canonical_rows_order_invariant(xs):
    a = pd.DataFrame({"x": xs})
    b = pd.DataFrame({"x": list(reversed(xs))})
    assert canonical_rows(a) == canonical_rows(b)


@given(finite_doubles)
@settings(max_examples=300, deadline=None)
def test_canonical_float_roundtrip_is_exact(x):
    """repr-based canonicalization distinguishes any two distinct doubles
    (shortest-roundtrip repr is injective on floats)."""
    a = pd.DataFrame({"x": [x]})
    assert canonical_rows(a) == canonical_rows(a.copy())
    import struct

    bumped = struct.unpack("<d", struct.pack("<q", struct.unpack("<q", struct.pack("<d", x))[0] ^ 1))[0]
    if bumped == bumped and x != bumped:  # skip NaN outcomes
        b = pd.DataFrame({"x": [bumped]})
        assert canonical_rows(a) != canonical_rows(b)
