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


def test_hash48_matches_duckdb_on_adversarial_strings(spark, duck):
    """hash48 (Spark) and sql_hash48 (DuckDB) must agree byte-for-byte —
    every dedup/LSH/sampling grade rests on this. Checked over seeded
    random strings plus the edge shapes md5 implementations disagree on
    least rarely but matter most: empty, whitespace, unicode, long runs."""
    import random

    from pyspark.sql import functions as F

    from datums_warehouse_spark.functions.hashing import hash48, sql_hash48

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-.@/"
    samples = ["", " ", "  ", "é漢字🙂", "a" * 500, "\t", "0", "-1"]
    samples += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60))) for _ in range(200)]

    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.h for r in sdf.select(hash48(F.col("s")).alias("h")).collect()]
    want = [
        duck.execute(f"SELECT {sql_hash48('?')}", [s]).fetchone()[0] for s in samples
    ]
    assert got == want


def test_minhash_permutations_match_duckdb(spark, duck):
    """The (a*h + b) % P permutation family must be exact int64 math in
    both engines for any 48-bit input (including the extremes)."""
    from pyspark.sql import functions as F

    from datums_warehouse_spark.functions.hashing import (
        MINHASH_AS,
        MINHASH_BS,
        MINHASH_P,
        minhash_expr,
    )

    hs = [0, 1, (1 << 48) - 1, 123456789012345, 999999999999]
    sdf = spark.createDataFrame([(h,) for h in hs], "h long")
    for i in range(len(MINHASH_AS)):
        got = [
            r.m
            for r in sdf.select(
                ((F.lit(MINHASH_AS[i]) * F.col("h") + F.lit(MINHASH_BS[i])) % F.lit(MINHASH_P)).alias("m")
            ).collect()
        ]
        want = [duck.execute(f"SELECT {minhash_expr(i, str(h))}").fetchone()[0] for h in hs]
        assert got == want, f"permutation {i} diverges"


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
