"""Property tests for operators/sharded.range_sharded_cumsum — the
two-stage replacement for unpartitioned running-total windows (l16/o6).

The contract: for ANY numeric key distribution (clustered, negative,
adversarially skewed into one shard) and ANY shard count, the output
equals the single-window global cumulative sum bit-for-bit. Hypothesis
drives the key/value/shard space; a pandas sort+cumsum is the spec.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datums_warehouse_spark.operators.sharded import range_sharded_cumsum

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31),  # key
        st.integers(min_value=0, max_value=1000),          # value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],  # unique keys: ties have no defined interleave
)


@given(rows=rows_strategy, num_shards=st.sampled_from([1, 2, 5, 32]))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_matches_single_window_cumsum(spark, rows, num_shards):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum
        for r in range_sharded_cumsum(
            df, "k", ["k"], F.col("v"), "cum", num_shards
        ).collect()
    }
    spec = pd.DataFrame(rows, columns=["k", "v"]).sort_values("k")
    spec["cum"] = spec["v"].cumsum()
    assert got == dict(zip(spec["k"], spec["cum"]))


def test_tie_keys_share_a_shard(spark):
    """Duplicate keys land in ONE shard by construction, so a secondary
    order column gives them a well-defined global order — the o6 case
    (zkey ties broken by event_id)."""
    rows = [(5, i, 1) for i in range(20)] + [(1, 100, 2), (9, 101, 3)]
    df = spark.createDataFrame(rows, "k long, sub long, v long")
    out = range_sharded_cumsum(df, "k", ["k", "sub"], F.col("v"), "cum", 4)
    got = {(r.k, r.sub): r.cum for r in out.collect()}
    assert got[(1, 100)] == 2
    for i in range(20):
        assert got[(5, i)] == 2 + (i + 1)  # each tie row adds exactly 1
    assert got[(9, 101)] == 2 + 20 + 3


def test_empty_input_yields_empty_output(spark):
    df = spark.createDataFrame([], "k long, v long")
    out = range_sharded_cumsum(df, "k", ["k"], F.col("v"), "cum", 8)
    assert out.count() == 0
    assert "cum" in out.columns


def test_misordered_key_rejected(spark):
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(AssertionError):
        range_sharded_cumsum(df, "k", ["other", "k"], F.col("v"), "cum", 4)
