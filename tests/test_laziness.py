"""Query construction must be lazy: calling ``queries()[name](spark, sf)``
declares a DAG — it must not run Spark jobs. An eager action at build time
means a blocking extra pass over the data before the query even executes
(the l6_tfidf ``d.count()`` defect class). Genuinely iterative/stateful
operators are allowlisted with the reason they are exempt.
"""

from __future__ import annotations

import pytest

from datums_warehouse_spark import all_queries

# Queries whose *construction* legitimately executes work.
EAGER_ALLOWED = {
    # iterative convergence loop (label propagation) drives jobs per round
    "l2_dedup_clusters",
    # MLlib BucketedRandomProjectionLSH.fit() reads one row to size the
    # random hyperplanes — inherent to the Estimator API, O(1) not a scan
    "l3_lsh_ann",
    # sink round-trips: the operator under test IS a write-then-read
    "s2_partitioned_sink",
    "s3_csv_roundtrip",
    "s4_jsonl_source",
    "s6_merge_upsert",
    "s2_bucketed_join",
    "s7_schema_evolution",
    # genuine streaming runs: start + awaitTermination then read the sink
    "t4_watermark_stream",
    "t7_stream_sink",
    "t6_stateful_stream",
    "t9_stream_upsert",
    "t8_stream_stream_join",
}


def _jobs_run(spark) -> int:
    """Cumulative job count for this SparkContext (local-mode DAGScheduler)."""
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


@pytest.fixture(scope="module", autouse=True)
def _warm_schemas(spark, sf_dir):
    """Populate the table-schema cache so construction needs no footer
    inference jobs (the only job a lazy build may otherwise run)."""
    from datums_warehouse_spark.sources import tables

    for t in tables.TABLES:
        tables.load(spark, sf_dir, t)


@pytest.mark.parametrize(
    "name", [n for n in all_queries() if n not in EAGER_ALLOWED]
)
def test_query_construction_is_lazy(spark, sf_dir, name):
    q = all_queries()[name]
    before = _jobs_run(spark)
    q.fn(spark, sf_dir)  # build only — no action
    ran = _jobs_run(spark) - before
    assert ran == 0, (
        f"{name} ran {ran} Spark job(s) at construction time — move the "
        "action into the returned DAG (broadcast 1-row aggregate, join, …) "
        "or allowlist it with a reason"
    )
