"""Query construction must be lazy: calling ``queries()[name](spark, sf)``
declares a DAG — it must not run Spark jobs. An eager action at build time
means a blocking extra pass over the data before the query even executes
(the l6_tfidf ``d.count()`` defect class). Genuinely iterative/stateful
operators are allowlisted with the reason they are exempt.
"""

from __future__ import annotations

import pytest

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.registry import eager_names

# Queries whose *construction* legitimately executes work: everything the
# registry tags ``eager`` (sink writes, genuine streaming runs, iterative
# loops), plus MLlib BucketedRandomProjectionLSH.fit(), which reads one row
# to size the random hyperplanes — inherent to the Estimator API, O(1) not
# a scan.
EAGER_ALLOWED = eager_names() | {"l3_lsh_ann"}


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
