"""Driver-gate replica: every registered query vs its DuckDB oracle.

Runs at sf0.001 for speed (the driver grades at sf0.01 — run
``python scripts/oracle_check.py sf0.01`` before shipping a batch).
Oracle-less queries are checked rows-only, mirroring the driver.
"""

from __future__ import annotations

import pytest

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.testing.compare import compare_frames

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: materializes without error
        return
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    res = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    keys = set(e.queries())
    oracle_keys = set(e.oracle_sql())
    assert oracle_keys <= keys
