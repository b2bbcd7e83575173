"""Every query must run (and return an empty/0-row-consistent result, not
raise) against a warehouse whose tables are all EMPTY.

At 100 TB this is the partition-local reality all the time: a date
partition with no rows, a filter that eliminates a split, a source that
produced nothing this hour. Operators that assume a first row, divide by a
count, or infer schema from data break exactly here while passing every
populated-data test.

Sink round-trips and genuine streaming runs are excluded: their write legs
have their own empty-input semantics (no files written → nothing to
re-read) exercised by the sink tests; the iterative clusterer is covered
by its dedicated empty-graph test.
"""

from __future__ import annotations

import os

import pytest

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.registry import eager_names
from datums_warehouse_spark.sources import tables

# Registry-tagged eager queries (sink writes, genuine streaming runs, the
# iterative clusterer — its empty-graph case has a dedicated test), plus
# MLlib BucketedRandomProjectionLSH.fit(), which requires ≥1 row to size
# its random hyperplanes — an empty corpus legitimately fails to index.
EXCLUDED = eager_names() | {"l3_lsh_ann"}

# Constant-shape outputs: one row per profiled COLUMN, independent of the
# input row count.
EXPECTED_ROWS = {"p8_table_profile": 3}


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("empty_wh")
    for t in tables.TABLES:
        df = tables.load(spark, sf_dir, t).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(str(root), f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", [n for n in all_queries() if n not in EXCLUDED])
def test_query_survives_empty_tables(spark, empty_dir, name):
    n = all_queries()[name].fn(spark, empty_dir).count()
    # global aggregates legitimately emit one all-null/zero row; keyed
    # queries emit nothing. Either way: a small finite result, no raise.
    assert n <= EXPECTED_ROWS.get(name, 1), f"{name} produced {n} rows from empty inputs"
