"""Local DuckDB oracle runner — replicates the driver's view registration.

The driver pre-registers each testdata parquet as a bare-named DuckDB view
(__spark_entry__.py docstring). We do the same so oracle SQL can be
validated locally before burning a driver round.
"""

from __future__ import annotations

import os

import duckdb

from datums_warehouse_spark.sources.tables import TABLES, path


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = path(sf_dir, t)
        if os.path.isdir(p):  # Spark-written dataset: a directory of parts
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con
