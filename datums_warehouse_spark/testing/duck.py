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
    # Bound the oracle's memory and let it spill: DuckDB's default limit is
    # 80% of RAM and several blocking operators can't spill without a
    # temp_directory — an unbounded 8×/32× oracle (l43's 4-way gram UNNEST
    # was the first to hit it) OOM-kills the whole harness process instead
    # of degrading to disk. 32 GB + spill keeps every stress oracle inside
    # the machine while leaving room for the Spark JVM heap.
    con.execute("SET memory_limit='32GB'")
    spill = os.path.join("/tmp", "dws_duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = path(sf_dir, t)
        if os.path.isdir(p):  # Spark-written dataset: a directory of parts
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con
