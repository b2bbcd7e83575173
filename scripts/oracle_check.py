"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, compares with the order-insensitive canonical comparison, and
prints a pass/fail table. Use before committing a batch of operators:

    python scripts/oracle_check.py                # sf0.01, all queries
    python scripts/oracle_check.py sf0.001 a8     # substring filter

Set SPARK_GRAFT_VANILLA=1 to compare under a bare SparkSession (no tuned
confs) — the driver's actual environment.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.session import get_spark
from datums_warehouse_spark.testing.compare import compare_frames
from datums_warehouse_spark.testing.duck import connect


def main() -> int:
    sf = "sf0.01"
    pattern = ""
    for arg in sys.argv[1:]:
        if arg.startswith("sf"):
            sf = arg
        else:
            pattern = arg
    sf_dir = f"/root/testdata/{sf}"

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = connect(sf_dir)

    qs = {k: v for k, v in all_queries().items() if pattern in k}
    failures, rows_only = [], []
    for name, q in sorted(qs.items()):
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if q.oracle is None:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_pdf)} rows (rows-only, no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        res = compare_frames(name, spark_pdf, oracle_pdf)
        if res:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time() - t0:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {res.detail}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed"
          f" ({len(rows_only)} rows-only) at {sf}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
