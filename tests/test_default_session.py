"""Driver-environment-faithful smoke: the driver imports __spark_entry__ in
a fresh process with a VANILLA SparkSession — none of session.get_spark's
confs (UTC timezone, Arrow, AQE tuning) are present. The round-4 breakage
(events.ts arriving as TIMESTAMP_NTZ once pyspark 4.1 ignored the
``nanosAsLong`` conf the tuned session set) is exactly the class of failure
only this leg catches: every query must run without any session conf the
repo happens to set.

Runs in a subprocess with cwd OUTSIDE the repo so executor workers resolve
UDFs by pickled value, matching the driver (see .claude/skills/verify).
Covers the queries whose plans touch ``events.ts`` (the only conf-sensitive
input) plus one representative per Python-UDF family.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every r04 NTZ victim + asof/interpolate/pandas-UDF representatives +
# the datetime/cast scalar families (the other session-conf-sensitive
# surface: timezone and ANSI cast behavior).
QUERIES = (
    "a8_candles_15m",
    "w2_lag_lead",
    "w5_range_frame",
    "o6_zorder_layout",
    "x8_m4_downsample",
    "s3_csv_roundtrip",
    "s4_jsonl_source",
    "j9_asof_join",
    "x3_interpolate_linear",
    "d2_pandas_udf",
    "t4_watermark_stream",
    "t8_stream_stream_join",
    "f2_datetime_funcs",
    "f5_cast_funcs",
    "s9_retention_ttl",
    "l9_multimodal_features",
)

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
for name in {queries!r}:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"ok {{name}}: {{n}} rows", flush=True)
"""


def test_queries_run_on_default_session(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, queries=QUERIES)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    for name in QUERIES:
        assert f"ok {name}:" in proc.stdout, proc.stdout


def test_s9_day_partitioning_is_session_tz_invariant(spark, sf_dir):
    """s9_retention_ttl derives its day partitions (and therefore WHICH
    partitions get dropped) from epoch-day arithmetic, never F.to_date —
    run the query under two session timezones and assert the grouped
    instants and aggregates are bit-identical. Catches the r04/ADVICE-r05
    class where a session-tz-dependent day boundary silently shifts the
    retention cutoff on a non-UTC host."""
    from pyspark.sql import functions as F

    from datums_warehouse_spark.sources.sinks import s9_retention_ttl

    def run():
        df = s9_retention_ttl(spark, sf_dir)
        return sorted(
            df.select(F.unix_micros("day").alias("us"), "n", "total_value")
            .collect()
        )

    original = spark.conf.get("spark.sql.session.timeZone")
    base = run()
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Auckland")
        shifted = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert base == shifted
