"""OHLCV candle aggregation — the reference engine's flagship computation.

Parity target: the reference's trades→candles pipeline (SURVEY.md §2.4 A8
[R] — reference checkout empty, see SURVEY.md §0; no file:line possible).
The reference loops rows in Python to bucket trades into OHLCV bars; here a
single hash aggregation does it: ``groupBy(series, date_trunc(bucket))``
with ``min_by/max_by`` for open/close. One shuffle, map-side partial
aggregation, whole-stage codegen — and the identical plan scales out to any
executor count because the grouping key (series, bucket) partitions evenly
over time.

The ``events`` table plays the trades feed: ``event_type`` = series key,
``value`` = price/size, ``ts`` = trade time (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import dsum, sql_dsum
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us


def candles(df: DataFrame, grain: str, series_col: str = "event_type") -> DataFrame:
    """Aggregate a (ts, value) stream into OHLCV bars at ``grain``.

    ``grain`` is any ``date_trunc`` unit ('hour', 'day', ...). open/close
    use ``min_by``/``max_by`` on the event time — a single-pass aggregate,
    not a window — so the whole candle is one HashAggregate.
    """
    return (
        df.groupBy(
            F.col(series_col).alias("series"),
            F.date_trunc(grain, "ts").alias("bucket"),
        ).agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _candles_oracle(grain: str) -> str:
    return f"""
        SELECT
          event_type AS series,
          date_trunc('{grain}', CAST(ts AS TIMESTAMP)) AS bucket,
          arg_min(value, ts) AS open,
          max(value) AS high,
          min(value) AS low,
          arg_max(value, ts) AS close,
          {sql_dsum("value")} AS volume,
          count(*) AS n
        FROM events
        GROUP BY 1, 2
    """


@query("a8_candles_1h", oracle=_candles_oracle("hour"), tags=("flagship", "A8"))
def a8_candles_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLCV candles per event_type series (SURVEY.md §2.4 A8)."""
    return candles(events_us(spark, sf_dir), "hour")


@query("t1_candles_1d_tumbling", oracle=_candles_oracle("day"), tags=("T1", "A8"))
def t1_candles_1d_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window candles via ``F.window`` (SURVEY.md §2.9 T1).

    Same semantics as date_trunc bucketing, expressed with the streaming
    window primitive so the identical code runs under readStream.
    """
    e = events_us(spark, sf_dir)
    return (
        e.groupBy(
            F.col("event_type").alias("series"),
            F.window("ts", "1 day").alias("w"),
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "series",
            F.col("w.start").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n",
        )
    )


@query(
    "x1_resample_1h_to_1d",
    oracle=f"""
        WITH hourly AS ({_candles_oracle("hour")})
        SELECT
          series,
          date_trunc('day', bucket) AS day,
          arg_min(open, bucket) AS open,
          max(high) AS high,
          min(low) AS low,
          arg_max(close, bucket) AS close,
          {sql_dsum("volume")} AS volume,
          CAST(sum(n) AS BIGINT) AS n
        FROM hourly
        GROUP BY 1, 2
    """,
    tags=("X1",),
)
def x1_resample_1h_to_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample hourly candles to daily (SURVEY.md §2.10 X1).

    Downsampling re-aggregates candle rows — open of the first hour, close
    of the last — exactly the multi-interval packet semantics the reference
    stores as separate series [R]. Two chained hash aggregations; Catalyst
    keeps the second shuffle narrow because (series, day) nests inside
    (series, hour)'s hash partitioning.
    """
    hourly = candles(events_us(spark, sf_dir), "hour")
    return (
        hourly.groupBy("series", F.date_trunc("day", "bucket").alias("day"))
        .agg(
            F.min_by("open", "bucket").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "bucket").alias("close"),
            dsum("volume").alias("volume"),
            F.sum("n").alias("n"),
        )
    )


@query(
    "a8_candles_vwap",
    oracle=f"""
        SELECT
          event_type AS series,
          date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket,
          {sql_dsum("value * value")} / {sql_dsum("value")} AS vwap,
          {sql_dsum("value")} AS volume,
          count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("A8",),
)
def a8_candles_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per daily bar — the candle column the
    reference derives from raw trades (Σ price·vol / Σ vol [R]; ``value``
    doubles as both here). Decimal-exact numerator and denominator, then
    one identical double division per group."""
    e = events_us(spark, sf_dir)
    return e.groupBy(
        F.col("event_type").alias("series"),
        F.date_trunc("day", "ts").alias("bucket"),
    ).agg(
        (dsum(F.col("value") * F.col("value")) / dsum("value")).alias("vwap"),
        dsum("value").alias("volume"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a8_candles_15m",
    oracle=f"""
        SELECT
          event_type AS series,
          time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bucket,
          arg_min(value, ts) AS open,
          max(value) AS high,
          min(value) AS low,
          arg_max(value, ts) AS close,
          {sql_dsum("value")} AS volume,
          count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("A8",),
)
def a8_candles_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-hour OHLCV bars (15-minute buckets) — the reference stores
    packets per interval down to one minute [R]; date_trunc can't express
    sub-hour grains, so the bucket is epoch arithmetic
    (floor(epoch_us / 900e6) · 900s), epoch-aligned exactly like DuckDB's
    time_bucket. Same single hash-aggregate plan as the hourly flagship —
    grain changes the key cardinality, never the plan."""
    e = events_us(spark, sf_dir)
    ts_us = F.unix_micros("ts")
    bucket = F.timestamp_seconds(F.floor(ts_us / (900 * 1_000_000)) * 900)
    return (
        e.groupBy(F.col("event_type").alias("series"), bucket.alias("bucket"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )
