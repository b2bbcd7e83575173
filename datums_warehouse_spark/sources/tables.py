"""Parquet table loaders (SURVEY.md §2.1 S1).

The warehouse is a directory of Parquet datasets — the columnar flip of the
reference's CSV-per-series layout (SURVEY.md §1.1). Scans are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning,
and the vectorized reader for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. The only sanctioned way to read testdata."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(path(sf_dir, name))


def events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` normalized to microsecond-precision timestamp.

    The parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark has no type
    for — with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as an
    int64 of nanoseconds since epoch. We truncate to µs (Spark's timestamp
    resolution). DuckDB keeps ns, so oracle SQL touching raw ``ts`` must
    bucket/cast to µs or coarser on its side too (FIXTURES.md).
    """
    # Runtime-settable SQL conf; the driver's own SparkSession won't have it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load(spark, sf_dir, "events")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
