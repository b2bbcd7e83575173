"""Deterministic train/val/test split assignment (L25/L26).

Split membership must be a pure function of a stable document identity —
never row order, sampling RNG, or partition layout — so that re-runs,
backfills, and incremental appends keep every document on its original
side of the train/test wall. The portable 48-bit md5 hash (hash48) mod
SPLIT_SCALE gives identical buckets in Spark and DuckDB, making the split
itself oracle-gradable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.hashing import hash48, sql_hash48

SPLIT_SCALE = 1000
TRAIN_CUT = 900  # [0, 900) → train
VAL_CUT = 950    # [900, 950) → val; [950, 1000) → test


def split_col(doc_id: str = "doc_id") -> Column:
    """'train' | 'val' | 'test' from the stable doc identity."""
    b = F.pmod(hash48(F.col(doc_id).cast("string")), F.lit(SPLIT_SCALE))
    return (
        F.when(b < TRAIN_CUT, F.lit("train"))
        .when(b < VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# DuckDB twin: a CTE named `splits` with (doc_id, split).
SQL_SPLITS = f"""
    splits AS (
        SELECT doc_id,
               CASE WHEN b < {TRAIN_CUT} THEN 'train'
                    WHEN b < {VAL_CUT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   {sql_hash48("CAST(doc_id AS VARCHAR)")} % {SPLIT_SCALE} AS b
            FROM documents
        )
    )
"""
