"""Cross-engine portable hashing (SURVEY.md §4.3.3).

Engine-native ``hash()`` differs between Spark (Murmur3) and DuckDB, so
graded dedup/LSH pipelines derive integer keys from md5 — identical hex on
both engines — taking the first 12 hex digits as a 48-bit integer. 48 bits
keeps every subsequent ``a*h + b`` permutation inside int64 (a < 2^13 ⇒
a*h < 2^61 < 2^63), so MinHash arithmetic is exact integer math everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61 - 1: modulus for the (a*h + b) % P permutation family.
MINHASH_P = (1 << 61) - 1

# Fixed permutation parameters — 8 hashes → 4 bands × 2 rows.
MINHASH_AS = (1009, 1013, 1019, 1021, 1031, 1033, 1039, 1049)
MINHASH_BS = (12345, 67891, 23457, 89123, 45679, 1235, 56789, 91234)


def hash48(col: Column | str) -> Column:
    """48-bit integer hash of a string column, identical in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def sql_hash48(expr: str) -> str:
    """DuckDB twin of :func:`hash48`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 12)) AS BIGINT)"


def minhash_expr(i: int, h: str = "h") -> str:
    """SQL snippet (valid in both dialects) for permutation ``i`` of ``h``."""
    return f"({MINHASH_AS[i]} * {h} + {MINHASH_BS[i]}) % {MINHASH_P}"
