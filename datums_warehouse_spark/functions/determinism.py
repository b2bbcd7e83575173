"""Cross-engine determinism helpers (SURVEY.md §4.3.4–5).

Floating-point aggregation is order-dependent, and Spark's partition/merge
order differs run-to-run and from DuckDB's. For any aggregate whose value is
graded against the oracle we route the sum through an exact decimal:

    Spark : CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)

Decimal addition is exact and associative, so both engines produce the
identical decimal, and decimal→double conversion is the same IEEE value.
This also makes the result *deterministic across Spark runs* — which plain
``SUM(double)`` is not. The per-row double→decimal cast rounds at 1e-6,
far below the testdata's value resolution.

At 100 TB this costs one widened accumulator per group — negligible next to
the shuffle — and buys reproducible results, which a real pipeline wants
anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 sums (~6e9) with big headroom; scale 6 puts the
# rounding boundary far below data resolution.
DEC = "decimal(25,6)"
# High-scale variant for small-magnitude values (embedding components).
DEC12 = "decimal(30,12)"


def dsum(col: Column | str, dec: str = DEC) -> Column:
    """Order-independent SUM over doubles; returns DoubleType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double")


def davg(col: Column | str, dec: str = DEC) -> Column:
    """Order-independent AVG over doubles; returns DoubleType.

    Exact decimal sum divided by count as a double — both engines perform
    the identical double division.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double") / F.count(c)


def sql_dsum(expr: str, dec: str = "DECIMAL(25,6)") -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE)"


def sql_davg(expr: str, dec: str = "DECIMAL(25,6)") -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE) / COUNT({expr})"
