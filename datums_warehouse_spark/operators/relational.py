"""Projection & filter operators (SURVEY.md §2.2 P1–P7).

All pure Catalyst territory: every predicate here reaches the parquet scan
as a pushed filter and the projection prunes columns at the reader
(verify with ``.explain`` → PushedFilters / ReadSchema). Nothing below ever
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load


@query(
    "p1_project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        FROM lineitem
    """,
    tags=("P1",),
)
def p1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with derived columns; per-row IEEE arithmetic is
    deterministic so raw doubles are directly comparable cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "p2_filter_comparison",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity < 24 AND l_extendedprice >= 1000
    """,
    tags=("P2",),
)
def p2_filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates — pushed down to the parquet row-group stats."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") < 24) & (F.col("l_extendedprice") >= 1000)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "p3_filter_time_range",
    oracle="""
        SELECT event_id, ts, event_type, value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=("P3",),
)
def p3_filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range scan — the reference's since/until REST params
    (SURVEY.md §2.2 P3 [R]). Both engines read the ns parquet at µs, so the
    raw ``ts`` is directly comparable."""
    e = events_us(spark, sf_dir)
    return e.filter(F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00")).select(
        "event_id", "ts", "event_type", "value"
    )


@query(
    "p4_filter_in_list",
    oracle="""
        SELECT event_id, event_type, user_id
        FROM events
        WHERE event_type IN ('purchase', 'signup')
    """,
    tags=("P4",),
)
def p4_filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership."""
    e = events_us(spark, sf_dir)
    return e.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "event_type", "user_id"
    )


@query(
    "p5_filter_like_regex",
    oracle="""
        SELECT p_partkey, p_name, p_type, p_brand
        FROM part
        WHERE p_name LIKE '%bolt%'
           OR regexp_matches(p_brand, '^Brand#1[0-9]$')
    """,
    tags=("P5",),
)
def p5_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regexp predicates."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_brand").rlike("^Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "p6_filter_nulls",
    oracle="""
        SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS disc_or_null
        FROM lineitem
        WHERE nullif(l_discount, 0.0) IS NULL AND l_quantity IS NOT NULL
    """,
    tags=("P6",),
)
def p6_filter_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL handling (nulls synthesized via nullif — the testdata
    itself is null-free)."""
    li = load(spark, sf_dir, "lineitem")
    disc_or_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey", "l_linenumber", disc_or_null.alias("disc_or_null"), "l_quantity"
    ).filter(F.col("disc_or_null").isNull() & F.col("l_quantity").isNotNull()).drop("l_quantity")


@query(
    "p7_compound_predicates",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' AND o_totalprice > 200000)
           OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'O')
    """,
    tags=("P7",),
)
def p7_compound_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT compound predicate tree."""
    o = load(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)) | (
        (F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_orderstatus") == "O")
    )
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "p8_table_profile",
    oracle=f"""
        SELECT 'l_quantity' AS col, count(*) AS n, count(l_quantity) AS n_nonnull,
               count(DISTINCT l_quantity) AS n_distinct,
               min(l_quantity) AS vmin, max(l_quantity) AS vmax
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*), count(l_extendedprice),
               count(DISTINCT l_extendedprice), min(l_extendedprice), max(l_extendedprice)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*), count(l_discount),
               count(DISTINCT l_discount), min(l_discount), max(l_discount)
        FROM lineitem
    """,
    tags=("P8", "profiling"),
)
def p8_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling: null/distinct/min/max per measure column — the
    warehouse-hygiene utility every ingest runs. One aggregate scan per
    profiled column, unioned to one row per column (count-distinct forces
    the per-column pass; without it this would be a single multi-agg scan).
    """
    li = load(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).alias("vmin"),
            F.max(col).alias("vmax"),
        )

    return (
        profile("l_quantity")
        .unionByName(profile("l_extendedprice"))
        .unionByName(profile("l_discount"))
    )
