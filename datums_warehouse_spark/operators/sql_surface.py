"""SQL-API surface: queries expressed as `spark.sql(...)` text over
registered temp views — the other half of the engine's user contract.

Everything else in the registry drives the DataFrame API; these prove the
same warehouse serves ANSI SQL directly (view registration → SQL text →
Catalyst), with the same determinism discipline: every graded float
aggregate routes through the exact-decimal cast, spelled identically in
the Spark SQL and the DuckDB oracle.

View registration (`createOrReplaceTempView`) is catalog metadata only —
no job runs at query construction, so these stay lazy like the rest of
the registry. View names carry the scale-factor tag so two sf_dirs never
collide in one session.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import load

DSUM = "CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").split("/")[-1])
    name = f"{table}_{tag}"
    load(spark, sf_dir, table).createOrReplaceTempView(name)
    return name


@query(
    "sql1_pricing_summary_full",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {DSUM.format(x="l_quantity")} AS sum_qty,
               {DSUM.format(x="l_extendedprice")} AS sum_base_price,
               {DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {DSUM.format(x="l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
                   AS sum_charge,
               {DSUM.format(x="l_quantity")} / count(*) AS avg_qty,
               {DSUM.format(x="l_extendedprice")} / count(*) AS avg_price,
               {DSUM.format(x="l_discount")} / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("SQL1", "A1"),
)
def sql1_pricing_summary_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete TPC-H Q1 (all nine aggregates) as literal `spark.sql`
    text — the SQL-API twin of a1_pricing_summary, which grades a reduced
    DataFrame version. The SQL string is the SAME text DuckDB runs except
    for the view name, so this also pins that the engine's SQL dialect
    handles the ANSI core unchanged.

    Scale shape: identical to a1 — Catalyst compiles the text to the same
    scan → partial hash-agg → exchange → final hash-agg plan the DataFrame
    version gets; pushdown of the shipdate predicate included.
    """
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {DSUM.format(x="l_quantity")} AS sum_qty,
               {DSUM.format(x="l_extendedprice")} AS sum_base_price,
               {DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {DSUM.format(x="l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
                   AS sum_charge,
               {DSUM.format(x="l_quantity")} / count(*) AS avg_qty,
               {DSUM.format(x="l_extendedprice")} / count(*) AS avg_price,
               {DSUM.format(x="l_discount")} / count(*) AS avg_disc,
               count(*) AS count_order
        FROM {li}
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "sql2_top_orders_per_segment",
    oracle="""
        SELECT mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c_mktsegment AS mktsegment, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        WHERE rn <= 3
    """,
    tags=("SQL2", "W7"),
)
def sql2_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment as `spark.sql` text: join + window
    + rank-filter subquery — the SQL-API twin of w7_topk_per_group.
    Deterministic rank: o_orderkey breaks totalprice ties identically on
    both engines. Catalyst still plans WindowGroupLimit (rank pushdown),
    so per-group state stays bounded at any segment size.
    """
    o = _view(spark, sf_dir, "orders")
    c = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c_mktsegment AS mktsegment, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM {o} JOIN {c} ON o_custkey = c_custkey
        )
        WHERE rn <= 3
        """
    )


@query(
    "sql3_recursive_cte",
    oracle=f"""
        WITH RECURSIVE spine AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS m,
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS mx
            FROM orders
            UNION ALL
            SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx
            FROM spine WHERE m < mx
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   count(*) AS n_orders,
                   {DSUM.format(x="o_totalprice")} AS revenue
            FROM orders
            GROUP BY m
        )
        SELECT strftime(spine.m, '%Y-%m') AS month,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(revenue, 0.0) AS revenue
        FROM spine LEFT JOIN per_month ON per_month.m = spine.m
    """,
    tags=("SQL3",),
)
def sql3_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (SQL:1999 `WITH RECURSIVE`, new in Spark 4): a
    gap-free calendar-month spine unrolled from the order-date range —
    anchor = one aggregate row carrying (first month, last month), step =
    add one month while below the bound — LEFT-joined with the per-month
    order rollup so empty months surface as explicit zero rows (the
    revenue-reporting shape where a missing month must read 0, not
    vanish). The recursion is self-contained: bounds travel inside the
    working set, so neither engine needs correlated scalar subqueries in
    the recursive member.

    Scale shape: the recursion generates O(calendar months) rows — bounded
    by time, not data — while the corpus-sized work is one map-side-
    combinable hash aggregate; the spine-side join broadcasts. Recursion
    depth ≈ months of history (safely under any iteration limit)."""
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        WITH RECURSIVE spine AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS m,
                   CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS mx
            FROM {o}
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE), mx
            FROM spine WHERE m < mx
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   count(*) AS n_orders,
                   {DSUM.format(x="o_totalprice")} AS revenue
            FROM {o}
            GROUP BY m
        )
        SELECT date_format(spine.m, 'yyyy-MM') AS month,
               coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
               coalesce(revenue, CAST(0.0 AS DOUBLE)) AS revenue
        FROM spine LEFT JOIN per_month ON per_month.m = spine.m
        """
    )
