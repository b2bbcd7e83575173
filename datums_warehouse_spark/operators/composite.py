"""Composite analytics — multi-operator pipelines exercising realistic
query shapes end to end (TPC-H-style decision-support + funnel/health
reports). Each composes operators already covered individually in
SURVEY.md §2, proving they chain under one Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import dsum, sql_dsum
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load

SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "comp1_shipping_priority",
    oracle=f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {sql_dsum(SQL_REVENUE)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("composite",),
)
def comp1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped BUILDING orders by revenue —
    filter pushdown ⋈ two joins ⋈ aggregate ⋈ top-k in one plan.
    Deterministic LIMIT: revenue is decimal-exact, orderkey breaks ties.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "comp2_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               {sql_dsum(SQL_REVENUE)} AS lost_revenue,
               count(*) AS n_returned_lines
        FROM customer
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("composite",),
)
def comp2_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue).alias("lost_revenue"), F.count(F.lit(1)).alias("n_returned_lines"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "comp3_funnel_conversion",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ), purchases AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ), converted AS (
            SELECT DISTINCT c.user_id, c.ts
            FROM clicks c JOIN purchases p
              ON p.user_id = c.user_id
             AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
        )
        SELECT c.user_id AS user_id,
               count(*) AS n_clicks,
               count(v.ts) AS n_converted,
               CAST(count(v.ts) AS DOUBLE) / count(*) AS conversion_rate
        FROM clicks c
        LEFT JOIN converted v ON v.user_id = c.user_id AND v.ts = c.ts
        GROUP BY c.user_id
    """,
    tags=("composite",),
)
def comp3_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion within 30 minutes, per user — interval
    join + semi-join-style dedup + conditional aggregation."""
    e = events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("user_id", "ts")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    joined = clicks.join(converted, ["user_id", "ts"], "left")
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("converted").alias("n_converted"),
        (F.count("converted").cast("double") / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
    )


@query(
    "comp4_series_health",
    oracle="""
        WITH hourly AS (
            SELECT event_type AS series, date_trunc('hour', ts) AS bucket,
                   arg_max(value, ts) AS close
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT series, min(bucket) AS h0, max(bucket) AS h1,
                   count(*) AS n_candles
            FROM hourly GROUP BY series
        ),
        latest AS (
            SELECT series, arg_max(close, bucket) AS last_close FROM hourly GROUP BY series
        )
        SELECT b.series AS series,
               b.n_candles AS n_candles,
               CAST(date_diff('hour', b.h0, b.h1) + 1 AS BIGINT) AS n_expected,
               CAST(date_diff('hour', b.h0, b.h1) + 1 AS BIGINT) - b.n_candles AS n_gaps,
               CAST(b.n_candles AS DOUBLE)
                   / (date_diff('hour', b.h0, b.h1) + 1) AS completeness,
               l.last_close AS last_close
        FROM bounds b JOIN latest l ON b.series = l.series
    """,
    tags=("composite",),
)
def comp4_series_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series health report — the reference's validation summary as one
    query: candle counts vs expected grid, gap totals, completeness ratio,
    latest close (composes A8 + X2 + A2)."""
    e = events_us(spark, sf_dir)
    hourly = e.groupBy(
        F.col("event_type").alias("series"), F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.max_by("value", "ts").alias("close"))
    bounds = hourly.groupBy("series").agg(
        F.min("bucket").alias("h0"),
        F.max("bucket").alias("h1"),
        F.count(F.lit(1)).alias("n_candles"),
        F.max_by("close", "bucket").alias("last_close"),
    )
    n_expected = (
        (F.unix_timestamp("h1") - F.unix_timestamp("h0")) / 3600 + 1
    ).cast("long")
    return bounds.select(
        "series",
        "n_candles",
        n_expected.alias("n_expected"),
        (n_expected - F.col("n_candles")).alias("n_gaps"),
        (F.col("n_candles").cast("double") / n_expected).alias("completeness"),
        "last_close",
    )


@query(
    "comp5_promo_revenue_share",
    oracle=f"""
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE 0.0 END")}
                   AS promo_revenue,
               {sql_dsum(SQL_REVENUE)} AS total_revenue,
               round({sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE 0.0 END")}
                     / {sql_dsum(SQL_REVENUE)} * 100, 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    """,
    tags=("composite",),
)
def comp5_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly % of revenue from PROMO parts — broadcast
    dim join + conditional decimal aggregation + exact ratio."""
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0)
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month")).agg(
        dsum(promo).alias("promo_revenue"),
        dsum(revenue).alias("total_revenue"),
        F.round(dsum(promo) / dsum(revenue) * 100, 6).alias("promo_pct"),
    )


@query(
    "comp6_small_quantity_revenue",
    oracle=f"""
        SELECT p_brand,
               {sql_dsum("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
        GROUP BY p_brand
    """,
    tags=("composite",),
)
def comp6_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders, per brand —
    a correlated scalar subquery, decorrelated by hand into a per-part
    average joined back (exactly what Catalyst's RewriteCorrelatedScalarQuery
    does; writing the join form keeps the plan explicit).

    Cross-engine note: the 0.2*avg threshold is compared, not projected —
    avg(integral doubles) is exact, 0.2*x is one deterministic multiply,
    so the predicate agrees between engines.
    """
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "comp7_large_orders",
    oracle=f"""
        SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
               {sql_dsum("l_quantity")} AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        )
        GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("composite",),
)
def comp7_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — IN-subquery on
    an aggregate, expressed as a semi join against the grouped lineitem
    (sum of integral quantities is exact, so the >250 cut is portable)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "comp8_late_shipment_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    tags=("composite",),
)
def comp8_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped >60 days after
    order date, counted per priority — EXISTS becomes a left-semi join with
    a non-equi conjunct on top of the orderkey equi-join (shuffles once on
    the key; the date predicate evaluates join-side, no explosion)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "comp9_priority_shipment_mix",
    oracle="""
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS n_priority,
               count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS n_regular
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_discount >= 0.05
        GROUP BY 1
    """,
    tags=("composite",),
)
def comp9_priority_shipment_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship month, discounted lines split into
    priority vs regular orders — conditional aggregation over a fact⋈fact
    join with the selective line filter pushed below the join."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.05)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.count(F.when(urgent, 1)).alias("n_priority"),
            F.count(F.when(~urgent, 1)).alias("n_regular"),
        )
    )


@query(
    "comp10_disjunctive_revenue",
    oracle=f"""
        SELECT {sql_dsum(SQL_REVENUE)} AS revenue, count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("composite",),
)
def comp10_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    branches — the disjunction splits into a part-side prefilter (brand
    IN …, the union of branches) that pushes into the broadcast build
    side, with the full predicate evaluated post-join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "comp11_dormant_rich_customers",
    oracle="""
        WITH cutoff AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                   / count(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
        FROM customer, cutoff
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_nationkey
    """,
    tags=("composite",),
)
def comp11_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never ordered,
    per nation — a broadcast scalar subquery (the global average), then an
    anti join against orders. The anti join shuffles on custkey; the
    one-row cutoff broadcasts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count("c_acctbal")).alias("avg_bal")
    )
    rich = (
        c.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_bal"),
    )


@query(
    "comp12_local_supplier_volume",
    oracle=f"""
        SELECT n_name, {sql_dsum(SQL_REVENUE)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("composite",),
)
def comp12_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation, scoped to one region and one order year. The distinctive
    piece is the *cross-table* equi-conjunct c_nationkey = s_nationkey,
    which rides on the supplier join rather than a filter. nation⋈region
    broadcast; the two fact joins shuffle on their keys; the year filter
    pushes into the orders scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(nr, s.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


@query(
    "comp13_forecast_revenue",
    oracle=f"""
        SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("composite",),
)
def comp13_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table scan-aggregate under three conjunctive
    range predicates — the canonical predicate-pushdown probe. All three
    filters reach the parquet reader as PushedFilters; the global aggregate
    is a partial-per-partition + single final reduce (no keyed shuffle).
    The discount bounds compare identical parquet doubles against identical
    literals in both engines, so the row set is exact."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "comp14_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year, {sql_dsum("volume")} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("composite",),
)
def comp14_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. nation joins twice under different roles (supplier side n1,
    customer side n2) — both broadcast — and the disjunctive nation-pair
    predicate evaluates after both are attached. year() is cast to long to
    match DuckDB's BIGINT."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(volume).alias("revenue"))
    )


@query(
    "comp15_national_market_share",
    oracle=f"""
        SELECT o_year,
               round({sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
                     / {sql_dsum("volume")}, 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        )
        GROUP BY o_year
    """,
    tags=("composite",),
)
def comp15_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of STANDARD-part order volume sold
    into AMERICA, per order year — an 8-table join where nation serves two
    roles (customer→region scoping via n1, supplier labelling via n2), with
    the share as a conditional-sum / total-sum ratio (both decimal-exact,
    divided once, rounded at a representable boundary)."""
    p = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = F.broadcast(
        nat.join(r, nat.n_regionkey == r.r_regionkey).select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = F.broadcast(
        nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat3 = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(dsum(nat3) / dsum(volume), 6).alias("mkt_share"))
    )


@query(
    "comp16_product_profit",
    oracle=f"""
        SELECT nation, o_year, {sql_dsum("amount")} AS profit
        FROM (
            SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
    """,
    tags=("composite",),
)
def comp16_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts per supplier nation and order
    year — the LIKE-filtered part list broadcasts into lineitem, then
    supplier/orders/nation attach. The testdata has no partsupp table, so
    the classic ``- ps_supplycost * l_quantity`` term is absent and profit
    degenerates to discounted revenue; the join/filter/rollup shape (the
    part of Q9 that stresses an engine) is intact."""
    p = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("profit"))
    )


@query(
    "comp17_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {sql_dsum(SQL_REVENUE)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("composite",),
)
def comp17_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    an aggregate-derived view consumed twice (per-supplier revenue, and its
    global max as a scalar subquery). The revenue view is computed once and
    reused; the one-row max broadcasts into the equality filter. Revenue is
    decimal-exact on both engines, so the double equality against the max
    is exact, and ties (all max suppliers) surface identically."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "comp18_waiting_suppliers",
    oracle="""
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
        )
        SELECT s_name, count(*) AS numwait
        FROM lo l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (
              SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lo l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.late
          )
        GROUP BY s_name
    """,
    tags=("composite",),
)
def comp18_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper on a
    finished multi-supplier order (late ≡ shipped >60 days after the order
    date, the same lateness proxy as comp8 — the testdata carries no
    commit/receipt dates). Instead of decorrelating the EXISTS / NOT-EXISTS
    pair into a per-order aggregate self-joined back (two lineitem scans,
    two shuffles on the order key), both subqueries become window
    collect_sets over ``partitionBy(l_orderkey)``: a late line qualifies
    iff its order's supplier set has >1 member and its late-supplier set
    exactly one (necessarily its own). One lineitem scan, and the window
    reuses the order-join's key partitioning."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    lo = lo.withColumn("supps", F.collect_set("l_suppkey").over(w)).withColumn(
        "late_supps", F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lo.filter(F.col("late") & (F.size("supps") > 1) & (F.size("late_supps") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "comp19_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), cand AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost,
                   min(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
            FROM part
            JOIN cost ON p_partkey = l_partkey
            JOIN eu   ON l_suppkey = s_suppkey
            WHERE p_type = 'STANDARD' AND p_size < 15
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM cand
        WHERE unit_cost = best_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("composite",),
)
def comp19_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering it at the minimum unit cost. The testdata has no partsupp
    table, so the supplier catalog is derived from lineitem itself —
    unit cost ≡ min(l_extendedprice / l_quantity) per (part, supplier) —
    which preserves Q2's defining structure: a correlated min-subquery
    over a region-restricted supplier set.

    Scale shape: the classic decorrelation. Instead of re-evaluating the
    min per part (Q2's correlated subquery), the region-restricted
    candidate set is built once and ``min() OVER (PARTITION BY
    p_partkey)`` attaches each part's floor in the same shuffle that the
    equality filter then consumes — one lineitem aggregation, one window,
    no second scan. supplier⋈nation⋈region collapses to one broadcast.
    Every compared value is exact across engines: the division and min are
    identical IEEE ops on identical doubles, so `unit_cost = best_cost`
    selects the same rows in Spark and DuckDB, and the ORDER BY key
    (s_acctbal, n_name, s_name, p_partkey) is unique per row, making the
    LIMIT deterministic.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = F.broadcast(
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") < 15))
        .select("p_partkey", "p_name")
    )
    # Round 12 (guide §3.2: reduce the big side BEFORE shuffling it): both
    # dimension filters are broadcastable, so broadcast semi-joins drop
    # every lineitem row whose part or supplier can't qualify BEFORE the
    # (l_partkey, l_suppkey) aggregation shuffle — exact pruning: min()
    # within a surviving group never sees rows of dropped groups, so the
    # group set and every unit_cost are unchanged (verified identical at
    # sf0.1; 0.91 s → 0.66 s). At 100 TB this is the difference between
    # shuffling the full catalog and the qualifying slice.
    li = li.join(
        p.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    ).join(eu.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "left_semi")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(p, cost.l_partkey == p.p_partkey)
        .join(eu, cost.l_suppkey == eu.s_suppkey)
        .withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(100)
    )


@query(
    "comp20_important_parts",
    oracle=f"""
        WITH natline AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS amount
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'AMERICA'
        )
        SELECT l_partkey AS p_partkey, {sql_dsum("amount")} AS part_value
        FROM natline
        GROUP BY l_partkey
        HAVING {sql_dsum("amount")} >
               CAST(0.001 AS DOUBLE) * (SELECT {sql_dsum("amount")} FROM natline)
    """,
    tags=("composite",),
)
def comp20_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose AMERICA-supplied value exceeds a
    fraction of the region's total supplied value — HAVING against a
    scalar subquery. (No partsupp table, so "supplied value" is the
    region's discounted lineitem revenue per part; a region rather than
    Q11's single nation keeps the filter non-degenerate at sf0.001.)

    Scale shape: the nation-filtered line set is declared once and
    consumed twice (per-part sum, global sum); the global sum is one row
    and broadcasts into the HAVING filter, so the second consumption costs
    a recompute of the filtered scan, not a second shuffle of the groups.
    Both sums route through exact decimal (dsum), and the 0.001
    multiplication is the same double op on both engines, so the HAVING
    cut is bit-identical.
    """
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nat_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    natline = li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
    )
    per_part = natline.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        dsum("amount").alias("part_value")
    )
    total = natline.agg((dsum("amount") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("p_partkey", "part_value")
    )


@query(
    "comp21_supplier_breadth",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#17'
          AND p_type NOT IN ('PROMO', 'LARGE')
          AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
          )
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("composite",),
)
def comp21_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can ship each
    qualifying (brand, type, size) bucket, excluding a blocklisted
    supplier set (NOT-IN subquery — Q16's complaint filter, proxied by an
    s_name pattern since the testdata carries no comment column). The
    part-supplier relation is derived from lineitem.

    Scale shape: the blocklist is a filtered dim → broadcast LEFT ANTI
    join (no shuffle); the part filter broadcasts into the fact scan; the
    only shuffle is the final count-distinct aggregation, whose
    distinct-expand Spark handles with a two-phase partial aggregate. All
    compared values are integers/strings — no FP concerns.
    """
    blocked = F.broadcast(
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    p = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#17")
            & (~F.col("p_type").isin("PROMO", "LARGE"))
            & (F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(blocked, li.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "comp22_excess_quantity_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate <  TIMESTAMP '1999-01-01'
            GROUP BY l_partkey, l_suppkey
        ), dominant AS (
            SELECT l_suppkey
            FROM (
                SELECT l_suppkey, qty,
                       CAST(SUM(CAST(qty AS DECIMAL(25,6)))
                            OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_total
                FROM shipped
            )
            WHERE qty > CAST(0.3 AS DOUBLE) * part_total
        )
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
    tags=("composite",),
)
def comp22_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers who dominated shipment of a 'small'
    part in 1998 — shipped >30% of the part's year volume. Q20's nested
    IN-subqueries (supplier IN (... part IN (...) HAVING qty > scalar))
    become an aggregate-derived qualifying set consumed via a semi-join;
    availqty is absent from the testdata, so dominance is measured against
    the part's shipped total.

    Scale shape: the filtered fact is explicitly repartitioned on
    l_partkey ONCE; HashPartitioning(l_partkey) satisfies both the
    (l_partkey, l_suppkey) aggregation's clustering (partitioning keys are
    a subset of the group keys) and the per-part window's — so the agg and
    the window both run shuffle-free on that single exchange (the r06
    advice showed the previous group-key partitioning did NOT carry over
    to the window, which cost a hidden second exchange). The qualifying
    supplier set is tiny → broadcast LEFT SEMI into the region-filtered
    supplier dim. Both the group sum and the window sum route through
    exact decimal, so the 0.3·total cut is bit-identical across engines.
    """
    p = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn(
            "part_total", F.sum(F.col("qty").cast("decimal(25,6)")).over(w).cast("double")
        )
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_total"))
        .select("l_suppkey")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
