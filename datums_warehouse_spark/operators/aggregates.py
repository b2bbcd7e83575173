"""Aggregation operators (SURVEY.md §2.4 A1–A11, minus A8 in candles.py).

All hash aggregations with map-side partial aggregation — the plan shape
that scales linearly with executors. Float-valued aggregates route through
``functions.determinism`` so results are bit-identical across runs and
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import davg, dsum, sql_davg, sql_dsum
from datums_warehouse_spark.functions.hashing import hash48, sql_hash48
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load


@query(
    "a1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity")} AS sum_qty,
               {sql_dsum("l_extendedprice")} AS sum_base_price,
               {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               {sql_davg("l_quantity")} AS avg_qty,
               {sql_davg("l_extendedprice")} AS avg_price,
               {sql_davg("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1",),
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical multi-aggregate hash group-by."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "a2_global_cursor",
    oracle="""
        SELECT max(ts) AS max_ts, min(ts) AS min_ts, count(*) AS n
        FROM events
    """,
    tags=("A2",),
)
def a2_global_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global no-group aggregate — the reference's incremental-update cursor
    (read stored max(ts), fetch newer; SURVEY.md §2.1 S5 [R])."""
    e = events_us(spark, sf_dir)
    return e.agg(
        F.max("ts").alias("max_ts"), F.min("ts").alias("min_ts"), F.count(F.lit(1)).alias("n")
    )


@query(
    "a3_count_distinct",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT date_trunc('day', ts)) AS n_active_days
        FROM events
        GROUP BY event_type
    """,
    tags=("A3",),
)
def a3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate."""
    e = events_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_active_days"),
    )


@query("a4_approx_count_distinct", tags=("A4",))
def a4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct (rows-only: sketches aren't cross-engine).

    The 100 TB path for cardinality estimation — one pass, fixed memory,
    no shuffle of distinct values (SURVEY.md §2.4 A4).
    """
    e = events_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
    )


@query(
    "a5_rollup",
    oracle=f"""
        SELECT year(o_orderdate) AS order_year, o_orderpriority,
               count(*) AS n_orders,
               {sql_dsum("o_totalprice")} AS total
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
    tags=("A5",),
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (year, priority) → (year) → () subtotal levels."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .rollup("order_year", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


@query(
    "a5_cube",
    oracle=f"""
        SELECT c_mktsegment, o_orderstatus,
               count(*) AS n_orders,
               {sql_davg("o_totalprice")} AS avg_price
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
    tags=("A5",),
)
def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims of the customer⋈orders join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), davg("o_totalprice").alias("avg_price"))
    )


@query(
    "a6_having",
    oracle=f"""
        SELECT o_custkey, count(*) AS n_orders, {sql_dsum("o_totalprice")} AS total
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 8 AND {sql_dsum("o_totalprice")} > 1500000
    """,
    tags=("A6",),
)
def a6_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
        .filter((F.col("n_orders") >= 8) & (F.col("total") > 1_500_000))
    )


@query(
    "a7_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("A7",),
)
def a7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT rows — the reference dedups re-fetched candles the
    same way (by key), SURVEY.md §2.4 A7 [R]."""
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "a9_pivot",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY 1
    """,
    tags=("A9",),
)
def a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into per-day count columns.

    The pivot value list is explicit — at scale an implicit pivot triggers
    an extra distinct-values job.
    """
    e = events_us(spark, sf_dir)
    piv = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select("day", *[F.coalesce(t, F.lit(0)).alias(t) for t in EVENT_TYPES])


@query(
    "a9b_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, value
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-06-01'
              AND l_shipdate <  TIMESTAMP '1998-07-01'
        ) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    tags=("A9",),
)
def a9b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the inverse of a9's pivot: wide measure columns melted to
    (key, metric, value) rows, the normalization step before generic
    per-metric aggregation or sparse storage.

    Scale shape: a pure per-row projection (each input row expands to
    exactly |measures| output rows inside the scan's task — Spark compiles
    `unpivot` to an Expand node), no shuffle, filter pushed to the scan.
    Values are copied, not computed, so cross-engine equality is exact.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-06-01") & (F.col("l_shipdate") < "1998-07-01")
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )


@query(
    "a10_stats",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(stddev_samp(value), 6) AS sd,
               min(value) AS vmin,
               max(value) AS vmax
        FROM events
        GROUP BY event_type
    """,
    tags=("A10",),
)
def a10_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles + stddev — the reference's series-validation stats
    (SURVEY.md §2.4 A10 [R]). Rounded to 6dp: interpolation/variance
    accumulation differs in final ulps across engines."""
    e = events_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@query(
    "a11_collect_list",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               count(*) AS n
        FROM events
        GROUP BY user_id
    """,
    tags=("A11",),
)
def a11_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set into a sorted, comma-joined string (sorted for
    determinism — raw collect order is partition-dependent; joined to a
    scalar because the correctness gate's canonicalizer hashes flat cells,
    and array cells are unhashable on the pandas side)."""
    e = events_us(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a5_grouping_sets",
    oracle=f"""
        SELECT c_mktsegment, o_orderpriority,
               count(*) AS n, {sql_dsum("o_totalprice")} AS total,
               CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
    """,
    tags=("A5",),
)
def a5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators, via the SQL
    surface (rollup/cube cover the other A5 shapes)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    c.join(o, c.c_custkey == o.o_custkey).createOrReplaceTempView("a5gs")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total,
               CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri
        FROM a5gs
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        """
    )


@query(
    "a1_salted_two_stage",
    oracle=f"""
        SELECT event_type, count(*) AS n, {sql_dsum("value")} AS total
        FROM events GROUP BY event_type
    """,
    tags=("A1", "scale"),
)
def a1_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation: pre-aggregate on (key, salt) then
    merge — the manual skew-buster for hot grouping keys (SURVEY.md §4.3).

    With 5 event types every key IS hot; salting spreads each over 16
    partial groups. Decimal sums re-merge exactly, so the result is
    bit-identical to the direct aggregation (same oracle shape). At 100 TB
    this is the fallback when AQE skew handling can't help (skew in the
    aggregation key itself, not a join).
    """
    e = events_us(spark, sf_dir)
    salted = e.withColumn("salt", F.col("event_id") % 16)
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.sum("psum").cast("double").alias("total")
    )


KMV_K = 64  # sketch size: relative error ~ 1/sqrt(K-1) ≈ 12.6%


@query(
    "a12_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   {sql_hash48("CAST(user_id AS VARCHAR)")} AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ),
        kth AS (
            SELECT event_type, max(h) AS hk, count(*) AS n_in
            FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, count(DISTINCT user_id) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, e.n_exact,
               CASE WHEN k.n_in < {KMV_K}
                    THEN CAST(k.n_in AS DOUBLE)
                    ELSE CAST({KMV_K - 1} AS DOUBLE) * 281474976710656.0 / k.hk
               END AS kmv_estimate
        FROM exact e JOIN kth k ON e.event_type = k.event_type
    """,
    tags=("A12", "A4", "scale"),
)
def a12_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch — the cross-engine-
    REPRODUCIBLE alternative to A4's HLL: keep the K smallest values of a
    portable 48-bit hash per group; the K-th smallest estimates density
    ((K-1) · 2^48 / h_K, the classic bottom-k estimator). Because the
    sketch is just an order statistic of deterministic integer hashes,
    DuckDB reconstructs it bit-for-bit and the approximate answer itself
    is hash-GRADED — the property engine-native HLL can never offer
    (a4 stays rows-only for exactly that reason). Below K distinct values
    the sketch degenerates to the exact count (n_in < K regime).

    Scale shape: one distinct-reduce of (group, hash) — map-side
    combinable — then a bottom-K per group via a PARTITIONED window over
    the deduped hashes, bounded by distinct-count not corpus size; K-row
    state per group. Mergeability is the production point: bottom-K sets
    union associatively across partitions/days, so the sketch composes
    incrementally like the reference's cursor updates [R].
    """
    from pyspark.sql import Window

    e = events_us(spark, sf_dir)
    h = (
        e.select("event_type", hash48(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_in"))
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("n_in") < KMV_K, F.col("n_in").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * F.lit(281474976710656.0) / F.col("hk"))
    return exact.join(kth, "event_type").select(
        "event_type", "n_exact", est.alias("kmv_estimate")
    )


# --- A13: equi-width value histogram ------------------------------------------

HIST_WIDTH = 25.0  # value-units per bin (events.value spans ~[0, 600])
HIST_BINS = 24     # overflow clamps into the last bin


@query(
    "a13_value_histogram",
    oracle=f"""
        WITH binned AS (
            SELECT event_type AS series,
                   least(CAST(floor(value / {HIST_WIDTH}) AS BIGINT),
                         {HIST_BINS - 1}) AS bin,
                   value
            FROM events
        )
        SELECT series, bin,
               bin * {HIST_WIDTH} AS lo,
               (bin + 1) * {HIST_WIDTH} AS hi,
               count(*) AS n,
               min(value) AS v_min,
               max(value) AS v_max
        FROM binned
        GROUP BY series, bin
    """,
    tags=("A13",),
)
def a13_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per series (A13) — the distribution
    profile an optimizer's column statistics, a monitoring dashboard, or
    a data-quality drift check is built from; the binned complement of
    a10's summary statistics and l30's equi-DEPTH deciles (fixed bin
    edges here, fixed bin mass there).

    Bin assignment is row-local integer arithmetic — floor(value/width)
    clamped into the top bin — so the corpus is never sorted or ranked:
    one map-side-combinable hash aggregate, output bounded by
    series × bins regardless of data volume. floor of an IEEE division
    is deterministic cross-engine (identical double in, identical bin
    out); min/max per bin carry raw stored values, so the whole row is
    hash-exact. At 100 TB this is the profile you compute per partition
    and merge — the aggregate is associative by construction.
    """
    e = events_us(spark, sf_dir)
    bin_col = F.least(
        F.floor(F.col("value") / HIST_WIDTH).cast("long"), F.lit(HIST_BINS - 1)
    )
    return (
        e.select(F.col("event_type").alias("series"), bin_col.alias("bin"), "value")
        .groupBy("series", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .select(
            "series",
            "bin",
            (F.col("bin") * HIST_WIDTH).alias("lo"),
            ((F.col("bin") + 1) * HIST_WIDTH).alias("hi"),
            "n",
            "v_min",
            "v_max",
        )
    )


@query(
    "a14_grouped_mode",
    oracle="""
        WITH buckets AS (
            SELECT event_type, floor(value / 10) * 10 AS bucket, count(*) AS cnt
            FROM events
            GROUP BY event_type, bucket
        )
        SELECT event_type,
               -(max(struct_pack(cnt := cnt, nb := -bucket)).nb) AS mode_bucket,
               max(struct_pack(cnt := cnt, nb := -bucket)).cnt AS mode_n
        FROM buckets
        GROUP BY event_type
    """,
    tags=("A14",),
)
def a14_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tie-break — the
    most-frequent value-decile bucket per event type. Engine-native
    ``mode()`` breaks ties arbitrarily (DuckDB documents "first seen",
    Spark's depends on aggregation order), so the graded form makes the
    tie-break part of the semantics: highest count, then LOWEST bucket,
    expressed as ``max(struct(cnt, -bucket))`` — fieldwise struct
    comparison, identical in both engines (the l43 top-gram idiom).

    Scale shape: two hash aggregates, both map-side combinable — the
    first keyed (event_type, bucket) reduces the fact table to the bucket
    histogram, the second keyed event_type reduces that to one row per
    group. No window, no sort, no join."""
    e = events_us(spark, sf_dir)
    # floor() returns BIGINT in Spark but DOUBLE in DuckDB — cast before
    # the *10 so the graded bucket column is DoubleType on both engines
    buckets = e.groupBy(
        "event_type",
        (F.floor(F.col("value") / 10).cast("double") * 10).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    top = buckets.groupBy("event_type").agg(
        F.max(
            F.struct(F.col("cnt").alias("cnt"), (-F.col("bucket")).alias("nb"))
        ).alias("top")
    )
    return top.select(
        "event_type",
        (-F.col("top.nb")).alias("mode_bucket"),
        F.col("top.cnt").alias("mode_n"),
    )
