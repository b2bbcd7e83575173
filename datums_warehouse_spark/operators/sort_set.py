"""Sort / limit / top-k (SURVEY.md §2.6 O1–O4) and set ops (§2.7 U1–U4).

Order itself isn't graded (the driver's hash is order-insensitive), but
LIMIT/OFFSET queries sort on a unique total key so both engines select the
same rows. ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
a per-partition heap + driver merge, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import dsum, sql_dsum
from datums_warehouse_spark.functions.hashing import sql_hash48
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load


@query(
    "o1_global_sort",
    oracle="SELECT event_id, ts, event_type, value FROM events ORDER BY ts",
    tags=("O1",),
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global time-ordered output — the reference's REST response order
    (range-partitioned SortExec in Spark)."""
    e = events_us(spark, sf_dir)
    return e.select("event_id", "ts", "event_type", "value").orderBy("ts")


@query(
    "o2_multikey_sort",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
    """,
    tags=("O2",),
)
def o2_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit direction and null placement."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice").orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )


@query(
    "o3_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100 OFFSET 10
    """,
    tags=("O3",),
)
def o3_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 11–110 of the price-ranked orders. The sort key
    includes the unique o_orderkey so the page is engine-independent."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(100)
    )


@query(
    "o4_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("O4",),
)
def o4_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit → TakeOrderedAndProject (no global sort)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "u1_union_all",
    oracle="""
        SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    """,
    tags=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the reference's append-new-batch-to-series step [R]."""
    e = events_us(spark, sf_dir).select("event_id", "event_type", "value")
    return e.filter(F.col("event_type") == "click").unionByName(
        e.filter(F.col("event_type") == "purchase")
    )


@query(
    "u2_union_distinct",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U2",),
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics."""
    e = events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.union(buys).distinct()


@query(
    "u3_intersect",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'error'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U3",),
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users who both errored and purchased."""
    e = events_us(spark, sf_dir)
    errs = e.filter(F.col("event_type") == "error").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return errs.intersect(buys)


@query(
    "u4_except",
    oracle="""
        SELECT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'purchase'
    """,
    tags=("U4",),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): user-days with views but no purchase — the
    expected-minus-present shape the reference uses for gap detection [R]."""
    e = events_us(spark, sf_dir)
    day = F.date_trunc("day", "ts").alias("day")
    views = e.filter(F.col("event_type") == "view").select("user_id", day)
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", day)
    return views.subtract(buys)


@query(
    "u5_except_all",
    oracle="""
        SELECT user_id, n_views - n_buys AS n_unmatched FROM (
            SELECT user_id,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buys
            FROM events GROUP BY user_id
        )
        WHERE n_views > n_buys
    """,
    tags=("U5",),
)
def u5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each user's view rows minus one per
    purchase row — multiplicity-aware difference, a different operator
    from U4's distinct EXCEPT (Spark ``exceptAll``, planned as an
    aggregate of signed counts rather than an anti join). Graded on the
    surviving multiplicity per user, which pins the bag arithmetic."""
    e = events_us(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        views.exceptAll(buys)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_unmatched"))
    )


@query("o5_table_sample", tags=("O5", "sampling"))
def o5_table_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli table sample, seeded (rows-only: sampling RNG is
    engine-specific). At 100 TB this is the cheap way to bound any
    estimation query — the sample predicate evaluates during the scan,
    no shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query("o5_stratified_sample", tags=("O5", "sampling"))
def o5_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: different fractions per event_type via
    ``sampleBy`` — the class-balancing step of a training-data pipeline
    (rows-only). Output is the per-stratum sampled counts."""
    e = events_us(spark, sf_dir)
    fractions = {"click": 0.05, "view": 0.05, "purchase": 0.5, "signup": 0.5, "error": 1.0}
    sampled = e.sampleBy("event_type", fractions, seed=42)
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))


# --- O6: Z-order data layout -------------------------------------------------

ZBITS = 16
ZPAGE = 2048  # rows per layout page


def _interleave_expr(x: str, y: str, shr: str) -> str:
    """Morton interleave of two 16-bit values — one expression string,
    rendered per dialect only in the shift operator (`shr` = 'shiftright'
    for Spark, '>>'-style lambda for DuckDB builds below)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(({shr}({x}, {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"(({shr}({y}, {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


_Z_SPARK = _interleave_expr("xdim", "ydim", "shiftright")
_Z_DUCK = _interleave_expr("xdim", "ydim", "__shr")
for _i in range(ZBITS):
    _Z_DUCK = _Z_DUCK.replace(f"__shr(xdim, {_i})", f"(xdim >> {_i})").replace(
        f"__shr(ydim, {_i})", f"(ydim >> {_i})"
    )


@query(
    "o6_zorder_layout",
    oracle=f"""
        WITH dims AS (
            SELECT event_id,
                   CAST((epoch_us(ts) // 3600000000) % {1 << ZBITS} AS BIGINT) AS xdim,
                   CAST(user_id % {1 << ZBITS} AS BIGINT) AS ydim
            FROM events
        ),
        keyed AS (
            SELECT *, {_Z_DUCK} AS zkey,
                   row_number() OVER (ORDER BY {_Z_DUCK}, event_id) AS rn
            FROM dims
        )
        SELECT CAST((rn - 1) // {ZPAGE} AS BIGINT) AS page,
               count(*) AS n,
               min(xdim) AS x_min, max(xdim) AS x_max,
               min(ydim) AS y_min, max(ydim) AS y_max
        FROM keyed
        GROUP BY 1
    """,
    tags=("O6", "scale"),
)
def o6_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout: interleave the bits of the time bucket
    and the user bucket, sort by the interleaved key, cut into pages, and
    report each page's (x, y) bounding box — the multi-dimensional
    clustering pass (Delta/Iceberg ``OPTIMIZE ZORDER BY``) that makes
    min/max footer pruning effective on BOTH dimensions at once.

    A ts-sorted layout gives every page the full user range (point lookups
    on user scan everything); Z-ordering bounds each page's span in both
    dims to ~√(pages) cells, so a predicate on either dimension prunes ~all
    pages (tests assert the span contraction). The global row number that
    cuts the pages runs as 32 parallel zkey-range shards plus a broadcast
    per-shard offset (operators/sharded.py) — the same per-range-offset
    bookkeeping a ``repartitionByRange(zkey)`` layout write does, with no
    unpartitioned window in the plan. The interleave is pure integer bit
    math generated from ONE template for both engines.
    """
    from datums_warehouse_spark.operators.sharded import range_sharded_cumsum

    e = events_us(spark, sf_dir)
    dims = e.select(
        "event_id",
        (F.floor(F.unix_micros("ts") / 3600000000) % (1 << ZBITS)).alias("xdim"),
        F.pmod("user_id", F.lit(1 << ZBITS)).cast("long").alias("ydim"),
    )
    keyed = dims.withColumn("zkey", F.expr(_Z_SPARK))
    rn = range_sharded_cumsum(
        keyed, "zkey", ["zkey", "event_id"], F.lit(1).cast("long"), "__rn"
    )
    paged = rn.withColumn("page", ((F.col("__rn") - 1) / ZPAGE).cast("long")).drop("__rn")
    return paged.groupBy("page").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xdim").alias("x_min"),
        F.max("xdim").alias("x_max"),
        F.min("ydim").alias("y_min"),
        F.max("ydim").alias("y_max"),
    )


# --- O7: deterministic hash sample ------------------------------------------

SAMPLE_PCT = 5  # keep ~5% of rows


@query(
    "o7_hash_sample",
    oracle=f"""
        SELECT event_type,
               count(*) AS n_sampled,
               {sql_dsum("value")} AS value_sum
        FROM events
        WHERE {sql_hash48("CAST(event_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
        GROUP BY event_type
    """,
    tags=("O7", "sampling", "scale"),
)
def o7_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample via a portable content hash — the
    reproducible complement to o5's engine-RNG sampling (rows-only by
    necessity): membership depends only on the row's key, so the sample
    is STABLE across runs, engines, partitionings, and incremental
    appends — the property an eval set or a debugging slice needs, and
    the reason this variant IS hash-graded while o5 cannot be.

    Scale shape: the membership predicate is a pure projection-level
    filter (md5 → 48-bit int → mod) evaluated inside the scan's codegen
    stage — no shuffle, no state, no coordination; the per-type rollup
    collapses map-side. Skew-free by construction: md5 spreads any key
    distribution uniformly over the percentile space.
    """
    from datums_warehouse_spark.functions.hashing import hash48

    e = events_us(spark, sf_dir)
    sampled = e.filter(
        hash48(F.col("event_id").cast("string")) % 100 < SAMPLE_PCT
    )
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"), dsum("value").alias("value_sum")
    )


@query(
    "u6_intersect_all",
    oracle="""
        SELECT user_id, least(n_views, n_buys) AS n_common FROM (
            SELECT user_id,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buys
            FROM events GROUP BY user_id
        )
        WHERE n_views > 0 AND n_buys > 0
    """,
    tags=("U6",),
)
def u6_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each user keeps min(#view, #purchase)
    rows — multiplicity-aware intersection, the U5 counterpart on the
    intersect side and a different operator from U3's distinct INTERSECT
    (Spark ``intersectAll``, planned as a min-of-counts aggregate rather
    than a semi join). Graded on the surviving multiplicity per user,
    which pins the bag arithmetic the distinct form erases.

    Scale shape: like U5, one hash aggregate per side sharded on the row
    key — no all-pairs anything; the multiset min is computed where the
    rows live.
    """
    e = events_us(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        views.intersectAll(buys)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
