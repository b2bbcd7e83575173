"""Window functions (SURVEY.md §2.5 W1–W7).

Scale discipline: every window partitions by a real key (nation, user) —
never a naked ``Window.orderBy`` over the whole table, which collapses to a
single partition and dies at 100 TB (SURVEY.md §4.3.1).

Determinism discipline: orderings include a unique tie-break key wherever
row identity matters (row_number, lag, ntile); frame sums go through
decimal so sliding-accumulator strategies (DuckDB) and frame-rescan
strategies (Spark) produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import DEC
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load

SQL_WDEC = f"CAST(value AS DECIMAL(25,6))"


@query(
    "w1_ranking",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(row_number() OVER w_unique AS BIGINT) AS rn,
               CAST(rank() OVER w_ties AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w_ties AS BIGINT) AS drnk,
               CAST(ntile(4) OVER w_unique AS BIGINT) AS quartile
        FROM customer
        WINDOW w_unique AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
               w_ties   AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
    tags=("W1",),
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family per nation. row_number/ntile order on a unique key;
    rank/dense_rank order on the bare measure (tie-stable by definition)."""
    c = load(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.ntile(4).over(w_unique).cast("long").alias("quartile"),
    )


@query(
    "w2_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W2",),
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user — the reference's gap-detection scan
    (``ts - lag(ts) > interval``, SURVEY.md §2.5 W2 [R])."""
    e = events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (us - F.lag(us).over(w)).alias("us_since_prev"),
    )


@query(
    "w3_running_total",
    oracle=f"""
        SELECT event_id, user_id,
               CAST(SUM({SQL_WDEC}) OVER w AS DOUBLE) AS running_value,
               CAST(count(*) OVER w AS BIGINT) AS running_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W3",),
)
def w3_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count per user (decimal-exact running sum)."""
    e = events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


@query(
    "w4_moving_avg",
    oracle=f"""
        SELECT event_id, user_id, value,
               CAST(SUM({SQL_WDEC}) OVER w AS DOUBLE) / count(*) OVER w AS ma7
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    tags=("W4",),
)
def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average per user (decimal sum / exact count, so the
    sliding-frame accumulation order can't diverge)."""
    e = events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "ma7"
        ),
    )


@query(
    "w5_range_frame",
    oracle=f"""
        SELECT event_id, user_id,
               CAST(SUM({SQL_WDEC}) OVER w AS DOUBLE) AS trailing_1h_value,
               CAST(count(*) OVER w AS BIGINT) AS trailing_1h_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("W5",),
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing 1 hour by actual timestamp value
    (frame membership is value-defined, so tie order is irrelevant)."""
    e = events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_1h_n"),
    )


@query(
    "w6_fill_forward",
    oracle="""
        SELECT event_id, user_id, event_type,
               last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                   OVER w AS last_purchase_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W6",),
)
def w6_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill: carry each user's last purchase value — the
    interpolation building block (SURVEY.md §2.5 W6, §2.10 X3 [R])."""
    e = events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "w7_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER w AS BIGINT) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        QUALIFY rn <= 3
    """,
    tags=("W7",),
)
def w7_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: rank-then-filter. Catalyst pushes the
    rank limit into the window sort (WindowGroupLimit) so each partition
    keeps only k rows — the scalable per-group top-k."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w8_sliding_distinct_users",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT d.day AS day, count(DISTINCT p.user_id) AS active_users_7d
        FROM days d
        JOIN pairs p ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    """,
    tags=("W8",),
)
def w8_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding-uniques
    metric (DAU/WAU) Spark has no native operator for: COUNT(DISTINCT)
    OVER a moving frame isn't supported, so each (user, day) pair is
    exploded into the ≤7 future days it covers, deduplicated, and counted —
    a linear explode-and-aggregate instead of a per-row set union.

    Scale shape: input reduces to distinct (user, day) FIRST (one combinable
    aggregate), so the 7× explode multiplies days-per-user, not raw events;
    everything shuffles on small keys. The oracle states the same metric
    directly as a range join.
    """
    e = events_us(spark, sf_dir)
    pairs = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    covered = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                "day", F.col("day") + F.expr("INTERVAL 6 DAYS"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day"),
    )  # no pre-distinct: countDistinct dedups in-aggregate, one less shuffle
    return (
        covered.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


@query(
    "w9_distribution_ranks",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               first_value(c_acctbal) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS top_bal,
               nth_value(c_acctbal, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS runner_up_bal
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("W1", "W9"),
)
def w9_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank family per nation: percent_rank, cume_dist, and
    first/nth value over the full-partition frame — the remaining window
    functions W1's ranking family doesn't cover. Ordered on a unique
    (measure, key) pair so both engines rank identical rows. The ratios
    are emitted UNROUNDED: both engines compute the identical integer
    division (rank-1)/(n-1) in doubles, so raw values are bit-identical —
    whereas round(x, 6) diverges cross-engine whenever a rank ratio lands
    exactly on a .5 ulp boundary (with n-1 = 640-style divisors that is
    every odd numerator; found as a real sf0.1 mismatch in round 6).
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_acctbal").over(w_full).alias("top_bal"),
        F.nth_value("c_acctbal", 2).over(w_full).alias("runner_up_bal"),
    )
