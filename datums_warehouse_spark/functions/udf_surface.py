"""UDF / UDAF / UDTF surface (SURVEY.md §2.12 D1–D5).

UDFs are the deliberate slow path (JVM↔Python Arrow hop); every query here
demonstrates the *surface* on logic whose result is still exactly
reproducible in SQL, so even the escape hatches stay under the oracle.

All Python callables are defined inside their query functions: executor
workers don't have this package on PYTHONPATH, so cloudpickle must ship
them by value (see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from typing import Iterator, Tuple  # ditto, for the iterator UDF variants

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load


@query(
    "d1_scalar_udf",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
                    WHEN o_orderstatus = 'F' THEN 'archive'
                    ELSE 'routine' END AS routing
        FROM orders
    """,
    tags=("D1",),
)
def d1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (D1) — exact string logic, graded.

    Kept out of any hot path: this exists to cover the surface; the same
    logic in production belongs in ``F.when`` (see f4_conditional_funcs).
    """

    @F.udf("string")
    def route(priority: str, status: str) -> str:
        if priority in ("1-URGENT", "2-HIGH"):
            return "expedite"
        if status == "F":
            return "archive"
        return "routine"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", route("o_orderpriority", "o_orderstatus").alias("routing"))


@query(
    "d2_pandas_udf",
    oracle="""
        SELECT event_id,
               floor(value / 10) * 10 AS value_bucket,
               length(event_type) + CAST(user_id % 7 AS BIGINT) AS mixed_key
        FROM events
    """,
    tags=("D2",),
)
def d2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (D2): Arrow-batched, operates on whole
    columns — the 10-100× faster alternative to D1 when Python is
    unavoidable. Exact float arithmetic so the oracle reproduces it."""
    @F.pandas_udf("double")
    def bucketize(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.floor(v / 10) * 10

    @F.pandas_udf("long")
    def mixed_key(t: pd.Series, u: pd.Series) -> pd.Series:
        return t.str.len() + (u % 7)

    e = events_us(spark, sf_dir)
    return e.select(
        "event_id",
        bucketize("value").alias("value_bucket"),
        mixed_key("event_type", "user_id").alias("mixed_key"),
    )


@query(
    "d3_grouped_apply",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_type
            FROM events
        )
        SELECT user_id, concat(prev_type, '->', event_type) AS transition,
               count(*) AS n
        FROM ordered
        WHERE prev_type IS NOT NULL
        GROUP BY user_id, transition
    """,
    tags=("D3",),
)
def d3_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (D3): per-user pandas logic — the
    direct escape hatch for per-series algorithms that resist SQL
    (SURVEY.md §2.12). Computes event-type transition counts; integer
    output, so the windowed-SQL oracle matches exactly."""

    def transitions(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        prev = pdf["event_type"].shift(1)
        mask = prev.notna()
        trans = prev[mask] + "->" + pdf["event_type"][mask]
        out = trans.value_counts().rename_axis("transition").reset_index(name="n")
        out.insert(0, "user_id", pdf["user_id"].iloc[0])
        return out

    e = events_us(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    return e.groupBy("user_id").applyInPandas(
        transitions, schema="user_id long, transition string, n long"
    )


@query(
    "d4_python_udtf",
    oracle="""
        SELECT doc_id, part, CAST(idx AS BIGINT) AS idx
        FROM (
            SELECT doc_id,
                   unnest(string_split(source, 'c')) AS part,
                   generate_subscripts(string_split(source, 'c'), 1) - 1 AS idx
            FROM documents
        )
    """,
    tags=("D4",),
)
def d4_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (D4, Spark ≥3.5): table-generating function emitting
    (part, idx) rows per input — the custom-explode surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, part string, idx bigint")
    class SplitParts:
        def eval(self, doc_id: int, source: str):
            for i, part in enumerate(source.split("c")):
                yield doc_id, part, i

    spark.udtf.register("split_parts", SplitParts)
    d = load(spark, sf_dir, "documents")
    d.select("doc_id", "source").createOrReplaceTempView("d4_docs")
    return spark.sql(
        "SELECT p.doc_id, p.part, p.idx FROM d4_docs, LATERAL split_parts(doc_id, source) p"
    )


@query(
    "d5_sql_registration",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("D5",),
)
def d5_sql_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registered Python UDF (D5) used from ``spark.sql`` — the engine's
    SQL surface with user extensions. The UDF's float math is the same IEEE
    ops as the oracle expression."""

    def net_revenue(price: float, discount: float) -> float:
        return price * (1.0 - discount)

    spark.udf.register("net_revenue", net_revenue, "double")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("d5_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(SUM(CAST(net_revenue(l_extendedprice, l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        FROM d5_lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "s1_parquet_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("S1",),
)
def s1_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare parquet scan (S1) — the foundation every other query builds on;
    named so the inventory row is individually graded."""
    return load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "d2_pandas_udaf",
    oracle="""
        SELECT event_type,
               round(CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE)
                     / CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 6)
                   AS self_weighted_mean
        FROM events
        GROUP BY event_type
    """,
    tags=("D2",),
)
def d2_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): self-weighted mean
    Σv²/Σv per series. The UDF quantizes per-row terms to 1e-6 before
    summing — mirroring the decimal-cast oracle exactly, so even a custom
    Python aggregator stays under the oracle."""
    from decimal import ROUND_HALF_UP, Decimal

    @F.pandas_udf("double")
    def self_weighted_mean(v: pd.Series) -> float:
        # HALF_UP quantization matches both engines' double→decimal casts
        # for positive values (Python's default is banker's rounding)
        q = Decimal("0.000001")
        num = sum(Decimal(float(x * x)).quantize(q, ROUND_HALF_UP) for x in v)
        den = sum(Decimal(float(x)).quantize(q, ROUND_HALF_UP) for x in v)
        return round(float(num) / float(den), 6)

    e = events_us(spark, sf_dir)
    return e.groupBy("event_type").agg(
        self_weighted_mean("value").alias("self_weighted_mean")
    )


@query(
    "d6_arrow_udf",
    oracle="""
        SELECT o_orderkey,
               substr(o_orderpriority, 3) || ':' ||
                   CAST(o_orderkey % 13 AS VARCHAR) AS tag
        FROM orders
    """,
    tags=("D6",),
)
def d6_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (D6, ``useArrow=True``) — row-at-a-time
    Python SEMANTICS on the Arrow serialization path: batches cross the
    JVM↔Python boundary as Arrow record batches instead of pickled rows,
    typically several× faster than D1's pickled transfer while keeping
    the plain-scalar programming model (no pandas Series handling as in
    D2). The logic is exact string/int arithmetic so the escape hatch
    stays under the oracle like every other D-surface query.
    """

    @F.udf("string", useArrow=True)
    def tag(priority: str, key: int) -> str:
        return f"{priority[2:]}:{key % 13}"

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", tag("o_orderpriority", "o_orderkey").alias("tag")
    )


@query(
    "d7_map_in_arrow",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
    """,
    tags=("D7",),
)
def d7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` (D7): the zero-copy escape hatch below D2's pandas
    UDFs — the Python function receives raw ``pyarrow.RecordBatch``es and
    yields RecordBatches, skipping even the Arrow→pandas conversion, the
    right surface for columnar libraries that speak Arrow natively
    (vector math, tokenizers, Arrow-native codecs).

    The per-row math (net price) is pure IEEE double arithmetic computed
    by ``pyarrow.compute`` kernels, bit-identical to the oracle's, so this
    escape hatch is hash-graded like the rest of the D surface. The filter
    stays OUTSIDE the Arrow function as a real DataFrame predicate — it
    reaches the parquet scan (PushedFilters), which a filter buried inside
    the UDF never could; the Arrow stage sees only surviving batches.

    Scale: batches stream through Python workers with Arrow's O(columns)
    serialization; no pickling, no row loop, no driver involvement.
    """

    def net_of(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            net = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net],
                names=["l_orderkey", "l_linenumber", "net"],
            )

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    return li.mapInArrow(net_of, "l_orderkey bigint, l_linenumber int, net double")


@query(
    "d8_cogroup_pandas",
    oracle="""
        WITH e AS (
            SELECT date_trunc('month', ts) AS month,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        ),
        o AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders,
                   count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent
            FROM orders GROUP BY 1
        )
        SELECT COALESCE(e.month, o.month) AS month,
               COALESCE(n_events, 0) AS n_events,
               COALESCE(n_users, 0) AS n_users,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_urgent, 0) AS n_urgent
        FROM e FULL OUTER JOIN o ON e.month = o.month
    """,
    tags=("D8",),
)
def d8_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map ``applyInPandas`` (D8): the last Python-UDF surface —
    two DataFrames grouped on the same key, each key's pair of pandas
    frames handed to one function. The distinctive semantics vs a join:
    keys present on only ONE side still fire the function (the other
    frame arrives empty), which is why the oracle is a FULL OUTER join of
    the two per-key aggregates, not an inner one. All outputs are integer
    counts, so the escape hatch stays hash-graded.

    The cogroup key is the calendar MONTH — deliberately few-large-groups,
    because that is cogroup's cost model: one Python function call + one
    output-frame construction PER KEY (~1 ms each). A first cut of this
    query keyed on user/customer ids spent 20 s at sf0.1 in pure per-key
    overhead across 15k near-empty groups (AQE coalesces the tiny shuffle
    to 1-2 tasks, serializing those calls) while the month-keyed plan is
    sub-second with the same bytes — for high-cardinality per-key counts
    use a real join (the oracle's plan). One more scale note: a single
    month's frame must fit one executor's memory; a real deployment
    sub-buckets any giant key (salting) before cogrouping.

    Scale shape: one shuffle per side on the cogroup key (exactly what a
    shuffle join would pay), then per-key pandas with no cross-key state —
    groups shard across executors and grow with data while the key count
    stays fixed. The ledger logic is SQL-expressible on purpose (that's
    what makes it gradeable); the surface exists for per-key algorithms
    that are not.
    """

    def ledger(key, ev, od):
        import pandas as pd

        return pd.DataFrame(
            {
                "month": [key[0]],
                "n_events": [len(ev)],
                "n_users": [ev["user_id"].nunique() if len(ev) else 0],
                "n_orders": [len(od)],
                "n_urgent": [
                    int((od["o_orderpriority"] == "1-URGENT").sum())
                    if len(od)
                    else 0
                ],
            }
        )

    ev = events_us(spark, sf_dir).select(
        F.date_trunc("month", "ts").alias("month"), "user_id"
    )
    od = load(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        "o_orderpriority",
    )
    return (
        ev.groupBy("month")
        .cogroup(od.groupBy("month"))
        .applyInPandas(
            ledger,
            schema="month timestamp, n_events long, n_users long, "
            "n_orders long, n_urgent long",
        )
    )


@query(
    "d9_iter_pandas_udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross
        FROM lineitem
        WHERE l_quantity >= 45
    """,
    tags=("D9",),
)
def d9_iter_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF (D9, ``Iterator[Tuple[Series, ...]]
    → Iterator[Series]``) — the D-surface member for EXPENSIVE
    ONE-TIME INITIALIZATION: the function body runs once per task
    (amortized across all Arrow batches of that task's partition), does
    its setup before the loop, then streams every batch through the
    already-initialized state — a reused Python worker re-executes the
    setup for each task it picks up, so the guarantee is per-task, not
    per-worker. The scalar variants (D2) re-enter the function per batch with
    no place to hoist setup — for a tokenizer, an ONNX session, or a
    compiled regex set (the LLM-pipeline norm), per-batch reload is the
    difference between I/O-bound and setup-bound.

    Here the "model" is a trivial rate table so the arithmetic stays
    pure per-element IEEE (price·(1−disc)·(1+tax)), bit-identical to the
    oracle like every D-surface demo. The quantity filter stays OUTSIDE
    the UDF as a real DataFrame predicate — it reaches the parquet scan
    (PushedFilters), which a filter buried in Python never could.

    Scale: identical execution profile to D2 (Arrow batches, no pickling,
    no driver) plus O(1) setups per task instead of O(batches).
    """
    @F.pandas_udf("double")
    def gross_of(
        batches: Iterator[Tuple[pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        # one-time per-task setup (the expensive-init slot)
        rates = {"discount": 1.0, "tax": 1.0}
        for price, disc, tax in batches:
            yield price * (1 - disc * rates["discount"]) * (
                1 + tax * rates["tax"]
            )

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        gross_of("l_extendedprice", "l_discount", "l_tax").alias("gross"),
    )


@query(
    "d10_udtf_table_arg",
    oracle="""
        WITH o AS (
            SELECT event_type AS series, epoch_us(ts) AS ts_us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type
                       ORDER BY epoch_us(ts), event_id) AS prev_us
            FROM events
        )
        SELECT series, count(*) AS n,
               CAST(max(ts_us - prev_us) AS BIGINT) AS max_gap_us
        FROM o GROUP BY series
    """,
    tags=("D10",),
)
def d10_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE argument (D10, Spark ≥3.5 ``TABLE(...)
    PARTITION BY ... ORDER BY``): the engine hands the UDTF each
    partition's rows IN ORDER, and per-partition state lives across
    ``eval`` calls until ``terminate`` flushes — the surface for
    sequential per-key algorithms (tokenizer streaming, session
    reconstruction, custom gap logic) that a scalar UDF cannot express
    and a grouped-map UDF would re-buffer wholesale.

    The demo computes each series' max inter-event gap in integer
    microseconds (exact lag/subtract/max — the oracle reproduces it with
    a window), holding ONE running (prev_ts, max_gap, n) triple per
    partition: O(1) state per key regardless of partition size, the same
    bound applyInPandasWithState gives streams. PARTITION BY shards keys
    across executors like any keyed shuffle at 100 TB.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="series string, n bigint, max_gap_us bigint")
    class SeriesGaps:
        def __init__(self):
            self.series = None
            self.prev = None
            self.max_gap = None
            self.n = 0

        def eval(self, row):
            # TABLE-argument UDTFs receive each input row as one Row arg
            self.series = row["series"]
            self.n += 1
            ts_us = row["ts_us"]
            if self.prev is not None:
                gap = ts_us - self.prev
                self.max_gap = gap if self.max_gap is None else max(self.max_gap, gap)
            self.prev = ts_us

        def terminate(self):
            if self.series is not None:
                yield self.series, self.n, self.max_gap

    spark.udtf.register("series_gaps", SeriesGaps)
    events_us(spark, sf_dir).select(
        F.col("event_type").alias("series"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    ).createOrReplaceTempView("d10_events")
    return spark.sql(
        """
        SELECT series, n, max_gap_us FROM series_gaps(
            TABLE(SELECT series, ts_us, event_id FROM d10_events)
            PARTITION BY series ORDER BY (ts_us, event_id)
        )
        """
    )
