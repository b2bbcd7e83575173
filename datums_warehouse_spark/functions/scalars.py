"""Scalar function families (SURVEY.md §2.8 F1–F8), one graded query each.

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd;
no Python UDFs anywhere. Oracle SQL encodes the DuckDB dialect differences
(``date_diff`` arg order, ``ceil`` return type, ``strftime``, list
functions) once, here.

Cross-engine float discipline: ``sqrt`` is IEEE-correctly-rounded (safe
per-row); ``exp/ln/log10/pow`` are not guaranteed identical between the
JVM and libm, so they only appear inside decimal-cast aggregates where a
1-ulp input wiggle is absorbed by the 1e-6 quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datums_warehouse_spark.functions.determinism import dsum, sql_dsum
from datums_warehouse_spark.registry import query
from datums_warehouse_spark.sources.tables import events_us, load


@query(
    "f1_string_funcs",
    oracle=r"""
        SELECT p_partkey,
               upper(p_name) AS uname,
               length(p_name) AS name_len,
               substring(p_name, 1, 5) AS prefix,
               concat_ws('-', p_brand, p_type) AS brand_type,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
               regexp_replace(p_name, ' ', '_') AS snake_name,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
               split_part(p_name, ' ', 1) AS first_word,
               p_name LIKE 'small%' AS is_small
        FROM part
    """,
    tags=("F1",),
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.col("p_name").like("small%").alias("is_small"),
    )


@query(
    "f2_datetime_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               epoch_ms(CAST(epoch(o_orderdate) AS BIGINT) * 1000 + 500) AS reconstructed,
               strftime(o_orderdate, '%Y-%m-%d') AS iso_day
        FROM orders
    """,
    tags=("F2",),
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over orders — epoch↔timestamp conversion is core to
    the reference's exchange-feed ingestion (SURVEY.md §2.8 F2 [R])."""
    o = load(spark, sf_dir, "orders")
    epoch_s = F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp_ntz"), "o_orderdate")
        .cast("long")
        .alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        epoch_s,
        F.timestamp_millis(epoch_s.cast("long") * 1000 + 500).alias("reconstructed"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "f3_math_funcs",
    oracle=f"""
        SELECT l_returnflag,
               {sql_dsum("round(l_extendedprice, 0)")} AS sum_rounded,
               {sql_dsum("abs(l_discount - 0.05)")} AS sum_absdev,
               {sql_dsum("sqrt(l_quantity)")} AS sum_sqrt,
               {sql_dsum("exp(l_discount)")} AS sum_exp,
               {sql_dsum("ln(l_extendedprice)")} AS sum_ln,
               {sql_dsum("log10(l_extendedprice)")} AS sum_log10,
               {sql_dsum("pow(l_quantity, 1.5)")} AS sum_pow,
               CAST(SUM(CAST(ceil(l_extendedprice / 1000) AS BIGINT)) AS BIGINT) AS sum_ceil_k,
               CAST(SUM(CAST(floor(l_quantity / 7) AS BIGINT)) AS BIGINT) AS sum_floor_w,
               CAST(SUM(sign(l_discount - 0.05)) AS BIGINT) AS net_sign,
               {sql_dsum("greatest(l_quantity, 25.0)")} AS sum_greatest,
               {sql_dsum("least(l_tax, 0.04)")} AS sum_least,
               CAST(SUM(l_orderkey % 7) AS BIGINT) AS sum_mod
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("F3",),
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family — transcendentals wrapped in decimal-cast sums (see
    module docstring for the cross-engine ulp rationale)."""
    li = load(spark, sf_dir, "lineitem")
    q, price, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.groupBy("l_returnflag").agg(
        # round-to-integer only: fractional rounding of inexact doubles hits
        # engine-specific half-case handling (Spark exact-BigDecimal HALF_UP
        # vs DuckDB fp-scaled round) — boundary cases at .5 are exact here.
        dsum(F.round(price, 0)).alias("sum_rounded"),
        dsum(F.abs(disc - 0.05)).alias("sum_absdev"),
        dsum(F.sqrt(q)).alias("sum_sqrt"),
        dsum(F.exp(disc)).alias("sum_exp"),
        dsum(F.log(price)).alias("sum_ln"),
        dsum(F.log10(price)).alias("sum_log10"),
        dsum(F.pow(q, 1.5)).alias("sum_pow"),
        F.sum(F.ceil(price / 1000)).alias("sum_ceil_k"),
        F.sum(F.floor(q / 7)).alias("sum_floor_w"),
        F.sum(F.signum(disc - 0.05)).cast("long").alias("net_sign"),
        dsum(F.greatest(q, F.lit(25.0))).alias("sum_greatest"),
        dsum(F.least(F.col("l_tax"), F.lit(0.04))).alias("sum_least"),
        F.sum(F.col("l_orderkey") % 7).alias("sum_mod"),
    )


@query(
    "f4_conditional_funcs",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS tier,
               CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS state,
               coalesce(nullif(o_orderstatus, 'O'), 'X') AS status_or_x,
               CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END AS urgent_value
        FROM orders
    """,
    tags=("F4",),
)
def f4_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / if."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price >= 300000, "high").when(price >= 100000, "mid").otherwise("low").alias("tier"),
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("closed").alias("state"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("X")).alias("status_or_x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", price).otherwise(0.0).alias("urgent_value"),
    )


@query(
    "f5_cast_funcs",
    oracle="""
        SELECT l_orderkey,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
               CAST(l_quantity AS BIGINT) AS qty_int,
               CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS qty_back,
               CAST(l_linenumber AS DOUBLE) AS line_dbl,
               CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
               epoch_ms(CAST(epoch(l_shipdate) AS BIGINT) * 1000) AS ship_rt
        FROM lineitem
    """,
    tags=("F5",),
)
def f5_cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts numeric↔string↔timestamp (quantities are integral doubles, so
    the double→int cast is rounding-mode-independent cross-engine)."""
    li = load(spark, sf_dir, "lineitem")
    ship_epoch = F.unix_timestamp(F.col("l_shipdate").cast("timestamp")).cast("long")
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_quantity").cast("long").cast("double").alias("qty_back"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        ship_epoch.alias("ship_epoch"),
        F.timestamp_millis(ship_epoch * 1000).alias("ship_rt"),
    )


@query(
    "f6_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_comp,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
               round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6)
                   AS comp_sum,
               round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6)
                   AS comp_sq_sum,
               CAST(embedding[1] AS DOUBLE) AS h1,
               CAST(embedding[2] AS DOUBLE) AS h2,
               CAST(embedding[3] AS DOUBLE) AS h3,
               CAST(embedding[4] AS DOUBLE) AS h4
        FROM embeddings
    """,
    tags=("F6",),
)
def f6_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order functions over the embedding vectors —
    size, indexing, filter, transform, fold (the similarity-search
    building blocks, SURVEY.md §2.8 F6)."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_comp"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 6).alias("comp_sum"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("comp_sq_sum"),
        # slice-as-scalars (not an array column): the driver's canonicalizer
        # can't hash list cells — see a11_collect_list in round 1
        *[
            F.element_at("embedding", i).cast("double").alias(f"h{i}")
            for i in range(1, 5)
        ],
    )


@query(
    "f7_json_funcs",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               json_extract_string(props, '$.missing') IS NULL AS no_missing
        FROM events
    """,
    tags=("F7",),
)
def f7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from events.props (semi-structured column)."""
    e = events_us(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull().alias("no_missing"),
    )


@query(
    "f8_hash_funcs",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT) AS hash_bucket_key
        FROM documents
    """,
    tags=("F8",),
)
def f8_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes — identical hex across engines, so they double
    as portable dedup/bucketing keys (used by L1/L2). Engine-native
    ``hash()`` is deliberately absent: it differs across engines."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long").alias("hash_bucket_key"),
    )


@query(
    "f9_safe_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               TRY_CAST(CASE WHEN l_linenumber = 3 THEN 'not_a_number'
                             ELSE CAST(l_orderkey AS VARCHAR) END
                        AS BIGINT) AS safe_int,
               CASE WHEN l_linenumber - 1 = 0 THEN NULL
                    ELSE l_extendedprice / (l_linenumber - 1) END AS safe_div,
               TRY_CAST(CASE WHEN l_linenumber = 2 THEN 'garbage'
                             ELSE '1998-01-02 03:04:05' END
                        AS TIMESTAMP) AS safe_ts,
               [l_orderkey, CAST(l_linenumber AS BIGINT)][l_linenumber] AS safe_at
        FROM lineitem
        WHERE l_orderkey < 2000
    """,
    tags=("F9",),
)
def f9_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe scalar family: ``try_cast`` / ``try_divide`` /
    ``try_to_timestamp`` / ``try_element_at`` — null-on-error instead of
    job-killing exceptions, the production posture for malformed feeds
    under ANSI mode (one bad row in 100 TB must not abort the stage).
    Malformed inputs are synthesized deterministically (line 3 → bad int,
    line 2 → bad timestamp, divisor hits zero at line 1, index walks past
    the 2-element array at line 3+), so the NULL pattern is exact on both
    engines; DuckDB mirrors with TRY_CAST / NULLIF-style guards / its
    natively NULL-on-out-of-bounds list index.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    mixed = F.when(F.col("l_linenumber") == 3, "not_a_number").otherwise(
        F.col("l_orderkey").cast("string")
    )
    ts_str = F.when(F.col("l_linenumber") == 2, "garbage").otherwise(
        "1998-01-02 03:04:05"
    )
    arr = F.array(F.col("l_orderkey"), F.col("l_linenumber").cast("long"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        mixed.try_cast("bigint").alias("safe_int"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 1).alias(
            "safe_div"
        ),
        F.try_to_timestamp(ts_str).alias("safe_ts"),
        F.try_element_at(arr, F.col("l_linenumber")).alias("safe_at"),
    )
