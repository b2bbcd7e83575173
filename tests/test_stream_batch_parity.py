"""Stream ↔ batch cross-validation (VERDICT r06 task 6).

The genuine streaming queries (t4/t6-stateful/t7/t8/t10) are rows-only at
the driver forever — no SQL oracle can run a stream. These tests close
that gap locally: each stream's output is checked against its hash-graded
batch twin on the same fixture, using the deterministic subset watermark
semantics allow:

- exact-equality twins (t7 sink re-read, t8 inner interval join, t6
  stateful final state): streamed result == batch result;
- append-mode watermarked aggregations (t4 hourly, t10 sessions): every
  emitted row must EXACTLY match a batch row (stream ⊆ batch), and every
  window/session that provably closed before the final watermark must
  have been emitted (completeness of the finalized region).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.functions.determinism import dsum
from datums_warehouse_spark.sources.tables import events_us

WATERMARK = datetime.timedelta(hours=2)  # t4 / t10 use withWatermark("ts", "2 hours")


def _max_ts(spark, sf_dir):
    return events_us(spark, sf_dir).agg(F.max("ts")).collect()[0][0]


def test_t7_sink_equals_batch_counts(spark, sf_dir):
    """The streaming parquet sink must persist every event exactly once:
    re-read counts == batch counts."""
    streamed = {tuple(r) for r in all_queries()["t7_stream_sink"].fn(spark, sf_dir).collect()}
    batch = {
        tuple(r)
        for r in events_us(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_t8_join_equals_batch_interval_join(spark, sf_dir):
    """Inner stream-stream interval joins emit each match as soon as both
    sides arrive — on a finite replay the pair set must equal the batch
    join bit-for-bit (per-user pair counts)."""
    streamed = {
        tuple(r) for r in all_queries()["t8_stream_stream_join"].fn(spark, sf_dir).collect()
    }
    e = events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    batch = {
        tuple(r)
        for r in purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    assert streamed == batch


def test_t6_stateful_final_state_equals_batch(spark, sf_dir):
    """applyInPandasWithState's final per-user state must equal the batch
    purchase aggregate. Update mode may emit one row per microbatch per
    user; n_purchases is monotone, so the max-n row IS the final state."""
    rows = all_queries()["t6_stateful_stream"].fn(spark, sf_dir).collect()
    final = {}
    for r in rows:
        prev = final.get(r.user_id)
        if prev is None or r.n_purchases > prev.n_purchases:
            final[r.user_id] = r
    batch = {
        r.user_id: r
        for r in events_us(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value").alias("total_spend"), F.count(F.lit(1)).alias("n_purchases"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, got in final.items():
        want = batch[uid]
        assert got.n_purchases == want.n_purchases, uid
        # stream state sums floats in pandas order; batch sums exact decimal
        assert got.total_spend == pytest.approx(want.total_spend, rel=1e-9, abs=1e-6), uid


def test_t4_watermark_emits_finalized_hourly_buckets(spark, sf_dir):
    """Append-mode watermarked hourly counts: every emitted bucket matches
    the batch aggregate exactly, and every bucket whose END precedes the
    final watermark (max_ts - 2h) was emitted."""
    streamed = {tuple(r) for r in all_queries()["t4_watermark_stream"].fn(spark, sf_dir).collect()}
    batch_rows = (
        events_us(spark, sf_dir)
        .groupBy(F.col("event_type").alias("series"), F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("series", F.col("w.start").alias("bucket"), F.col("w.end").alias("bucket_end"), "n")
        .collect()
    )
    batch = {(r.series, r.bucket, r.n) for r in batch_rows}
    assert streamed <= batch, streamed - batch
    wm = _max_ts(spark, sf_dir) - WATERMARK
    must_emit = {(r.series, r.bucket, r.n) for r in batch_rows if r.bucket_end < wm}
    assert must_emit <= streamed, must_emit - streamed


def test_t10_sessions_match_batch_sessionization(spark, sf_dir):
    """Streamed session windows: every emitted session must match a batch
    t3 session exactly (same user, start, count, decimal-exact total), and
    every session whose end + gap precedes the final watermark must have
    been emitted and evicted."""
    streamed = {tuple(r) for r in all_queries()["t10_session_stream"].fn(spark, sf_dir).collect()}
    batch_rows = (
        events_us(spark, sf_dir)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
        .collect()
    )
    batch = {(r.user_id, r.session_start, r.n, r.total) for r in batch_rows}
    assert streamed <= batch, streamed - batch
    wm = _max_ts(spark, sf_dir) - WATERMARK
    must_emit = {
        (r.user_id, r.session_start, r.n, r.total)
        for r in batch_rows
        if r.session_end < wm
    }
    assert must_emit <= streamed, must_emit - streamed
