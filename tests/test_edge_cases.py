"""Adversarial edge inputs the uniform testdata never produces.

Motivated by the x3b empty-chunk bug: plan refactors that are equivalent
on dense data can diverge on sparse/degenerate series. These tests pin the
operator semantics on synthetic frames (Spark-only assertions — the
oracle gate covers cross-engine parity on the real data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import datums_warehouse_spark.operators.timeseries as TS


@pytest.fixture()
def fake_events(spark, monkeypatch):
    """Patch the events feed with a synthetic frame."""

    def _install(rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        monkeypatch.setattr(TS, "events_us", lambda s, d: df)
        return df

    return _install


def test_asof_purchase_without_prior_click(spark, fake_events):
    """A purchase before any click must survive the as-of join with nulls
    (left semantics), not disappear."""
    fake_events(
        [
            (1, "2024-01-01 08:00:00", 1, "purchase", 50.0, "{}"),  # no click yet
            (2, "2024-01-01 09:00:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 10:00:00", 1, "purchase", 60.0, "{}"),
        ]
    )
    rows = {r.event_id: r for r in TS.j9_asof_join(spark, "x").collect()}
    assert set(rows) == {1, 3}
    assert rows[1].last_click_ts is None and rows[1].last_click_value is None
    assert rows[3].last_click_value == 1.0


def test_asof_click_at_same_timestamp_included(spark, fake_events):
    """At-or-before semantics: a click at the exact purchase timestamp
    matches (DuckDB ASOF >= does the same)."""
    fake_events(
        [
            (1, "2024-01-01 08:00:00", 1, "click", 2.0, "{}"),
            (2, "2024-01-01 08:00:00", 1, "purchase", 50.0, "{}"),
        ]
    )
    row = TS.j9_asof_join(spark, "x").collect()[0]
    assert row.last_click_value == 2.0


def test_interpolation_single_bucket_series(spark, fake_events):
    """A series whose grid is one bucket: nothing to fill, no crash."""
    fake_events([(1, "2024-01-01 08:30:00", 1, "solo", 5.0, "{}")])
    for fn in (TS.x3_interpolate_linear, TS.x3b_interpolate_scaled):
        rows = fn(spark, "x").collect()
        assert len(rows) == 1
        assert rows[0].close_interp == 5.0 and not rows[0].filled


def test_interpolation_x3b_matches_x3_on_sparse_gap(spark, fake_events):
    """The regression that motivated this file: a hole wider than the
    7-day chunk must interpolate identically in both variants."""
    fake_events(
        [
            (1, "2024-01-01 00:30:00", 1, "sparse", 10.0, "{}"),
            (2, "2024-01-20 00:30:00", 1, "sparse", 40.0, "{}"),
        ]
    )
    a = {str(r.bucket): r.close_interp for r in TS.x3_interpolate_linear(spark, "x").collect()}
    b = {str(r.bucket): r.close_interp for r in TS.x3b_interpolate_scaled(spark, "x").collect()}
    assert a == b
    assert None not in b.values()


def test_gap_detection_dense_series_has_no_gaps(spark, fake_events):
    fake_events(
        [
            (i, f"2024-01-01 0{i}:15:00", 1, "dense", float(i), "{}")
            for i in range(1, 6)
        ]
    )
    assert TS.x2_gap_detection(spark, "x").count() == 0


def test_returns_single_day_is_null(spark, fake_events):
    """First return of every series is null (no previous close)."""
    fake_events([(1, "2024-01-01 08:00:00", 1, "one", 5.0, "{}")])
    rows = TS.x5_returns(spark, "x").collect()
    assert len(rows) == 1 and rows[0].ret is None


def test_asof_duplicate_click_ts_deterministic(spark, fake_events):
    """Two clicks at the same (user, ts): the carried value must be the one
    with the highest event_id — pinned, not partition-order luck (ADVICE r1)."""
    fake_events(
        [
            (1, "2024-01-01 08:00:00", 1, "click", 10.0, "{}"),
            (7, "2024-01-01 08:00:00", 1, "click", 99.0, "{}"),
            (3, "2024-01-01 08:00:00", 1, "click", 20.0, "{}"),
            (9, "2024-01-01 09:00:00", 1, "purchase", 50.0, "{}"),
        ]
    )
    for _ in range(3):  # repeat: flush out plan/partition nondeterminism
        row = TS.j9_asof_join(spark, "x").collect()[0]
        assert row.last_click_value == 99.0


@pytest.fixture()
def fake_documents(spark, monkeypatch):
    """Patch the documents table for text-pipeline edge tests."""
    import datums_warehouse_spark.llm.text as TX

    def _install(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        monkeypatch.setattr(TX, "load", lambda s, d, n: df)
        return df

    return _install


def test_chunking_short_doc_single_chunk(spark, fake_documents):
    """A doc shorter than CHUNK_SIZE - CHUNK_STRIDE tokens must yield exactly
    ONE chunk — the unclamped sequence(0, -1) descended and emitted two
    spurious chunks, one slicing from the array end (ADVICE r1, medium)."""
    import datums_warehouse_spark.llm.text as TX

    fake_documents(
        [
            (1, "alpha beta gamma", "en"),          # 3 tokens
            (2, "x", "en"),                          # 1 token
            (3, " ".join(f"t{i}" for i in range(25)), "en"),  # 25 tokens → 2 chunks
        ]
    )
    rows = TX.l15_doc_chunking(spark, "x").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1
    assert by_doc[1][0].chunk_idx == 0
    assert by_doc[1][0].chunk_text == "alpha beta gamma"
    assert by_doc[1][0].n_tokens == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 1
    assert len(by_doc[3]) == 2
    assert all(r.chunk_idx >= 0 for r in rows)

    # and the DuckDB oracle agrees on the same degenerate corpus
    import duckdb

    from datums_warehouse_spark import all_queries
    from datums_warehouse_spark.testing.compare import compare_frames

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'alpha beta gamma', 'en'), (2, 'x', 'en'), "
        f"(3, '{' '.join(f't{i}' for i in range(25))}', 'en')"
        ") AS t(doc_id, text, lang)"
    )
    oracle_pdf = con.execute(all_queries()["l15_doc_chunking"].oracle).fetchdf()
    spark_pdf = TX.l15_doc_chunking(spark, "x").toPandas()
    res = compare_frames("l15_short_docs", spark_pdf, oracle_pdf)
    assert res.ok, res.detail
