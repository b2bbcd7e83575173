"""Round-9 operator tests.

1. L33 duplicated-passage edge cases (VERDICT r08 task 7): docs shorter
   than PASSAGE_W, a doc that is ONE giant duplicated passage, and islands
   at the exact merge boundary (successive duplicated positions W apart
   merge — the spans tile contiguously; W+1 apart split — one clean token
   survives between them). Each case is verified against the DuckDB oracle
   on the same synthetic corpus, so the two engines' gaps-and-islands
   logic is pinned together, not separately.
2. L41 SemDeDup invariants: pairs are within-cell, threshold-true, and the
   materialized drop accounting is consistent with the pair set.
3. The `_assert_single_data_batch` guard (ADVICE r08): raises on a
   multi-batch drain, passes on exactly one.
"""

from __future__ import annotations

import duckdb
import pytest

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.llm.dedup import PASSAGE_W
from datums_warehouse_spark.testing.compare import compare_frames

W = PASSAGE_W


@pytest.fixture()
def fake_corpus(spark, monkeypatch):
    """Patch llm.dedup's documents table AND build the matching DuckDB
    view, so every case checks Spark vs oracle on the same rows."""
    import datums_warehouse_spark.llm.dedup as DD

    def _install(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        monkeypatch.setattr(DD, "load", lambda s, d, n: df)
        con = duckdb.connect()
        vals = ", ".join(
            f"({i}, '{t}', '{lg}', '{src}')" for i, t, lg, src in rows
        )
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
            "AS t(doc_id, text, lang, source)"
        )
        return df, con

    return _install


def _l33_check(spark, con, expected_spans):
    """Run l33_dup_passages on the patched corpus, assert the exact span
    set AND the DuckDB oracle parity."""
    import datums_warehouse_spark.llm.dedup as DD

    spark_pdf = DD.l33_dup_passages(spark, "x").toPandas()
    got = {
        (r.doc_id, r.span_start, r.span_len, r.n_sharers)
        for r in spark_pdf.itertuples()
    }
    assert got == expected_spans, f"spans {got} != expected {expected_spans}"
    oracle_pdf = con.execute(all_queries()["l33_dup_passages"].oracle).fetchdf()
    res = compare_frames("l33_edge", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.mark.parametrize("n_tok", [0, 1, W - 1])
def test_l33_docs_shorter_than_window_emit_nothing(spark, fake_corpus, n_tok):
    """A doc with fewer than W tokens has NO W-gram positions — even two
    identical such docs must produce zero spans (the npos==0 guard: an
    unclamped sequence(0,-1) would descend and slice garbage grams)."""
    text = toks("s", n_tok) if n_tok else ""
    _, con = fake_corpus(
        [
            (1, text, "en", "web"),
            (2, text, "en", "web"),
            # a long all-unique doc so the corpus itself is non-degenerate
            (3, toks("u", 3 * W), "en", "web"),
        ]
    )
    _l33_check(spark, con, set())


def test_l33_whole_doc_is_one_passage(spark, fake_corpus):
    """Two identical long docs: every position is duplicated, consecutive
    positions merge into ONE span covering the entire document —
    span_start 0, span_len = n_tokens, in both docs."""
    n = 3 * W + 4
    text = toks("d", n)
    _, con = fake_corpus(
        [
            (1, text, "en", "web"),
            (2, text, "en", "wiki"),
            (3, toks("u", 2 * W), "en", "web"),
        ]
    )
    _l33_check(spark, con, {(1, 0, n, 1), (2, 0, n, 1)})


def test_l33_islands_exactly_w_apart_merge(spark, fake_corpus):
    """Doc 1 = X(W tokens) ++ Y(W tokens), X shared with doc 2, Y shared
    with doc 3, no cross-boundary gram shared. Duplicated positions in
    doc 1 are {0, W} — exactly W apart, the merge boundary: their spans
    [0,W) and [W,2W) tile contiguously, so they must merge into ONE
    passage of 2W tokens (the break fires only on gaps > W)."""
    x, y = toks("x", W), toks("y", W)
    # docs 2/3 embed X/Y behind a unique prefix so only X's (resp. Y's)
    # own gram is shared — prefix+X cross grams are unique to doc 2/3
    _, con = fake_corpus(
        [
            (1, f"{x} {y}", "en", "web"),
            (2, f"{toks('p', W)} {x}", "en", "web"),
            (3, f"{toks('q', W)} {y}", "en", "web"),
        ]
    )
    _l33_check(
        spark,
        con,
        {
            (1, 0, 2 * W, 1),   # merged: X and Y tile [0, 2W)
            (2, W, W, 1),       # X inside doc 2
            (3, W, W, 1),       # Y inside doc 3
        },
    )


def test_l33_islands_w_plus_one_apart_split(spark, fake_corpus):
    """Doc 1 = X(W) ++ one unique token ++ Y(W): duplicated positions
    {0, W+1} are W+1 apart — past the boundary, so TWO spans and the
    clean token between them survives the scrub accounting."""
    x, y = toks("x", W), toks("y", W)
    _, con = fake_corpus(
        [
            (1, f"{x} GAP {y}", "en", "web"),
            (2, f"{toks('p', W)} {x}", "en", "web"),
            (3, f"{toks('q', W)} {y}", "en", "web"),
        ]
    )
    _l33_check(
        spark,
        con,
        {
            (1, 0, W, 1),
            (1, W + 1, W, 1),
            (2, W, W, 1),
            (3, W, W, 1),
        },
    )
    # the scrub audit agrees: doc 1 keeps exactly its 1 clean token
    import datums_warehouse_spark.llm.dedup as DD

    scrub = {
        r.source: r
        for r in DD.l33_passage_scrub(spark, "x").collect()
    }
    web = scrub["web"]
    # web = docs 1,2,3: tokens 2W+1 + 2W + 2W; dup = 2W + W + W
    assert web.tokens_total == (2 * W + 1) + 2 * W + 2 * W
    assert web.dup_tokens == 4 * W
    assert web.tokens_after == web.tokens_total - web.dup_tokens


# --- L41 SemDeDup invariants --------------------------------------------------


def test_l41_pairs_invariants(spark, sf_dir):
    """Pairs are within one cell, ordered (vec_a < vec_b), and every
    cosine clears the threshold; the cell assignment covers every vector
    exactly once."""
    from datums_warehouse_spark.llm.similarity import (
        SEMDEDUP_THETA,
        _semdedup_cells,
        l41_semdedup_pairs,
    )

    cells = _semdedup_cells(spark, sf_dir)
    n_vec = cells.count()
    assert cells.select("vec_id").distinct().count() == n_vec
    rows = l41_semdedup_pairs(spark, sf_dir).collect()
    assert rows, "threshold produced no pairs at test SF — tune θ"
    cell_of = {r.vec_id: r.cid for r in cells.select("vec_id", "cid").collect()}
    for r in rows:
        assert r.vec_a < r.vec_b
        assert cell_of[r.vec_a] == cell_of[r.vec_b] == r.cid
        assert r.cosine >= SEMDEDUP_THETA - 1e-6


def test_l41_materialize_consistent_with_pairs(spark, sf_dir):
    """n_before − n_after summed over labels equals the number of distinct
    dropped vectors (vec_b side of the pair set), and every label's
    n_after ≤ n_before."""
    from datums_warehouse_spark.llm.similarity import (
        l41_semdedup_materialize,
        l41_semdedup_pairs,
    )

    mat = l41_semdedup_materialize(spark, sf_dir).collect()
    dropped = {
        r.vec_b for r in l41_semdedup_pairs(spark, sf_dir).collect()
    }
    assert all(r.n_after <= r.n_before for r in mat)
    assert sum(r.n_before - r.n_after for r in mat) == len(dropped)


# --- streaming single-batch guard (ADVICE r08) --------------------------------


class _FakeQuery:
    def __init__(self, input_rows):
        self.recentProgress = [{"numInputRows": n} for n in input_rows]


def test_single_data_batch_guard():
    from datums_warehouse_spark.streaming.batch_equiv import (
        _assert_single_data_batch,
    )

    # one data batch + the availableNow closing no-data batch: fine
    _assert_single_data_batch(_FakeQuery([1000, 0]))
    # two data batches (e.g. maxFilesPerTrigger snuck in): must raise
    with pytest.raises(RuntimeError, match="single-data-batch"):
        _assert_single_data_batch(_FakeQuery([500, 500, 0]))
    # zero data batches (empty source): also not the pinned contract
    with pytest.raises(RuntimeError, match="single-data-batch"):
        _assert_single_data_batch(_FakeQuery([0]))


# --- L42 SRP-LSH ANN (session 2) ----------------------------------------------


def test_l42_bands_shape_and_range(spark, sf_dir):
    """Every vector emits exactly SRP_BANDS band rows, and band values fit
    in SRP_BITS/SRP_BANDS bits — the bucket key the 100 TB layout would
    partition on."""
    from datums_warehouse_spark.llm.similarity import (
        SRP_BANDS,
        SRP_BITS,
        _srp_bands,
    )
    from datums_warehouse_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    bands = _srp_bands(emb).collect()
    assert len(bands) == n * SRP_BANDS
    rbits = SRP_BITS // SRP_BANDS
    assert all(0 <= r.bandval < (1 << rbits) for r in bands)
    assert all(0 <= r.band < SRP_BANDS for r in bands)


def test_l42_results_are_banded_exact_rerank(spark, sf_dir):
    """Per query: rn is contiguous from 1, cosine is non-increasing in rn,
    every reported neighbor shares at least one band with its query (the
    candidates really came from the buckets), and every cosine matches the
    exact value to the rounding grain."""
    from collections import defaultdict

    from datums_warehouse_spark.llm.similarity import _srp_bands, l42_srp_ann
    from datums_warehouse_spark.sources.tables import load

    rows = l42_srp_ann(spark, sf_dir).collect()
    assert rows
    per_q = defaultdict(list)
    for r in rows:
        per_q[r.query_id].append(r)
    bands = defaultdict(set)
    for r in _srp_bands(load(spark, sf_dir, "embeddings")).collect():
        bands[r.vec_id].add((r.band, r.bandval))
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:
            assert bands[qid] & bands[r.neighbor_id], (
                f"{qid}->{r.neighbor_id} shares no band — not a bucket candidate"
            )


def test_l42_recall_floor_vs_exact(spark, sf_dir):
    """Deterministic recall@5 against the exact scan. The synthetic
    embeddings are near-uniform random — SRP's adversarial case — so the
    floor is modest; the assert pins that the banding doesn't silently
    degenerate (e.g. all-zero hyperplanes would still 'pass' the shape
    tests but collapse recall)."""
    from datums_warehouse_spark.llm.similarity import l3_cosine_topk, l42_srp_ann

    ann = {(r.query_id, r.neighbor_id) for r in l42_srp_ann(spark, sf_dir).collect()}
    exact = {(r.query_id, r.neighbor_id) for r in l3_cosine_topk(spark, sf_dir).collect()}
    assert exact
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.3, f"recall@5 collapsed to {recall}"


# --- L43 Gopher repetition (session 2) -----------------------------------------


@pytest.fixture()
def text_corpus(spark, monkeypatch):
    """Patch llm.text's documents table AND build the matching DuckDB view
    (the fake_corpus pattern, pointed at the text module; documents here
    carry n_chars, which l43's fractions divide by)."""
    import datums_warehouse_spark.llm.text as TT

    def _install(texts):
        rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        monkeypatch.setattr(TT, "load", lambda s, d, n: df)
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}', 'en', 'src0', {n})" for i, t, _, _, n in rows)
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
            "AS t(doc_id, text, lang, source, n_chars)"
        )
        return df, con

    return _install


def _gopher_expected(text: str):
    """Independent reimplementation of the l43 signals (pure Python)."""
    from collections import Counter

    toks = text.split(" ")
    n_chars = len(text)
    out = {}
    for n in (2, 3, 4, 5):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        if not grams:
            out[f"top{n}"] = 0.0
            out[f"dup{n}"] = 0.0
            continue
        mc = max(c.values())
        glen = max(len(g) for g, k in c.items() if k == mc)
        out[f"top{n}"] = mc * glen / n_chars
        out[f"dup{n}"] = sum(k for k in c.values() if k >= 2) / len(grams)
    return out


def test_l43_handbuilt_values_and_oracle_parity(spark, text_corpus):
    """Exact signal values on hand-built docs (vs an independent Python
    reimplementation) AND DuckDB oracle parity on the same corpus."""
    import datums_warehouse_spark.llm.text as TT

    texts = [
        "a b a b a b",              # heavy 2/3/4-gram repetition, no 5-gram dup
        # no repetition at all -> keep (long enough that one n-gram is a
        # small char fraction — the Gopher thresholds assume real doc sizes)
        " ".join(f"w{i}" for i in range(40)),
        "x",                        # 1 token: every signal coalesces to 0
        "x x x x x x x x x x x x",  # total repetition: every signal fires
    ]
    _, con = text_corpus(texts)
    got = {r.doc_id: r for r in TT.l43_gopher_repetition(spark, "x").collect()}
    assert set(got) == {0, 1, 2, 3}
    for i, t in enumerate(texts):
        exp = _gopher_expected(t)
        r = got[i]
        assert r.top2_frac == round(exp["top2"], 6), (i, "top2")
        assert r.top3_frac == round(exp["top3"], 6), (i, "top3")
        assert r.top4_frac == round(exp["top4"], 6), (i, "top4")
        assert r.dup5_frac == round(exp["dup5"], 6), (i, "dup5")
        exp_keep = (
            exp["top2"] <= 0.20
            and exp["top3"] <= 0.18
            and exp["top4"] <= 0.16
            and exp["dup5"] <= 0.15
        )
        assert r.keep == exp_keep, (i, "keep")
    # the repeated docs fail, the clean and degenerate-short docs keep
    assert not got[0].keep and got[1].keep and got[2].keep and not got[3].keep
    # full oracle parity on the synthetic corpus
    q = all_queries()["l43_gopher_repetition"]
    res = compare_frames(
        "l43", TT.l43_gopher_repetition(spark, "x").toPandas(), con.execute(q.oracle).df()
    )
    assert res.ok, res.detail


# --- L44 DSIR importance (session 2) --------------------------------------------


def test_l44_target_docs_score_higher(spark, sf_dir):
    """The importance weight must separate the target distribution from
    the rest: mean weight of target-language (en) docs exceeds the mean of
    every other language, and weights are finite."""
    import math
    from collections import defaultdict

    from datums_warehouse_spark.llm.text import l44_dsir_importance

    rows = l44_dsir_importance(spark, sf_dir).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        assert math.isfinite(r.weight)
        by_lang[r.lang].append(r.weight)
    assert "en" in by_lang
    en_mean = sum(by_lang["en"]) / len(by_lang["en"])
    for lang, ws in by_lang.items():
        if lang == "en":
            continue
        assert en_mean > sum(ws) / len(ws), (
            f"en mean {en_mean} not above {lang} mean — weights don't separate"
        )


# --- L45 n-gram novelty / L46 tokenizer fertility (session 3) -----------------


@pytest.fixture()
def fake_text_corpus(spark, monkeypatch):
    """Like fake_corpus but patches llm.text's loader and carries the
    n_chars column the text-module operators read."""
    import datums_warehouse_spark.llm.text as TT

    def _install(rows):
        rows = [(*r, len(r[1])) for r in rows]  # n_chars = len(text)
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        monkeypatch.setattr(TT, "load", lambda s, d, n: df)
        con = duckdb.connect()
        vals = ", ".join(
            f"({i}, '{t}', '{lg}', '{src}', {nc})" for i, t, lg, src, nc in rows
        )
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
            "AS t(doc_id, text, lang, source, n_chars)"
        )
        return df, con

    return _install


def _l45_check(spark, con, expected):
    import datums_warehouse_spark.llm.text as TT

    spark_pdf = TT.l45_ngram_novelty(spark, "x").toPandas()
    got = {
        (r.doc_id, r.n_grams, r.n_shared, r.dup_risk)
        for r in spark_pdf.itertuples()
    }
    assert got == expected, f"{got} != {expected}"
    oracle_pdf = con.execute(all_queries()["l45_ngram_novelty"].oracle).fetchdf()
    res = compare_frames("l45_edge", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_l45_short_docs_report_zero_not_null(spark, fake_text_corpus):
    """Docs with fewer than 8 tokens have no 8-grams: they must still get
    a (0, 0, false) row — and Spark's descending sequence() trap must not
    fabricate garbage grams for them."""
    _, con = fake_text_corpus(
        [
            (1, toks("a", 7), "en", "web"),   # 7 tokens: no 8-gram
            (2, toks("b", 8), "en", "web"),   # exactly one 8-gram, unshared
            (3, toks("c", 20), "en", "web"),  # 13 grams, all unique
        ]
    )
    _l45_check(
        spark,
        con,
        {(1, 0, 0, False), (2, 1, 0, False), (3, 13, 0, False)},
    )


def test_l45_identical_docs_fully_shared(spark, fake_text_corpus):
    """Two identical docs share every 8-gram → 100% shared, dup_risk on
    both; a third unique doc stays clean."""
    text = toks("d", 15)  # 8 distinct 8-grams
    _, con = fake_text_corpus(
        [(1, text, "en", "web"), (2, text, "en", "wiki"), (3, toks("u", 15), "en", "web")]
    )
    _l45_check(
        spark,
        con,
        {(1, 8, 8, True), (2, 8, 8, True), (3, 8, 0, False)},
    )


def test_l45_exact_20pct_boundary_flags(spark, fake_text_corpus):
    """dup_risk fires AT the 20% boundary (n_shared*5 >= n_grams — integer
    cross-multiplication, no float ratio): a doc with exactly 1 shared
    gram out of 5 is flagged; 1 of 6 is not."""
    x = toks("x", 8)  # the shared 8-gram
    # doc 1: 12 tokens = 5 grams, first gram = x's gram (tokens x0..x7)
    d1 = f"{x} p0 p1 p2 p3"
    # doc 2: 13 tokens = 6 grams, first gram shared
    d2 = f"{x} q0 q1 q2 q3 q4"
    # doc 3 embeds x behind a unique prefix so only x's own gram is shared
    d3 = f"{toks('z', 8)} {x}"
    _, con = fake_text_corpus(
        [(1, d1, "en", "web"), (2, d2, "en", "web"), (3, d3, "en", "web")]
    )
    _l45_check(
        spark,
        con,
        {(1, 5, 1, True), (2, 6, 1, False), (3, 9, 1, False)},
    )


def test_l46_fertility_floor_division_and_oracle(spark, fake_text_corpus):
    """The scaled ratios are exact floor divisions: a lang whose
    bpe/ws ratio is non-terminating (1/3) must floor identically in both
    engines, and per-lang totals must be exact."""
    import datums_warehouse_spark.llm.text as TT

    _, con = fake_text_corpus(
        [
            # en: 3 ws tokens, bpe = 3 letter-runs + 1 digit-run = 4
            (1, "ab cd 9x", "en", "web"),
            # de: 3 ws tokens, 1 bpe token each → fertility 10000//3*... :
            # ws=3, bpe=3+... 'foo bar baz' → 3 runs → 10000*3//3=10000
            (2, "foo bar baz", "de", "web"),
        ]
    )
    pdf = TT.l46_tokenizer_fertility(spark, "x").toPandas().set_index("lang")
    en = pdf.loc["en"]
    # 'ab cd 9x' → runs: ab, cd, 9, x → 4 bpe tokens over 3 ws words
    assert int(en.ws_tokens) == 3 and int(en.bpe_tokens) == 4
    assert int(en.fertility_x10000) == 4 * 10000 // 3  # 13333, floored
    assert int(en.chars_per_tok_x100) == len("ab cd 9x") * 100 // 4
    oracle_pdf = con.execute(
        all_queries()["l46_tokenizer_fertility"].oracle
    ).fetchdf()
    res = compare_frames(
        "l46_edge", TT.l46_tokenizer_fertility(spark, "x").toPandas(), oracle_pdf
    )
    assert res.ok, res.detail


# --- A14 grouped mode / X13 seasonality / SQL3 recursive CTE (session 3) ------


def test_a14_mode_tie_break_lowest_bucket(spark, monkeypatch):
    """Two buckets tie on count → the LOWER bucket must win on both
    engines (the tie-break is part of the graded semantics)."""
    import datums_warehouse_spark.operators.aggregates as AG

    rows = [
        # type 'a': bucket 10.0 ×2, bucket 30.0 ×2 (tie → 10.0), 50.0 ×1
        (1, "a", 12.0), (2, "a", 15.0), (3, "a", 31.0), (4, "a", 39.0),
        (5, "a", 55.0),
        # type 'b': negative values floor toward -inf: -0.1 → bucket -10.0
        (6, "b", -0.1), (7, "b", -5.0), (8, "b", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    monkeypatch.setattr(AG, "events_us", lambda s, d: df)
    got = {r.event_type: (r.mode_bucket, r.mode_n) for r in AG.a14_grouped_mode(spark, "x").collect()}
    assert got["a"] == (10.0, 2)
    assert got["b"] == (-10.0, 2)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', {v})" for i, t, v in rows)
        + ") AS t(event_id, event_type, value)"
    )
    res = compare_frames(
        "a14_edge",
        AG.a14_grouped_mode(spark, "x").toPandas(),
        con.execute(all_queries()["a14_grouped_mode"].oracle).fetchdf(),
    )
    assert res.ok, res.detail


def test_x13_monday_is_zero_and_cells_bounded(spark, sf_dir):
    """Weekday numbering pins Monday=0 (Spark weekday == DuckDB isodow-1);
    output is at most 168 cells with exact decimal means."""
    import datums_warehouse_spark.operators.timeseries as TS

    pdf = TS.x13_dow_hour_profile(spark, sf_dir).toPandas()
    assert len(pdf) <= 168
    assert pdf.dow.between(0, 6).all() and pdf.hr.between(0, 23).all()
    # cross-check one cell against a direct computation
    import duckdb as dk

    con = dk.connect()
    exp = con.execute(
        f"SELECT CAST(isodow(ts) - 1 AS INT) AS dow, count(*) AS n "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    got = pdf.groupby("dow", as_index=False)["n"].sum().sort_values("dow")
    assert list(got.n) == list(exp.n)


def test_sql3_spine_has_no_month_gaps(spark, sf_dir):
    """The recursive spine is gap-free and spans exactly the order-date
    range; months with no orders carry explicit zeros."""
    import pandas as pd

    from datums_warehouse_spark.operators.sql_surface import sql3_recursive_cte

    pdf = sql3_recursive_cte(spark, sf_dir).toPandas().sort_values("month")
    months = pd.to_datetime(pdf.month)
    diffs = months.diff().dropna()
    # consecutive calendar months: every step is 28–31 days
    assert ((diffs.dt.days >= 28) & (diffs.dt.days <= 31)).all()
    assert (pdf.n_orders >= 0).all()
    assert pdf.n_orders.sum() > 0
