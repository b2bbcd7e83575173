"""Round-10 operator tests.

1. SQL4 data-dependent recursion: depth grows with the data (3 levels at
   sf0.001, 4 at sf0.01), the closure visits every part exactly once, and
   branches are exactly the anchor keys — the invariants that make the
   "bounded by data, not a fixed unroll" claim checkable, on top of the
   oracle parity the generic suite already grades.
2. L47 incremental SemDeDup invariants: every pair crosses the new/index
   wall in the right orientation, clears θ, and the pair set is exactly
   the brute-force new-vs-index cell-mate computation (independent numpy
   reference, not the DuckDB oracle — a THIRD implementation).
3. The pair kernels' stripe chunking (ADVICE r09 hot-cell cap): a 3-row
   chunk — forcing many blocks per stripe — must reproduce the default
   single-block output hash-exactly for BOTH l41 and l47, because
   chunking the pair axis never splits a single dot product's left fold.
"""

from __future__ import annotations

import numpy as np
import pytest

from datums_warehouse_spark import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


# --- sql4 ----------------------------------------------------------------


def test_sql4_depth_grows_with_data(spark, qs):
    """max(depth) = ⌈log₈(max key)⌉ tracks the data: one level deeper at
    sf0.01 (2000 parts) than sf0.001 (200 parts)."""
    small = qs["sql4_transitive_closure"].fn(spark, "/root/testdata/sf0.001").toPandas()
    big = qs["sql4_transitive_closure"].fn(spark, "/root/testdata/sf0.01").toPandas()
    assert small["depth"].max() == 2  # 199 → 24 → 3 (anchor)
    assert big["depth"].max() == 3    # 1999 → 249 → 31 → 3 (anchor)


def test_sql4_closure_is_a_partition_of_parts(spark, qs, sf_dir):
    """Tree reachability: every part enters the closure exactly once, so
    per-(branch, depth) counts sum to the table size; branches are the
    eight anchor keys 0..7 and branch 0 (childless root) stays depth 0."""
    pdf = qs["sql4_transitive_closure"].fn(spark, sf_dir).toPandas()
    import duckdb

    n_parts = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/part.parquet')"
    ).fetchone()[0]
    assert int(pdf["n_parts"].sum()) == n_parts
    assert set(pdf["branch"]) == set(range(8))
    b0 = pdf[pdf["branch"] == 0]
    assert len(b0) == 1 and b0["depth"].iloc[0] == 0 and b0["n_parts"].iloc[0] == 1


# --- l47 -----------------------------------------------------------------


def _load_emb(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()


def test_l47_pairs_cross_the_wall_and_clear_theta(spark, qs, sf_dir):
    from datums_warehouse_spark.llm.similarity import SEMDEDUP_THETA

    pdf = qs["l47_incremental_semdedup"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0, "fixture must exercise the pair stage"
    assert (pdf["doc_new"] % 3 == 0).all()
    assert (pdf["dup_of"] % 3 != 0).all()
    assert (pdf["cosine"] >= SEMDEDUP_THETA).all()


def test_l47_matches_bruteforce_reference(spark, qs, sf_dir):
    """Third-implementation check: plain numpy recomputes the seed set,
    the nearest-seed assignment (d2 = vv − 2ab + cc, lowest-cid ties) and
    the new-vs-index cell-mate cosines; the Spark pair set must match
    exactly (ids) with cosines equal to 1e-9 (the reference uses np.dot,
    NOT the engines' left fold, so bit-equality is not expected)."""
    rows = _load_emb(sf_dir)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    E = np.array([r[1] for r in rows], dtype=np.float64)
    idx_mask = ids % 3 != 0
    n_idx = int(idx_mask.sum())
    s_thr = max(12, int(np.floor(n_idx * 3 / 500)))
    seed_mask = idx_mask & (ids < s_thr)
    seeds, seed_ids = E[seed_mask], ids[seed_mask]
    # nearest seed, lowest cid on ties
    d2 = ((E**2).sum(1)[:, None] - 2 * E @ seeds.T + (seeds**2).sum(1)[None, :])
    cid = seed_ids[np.argmin(d2, axis=1)]  # argmin takes first = lowest cid
    norms = np.sqrt((E**2).sum(1))
    expected = set()
    for c in np.unique(cid):
        m = cid == c
        new_i = np.where(m & (ids % 3 == 0))[0]
        idx_i = np.where(m & (ids % 3 != 0))[0]
        for a in new_i:
            cos = (E[a] @ E[idx_i].T) / (norms[a] * norms[idx_i])
            for b, cv in zip(idx_i[cos >= 0.40], cos[cos >= 0.40]):
                expected.add((int(ids[a]), int(ids[b]), round(float(cv), 6)))
    got = {
        (int(r.doc_new), int(r.dup_of), round(float(r.cosine), 6))
        for r in qs["l47_incremental_semdedup"].fn(spark, sf_dir).toPandas().itertuples()
    }
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in expected}
    exp_cos = {(a, b): c for a, b, c in expected}
    for a, b, c in got:
        assert abs(c - exp_cos[(a, b)]) < 1e-6


# --- kernel stripe chunking ----------------------------------------------


@pytest.mark.parametrize("name", ["l41_semdedup_pairs", "l47_incremental_semdedup"])
def test_pair_kernels_chunk_invariant(spark, qs, sf_dir, name, monkeypatch):
    """A 3-row SEMDEDUP_PAIR_CHUNK (many blocks per stripe) must reproduce
    the default single-block output EXACTLY — chunking the pair axis never
    splits a single dot product's left fold, so even the raw cosines are
    bit-equal (ADVICE r09: the cap must not change semantics)."""
    import datums_warehouse_spark.llm.similarity as S

    base = qs[name].fn(spark, sf_dir).toPandas()
    monkeypatch.setattr(S, "SEMDEDUP_PAIR_CHUNK", 3)
    chunked = qs[name].fn(spark, sf_dir).toPandas()
    cols = sorted(base.columns)
    a = base[cols].sort_values(cols, ignore_index=True)
    b = chunked[cols].sort_values(cols, ignore_index=True)
    assert a.equals(b)
