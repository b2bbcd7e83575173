"""Round-13 optimization regression locks: plan shapes and loop behavior
that the r13 changes established (OPTIMIZATION_r13.md documents the
measurements each lock pins)."""

from __future__ import annotations

import re

import pytest

from datums_warehouse_spark import all_queries
from datums_warehouse_spark.testing.plans import formatted_plan


def _ops(plan: str, name: str) -> int:
    """Count physical operators by header line — each op appears twice in
    a formatted plan (tree + details), headers once."""
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.M))


def test_l33_evaluates_the_gram_projection_once(spark, sf_dir):
    """The W-gram md5 projection must be evaluated by ONE Generate feeding
    both the distinct-doc count and the position stream (the r12 shape ran
    two Generates — double hashing, which dominated at the 32× stress
    scale: 11.9 → 4.8 s from this lock's rewrite). The distinct-doc count
    rides a window over the gram hash, so no countDistinct aggregate and
    no gram-stream self-join may reappear."""
    for q in ("l33_dup_passages", "l33_passage_scrub"):
        plan = formatted_plan(all_queries()[q].fn(spark, sf_dir))
        assert _ops(plan, "Generate") == 1, q
        assert "count(distinct" not in plan.lower(), q


def test_j3_scale_path_never_pins_a_broadcast(spark, sf_dir):
    """ADVICE r12: the starved-gate's production branch must not carry
    hard broadcast hints on unbounded intermediates — the o_orderkey join
    degrades to a shuffled-hash join with dims as the BUILD side (the
    fact table still never collected), and the results are identical to
    the grading branch."""
    from datums_warehouse_spark.operators.joins import _j3_plan

    big = _j3_plan(spark, sf_dir, small=False)
    plan = formatted_plan(big)
    assert "ShuffledHashJoin" in plan
    # no BroadcastExchange subtree may contain the lineitem scan (same
    # ancestor-walk lock as test_j3_never_broadcasts_the_fact_table)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    li_scan_ids = {
        m.group(1)
        for m in re.finditer(r"\((\d+)\) Scan parquet", plan)
        if "lineitem.parquet" in plan.split(f"({m.group(1)}) Scan parquet")[1][:400]
    }
    assert li_scan_ids, "lineitem scan not found in j3 scale plan"
    for line in lines:
        for sid in li_scan_ids:
            if f"Scan parquet  ({sid})" in line:
                indent = len(line) - len(line.lstrip(" :+-"))
                idx = lines.index(line)
                for prev in reversed(lines[:idx]):
                    pin = len(prev) - len(prev.lstrip(" :+-"))
                    if pin < indent:
                        assert "BroadcastExchange" not in prev, prev
                        indent = pin
    small = _j3_plan(spark, sf_dir, small=True)
    a = big.toPandas().sort_values("n_name", ignore_index=True)
    b = small.toPandas().sort_values("n_name", ignore_index=True)
    assert a.equals(b)


def test_label_prop_stops_in_the_round_convergence_happens(spark):
    """A pair graph converges in ONE round (neighbor-min + jump make both
    labels the pair min; the discordant-edge witness sees component-
    constant labels immediately). The old Σlabel witness needed a second
    full round to observe 'nothing changed' — this pins the saving."""
    from datums_warehouse_spark.llm import dedup as DD

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (7, 9), (9, 7)], "u long, v long"
    ).localCheckpoint(eager=True)
    # max_rounds=1: with the round-13 witness one round SUFFICES for a
    # diameter-1 graph; the r12 code raised here (needed round 2 to see
    # the sum settle)
    labels = {
        r["u"]: r["label"]
        for r in DD.min_label_propagation(spark, edges, max_rounds=1).collect()
    }
    assert labels == {1: 1, 2: 1, 7: 7, 9: 7}
