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
