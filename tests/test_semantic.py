"""SemDeDup (datapipe/semantic.py): planted-duplicate behavior, keep-policy
determinism, and the no-all-pairs plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.semantic import assign_cells, semantic_prune


@pytest.fixture(scope="module")
def emb(spark):
    # seeds 0..3 near the 4 axes of a 4-dim space; vectors 10.. cluster
    # around them; 20/21 are exact duplicates of each other, 22 is a
    # near-duplicate of 20.
    def v(*xs):
        return [float(x) for x in xs]

    rows = [
        (0, v(1, 0, 0, 0)),
        (1, v(0, 1, 0, 0)),
        (2, v(0, 0, 1, 0)),
        (3, v(0, 0, 0, 1)),
        (10, v(0.9, 0.1, 0, 0)),
        (11, v(0.1, 0.9, 0, 0)),
        (20, v(0.7, 0.7, 0, 0)),
        (21, v(0.7, 0.7, 0, 0)),
        (22, v(0.71, 0.69, 0, 0)),
        (30, v(0, 0, 0.5, 0.5)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assignment_nearest_seed_lowest_tiebreak(emb):
    cells = {r.vec_id: r.cell for r in assign_cells(emb, n_seeds=4).collect()}
    assert cells[0] == 0 and cells[1] == 1  # seeds map to themselves
    assert cells[10] == 0 and cells[11] == 1
    # 20/21 equidistant between seeds 0 and 1 -> lowest seed id wins
    assert cells[20] == 0 and cells[21] == 0
    # 30 equidistant between seeds 2 and 3 -> seed 2
    assert cells[30] == 2


def test_duplicates_pruned_lowest_id_kept(emb):
    out = {r.vec_id: r.kept for r in
           semantic_prune(emb, n_seeds=4, threshold=0.995).collect()}
    assert out[20] is True      # lowest id of the duplicate group survives
    assert out[21] is False     # exact duplicate of 20
    assert out[22] is False     # near-duplicate of 20 (cos > 0.995)
    assert out[10] is True and out[30] is True
    assert len(out) == 10       # every vector is labeled


def test_prune_is_cell_local(emb):
    """A duplicate pair split across cells is NOT pruned — the SemDeDup
    trade: recall is bounded by the clustering, in exchange for never
    comparing across clusters."""
    import pyspark.sql.functions as F  # noqa: F811
    twin = emb.union(
        emb.sparkSession.createDataFrame(
            [(40, [0.1, 0.9, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
    )
    out = {r.vec_id: r for r in semantic_prune(twin, n_seeds=4, threshold=0.9).collect()}
    # 40 duplicates 11 and lands in the same cell -> pruned
    assert out[40].cell == out[11].cell and out[40].kept is False


def test_no_python_and_no_cartesian_over_data(emb):
    plan = (
        semantic_prune(emb, n_seeds=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only nested-loop is the broadcast of the seed set; the prune join
    # must be a hash join keyed on cell
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
