"""Stats-driven join planning over snapshot tables: prune FIRST, then
pick the join strategy from what survived — all from manifest metadata,
zero data I/O before the decision.

Catalyst's own broadcast decision sees static table-level sizes (or waits for
AQE's runtime stats after a shuffle has already been planned). A table
format can do better at plan time: commits record per-file byte sizes
alongside column min/max (``snapshots.py::_stats_from_parent_manifest``), so after
``plan_snapshot_scan`` prunes each side's file list the planner knows the
PHYSICAL bytes the join will actually read. A dimension table that is
10 GB raw but 40 MB after predicate pruning broadcast-joins; the same
table unpruned shuffles. That post-prune re-decision is the piece the
static optimizer cannot make and AQE only makes after paying the first
shuffle.

Decision rule: among the sides the join type allows as build side
(either for inner; only the non-preserved side for outer/semi/anti), the
smaller post-prune side broadcasts iff its planned bytes ≤ threshold —
applied as an explicit ``F.broadcast`` hint so the physical plan carries
BroadcastHashJoin (pytest plan-asserted). Otherwise the join is left to
Catalyst/AQE (sort-merge with runtime skew handling). The returned
``JoinPlan`` records both sides' planned bytes, each scan's per-predicate
pruning steps, and the decision — ``require_broadcast`` RAISES when no
broadcast was chosen, the require_pruning proof discipline: a green
driver row proves the stats-driven decision ENGAGED.

Scale: planning cost is file-list-sized (two manifest reads). The bytes
estimate is exact physical file size, not a cardinality guess — it can
only over-estimate the broadcast payload (the residual filter drops more
rows), so a "fits" decision never broadcasts more bytes than planned.
Missing size entries (pre-upgrade manifests) fall back to one driver-side
``os.path.getsize`` per file, same cost class as the commit-time pass.

Reference parity: the reference hand-picks broadcast joins per job (e.g.
the allowlist semi-join the J3 row covers); this plans them from table
metadata, net-new engine surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.scan_planner import ScanPlan

DEFAULT_BROADCAST_THRESHOLD = 32 << 20  # bytes, post-prune


@dataclass
class JoinPlan:
    """The decision record: planned physical bytes per side (post-prune),
    which side broadcasts (None = Catalyst/AQE shuffle join), and each
    side's scan-pruning accounting."""

    left_bytes: int
    right_bytes: int
    broadcast: str | None
    left_scan: ScanPlan
    right_scan: ScanPlan


def planned_bytes(root: str, plan: ScanPlan, version: int | None = None) -> int:
    """Physical bytes of the files a ScanPlan kept, from the manifest's
    commit-time sizes (fallback: one getsize per missing entry)."""
    import os

    m = S.read_manifest(root, S.latest_version(root) if version is None else version)
    sizes = m.get("sizes", {})
    total = 0
    for f in plan.files:
        rel = os.path.relpath(f, root)
        n = sizes.get(rel)
        if n is None:
            try:
                n = os.path.getsize(f)
            except OSError:
                n = 0
        total += n
    return total


# which sides MAY be the broadcast build side, per join type: Spark can
# not broadcast the row-preserved side of an outer join, nor the left
# side of a semi/anti join.
_BROADCASTABLE = {
    "inner": ("left", "right"),
    "cross": ("left", "right"),
    "left": ("right",),
    "left_outer": ("right",),
    "left_semi": ("right",),
    "left_anti": ("right",),
    "right": ("left",),
    "right_outer": ("left",),
    "full": (),
    "full_outer": (),
    "outer": (),
}


def plan_join(
    spark: SparkSession,
    left_root: str,
    right_root: str,
    on: list[tuple[str, str]],
    how: str = "inner",
    left_predicates: list | None = None,
    right_predicates: list | None = None,
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
    require_broadcast: bool = False,
    require_pruning: str | None = None,
    left_version: int | None = None,
    right_version: int | None = None,
) -> tuple[DataFrame, JoinPlan]:
    """Prune both snapshot sides through ``plan_snapshot_scan``, then
    join with the strategy the surviving bytes justify. ``on`` is
    [(left_col, right_col), ...]. ``require_pruning``: 'left' / 'right' /
    'both' forwards the pruned-nothing raise to that side's scan."""
    ldf, lplan = S.plan_snapshot_scan(
        spark, left_root, left_predicates or [], version=left_version,
        require_pruning=require_pruning in ("left", "both"),
    )
    rdf, rplan = S.plan_snapshot_scan(
        spark, right_root, right_predicates or [], version=right_version,
        require_pruning=require_pruning in ("right", "both"),
    )
    lbytes = planned_bytes(left_root, lplan, left_version)
    rbytes = planned_bytes(right_root, rplan, right_version)

    allowed = _BROADCASTABLE.get(how, ())
    choice = None
    candidates = [
        (b, side)
        for b, side in ((lbytes, "left"), (rbytes, "right"))
        if side in allowed and b <= broadcast_threshold
    ]
    if candidates:
        choice = min(candidates)[1]
    if require_broadcast and choice is None:
        raise RuntimeError(
            f"plan_join: no side fits the broadcast threshold "
            f"({broadcast_threshold} B): left={lbytes} B after "
            f"{lplan.steps or 'no pruning'}, right={rbytes} B after "
            f"{rplan.steps or 'no pruning'}"
        )

    if choice == "left":
        ldf = F.broadcast(ldf)
    elif choice == "right":
        rdf = F.broadcast(rdf)
    cond = None
    for lc, rc in on:
        e = ldf[lc] == rdf[rc]
        cond = e if cond is None else cond & e
    joined = ldf.join(rdf, cond, how)
    return joined, JoinPlan(lbytes, rbytes, choice, lplan, rplan)
