"""Materialized-view catalog + automatic aggregate query rewrite.

The missing half of incremental view maintenance: ``snapshots.py``
already keeps a grouped SUM/COUNT view exactly in sync with a base
table's commit log (``refresh_view_incremental``, streamed by
``streaming/ivm.py``). This module makes the maintained view USABLE the
way a warehouse uses one — a user asks an aggregate question of the BASE
table and the engine answers it from the view when the view subsumes the
question, never touching the fact data:

- **Rollup subsumption**: a view grouped by (a, b) answers any GROUP BY
  over a subset of {a, b} — COUNT(*) re-aggregates as SUM(n_rows),
  SUM(x) as SUM(sum_x) for any materialized measure x, AVG(x) as
  SUM(sum_x)/SUM(n_rows). The re-aggregation runs over the
  group-cardinality-sized view, so a 100 TB fact table answers in
  view-sized time. Views carry ANY number of measures (one n_rows, one
  exact DECIMAL total per measure).
- **Freshness**: the view's manifest records the base version it
  reflects (``mv_base_version``). A rewrite against a stale view either
  incrementally catches up first (``auto_refresh`` — cost ∝ the change
  volume via ``table_changes``, the IVM contract) or refuses
  (``RewriteMiss``) so the caller can fall back to the base scan.
  Serving a stale answer silently is never an option.
- **Proof discipline**: ``answer_aggregate(require_rewrite=True)``
  RAISES when no view subsumes the question — the ``require_pruning`` /
  ``require_each_pruning`` pattern: a green driver row on
  ``mv_rewrite_rollup`` proves the rewrite ENGAGED, not merely that some
  scan produced the right numbers. ``DataFrame.inputFiles`` on the
  rewritten plan shows only view files (pytest-asserted).

Exactness: the view stores DECIMAL partial sums (associative), so
rewritten SUMs equal direct re-aggregation bit-for-bit; AVG divides the
two exact totals in IEEE double (both exactly representable at DECIMAL
(15,2) scale), deterministic across engines and task orderings.

Reference parity: the reference pre-computes fixed derived datasets as
standalone batch jobs and points consumers at the derived table by hand
(views/MainEventsView.scala:11-63 — per-day overwrite of a derived
parquet path; same pattern in SyncView/SyncFlatView). This module
generalizes that to a cataloged view with automatic subsumption
matching, staleness tracking against the commit log, and incremental
catch-up — net-new engine surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S


class RewriteMiss(Exception):
    """The view cannot answer the question (grouping not subsumed, agg
    not derivable, or stale with refresh disallowed)."""


@dataclass(frozen=True)
class Agg:
    """One requested aggregate: COUNT(*) is ``Agg('count')``; SUM/AVG
    name the base column they aggregate."""

    func: str  # 'count' | 'sum' | 'avg'
    col: str | None = None
    alias: str | None = None

    @property
    def out(self) -> str:
        return self.alias or (
            self.func if self.col is None else f"{self.func}_{self.col}"
        )


def _sum_name(m: dict, col: str) -> str:
    """The view column holding ``col``'s running total. Single-measure
    views created before multi-measure support store it as ``sum_val``."""
    if m.get("mv_sum_col"):
        return "sum_val"
    return f"sum_{col}"


def _total_type(cast_to: str) -> str:
    """The running-total type for partial sums cast to ``cast_to``:
    widen precision (sums grow) but KEEP the scale — hard-coding
    decimal(25,2) silently rounded finer-scaled measures."""
    m = re.match(r"decimal\((\d+),(\d+)\)", cast_to.replace(" ", ""))
    if not m:
        return cast_to  # non-decimal measures total in their own type
    p, s = int(m.group(1)), int(m.group(2))
    return f"decimal({min(38, p + 10)},{s})"


def create_view(
    spark: SparkSession,
    base_root: str,
    view_root: str,
    group_cols: list[str],
    sum_cols: str | list[str],
    cast_to: str = "decimal(15,2)",
) -> int:
    """Materialize the grouped COUNT + per-measure SUM view of
    ``base_root``'s head and commit it (with its defining metadata) as
    version 1 of the view table. One full scan of the base — the last
    one rewrites need."""
    cols = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    base_version = S.latest_version(base_root)
    base = S.read_snapshot(spark, base_root, base_version)
    state = base.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.col(c).cast(cast_to)).alias(f"sum_{c}")
            for c in cols
        ],
        # per-measure NON-NULL counts: SQL AVG ignores NULLs, so
        # sum/n_rows would understate it on nullable measures
        *[F.count(F.col(c)).alias(f"cnt_{c}") for c in cols],
    )
    return S.overwrite(
        spark,
        view_root,
        state,
        extra={
            "mv_base_root": base_root,
            "mv_base_version": base_version,
            "mv_group_cols": list(group_cols),
            "mv_sum_cols": cols,
            "mv_cast_to": cast_to,
            "mv_measure_counts": True,
        },
    )


def view_info(view_root: str) -> dict:
    """The view's defining metadata from its head manifest (legacy
    single-measure key normalized to ``mv_sum_cols``)."""
    m = S.read_manifest(view_root, S.latest_version(view_root))
    if "mv_base_root" not in m:
        raise ValueError(f"{view_root} is not a materialized view")
    if "mv_sum_cols" not in m:
        m["mv_sum_cols"] = [m["mv_sum_col"]]
    return m


def refresh_view(spark: SparkSession, view_root: str) -> int:
    """Catch the view up to its base table's head — cost ∝ the commits'
    change volume (``table_changes`` diffs only non-shared files), never
    the base table. No-op (returns the current view version) when
    already fresh. Each refresh is itself an atomic, time-travelable
    overwrite version of the view."""
    m = view_info(view_root)
    base_root, from_v = m["mv_base_root"], m["mv_base_version"]
    to_v = S.latest_version(base_root)
    if to_v == from_v:
        return S.latest_version(view_root)
    changes = S.table_changes(spark, base_root, from_v, to_v)
    state = S.read_snapshot(spark, view_root)
    groups, cast_to = m["mv_group_cols"], m["mv_cast_to"]
    sign = F.when(
        F.col("_change") == F.lit("insert"), F.lit(1)
    ).otherwise(F.lit(-1))
    sums = {c: _sum_name(m, c) for c in m["mv_sum_cols"]}
    has_counts = bool(m.get("mv_measure_counts"))
    delta = changes.groupBy(*groups).agg(
        F.sum(sign).alias("__d_cnt"),
        *[
            F.sum(F.col(c).cast(cast_to) * sign).alias(f"__d_{name}")
            for c, name in sums.items()
        ],
        *(
            [
                F.sum(
                    sign * F.col(c).isNotNull().cast("int")
                ).alias(f"__d_cnt_{c}")
                for c in sums
            ]
            if has_counts
            else []
        ),
    )
    merged_cols = [
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("__d_cnt"), F.lit(0))
        ).alias("n_rows")
    ]
    for name in sums.values():
        zero = F.lit(0).cast(delta.schema[f"__d_{name}"].dataType)
        merged_cols.append(
            (
                F.coalesce(F.col(name), zero)
                + F.coalesce(F.col(f"__d_{name}"), zero)
            )
            # decimal addition widens per refresh; pin the state schema
            # so view versions stay cross-readable (table_changes reads
            # both sides under the to-version schema)
            .cast(state.schema[name].dataType)
            .alias(name)
        )
    if has_counts:
        for c in sums:
            merged_cols.append(
                (
                    F.coalesce(F.col(f"cnt_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"__d_cnt_{c}"), F.lit(0))
                ).alias(f"cnt_{c}")
            )
    new_state = (
        state.join(delta, on=groups, how="full_outer")
        .select(*groups, *merged_cols)
        .where(F.col("n_rows") > 0)
    )
    return S.overwrite(
        spark,
        view_root,
        new_state,
        extra={
            "mv_base_root": base_root,
            "mv_base_version": to_v,
            "mv_group_cols": groups,
            "mv_sum_cols": m["mv_sum_cols"],
            "mv_cast_to": cast_to,
            **(
                {"mv_sum_col": m["mv_sum_col"]}
                if m.get("mv_sum_col")
                else {}
            ),
            # the marker must survive refresh — dropping it made AVG
            # unanswerable after the first catch-up
            **(
                {"mv_measure_counts": True}
                if m.get("mv_measure_counts")
                else {}
            ),
        },
    )


def _derive(agg: Agg, m: dict):
    """The view-side expression computing ``agg``, or RewriteMiss."""
    total = _total_type(m.get("mv_cast_to", "decimal(15,2)"))
    if agg.func == "count" and agg.col is None:
        return F.sum("n_rows").cast("bigint").alias(agg.out)
    if agg.func == "sum" and agg.col in m["mv_sum_cols"]:
        return F.sum(_sum_name(m, agg.col)).cast(total).alias(agg.out)
    if agg.func == "avg" and agg.col in m["mv_sum_cols"]:
        if not m.get("mv_measure_counts"):
            raise RewriteMiss(
                f"AVG({agg.col}) needs per-measure non-null counts "
                "(SQL AVG ignores NULLs; n_rows would understate it) — "
                "recreate the view to materialize them"
            )
        return (
            F.sum(_sum_name(m, agg.col)).cast("double")
            / F.sum(f"cnt_{agg.col}").cast("double")
        ).alias(agg.out)
    raise RewriteMiss(
        f"{agg.func}({agg.col}) not derivable from COUNT/"
        f"SUM({m['mv_sum_cols']})"
    )


def rewrite_aggregate(
    spark: SparkSession,
    view_root: str,
    group_cols: list[str],
    aggs: list[Agg],
    auto_refresh: bool = True,
) -> DataFrame:
    """Answer GROUP BY ``group_cols`` + ``aggs`` over the view's BASE
    table by re-aggregating the VIEW — raises ``RewriteMiss`` when the
    view doesn't subsume the question. Stale views incrementally catch up
    first (``auto_refresh``) or miss: a rewrite never silently serves an
    answer older than the base table's head."""
    m = view_info(view_root)
    if not set(group_cols) <= set(m["mv_group_cols"]):
        raise RewriteMiss(
            f"GROUP BY {group_cols} not subsumed by view grouping "
            f"{m['mv_group_cols']}"
        )
    exprs = [_derive(a, m) for a in aggs]
    if S.latest_version(m["mv_base_root"]) != m["mv_base_version"]:
        if not auto_refresh:
            raise RewriteMiss(
                f"view at base v{m['mv_base_version']} is stale "
                f"(base head v{S.latest_version(m['mv_base_root'])}) "
                "and auto_refresh is off"
            )
        refresh_view(spark, view_root)
    view = S.read_snapshot(spark, view_root)
    if group_cols:
        return view.groupBy(*group_cols).agg(*exprs)
    return view.agg(*exprs)


def probe_aggregate(
    view_root: str, group_cols: list[str], aggs: list[Agg]
) -> dict:
    """Subsumption check WITHOUT side effects — the EXPLAIN path. Runs
    exactly ``rewrite_aggregate``'s admission tests (grouping subset,
    every aggregate derivable from the view's totals) but never reads
    view data and never refreshes: staleness is REPORTED, not repaired.
    Raises ``RewriteMiss`` when the view can't answer the question."""
    m = view_info(view_root)
    if not set(group_cols) <= set(m["mv_group_cols"]):
        raise RewriteMiss(
            f"GROUP BY {group_cols} not subsumed by view grouping "
            f"{m['mv_group_cols']}"
        )
    for a in aggs:
        _derive(a, m)  # RewriteMiss when not derivable
    head = S.latest_version(m["mv_base_root"])
    return {
        "base_root": m["mv_base_root"],
        "view_base_version": m["mv_base_version"],
        "base_head": head,
        "stale_commits": head - m["mv_base_version"],
    }


def answer_aggregate(
    spark: SparkSession,
    base_root: str,
    view_roots: list[str],
    group_cols: list[str],
    aggs: list[Agg],
    require_rewrite: bool = False,
    auto_refresh: bool = True,
) -> tuple[DataFrame, str | None]:
    """The front door: try each cataloged view in order, fall back to a
    direct aggregation of the base table when none subsumes the question.
    Returns (answer, view_root used or None). ``require_rewrite`` turns
    the fallback into a loud error — the proof knob the driver query
    uses."""
    misses = []
    for root in view_roots:
        try:
            info = view_info(root)
            if info["mv_base_root"] != base_root:
                raise RewriteMiss(f"view {root} is over a different base")
            return (
                rewrite_aggregate(
                    spark, root, group_cols, aggs, auto_refresh
                ),
                root,
            )
        except (RewriteMiss, FileNotFoundError, ValueError) as e:
            # FileNotFoundError: the view's recorded base version was
            # vacuumed mid-catch-up; ValueError: not-yet-initialized
            # view root (the create_view overwrite race). Both mean
            # "this view can't answer RIGHT NOW" — fall back to the
            # scan instead of failing a query the base can serve.
            misses.append(f"{root}: {e}")
    if require_rewrite:
        raise RuntimeError(
            "no materialized view subsumes the question: "
            + "; ".join(misses or ["no views cataloged"])
        )
    base = S.read_snapshot(spark, base_root)
    exprs = []
    for a in aggs:
        if a.func == "count" and a.col is None:
            exprs.append(F.count("*").alias(a.out))
        elif a.func == "sum":
            exprs.append(
                F.sum(F.col(a.col).cast("decimal(15,2)"))
                .cast("decimal(25,2)")
                .alias(a.out)
            )
        elif a.func == "avg":
            exprs.append(
                (
                    F.sum(F.col(a.col).cast("decimal(15,2)")).cast("double")
                    # SQL AVG divides by the NON-NULL count, not COUNT(*)
                    / F.count(F.col(a.col)).cast("double")
                ).alias(a.out)
            )
        else:
            raise ValueError(f"unsupported aggregate {a.func}")
    out = (
        base.groupBy(*group_cols).agg(*exprs)
        if group_cols
        else base.agg(*exprs)
    )
    return out, None
