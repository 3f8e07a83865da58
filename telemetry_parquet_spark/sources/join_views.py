"""Materialized JOIN views (star rollups) with incremental maintenance.

``views.py`` maintains single-table rollups; real reporting views are
usually ``fact ⋈ dim`` rollups. This module materializes
``(fact ⋈ dim).groupBy(group_cols).agg(COUNT, SUM(measures))`` as a
snapshot table and keeps it fresh from the COMMIT LOGS of both bases:

- **fact changes** (append, COW delete, MOR delete — anything
  ``table_changes`` expresses as signed inserts/deletes) refresh
  INCREMENTALLY: the signed delta joins the dim PINNED at the view's
  recorded dim version, aggregates, and full-outer-merges into the
  state — cost ∝ change volume ⋈ dim, never the fact table. This is
  the classic ΔF ⋈ D term of incremental view maintenance; at 100 TB
  the fact table is never rescanned for an append.
- **dim changes** re-weight fact rows already folded into the state, so
  the delta algebra cannot express them against a rollup that discarded
  the join keys — the refresh falls back to ONE full recompute and says
  so (``mode='full'``): honest, loud, and still only one scan. (The
  standard trade: Materialize keeps join keys in arrangements to avoid
  this; a rollup view deliberately does not.)

Each refresh commits as an atomic ``overwrite`` version of the view's
own snapshot table — time-travelable, CDC-able, vacuum-managed like any
other table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S


def _state(
    spark: SparkSession,
    fact_root: str,
    dim_root: str,
    fact_v: int,
    dim_v: int,
    on: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    cast_to: str,
) -> DataFrame:
    fact = S.read_snapshot(spark, fact_root, fact_v)
    dim = S.read_snapshot(spark, dim_root, dim_v)
    return (
        fact.join(dim, on=on, how="inner")
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_rows"),
            *[
                F.sum(F.col(c).cast(cast_to)).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
    )


def create_join_view(
    spark: SparkSession,
    fact_root: str,
    dim_root: str,
    view_root: str,
    on: list[str],
    group_cols: list[str],
    sum_cols: str | list[str],
    cast_to: str = "decimal(15,2)",
) -> int:
    """Materialize the fact⋈dim rollup at both tables' heads and commit
    it (with its defining metadata) as version 1 of the view table."""
    cols = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    fact_v = S.latest_version(fact_root)
    dim_v = S.latest_version(dim_root)
    state = _state(
        spark, fact_root, dim_root, fact_v, dim_v,
        on, group_cols, cols, cast_to,
    )
    return S.overwrite(
        spark,
        view_root,
        state,
        extra={
            "jv_fact_root": fact_root,
            "jv_dim_root": dim_root,
            "jv_on": list(on),
            "jv_group_cols": list(group_cols),
            "jv_sum_cols": cols,
            "jv_cast_to": cast_to,
            "jv_fact_version": fact_v,
            "jv_dim_version": dim_v,
        },
    )


def join_view_info(view_root: str) -> dict:
    m = S.read_manifest(view_root, S.latest_version(view_root))
    if "jv_fact_root" not in m:
        raise ValueError(f"{view_root} is not a materialized join view")
    return m


def refresh_join_view(
    spark: SparkSession, view_root: str
) -> tuple[int, str]:
    """Catch the join view up to both bases' heads. Returns
    ``(view_version, mode)`` with mode ``'noop'`` (already fresh),
    ``'incremental'`` (fact delta ⋈ pinned dim merged into the state —
    change-volume-sized), or ``'full'`` (dim moved: one recompute)."""
    m = join_view_info(view_root)
    fact_root, dim_root = m["jv_fact_root"], m["jv_dim_root"]
    from_f, from_d = m["jv_fact_version"], m["jv_dim_version"]
    to_f = S.latest_version(fact_root)
    to_d = S.latest_version(dim_root)
    if (to_f, to_d) == (from_f, from_d):
        return S.latest_version(view_root), "noop"
    meta = {
        k: m[k]
        for k in (
            "jv_fact_root", "jv_dim_root", "jv_on", "jv_group_cols",
            "jv_sum_cols", "jv_cast_to",
        )
    }
    meta["jv_fact_version"], meta["jv_dim_version"] = to_f, to_d
    groups, cast_to = m["jv_group_cols"], m["jv_cast_to"]
    if to_d != from_d:
        # dim change re-weights folded fact rows: full recompute, loudly
        state = _state(
            spark, fact_root, dim_root, to_f, to_d,
            m["jv_on"], groups, m["jv_sum_cols"], cast_to,
        )
        return (
            S.overwrite(spark, view_root, state, extra=meta),
            "full",
        )
    changes = S.table_changes(spark, fact_root, from_f, to_f)
    dim = S.read_snapshot(spark, dim_root, from_d)
    sign = F.when(
        F.col("_change") == F.lit("insert"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        changes.join(dim, on=m["jv_on"], how="inner")
        .groupBy(*groups)
        .agg(
            F.sum(sign).alias("__d_cnt"),
            *[
                F.sum(F.col(c).cast(cast_to) * sign).alias(f"__d_sum_{c}")
                for c in m["jv_sum_cols"]
            ],
        )
    )
    state = S.read_snapshot(spark, view_root)
    merged = [
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("__d_cnt"), F.lit(0))
        ).alias("n_rows")
    ]
    for c in m["jv_sum_cols"]:
        name = f"sum_{c}"
        zero = F.lit(0).cast(delta.schema[f"__d_sum_{c}"].dataType)
        merged.append(
            (
                F.coalesce(F.col(name), zero)
                + F.coalesce(F.col(f"__d_sum_{c}"), zero)
            )
            # cast back to the STATE column's type: decimal addition
            # widens (25,2 -> 37,2 -> 38,2 per refresh), and a schema
            # that drifts between view versions breaks cross-version
            # reads (table_changes reads both sides under one schema)
            # and flips back on every full recompute
            .cast(state.schema[name].dataType)
            .alias(name)
        )
    new_state = (
        state.join(delta, on=groups, how="full_outer")
        .select(*groups, *merged)
        .where(F.col("n_rows") > 0)
    )
    return (
        S.overwrite(spark, view_root, new_state, extra=meta),
        "incremental",
    )


def read_join_view(
    spark: SparkSession, view_root: str, auto_refresh: bool = True
) -> DataFrame:
    """The rollup state, never stale: a read catches the view up first
    (``auto_refresh``) or raises when it would serve an answer older
    than either base's head."""
    m = join_view_info(view_root)
    stale = (
        S.latest_version(m["jv_fact_root"]) != m["jv_fact_version"]
        or S.latest_version(m["jv_dim_root"]) != m["jv_dim_version"]
    )
    if stale:
        if not auto_refresh:
            raise RuntimeError(
                f"join view {view_root} is stale and auto_refresh is off"
            )
        refresh_join_view(spark, view_root)
    return S.read_snapshot(spark, view_root)
