"""Deterministic integer-exact Lloyd's k-means — the fourth exactly-oracled
iterative algorithm (after PageRank, BPE, label propagation).

``pyspark.ml`` KMeans (used by the IVF index build, datapipe/ivf.py:96) is
the production clustering path but its float sum-order and RNG make it
unreplayable cross-engine, so everything downstream of it is rows-only
gated. THIS module restates Lloyd's iteration over exact integers so a
DuckDB recursive CTE replays every assignment and centroid bit for bit:

- vectors are quantized once: ``q = floor(x * 10^6 + 0.5)`` per component
  (double multiply+add+floor, fixed order per element — IEEE-identical in
  any engine; |x| < 1 keeps |q| <= 10^6).
- distances are exact int64: ``d2 = sum((q_i - c_i)^2)`` <= 64 * (2*10^6)^2
  ~ 2.6*10^14 — order-free integer sums.
- argmin uses the label-propagation packed trick: ``min(d2 * k + cid)``
  (exact lexicographic (d2, cid) min — deterministic tie-break on the
  lowest cluster id; max packed value ~ 2*10^15 << 2^63).
- centroid update is ``floor(sum / count + 0.5)`` per component: the int64
  sum (< 2^53, exactly representable) divided as IEEE double, identical in
  Spark, DuckDB, and driver-side Python.
- init is RNG-free: the k vectors with the lowest ids are the seeds.

Clusters may go empty (a duplicate seed's points all tie to the lower id);
an empty cluster simply drops out of the centroid table — identically in
both engines — which is standard Lloyd behavior, not a divergence.

Scale: the corpus is touched once per iteration by a MAP-ONLY assignment
(centroids ride along as literal arrays — k*dim values, collected per
iteration exactly like BPE's argmax rows: a driver-sized contract, T
round-trips total) followed by one map-side-combinable (cid, dim) sum
whose shuffle is k*dim rows. No join, no corpus-sized shuffle. For
hundreds-of-cells indexes the assignment switches (``assignment='auto'``,
k*dim > MATMUL_THRESHOLD) to ``_matmul_assign_udf`` — the int64 numpy
matmul analog of the IVF build's float scorer (datapipe/ivf.py:71) —
which computes the SAME packed min(d2*k + cid) integers, so the two
paths are bit-identical (equality-gated in tests/test_kmeans_det.py)
and the per-iteration codegen recompile cost no longer grows with k.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000

# Above this k*dim the per-centroid codegen expression is the wrong tool:
# the generated argmin chain recompiles every iteration and grows with k
# (measured ~90% of wall at k=8 already compile, BENCH r08 notes), while
# the int64 numpy matmul amortizes to one Arrow batch pass. 4096 = 64
# cells at dim 64, the same knee the float IVF build uses (ivf.py).
MATMUL_THRESHOLD = 4096


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """(id, qv): the integer-quantized vectors every iteration reuses."""
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)),
        ).alias("qv"),
    )


def _packed_argmin(centroids: list[tuple[int, list[int]]], k: int):
    """min over centroids of (d2 * k + cid) — one codegen expression, no
    join, no shuffle; d2 is an order-free exact integer fold per centroid."""
    packed = []
    for cid, vec in centroids:
        lit_vec = F.array(*[F.lit(int(v)) for v in vec])
        d2 = F.aggregate(
            F.zip_with(F.col("qv"), lit_vec, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        packed.append(d2 * F.lit(k) + F.lit(cid))
    return F.least(*packed) if len(packed) > 1 else packed[0]


def _matmul_assign_udf(centroids: list[tuple[int, list[int]]], k: int):
    """The hundreds-of-cells assignment: one int64 numpy matmul per Arrow
    batch, BIT-IDENTICAL to ``_packed_argmin`` (equality-gated in
    tests/test_kmeans_det.py). All arithmetic stays in int64 — d2 via
    |q|² − 2·q·c + |c|² (≤ 64·(2·10⁶)² ≈ 2.6·10¹⁴), the argmin via the
    SAME packed min(d2·k + cid) integers the expression path folds — so
    there is no float summation order to diverge on, and the lowest-cid
    tie-break is the packed min itself, not np.argmin's first-hit."""
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cm = np.array([v for _, v in centroids], dtype=np.int64)  # (k', dim)
    cc = (cm * cm).sum(axis=1)  # (k',) int64

    @F.pandas_udf("long")
    def assign(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.int64) for v in qv])
        d2 = (m * m).sum(axis=1)[:, None] - 2 * (m @ cm.T) + cc[None, :]
        packed = d2 * np.int64(k) + cids[None, :]
        return pd.Series(packed.min(axis=1) % np.int64(k))

    return assign


def kmeans_fit(
    qvec: DataFrame, k: int = 8, iters: int = 4, assignment: str = "auto"
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iters`` Lloyd iterations; return (final assignment DataFrame
    with columns (vec_id, cluster_id), final centroid list).

    Iteration t assigns every point to the nearest current centroid, then
    recomputes centroids from that assignment; the returned assignment is
    the one that PRODUCED the returned centroids (same convention as the
    recursive oracle).

    ``assignment`` picks the per-point argmin implementation — "expr"
    (literal-centroid codegen fold), "matmul" (int64 numpy pandas_udf),
    or "auto" (matmul once k*dim > MATMUL_THRESHOLD). The two paths are
    bit-identical by construction (same packed int64 min), so the choice
    is purely a performance knob."""
    if assignment not in ("auto", "expr", "matmul"):
        raise ValueError(f"unknown assignment mode {assignment!r}")
    if iters < 1:
        raise ValueError(f"kmeans_fit requires iters >= 1, got {iters}")
    qvec = qvec.persist()
    try:
        # "k vectors with the lowest ids" — robust to sparse/hashed ids,
        # unlike a `vec_id < k` filter which silently under-seeds.
        seeds = qvec.orderBy("vec_id").limit(k).collect()
        if len(seeds) < k:
            raise ValueError(
                f"kmeans_fit: need >= {k} input vectors, got {len(seeds)}"
            )
        # Renumber seeds 0..k-1 in vec_id order: _packed_argmin packs the
        # cluster id into d2*k + cid, which requires cid < k.
        centroids = [
            (i, vec)
            for i, (_, vec) in enumerate(
                sorted((int(r.vec_id), [int(v) for v in r.qv]) for r in seeds)
            )
        ]
        dim = len(centroids[0][1])
        use_matmul = assignment == "matmul" or (
            assignment == "auto" and k * dim > MATMUL_THRESHOLD
        )
        assigned = None
        for _ in range(iters):
            if use_matmul:
                cid = _matmul_assign_udf(centroids, k)(F.col("qv")).alias(
                    "cluster_id"
                )
            else:
                cid = (_packed_argmin(centroids, k) % F.lit(k)).alias(
                    "cluster_id"
                )
            assigned = qvec.select("vec_id", "qv", cid)
            sums = (
                assigned.select(
                    "cluster_id", F.posexplode("qv").alias("dim", "qval")
                )
                .groupBy("cluster_id", "dim")
                .agg(F.sum("qval").alias("s"), F.count("*").alias("c"))
                .collect()  # <= k*dim rows — driver-sized by contract
            )
            by_cid: dict[int, dict[int, int]] = {}
            for r in sums:
                by_cid.setdefault(int(r.cluster_id), {})[int(r.dim)] = (
                    int(math.floor(r.s / r.c + 0.5))
                )
            centroids = sorted(
                (cid_, [comps[d] for d in sorted(comps)])
                for cid_, comps in by_cid.items()
            )
        return assigned.select("vec_id", "cluster_id"), centroids
    finally:
        qvec.unpersist()


def kmeans_centroid_table(assigned: DataFrame, qvec: DataFrame) -> DataFrame:
    """(cluster_id, dim_idx, centroid_q, n_points): the centroid relation
    derived from a final assignment — the persistable model state."""
    return (
        assigned.join(qvec, "vec_id")
        .select("cluster_id", F.posexplode("qv").alias("dim0", "qval"))
        .groupBy("cluster_id", (F.col("dim0") + 1).cast("int").alias("dim_idx"))
        .agg(
            F.floor(F.sum("qval") / F.count("*") + F.lit(0.5))
            .cast("long")
            .alias("centroid_q"),
            F.count("*").alias("n_points"),
        )
    )
