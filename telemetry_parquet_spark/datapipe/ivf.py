"""IVF (inverted-file) approximate nearest neighbor — the clustered scale
path for similarity search, alongside the hyperplane-LSH variant
(datapipe/similarity.py).

Build: KMeans (pyspark.ml) over a sample → centroid table (tiny, broadcast).
Assign: each corpus vector to its nearest centroid (one pass, JVM-side fold).
Query: probe the ``nprobe`` nearest centroids, exact-rescore only vectors in
those cells — at 100 TB the probe prunes the corpus by ~n_cells/nprobe while
the centroid table stays a broadcast literal.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.similarity import cosine, dot


@dataclass
class IVFIndex:
    assigned: DataFrame      # corpus + cell_id
    centroids: list[list[float]]
    id_col: str
    vec_col: str


def _nearest_centroid(vec: F.Column, centroids: list[list[float]]):
    """Argmin over squared L2 distance to each centroid.

    The centroid table is a literal ``array<struct<d2_bias, c>>`` column and
    the argmin is ONE ``transform`` + ``array_min`` over it — the generated
    code is constant-size regardless of n_cells (a chained CASE WHEN per
    centroid, the naive form, blows past the JVM codegen limits and falls
    back to interpreted mode at the thousands of cells a 100 TB index
    needs). ``dot(vec, vec)`` is constant per row, so the comparison key is
    ``dot(c, c) - 2*dot(vec, c)``; struct ordering breaks exact-distance
    ties by the lower cell id, matching the sequential-scan argmin."""
    cent = F.array(
        *[
            F.struct(
                F.lit(float(sum(x * x for x in c))).alias("cc"),
                F.lit(i).alias("id"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    scored = F.transform(
        cent,
        lambda s: F.struct(
            (s["cc"] - 2 * dot(vec, s["c"])).alias("d"), s["id"].alias("id")
        ),
    )
    return F.array_min(scored)["id"]


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 8,
) -> IVFIndex:
    """KMeans the (sampled) corpus into cells; assign every vector.

    ``max_iter`` defaults well below KMeans convergence: IVF cells only
    need a balanced partition of the space, not converged centroids —
    recall comes from nprobe, and the full-probe == brute-force exactness
    gate holds for ANY assignment. Each extra iteration is a full pass
    over the training sample (a distributed job per iteration)."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable") from e

    train = corpus if sample_fraction is None else corpus.sample(
        fraction=sample_fraction, seed=seed
    )
    feat = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(feat)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    assigned = corpus.withColumn(
        "cell_id", _nearest_centroid(F.col(vec_col).cast("array<double>"), centroids)
    )
    return IVFIndex(assigned=assigned, centroids=centroids, id_col=id_col, vec_col=vec_col)


def ivf_top_k(
    index: IVFIndex,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the ``nprobe`` centroids nearest the query, exact-rescore their
    cells, return top-k (cosine, deterministic tie-break)."""

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe_cells = sorted(
        range(len(index.centroids)),
        key=lambda i: d2(index.centroids[i], query_vec),
    )[:nprobe]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cells = index.assigned.where(F.col("cell_id").isin(probe_cells))
    return (
        cells.select(
            F.col(index.id_col),
            F.round(cosine(F.col(index.vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(index.id_col))
        .limit(k)
    )
