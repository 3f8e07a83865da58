"""KMV / theta sketches: mergeable distinct-count samples with SET ALGEBRA.

The sketch family the other four (HLL, CMS, Misra-Gries, log-linear
quantile) can't cover: "how many users did A AND B" needs a distinct
sketch supporting INTERSECTION, which HLL alone does not give. A KMV
(k-minimum-values) sketch keeps the k smallest hash values of the distinct
keys; treating the kth value θ as a sampling threshold makes the sample a
uniform θ-fraction of the key space, so:

- distinct(A)      ≈ (k−1) · 2^60 / θ_A          (exact when |A| < k)
- A ∩ B: θ = min(θ_A, θ_B); retained = sample hashes present in BOTH
  sides below θ; distinct ≈ |retained| · 2^60 / θ
- A ∪ B: same θ; distinct hashes of either side below θ, scaled the same.

(Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007 — the theta-sketch formulation.)

Built on the engine-portable ``md5_hash60`` (datapipe/dedup.py), the
sketch CONTENT is bit-exact cross-engine: the driver gate checks actual
(rank, hash) rows and the estimate arithmetic, not just behavior — the
same discipline as the CMS/quantile sketches.

100 TB shape: the only corpus-sized work is one distinct over
(group, key) — map-side combinable — plus a per-group top-k (rank ≤ k
window over group-partitioned data; state is k rows per group). Every set
operation afterwards runs on sketch-sized tables (k rows per group), so
cross-audience overlap matrices cost nothing at query time. Sketches
persist as tiny (group, rank, h) tables and merge by re-ranking the
unioned samples — same shape as the other mergeable families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.dedup import md5_hash60

HASH_SPACE = 1 << 60  # md5_hash60 values are uniform in [0, 2^60)


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 32
) -> DataFrame:
    """(group, rank, h): the k smallest distinct-key hashes per group —
    the persistable sketch content."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = (
        df.select(group_col, key_col)
        .distinct()
        .select(
            group_col, md5_hash60(F.col(key_col).cast("string")).alias("h")
        )
        .distinct()  # hash collisions collapse, per the sketch definition
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "rank", "h")
    )


def kmv_thetas(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """(group, n_sample, theta): θ = kth smallest hash when the sketch is
    full, else 2^60 (the sample IS the full key set)."""
    return sketch.groupBy(group_col).agg(
        F.count("*").alias("n_sample"),
        F.when(F.count("*") >= k, F.max("h"))
        .otherwise(F.lit(HASH_SPACE))
        .alias("theta"),
    )


def kmv_distinct_estimates(
    sketch: DataFrame, group_col: str, k: int
) -> DataFrame:
    """(group, est_distinct): (k−1)·2^60/θ for full sketches, the exact
    sample size otherwise. Deterministic — rounded to 6dp."""
    t = kmv_thetas(sketch, group_col, k)
    return t.select(
        group_col,
        F.round(
            F.when(
                F.col("n_sample") >= k,
                F.lit(float(k - 1))
                * (F.lit(float(HASH_SPACE)) / F.col("theta").cast("double")),
            ).otherwise(F.col("n_sample").cast("double")),
            6,
        ).alias("est_distinct"),
    )


def kmv_pair_set_estimates(
    sketch: DataFrame, group_col: str, k: int
) -> DataFrame:
    """(group_a, group_b, n_retained, est_intersection, est_union) for
    every unordered group pair — the audience-overlap matrix, computed
    entirely on sketch-sized tables."""
    t = kmv_thetas(sketch, group_col, k)
    ta = t.select(
        F.col(group_col).alias("group_a"), F.col("theta").alias("ta")
    )
    tb = t.select(
        F.col(group_col).alias("group_b"), F.col("theta").alias("tb")
    )
    pairs = ta.join(tb, F.col("group_a") < F.col("group_b")).select(
        "group_a", "group_b", F.least("ta", "tb").alias("theta")
    )
    sa = sketch.select(F.col(group_col).alias("group_a"), "h")
    sb = sketch.select(F.col(group_col).alias("group_b"), "h")
    inter = (
        pairs.join(sa, "group_a")
        .join(sb, ["group_b", "h"])
        .where(F.col("h") < F.col("theta"))
        .groupBy("group_a", "group_b", "theta")
        .agg(F.count("*").alias("n_retained"))
    )
    side_a = (
        pairs.join(sa, "group_a")
        .where(F.col("h") < F.col("theta"))
        .select("group_a", "group_b", "h")
    )
    side_b = (
        pairs.join(sb, "group_b")
        .where(F.col("h") < F.col("theta"))
        .select("group_a", "group_b", "h")
    )
    uni = (
        side_a.union(side_b)
        .distinct()
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("n_union"))
    )
    scale = F.lit(float(HASH_SPACE)) / F.col("theta").cast("double")
    return (
        pairs.join(inter.drop("theta"), ["group_a", "group_b"], "left")
        .join(uni, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)).cast("double") * scale, 6
            ).alias("est_intersection"),
            F.round(
                F.coalesce("n_union", F.lit(0)).cast("double") * scale, 6
            ).alias("est_union"),
        )
    )
