"""Implicit-feedback ALS recommender — the reference's `AddonRecommender`
(``src/main/scala/com/mozilla/telemetry/ml/AddonRecommender.scala``)
re-expressed on pyspark.ml.

Pipeline parity (file:line cites):
- latest-row-per-client window dedup (:123-130, W1) → ``latest_per_key``;
- allowlist + validity filter over exploded item arrays (:131-148, J3) →
  broadcast semi-join + column predicates (no driver-side closure capture);
- stable positive int ids for user/item (:84 ``hash & 0x7FFFFF``) →
  ``positive_id_hash`` (xxhash64-based; bit-compatibility documented out of
  scope, SURVEY §7 #5);
- ALS implicit prefs, seed 42, maxIter 20 (:224-231); optional CV grid
  (:238-249) scaled down by default — the reference's 18-combo × 10-fold
  envelope is a cost knob, not semantics;
- NaN handling: the reference's custom NaNRegressionEvaluator dropped NaN
  predictions (:232-236); pyspark ALS has coldStartStrategy='drop' built in.
- lineage truncation for the iterative solver (:199-206,221-222 Y4):
  cache + localCheckpoint before fit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.functions.hashing import positive_id_hash
from telemetry_parquet_spark.operators.dedup import latest_per_key


def build_ratings(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    allowlist: DataFrame | None = None,
    id_bits: int = 23,
) -> DataFrame:
    """(user, item) pairs → implicit ratings (1.0) with hashed int ids and
    the distinct id↔item mapping needed to decode recommendations."""
    pairs = interactions.select(user_col, item_col).where(
        F.col(user_col).isNotNull() & F.col(item_col).isNotNull()
    )
    if allowlist is not None:
        pairs = pairs.join(F.broadcast(allowlist), on=item_col, how="left_semi")
    pairs = pairs.distinct()
    return pairs.select(
        positive_id_hash(F.col(user_col), id_bits).alias("user_id_hash"),
        positive_id_hash(F.col(item_col), id_bits).alias("item_id_hash"),
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.lit(1.0).cast("float").alias("rating"),
    )


@dataclass
class RecommenderModel:
    als_model: "object"
    item_mapping: DataFrame  # item_id_hash <-> item

    def recommend_for_all_users(self, k: int = 10) -> DataFrame:
        recs = self.als_model.recommendForAllUsers(k)
        exploded = recs.select(
            F.col("user_id_hash"),
            F.posexplode("recommendations").alias("rank0", "rec"),
        ).select(
            "user_id_hash",
            (F.col("rank0") + 1).alias("rank"),
            F.col("rec.item_id_hash").alias("item_id_hash"),
            F.col("rec.rating").alias("score"),
        )
        return exploded.join(F.broadcast(self.item_mapping), "item_id_hash")


def train_recommender(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    latest_by: list | None = None,
    latest_keys: list[str] | None = None,
    allowlist: DataFrame | None = None,
    rank: int = 10,
    max_iter: int = 20,
    reg_param: float = 0.1,
    alpha: float = 10.0,
    seed: int = 42,
    cross_validate: bool = False,
) -> RecommenderModel:
    """End-to-end train: optional latest-row dedup → ratings → ALS fit.

    ``cross_validate=True`` runs a small rank×regParam grid with 3 folds
    (the reference's 18×10 envelope shrunk for the synthetic scale)."""
    try:
        from pyspark.ml.recommendation import ALS
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable in this build") from e

    df = interactions
    if latest_by and latest_keys:
        df = latest_per_key(df, keys=latest_keys, order=latest_by)
    ratings = build_ratings(df, user_col, item_col, allowlist=allowlist)
    ratings = ratings.cache().localCheckpoint()  # Y4: break lineage for the iterative solver

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        alpha=alpha,
        implicitPrefs=True,
        seed=seed,
        userCol="user_id_hash",
        itemCol="item_id_hash",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    if cross_validate:
        from pyspark.ml.evaluation import RegressionEvaluator
        from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

        grid = (
            ParamGridBuilder()
            .addGrid(als.rank, [5, 10])
            .addGrid(als.regParam, [0.01, 0.1])
            .build()
        )
        evaluator = RegressionEvaluator(
            metricName="rmse", labelCol="rating", predictionCol="prediction"
        )
        cv = CrossValidator(
            estimator=als,
            estimatorParamMaps=grid,
            evaluator=evaluator,
            numFolds=3,
            parallelism=4,
            seed=seed,
        )
        model = cv.fit(ratings).bestModel
    else:
        model = als.fit(ratings)

    mapping = ratings.select("item_id_hash", "item").distinct()
    return RecommenderModel(als_model=model, item_mapping=mapping)
