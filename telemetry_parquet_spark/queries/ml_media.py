"""Queries putting the ML + multimodal surface under the driver's gate.

The media table is synthesized deterministically from ``documents`` (payload
= UTF-8 bytes of the text, kind = doc_id mod 3) so the mapInPandas decode
plumbing (datapipe/multimodal.py) runs against real Arrow batches with a
DuckDB-checkable output: ``n_bytes`` is computed INSIDE the pandas UDF from
the binary payload and must equal ``octet_length(text)`` on the oracle side,
proving the binary round-trip through Arrow. The codec itself stays stubbed
(no image/audio libs in this container) — what's verified is the Spark
contract: schema, batching, null handling, explode fan-out.

ALS (ml/recommender.py) is iterative/approximate — registered rows-only; its
numeric behavior is covered by test_ml_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

_KINDS = ["image", "audio", "video"]


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA-shaped frame: payload is the UTF-8 encoding
    of the text, kind cycles by doc_id, video duration derives from length."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(
            kind == "video", (F.octet_length("text") * 10).cast("long")
        ).alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@query(
    "mm_decoded_features",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_decoded
    FROM documents
    GROUP BY 1
    """,
)
def mm_decoded_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing under the exact gate: binary payloads →
    mapInPandas (Arrow batches) → per-kind byte totals. n_bytes/ok are
    computed inside the pandas worker from the payload bytes, so a match
    against octet_length proves the binary column survived the Arrow
    round-trip intact."""
    from telemetry_parquet_spark.datapipe import spread
    from telemetry_parquet_spark.datapipe.multimodal import decode_media

    # single-file scan = one partition = one Python decode worker; spread
    # before the CPU-bound mapInPandas stage (no-op on a real multi-split scan)
    media = spread(_media_from_documents(spark, sf_dir))
    decoded = decode_media(media)
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.col("ok").cast("long")).alias("n_decoded"),
    )


@query(
    "mm_frame_samples",
    oracle="""
    SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(ts) AS BIGINT) AS last_frame_ms
    FROM (
      SELECT doc_id, UNNEST(generate_series(0,
               CAST(octet_length(CAST(text AS BLOB)) * 10 AS BIGINT), 1000)) AS ts
      FROM documents WHERE doc_id % 3 = 2
    ) frames
    GROUP BY doc_id
    """,
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling stub (metadata-driven explode of the sampling
    timeline — the decode would slot into the same mapInPandas op): per
    video, frame count and last sampled timestamp vs generate_series."""
    from telemetry_parquet_spark.datapipe.multimodal import sample_frames

    media = _media_from_documents(spark, sf_dir)
    frames = sample_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").cast("long").alias("last_frame_ms"),
    )


@query("ml_als_recommendations")
def ml_als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS implicit-feedback recommendations (reference AddonRecommender
    pipeline, `AddonRecommender.scala:224-251`): customer×part interactions
    from lineitem, latest-order dedup, seeded ALS, top-3 per user. Iterative
    float solver → rows-only check (schema + non-empty); numeric invariants
    in tests/test_ml_multimodal.py."""
    from telemetry_parquet_spark.ml.recommender import train_recommender

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("user"),
            (F.col("l_partkey") % 100).alias("item"),
        )
        .where(F.col("user") % 7 == 0)  # sample users: keep the fit cheap
    )
    model = train_recommender(
        inter, user_col="user", item_col="item", rank=5, max_iter=5
    )
    return model.recommend_for_all_users(k=3).select(
        "user_id_hash", "rank", "item", F.round("score", 4).alias("score")
    )
