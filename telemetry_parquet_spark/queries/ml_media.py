"""Queries putting the ML + multimodal surface under the driver's gate.

The media table is synthesized deterministically from ``documents``: the
text's UTF-8 bytes become REAL media payloads — an 8-bit-PCM WAV for audio
rows, a 24-bpp BMP (gray pixels) for image rows, a TPSV frame container for
video rows (kind cycles by doc_id mod 3; documents text is pure ASCII at
every test sf, so byte value == codepoint). ``decode_media`` then parses
those payloads back with the pure-Python struct codecs
(datapipe/multimodal.py) and the oracle recomputes the decoded facts —
sample counts, pixel dimensions, frame counts, and the content byte-sum —
from the text in DuckDB. A hash match proves encode → Arrow → parse →
feature round-trips byte-exactly, not just that the plumbing ran.

ALS (ml/recommender.py) is iterative/approximate — registered rows-only; its
numeric behavior is covered by test_ml_multimodal.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

_KINDS = ["image", "audio", "video"]


@F.pandas_udf(T.BinaryType())
def _synthesize_payload(kind: pd.Series, text: pd.Series) -> pd.Series:
    """text → real container bytes per kind (encoders are deterministic)."""
    from telemetry_parquet_spark.datapipe.multimodal import (
        encode_bmp,
        encode_tpsv,
        encode_wav,
    )

    enc = {"image": encode_bmp, "audio": encode_wav, "video": encode_tpsv}
    return pd.Series(
        [
            None if t is None else enc[k](t.encode("utf-8"))
            for k, t in zip(kind, text)
        ]
    )


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → MEDIA_SCHEMA-shaped frame: payload is a real WAV/BMP/TPSV
    container built from the text bytes, kind cycles by doc_id."""
    from telemetry_parquet_spark.datapipe.multimodal import TPSV_FRAME_MS

    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    mime = F.element_at(
        F.array(F.lit("image/bmp"), F.lit("audio/wav"), F.lit("video/x-tpsv")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    # encoders emit at least one frame/row even for empty payloads — the
    # metadata must agree (see encode_bmp/encode_tpsv clamps)
    n_frames = F.greatest(F.lit(1), F.ceil(F.octet_length("text") / 16)).cast("long")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(kind == "video", n_frames * TPSV_FRAME_MS).alias("duration_ms"),
        _synthesize_payload(kind, F.col("text")).alias("payload"),
    )


@query(
    "mm_decoded_features",
    oracle="""
    WITH d AS (
      SELECT CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             length(text) AS n,
             list_aggregate(list_transform(range(1, length(text) + 1),
                                           i -> ord(substr(text, i, 1))),
                            'sum') AS csum
      FROM documents
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(COUNT(*) AS BIGINT) AS n_decoded,
           CAST(SUM(csum) AS BIGINT) AS total_content_sum,
           CAST(SUM(CASE WHEN kind = 'audio' THEN n END) AS BIGINT)
             AS total_samples,
           CAST(SUM(CASE WHEN kind = 'image'
                         THEN 16 * GREATEST(1, (n + 15) // 16) END)
                AS BIGINT) AS total_pixels,
           CAST(SUM(CASE WHEN kind = 'video' THEN GREATEST(1, (n + 15) // 16) END)
                AS BIGINT) AS total_frames
    FROM d GROUP BY kind
    """,
)
def mm_decoded_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode under the exact gate: real WAV/BMP/TPSV payloads →
    mapInPandas struct parsers → per-kind decoded totals. content_sum,
    n_samples, width×height, and n_frames are computed inside the pandas
    worker FROM THE PARSED PAYLOAD, so the oracle match proves the codec
    path (header walk, row-padding skip, frame directory), not just Arrow
    transport."""
    from telemetry_parquet_spark.datapipe import spread
    from telemetry_parquet_spark.datapipe.multimodal import decode_media

    # single-file scan = one partition = one Python decode worker; spread
    # before the CPU-bound mapInPandas stage (no-op on a real multi-split scan)
    media = spread(_media_from_documents(spark, sf_dir))
    decoded = decode_media(media)
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("ok").cast("long")).alias("n_decoded"),
        F.sum("content_sum").alias("total_content_sum"),
        F.sum("n_samples").alias("total_samples"),
        F.sum(
            F.col("width").cast("long") * F.col("height").cast("long")
        ).alias("total_pixels"),
        F.sum(F.col("n_frames").cast("long")).alias("total_frames"),
    )


@query(
    "mm_frame_samples",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(GREATEST(1, (length(text) + 15) // 16) AS BIGINT) AS n_frames,
           CAST((GREATEST(1, (length(text) + 15) // 16) - 1) * 40 AS BIGINT)
             AS last_frame_ms,
           CAST(COALESCE(list_aggregate(
                  list_transform(range(1, length(text) + 1),
                                 i -> ord(substr(text, i, 1))),
                  'sum'), 0) AS BIGINT) AS total_frame_sum
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame extraction: TPSV payloads decoded in mapInPandas, one row
    per frame with its byte checksum; per video, frame count, last frame
    timestamp, and the total checksum (zero padding contributes nothing, so
    it must equal the text byte-sum recomputed by DuckDB)."""
    from telemetry_parquet_spark.datapipe.multimodal import sample_frames

    media = _media_from_documents(spark, sf_dir)
    frames = sample_frames(media, every_n=1)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ms"),
        F.sum("frame_sum").alias("total_frame_sum"),
    )


@query(
    "mm_image_near_dup",
    oracle="""
    WITH img AS (
      SELECT doc_id, text, length(text) AS n,
             16 * GREATEST(1, (length(text) + 15) // 16) AS m
      FROM documents WHERE doc_id % 3 = 0
    ), bytes AS (
      SELECT doc_id, m,
        list_transform(range(0, m),
          i -> CASE WHEN i < n
                    THEN ord(substr(text, CAST(i + 1 AS INT), 1))
                    ELSE 0 END) AS b
      FROM img
    ), fp AS (
      SELECT doc_id,
        list_transform(range(0, 64), j ->
          CASE WHEN j < m AND
            CAST(list_sum(list_filter(b, (x, i) -> (i - 1) % 64 = j)) AS DOUBLE)
              / len(list_filter(b, (x, i) -> (i - 1) % 64 = j))
            > CAST(list_sum(b) AS DOUBLE) / m
          THEN 1 ELSE 0 END) AS bits
      FROM bytes
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(list_sum(list_transform(range(1, 65),
                    k -> CASE WHEN a.bits[CAST(k AS INT)]
                                != b.bits[CAST(k AS INT)]
                              THEN 1 ELSE 0 END)) AS INT) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup: decode BMP payloads → 64-bit aHash
    (stripe-mean threshold over the decoded gray pixels) → the SAME
    pigeonhole chunk-bucket Hamming join the SimHash text path uses
    (``dedup.hamming_pairs``, 16-bit chunks — the 100 TB blocking config).
    Unlike SimHash's xxhash64 bit-votes, aHash is pure arithmetic on the
    decoded content, so DuckDB replays the full pipeline — decode, stripe
    means, fingerprint, Hamming — exactly, putting a multimodal near-dup
    operator under the byte-exact gate."""
    from telemetry_parquet_spark.datapipe import spread
    from telemetry_parquet_spark.datapipe.dedup import hamming_pairs
    from telemetry_parquet_spark.datapipe.multimodal import image_ahash

    media = spread(_media_from_documents(spark, sf_dir))
    fps = image_ahash(media)
    return hamming_pairs(
        fps, id_col="media_id", fp_col="ahash", max_hamming=3, chunks=4
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


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


# --- ALS exactness gate -----------------------------------------------------
# ml_als_recommendations is rows-only (iterative float solver); this sibling
# is the exact gate: train ALS on a block-separable synthetic preference
# structure derived from the REAL tables, measure precision@k against the
# exact preference ranking RELATIONALLY, and emit a thresholded verdict the
# DuckDB oracle restates from the same tables. If the solver were broken
# (random factors ≈ 1/G in-block precision ≈ 0.125), every floor_met row
# flips FALSE and the driver check goes red — the sim_adc_recall_eval
# pattern applied to the one remaining run-only component.

ALS_GROUPS = 8  # preference blocks
ALS_IDS = 64  # users = custkeys < 64, items = partkeys < 64
ALS_K = 5  # recommendations per user
ALS_FLOOR = 0.6  # avg in-block precision@5 floor (working ALS ≈ 1.0)


@query(
    "ml_als_recall_eval",
    oracle=f"""
    WITH u AS (
      SELECT c_custkey % {ALS_GROUPS} AS grp
      FROM customer WHERE c_custkey < {ALS_IDS}
    )
    SELECT CAST(grp AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS users,
           TRUE AS floor_met
    FROM u GROUP BY grp ORDER BY grp
    """,
)
def ml_als_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS quality gate under an exact oracle. Fixture: users (custkeys
    < {ALS_IDS}) and items (partkeys < {ALS_IDS}) in {ALS_GROUPS} hash
    blocks; each user interacts with exactly the items of their own block,
    so the exact preference ranking is relational (in-block = preferred).
    Seeded implicit ALS trains on those interactions; per-user
    precision@{ALS_K} of ``recommendForAllUsers`` against in-block
    membership is averaged per block and thresholded at {ALS_FLOOR} —
    block-separable preferences put working-ALS precision at ≈ 1.0 while
    broken factors sit near 1/{ALS_GROUPS}, so the boolean is stable
    despite the float solver. Scale: the fixture is deliberately tiny (the
    gate's job is solver correctness); the production path's 100 TB story
    is the ratings build (broadcast allowlist semi-join + hashed ids,
    ml/recommender.py) which this query exercises end-to-end."""
    from telemetry_parquet_spark.ml.recommender import (
        build_ratings,
        train_recommender,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .where(F.col("c_custkey") < ALS_IDS)
    )
    part = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey")
        .where(F.col("p_partkey") < ALS_IDS)
    )
    inter = (
        cust.crossJoin(F.broadcast(part))
        .where(F.col("c_custkey") % ALS_GROUPS == F.col("p_partkey") % ALS_GROUPS)
        .select(
            F.col("c_custkey").alias("user"), F.col("p_partkey").alias("item")
        )
    )
    model = train_recommender(
        inter, user_col="user", item_col="item", rank=ALS_GROUPS, max_iter=10
    )
    user_map = (
        build_ratings(inter, "user", "item")
        .select("user_id_hash", "user")
        .distinct()
    )
    recs = model.recommend_for_all_users(k=ALS_K).join(
        F.broadcast(user_map), "user_id_hash"
    )
    per_user = recs.groupBy("user").agg(
        F.avg(
            (F.col("user") % ALS_GROUPS == F.col("item") % ALS_GROUPS).cast(
                "double"
            )
        ).alias("prec")
    )
    return (
        per_user.groupBy((F.col("user") % ALS_GROUPS).alias("grp"))
        .agg(
            F.count("*").alias("users"),
            (F.avg("prec") >= F.lit(ALS_FLOOR)).alias("floor_met"),
        )
        .select(
            F.col("grp").cast("bigint").alias("grp"),
            F.col("users").cast("bigint").alias("users"),
            "floor_met",
        )
        .orderBy("grp")
    )
