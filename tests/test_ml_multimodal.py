"""ALS recommender + multimodal plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_recommender_end_to_end(spark):
    """Synthetic two-cluster preference structure: ALS must recommend
    within-cluster items the user hasn't interacted with."""
    from telemetry_parquet_spark.ml.recommender import train_recommender

    rows = []
    # cluster A: users a0..a9 like items i0..i4 (each missing one), cluster B
    # likes i5..i9
    for u in range(10):
        for i in range(5):
            if i != u % 5:
                rows.append((f"a{u}", f"i{i}", "20240101"))
    for u in range(10):
        for i in range(5, 10):
            if i - 5 != u % 5:
                rows.append((f"b{u}", f"i{i}", "20240101"))
    df = spark.createDataFrame(rows, ["client_id", "item_id", "submission_date_s3"])

    model = train_recommender(
        df, user_col="client_id", item_col="item_id", rank=8, max_iter=10
    )
    recs = model.recommend_for_all_users(k=3)
    assert {"user_id_hash", "rank", "item_id_hash", "score", "item"} <= set(recs.columns)

    # decode a known user: a0 is missing i0 from cluster A — its top recs
    # must come from cluster A's items
    from telemetry_parquet_spark.functions.hashing import positive_id_hash

    a0_hash = (
        spark.createDataFrame([("a0",)], ["u"])
        .select(positive_id_hash("u").alias("h"))
        .first()
        .h
    )
    a0_items = {r.item for r in recs.where(F.col("user_id_hash") == a0_hash).collect()}
    assert a0_items, "a0 got no recommendations"
    assert a0_items <= {f"i{i}" for i in range(5)}, a0_items


def test_recommender_latest_dedup_and_allowlist(spark):
    from telemetry_parquet_spark.ml.recommender import build_ratings

    df = spark.createDataFrame(
        [("c1", "x", "1"), ("c1", "x", "2"), ("c2", "y", "1"), ("c2", "z", "1")],
        ["client_id", "item_id", "day"],
    )
    allow = spark.createDataFrame([("x",), ("y",)], ["item_id"])
    ratings = build_ratings(df, "client_id", "item_id", allowlist=allow)
    pairs = {(r.user, r.item) for r in ratings.collect()}
    assert pairs == {("c1", "x"), ("c2", "y")}  # z filtered, duplicates collapsed


def test_codecs_roundtrip_pure_python():
    """encode→decode is byte-exact for every container, without Spark."""
    from telemetry_parquet_spark.datapipe.multimodal import (
        decode_payload,
        encode_bmp,
        encode_tpsv,
        encode_wav,
    )

    data = b"hello multimodal world, 0123456789" * 3

    wav = decode_payload(encode_wav(data, sample_rate=8000))
    assert wav["format"] == "wav"
    assert wav["sample_rate"] == 8000
    assert wav["n_samples"] == len(data)
    assert wav["content"] == data
    assert wav["content_sum"] == sum(data)

    bmp = decode_payload(encode_bmp(data, width=16))
    assert bmp["format"] == "bmp"
    assert bmp["width"] == 16
    assert bmp["height"] == (len(data) + 15) // 16
    assert bmp["content"][: len(data)] == data  # zero padding after
    assert bmp["content_sum"] == sum(data)

    vid = decode_payload(encode_tpsv(data))
    assert vid["format"] == "tpsv"
    assert vid["n_frames"] == (len(data) + 15) // 16
    assert vid["content"] == data
    assert len(vid["frames"]) == vid["n_frames"]
    assert all(len(f) == 16 for f in vid["frames"])

    # odd BMP width exercises the per-row 4-byte stride padding skip
    bmp5 = decode_payload(encode_bmp(data, width=5))
    assert bmp5["width"] == 5 and bmp5["content_sum"] == sum(data)

    # corrupt / truncated / foreign payloads: None, never an exception
    assert decode_payload(None) is None
    assert decode_payload(b"") is None
    assert decode_payload(b"\x89PNG not actually supported") is None
    assert decode_payload(encode_wav(data)[:30]) is None  # truncated header
    assert decode_payload(encode_wav(data)[:-5]) is None  # truncated samples
    assert decode_payload(encode_tpsv(data)[:-3]) is None  # truncated frame
    assert decode_payload(encode_bmp(data)[:-7]) is None  # truncated pixels


def test_decode_media_plumbing(spark):
    from telemetry_parquet_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_tpsv,
        encode_wav,
        media_repartition_by_bytes,
        sample_frames,
    )

    audio = bytes(range(48))
    video = bytes(range(40))  # 3 frames: 16 + 16 + 8(+pad)
    rows = [
        (1, "audio", "audio/wav", None, None, None, encode_wav(audio)),
        (2, "image", "image/png", 2, 2, None, None),  # null payload
        (3, "video", "video/x-tpsv", None, None, 120, encode_tpsv(video)),
        (4, "image", "image/bmp", None, None, None, b"BM garbage"),  # corrupt
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    decoded = decode_media(df, feature_dim=4)
    got = {r.media_id: r for r in decoded.collect()}
    assert got[1].ok and got[1].format == "wav"
    assert got[1].n_samples == 48 and got[1].sample_rate == 8000
    assert got[1].content_sum == sum(audio)
    assert len(got[1].feature) == 4
    assert not got[2].ok and got[2].feature is None
    assert got[3].ok and got[3].n_frames == 3 and got[3].duration_ms == 120
    assert not got[4].ok  # corrupt BMP skipped, not raised
    # determinism: same payload -> same feature
    again = {r.media_id: r for r in decode_media(df, feature_dim=4).collect()}
    assert again[1].feature == got[1].feature

    frames = sample_frames(df).orderBy("frame_idx").collect()
    assert [r.frame_ts_ms for r in frames] == [0, 40, 80]
    assert [r.frame_sum for r in frames] == [
        sum(video[:16]), sum(video[16:32]), sum(video[32:]),
    ]

    assert media_repartition_by_bytes(df).count() == 4


def test_media_metadata_query_prunes_payload_column(spark, tmp_path):
    """The payload rides in its own binary column so metadata-only queries
    never read the bytes: the parquet scan's ReadSchema must exclude
    payload — at PB scale this is the difference between a metadata agg
    touching kilobytes and touching everything."""
    from telemetry_parquet_spark.datapipe.multimodal import MEDIA_SCHEMA, encode_wav
    from telemetry_parquet_spark.plans.explain import read_schema_columns

    rows = [
        (i, "audio", "audio/wav", None, None, None, encode_wav(bytes([i]) * 100))
        for i in range(20)
    ]
    path = str(tmp_path / "media")
    spark.createDataFrame(rows, schema=MEDIA_SCHEMA).write.parquet(path)

    media = spark.read.parquet(path)
    meta_query = media.groupBy("kind").count()
    cols = read_schema_columns(meta_query)
    assert "payload" not in cols, cols
    assert meta_query.count() == 1


def test_media_repartition_sizes_from_byte_totals(spark):
    """Partition count must derive from total payload bytes / target, not
    just the core count."""
    from telemetry_parquet_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        media_repartition_by_bytes,
    )

    rows = [
        (i, "image", "image/bmp", None, None, None, bytes([i % 256]) * 1000)
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    # 64 KB of payload at a 1 KB target → 64 byte-derived partitions, but
    # media_repartition_by_bytes floors at defaultParallelism (machines with
    # more cores than payload/target legitimately keep their parallelism)
    out = media_repartition_by_bytes(df, target_bytes=1000)
    floor_n = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    assert out.rdd.getNumPartitions() == max(64, floor_n)
    assert out.count() == 64


def test_image_ahash_near_dup_detection(spark):
    """aHash must place a lightly-edited image within small Hamming distance
    of its original, far from unrelated images, and skip non-image/corrupt
    payloads; hamming_pairs blocks + verifies the pair."""
    from telemetry_parquet_spark.datapipe.dedup import hamming_pairs
    from telemetry_parquet_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_wav,
        image_ahash,
    )

    base = bytes(range(256)) * 4
    edited = bytearray(base)
    edited[100] = 255  # one pixel touched
    unrelated = bytes(reversed(base))
    rows = [
        (0, "image", "image/bmp", None, None, None, encode_bmp(base)),
        (1, "image", "image/bmp", None, None, None, encode_bmp(bytes(edited))),
        (2, "image", "image/bmp", None, None, None, encode_bmp(unrelated)),
        (3, "audio", "audio/wav", None, None, None, encode_wav(b"abc")),
        (4, "image", "image/bmp", None, None, None, b"BMgarbage"),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    fps = image_ahash(media)
    got = {r.media_id: r.ahash for r in fps.collect()}
    assert set(got) == {0, 1, 2}  # wav + corrupt payloads skipped
    mask = (1 << 64) - 1  # bin() of a negative long would miscount bits
    assert bin((got[0] ^ got[1]) & mask).count("1") <= 3
    assert bin((got[0] ^ got[2]) & mask).count("1") > 3

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in hamming_pairs(fps, id_col="media_id", fp_col="ahash",
                                    max_hamming=3, chunks=4).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_hamming_pairs_parameter_validation(spark):
    import pytest as _pytest

    from telemetry_parquet_spark.datapipe.dedup import hamming_pairs

    df = spark.createDataFrame([(1, 0)], ["media_id", "ahash"])
    with _pytest.raises(ValueError, match="divide 64"):
        hamming_pairs(df, id_col="media_id", fp_col="ahash", chunks=7)
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_pairs(df, id_col="media_id", fp_col="ahash",
                      max_hamming=4, chunks=4)


def test_als_recall_gate_discriminates(spark, sf_dir):
    """The ml_als_recall_eval floor is a real measurement, not a
    construction: working ALS clears it everywhere, and a deliberately
    broken ranking (out-of-block items, the random-factor failure mode)
    lands far below it, so a solver regression flips the driver row red."""
    from telemetry_parquet_spark.queries.ml_media import (
        ALS_FLOOR,
        ALS_GROUPS,
        ALS_IDS,
        ml_als_recall_eval,
    )

    rows = ml_als_recall_eval(spark, sf_dir).collect()
    assert rows and all(r.floor_met for r in rows)
    assert sum(r.users for r in rows) >= ALS_IDS - 1  # every user got recs

    # adversarial ranking: recommend only OUT-of-block items — the exact
    # preference ranking scores it at precision 0, far below the floor
    from telemetry_parquet_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < ALS_IDS
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < ALS_IDS)
    wrong = (
        cust.crossJoin(F.broadcast(part))
        .where(
            F.col("c_custkey") % ALS_GROUPS != F.col("p_partkey") % ALS_GROUPS
        )
        .select(
            F.col("c_custkey").alias("user"),
            (
                F.col("c_custkey") % ALS_GROUPS
                == F.col("p_partkey") % ALS_GROUPS
            )
            .cast("double")
            .alias("hit"),
        )
        .groupBy("user")
        .agg(F.avg("hit").alias("prec"))
    )
    worst = wrong.agg(F.max("prec").alias("m")).first().m
    assert worst is not None and worst < ALS_FLOOR
