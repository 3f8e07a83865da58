"""Document deduplication families: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Design for 100 TB:
- exact: one hash-groupBy shuffle on a 64/128-bit content hash (never on the
  text itself — shuffle payload is the hash + doc id).
- MinHash+LSH: shingle → K minhashes → B bands; candidate pairs come from a
  self-join on (band_id, band_hash) buckets, so the shuffle key is the band
  hash and no O(N²) compare ever happens. Verification re-computes exact
  Jaccard only on candidates.
- SimHash: 64-bit fingerprint via per-token hash bit-votes; near-dup = small
  Hamming distance within LSH buckets over bit-chunks.
All stages are built-in expressions (xxhash64, explode, groupBy) — no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import spread
from telemetry_parquet_spark.datapipe.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_hash(text: Column | str, normalize: bool = True) -> Column:
    """Content key for exact dedup: md5 of (optionally whitespace-normalized,
    lowercased) text. md5 over xxhash64 here: 128 bits make accidental
    collisions at 10^11-document scale negligible."""
    c = F.col(text) if isinstance(text, str) else text
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(c)


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate-group summary: one row per distinct content hash with the
    earliest id as keeper and the duplicate count.

    No ``spread()`` here (unlike the shingling/minhash paths): md5 is cheap
    enough that a pre-repartition — which shuffles the FULL TEXT — costs more
    than it saves at every scale (measured 2.9s vs 0.5s cold at sf0.1; at
    100 TB the scan already has thousands of splits and the groupBy's own
    shuffle carries only (hash, id))."""
    return (
        df.select(F.col(id_col), content_hash(text_col).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the earliest row (by id) per distinct content hash.

    Same reasoning as ``exact_dedup_groups``: no pre-repartition — the
    dedup window's own shuffle is the only one needed."""
    from telemetry_parquet_spark.operators.dedup import earliest_per_key

    hashed = df.withColumn("__content_md5", content_hash(text_col))
    return earliest_per_key(
        hashed, keys=["__content_md5"], order_cols=[id_col]
    ).drop("__content_md5")


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingle array (lowercased)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(c))
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(
        # shorter than n words: the whole doc is one shingle
        F.array(F.array_join(toks, " "))
    )
    return F.array_distinct(grams)


def _rotl64(c: Column, i: int) -> Column:
    """Bitwise 64-bit rotate-left (overflow-free under ANSI mode)."""
    if i % 64 == 0:
        return c
    i = i % 64
    return F.shiftleft(c, i).bitwiseOR(F.shiftrightunsigned(c, 64 - i))


def _hash_family(h1: Column, h2: Column, i: int) -> Column:
    """K-member hash family from two base hashes (Carter-Wegman style, with
    XOR+rotate instead of multiply so ANSI overflow checking never fires):
    g_i = rotl(h1, (i mod 63)+1) XOR rotl(h2, (i mod 61)+1) XOR i.

    The rotation PAIR must be distinct per member (63 and 61 are coprime:
    pairs repeat only past i=3842). The earlier single-rotation form
    ``h1 XOR rotl(h2, (7i+1) mod 63 + 1)`` repeated its rotation every 9
    members, leaving g_i and g_{i+9} equal up to a sub-7-bit XOR constant —
    near-identical argmins, so 64 "independent" minhashes collapsed to ~9
    effective ones and banding recall at mid similarity ran far below the
    (1-s^r)^b model (measured 0.28 vs predicted 0.64 at s=0.5; the
    S-curve fixture in tests/test_incremental_near_dup.py now pins the
    model within ±0.15)."""
    return (
        _rotl64(h1, (i % 63) + 1)
        .bitwiseXOR(_rotl64(h2, (i % 61) + 1))
        .bitwiseXOR(F.lit(i))
    )


def minhash_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """K-permutation MinHash signatures as (id, minhash array<bigint>).

    Shape for scale: explode distinct shingles once, compute TWO base
    xxhash64 values per shingle, derive the K family members with bit
    arithmetic, and take K min() aggregates in a single vectorized hash-agg
    (map-side partials, one shuffle on the doc id). The naive form — K
    array transforms per document — re-hashes every shingle K times inside
    one giant codegen expression and was the bench's hot spot."""
    ex = (
        spread(df)
        .select(F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("__sh"))
        .select(
            F.col(id_col),
            F.xxhash64("__sh", F.lit(1)).alias("__h1"),
            F.xxhash64("__sh", F.lit(2)).alias("__h2"),
        )
    )
    mins = ex.groupBy(id_col).agg(
        *[
            F.min(_hash_family(F.col("__h1"), F.col("__h2"), i)).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("minhash"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    num_hashes: int = 64,
) -> DataFrame:
    """LSH banding: split the ``num_hashes``-length signature into ``bands``
    rows of (band_id, band_hash), self-join buckets, emit candidate pairs
    (a < b). ``num_hashes`` must match the signature length produced by
    ``minhash_docs`` and be divisible by ``bands`` — otherwise band slices
    would silently overlap or read past the array.

    The band join key is xxhash64 of the band slice, so the shuffle carries
    (band_id, 64-bit hash, doc id). Bucket skew (a viral duplicate cluster)
    is handled by AQE skew-join; the downstream verify is per-pair."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    width = num_hashes // bands
    # runtime guard: a signature shorter than num_hashes would make F.slice
    # silently return truncated band slices (degenerate band hashes) instead
    # of failing — raise per-row if the actual array length disagrees
    sig = F.when(F.size(F.col(sig_col)) == num_hashes, F.col(sig_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_candidate_pairs: expected signature of {num_hashes}"
                      " minhashes, got "),
                F.size(F.col(sig_col)).cast("string"),
            )
        )
    )
    # materialize the banded keys ONCE (bands·N rows of (id, band_id,
    # 64-bit hash)) — without the lineage break both self-join sides
    # recompute the whole signature pipeline (corpus shingle explode +
    # K-min aggregation); the broadcast side's exchange cannot be reused
    # by the streamed side, so the corpus pass ran twice
    banded = _banded(sigs, sig, id_col, bands, width).localCheckpoint()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col(f"l.band_id") == F.col(f"r.band_id"))
            & (F.col(f"l.band_hash") == F.col(f"r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _banded(sigs: DataFrame, sig: Column, id_col: str, bands: int, width: int) -> DataFrame:
    """(id, band_id, band_hash): one row per signature band — the LSH
    bucket key shared by the self-join (``lsh_candidate_pairs``) and the
    two-sided new-vs-history join (``incremental_near_dup``)."""
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * width + 1, width),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH candidates → exact
    Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard_sim)."""
    sigs = minhash_docs(df, id_col, text_col, shingle_n, num_hashes)
    # the candidate set is tiny and reused three times below (ids for both
    # pair sides + the semi-join filter); materialize it once so the
    # signature pipeline doesn't recompute per consumer (Y4-style lineage
    # break, AddonRecommender.scala:221-222)
    cands = lsh_candidate_pairs(
        sigs, id_col=id_col, bands=bands, num_hashes=num_hashes
    ).localCheckpoint()
    # verification shingles only for docs that appear in a candidate pair —
    # prunes the second full-corpus shingle pass to a broadcast-semi-joined
    # subset
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    )
    # The verify join consumes sh on BOTH pair sides under DIFFERENT
    # keys/projections (id_a vs id_b), so the two BroadcastExchange subtrees
    # are not exchange-identical and reuse cannot kick in — without a
    # materialization the corpus scan + semi-join ran TWICE (plan-verified:
    # 2 parquet scans of documents in the verify subtree). Checkpoint the
    # pruned (id, text) rows — NOT the shingle arrays: those are ~3× the
    # text bytes and materializing them measured 30-60% SLOWER at sf0.1
    # (write+re-read of the arrays beat the page-cached second scan). The
    # cheap shingle expression runs once per pair side over candidate docs
    # only; the corpus scan and semi-join run once.
    sh = (
        spread(df.join(F.broadcast(cand_ids), id_col, "left_semi"))
        .select(F.col(id_col), F.col(text_col))
        .localCheckpoint()
        .select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, no sketch) — the verification oracle path
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle index:
    explode distinct shingles → self-join on shingle (candidates share ≥1)
    → count intersections per pair → Jaccard from |A|,|B|,|A∩B|.

    Scale: the shuffle key is the shingle hash; a shingle appearing in d
    documents produces d² join rows, so ``df_cap`` bounds the self-join by
    dropping shingles whose document frequency exceeds the cap BEFORE the
    join — the standard inverted-index hot-key guard. The hot set is tiny by
    construction (only keys with df > cap) and is pruned with a broadcast
    anti-join, so the guard adds one cheap aggregation and no extra shuffle
    of the index. Jaccard denominators still use the FULL per-doc shingle
    counts; dropping a hot shingle can only lower a pair's reported
    intersection (conservative: similarity is under-, never over-stated).
    ``df_cap=None`` disables the guard (exact oracle mode)."""
    # materialize the hashed shingle index ONCE ((id, 64-bit hash) rows) —
    # it feeds four consumers (per-doc sizes, the hot-key census, and both
    # self-join sides), each of which otherwise re-runs the corpus shingle
    # explode + hash
    sh = spread(df).select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("shingle"),
    ).withColumn("shingle", F.xxhash64("shingle")).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    joinable = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > df_cap)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    inter = (
        joinable.alias("l")
        .join(joinable.alias("r"), "shingle")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _bit_mask(j: int) -> int:
    """Two's-complement 64-bit mask for bit j (bit 63 is the sign bit)."""
    return (1 << j) if j < 63 else -(1 << 63)


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, per-bit ±1 votes
    across tokens, sign of each vote → fingerprint bit.

    Shape for scale: explode tokens → hash → one hash-aggregation with 64
    conditional-sum columns (vectorized, map-side partials), then OR the
    winning bit masks. One shuffle on the doc id; no Python, no UDAF."""
    toks = spread(df).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__t")
    ).withColumn("__h", F.xxhash64("__t"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.col("__h").bitwiseAND(F.lit(_bit_mask(j))) != 0, 1
                ).otherwise(-1)
            ).alias(f"__v{j}")
            for j in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"__v{j}") > 0, F.lit(_bit_mask(j)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select(F.col(id_col), fp.alias("fp"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs among 64-bit fingerprints by pigeonhole LSH: two
    fingerprints within ``max_hamming`` (< chunks) Hamming distance share at
    least one exact ``64/chunks``-bit chunk → bucket-join on (chunk_id,
    chunk_value), verify ``bit_count(xor) <= max_hamming``. Shared by
    SimHash text dedup and aHash image dedup (any 64-bit fingerprint
    family). Chunk width is the blocking selectivity: 16-bit chunks (the
    default) give 65536 buckets per chunk position — the 100 TB setting;
    narrower chunks trade join fan-out for higher allowed distance."""
    if 64 % chunks != 0:
        raise ValueError(f"chunks ({chunks}) must divide 64")
    if max_hamming >= chunks:
        raise ValueError(
            f"pigeonhole needs max_hamming ({max_hamming}) < chunks ({chunks})"
        )
    width = 64 // chunks
    # materialize the fingerprints ONCE (doc-sized: id + 8 bytes) — the
    # chunk-bucket self-join otherwise recomputes the full fingerprint
    # pipeline (token explode + 64-column vote aggregation for SimHash,
    # image decode for aHash) on BOTH sides
    fp = fps.select(F.col(id_col), F.col(fp_col).alias("fp")).localCheckpoint()
    chunked = fp.select(
        F.col(id_col),
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("fp"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    pairs = (
        chunked.alias("l")
        .join(
            chunked.alias("r"),
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.fp").alias("fp_a"),
            F.col("r.fp").alias("fp_b"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b", hamming64(F.col("fp_a"), F.col("fp_b")).alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints → pigeonhole chunk-bucket
    join → Hamming verify (see ``hamming_pairs``)."""
    fp = simhash_fingerprints(df, id_col=id_col, text_col=text_col)
    return hamming_pairs(
        fp, id_col=id_col, fp_col="fp", max_hamming=max_hamming, chunks=chunks
    )


# ---------------------------------------------------------------------------
# Passage-level (exact-substring) duplication
# ---------------------------------------------------------------------------


def duplicate_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Passage-level duplication signals (the ExactSubstr idea from
    "Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022, re-expressed relationally): a document's ``window``-token sliding
    windows (stride 1, WITH multiplicity) are duplicated when the same
    window text occurs in at least one OTHER document. Returns, per
    document with any duplication, the window count, duplicated-window
    count, and duplicated fraction — the signal a pipeline uses to cut
    repeated passages (boilerplate, licenses, syndicated text) that
    document-level dedup can't see because the containing documents differ.

    Scale shape: windows travel as md5 digests (16-byte shuffle payload,
    never text); "occurs in ≥2 distinct docs" is ONE hash-aggregation on
    the digest (map-side combinable — a viral passage makes a big count,
    not a join blow-up, unlike pair-joins which need the df-cap guard);
    flagging is a semi join on the digest. No self-join anywhere, so no
    quadratic hot-key risk."""
    from telemetry_parquet_spark.datapipe.scrub import _raw_word_ngrams

    grams = (
        spread(df)
        .select(
            F.col(id_col),
            F.explode(_raw_word_ngrams(F.col(text_col), window)).alias("__g"),
        )
        .select(F.col(id_col), F.md5("__g").alias("__h"))
    )
    dup_hashes = (
        grams.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    dups = (
        grams.join(dup_hashes, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
    )
    return totals.join(dups, id_col).select(
        F.col(id_col),
        "n_windows",
        "n_dup_windows",
        F.round(F.col("n_dup_windows") / F.col("n_windows"), 6).alias("dup_frac"),
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Maximal cross-document repeated spans, positionally (the actionable
    form of ``duplicate_passages``: not just "how much of this doc is
    duplicated" but WHERE, so a pipeline can cut the spans).

    A ``window``-token sliding window (stride 1) is repeated when its text
    occurs in ≥2 distinct documents; runs of repeated window starts whose
    gaps are ≤ ``window`` (overlapping or touching coverage) merge into one
    maximal span [span_start, span_end] (1-based token indexes, inclusive).

    Scale shape: the repeat census is ONE digest-keyed hash aggregation
    (16-byte shuffle payload); flagging is a semi join on the digest; the
    island merge is a lag+cumsum window partitioned by doc id — per-doc
    state, no global window. No self-join, so no quadratic hot-key risk
    (a viral passage inflates one count, not a pair explosion)."""
    from pyspark.sql import Window as W

    toks = tokens(F.lower(F.col(text_col)))
    k = F.size(toks) - (window - 1)
    gram_hashes = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = spread(df).select(
        F.col(id_col), F.posexplode(gram_hashes).alias("__p0", "__h")
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "__h")
    dup_hashes = (
        grams.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    hits = grams.join(dup_hashes, "__h", "left_semi")
    w_doc = W.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn(
        "__new",
        F.when(
            F.col("pos") - F.lag("pos").over(w_doc) > window, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return islands.groupBy(id_col, "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(window - 1)).alias("span_end"),
        F.count("*").alias("n_grams"),
    ).select(
        F.col(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        "n_grams",
    )


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash from md5's first 15 hex nibbles — ENGINE-PORTABLE
    (any SQL engine with md5 + string ops reconstructs it exactly), unlike
    xxhash64. 16^k is a power of two, so the nibble-weight arithmetic is
    exact in any numeric system; 60 bits keeps every value signed-positive.
    """
    # conv(hex, 16, 10) evaluates the same nibble-weight polynomial in one
    # codegen call (verified value-identical to the explicit fold on 100k
    # strings); 60 bits < 2^63 so the string→long cast is exact.
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash60_md5_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash over the portable ``md5_hash60`` token hash — the SAME
    pipeline shape as ``simhash_fingerprints`` (explode DISTINCT tokens →
    one hash-agg with per-bit conditional sums) but with an EXACT DuckDB
    oracle: every step is md5 + integer arithmetic both engines share.
    Registered as ``dd_simhash_md5_pairs``; the xxhash64 variant remains
    the cheaper in-engine default."""
    toks = (
        spread(df)
        .select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__t"),
        )
        .distinct()
        .withColumn("__h", md5_hash60(F.col("__t")))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__v{j}")
            for j in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"__v{j}") > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), fp.alias("fp"))


def band_history(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The persistable history-side LSH state for ``incremental_near_dup``:
    banded MinHash signatures as (id, band_id, band_hash). A daily
    pipeline computes this ONCE per history snapshot (cost ∝ history),
    persists it, and appends each day's new-document bands — so the daily
    near-dup check pays banding only for the day, exactly the incremental
    discipline the Bloom exact-dedup sibling (bloom.py) follows. Must be
    built with the SAME (shingle_n, num_hashes, bands) the consumer
    passes."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    return _banded(
        minhash_docs(df, id_col, text_col, shingle_n, num_hashes),
        F.col("minhash"), id_col, bands, num_hashes // bands,
    )


def incremental_near_dup(
    new_df: DataFrame,
    history_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    history_bands: DataFrame | None = None,
) -> DataFrame:
    """Daily-increment near-dup dedup: label each NEW document with the
    earliest historical document it near-duplicates (exact Jaccard ≥
    threshold), or keep it. The near-dup sibling of the Bloom exact
    incremental dedup (datapipe/bloom.py): history is banded once and
    joined against the (much smaller) new day — never a self-join over
    history ∪ new, so a day's cost scales with the day, and the history
    side's banded signatures are exactly what a daily pipeline persists.

    LSH prunes candidates; the exact-Jaccard verify makes the OUTPUT
    deterministic and oracle-able. Recall caveat (the honest S-curve, not
    a flat bound): with b=16 bands of width r=4 a pair at true Jaccard s
    is missed with probability (1 - s^4)^16 — ≈ 2e-4 at s=0.9, ≈ 0.013
    at s=0.8, but ≈ 0.36 at s=0.5. The exact-oracle gate is therefore
    valid only because the test corpus's qualifying cross-day pairs are
    all high-similarity (s ≳ 0.8, verified equal to the exact SQL at
    every test SF before wiring); a corpus with mid-similarity
    (0.5–0.8) qualifying pairs needs more/narrower bands (e.g. b=32,
    r=2: miss ≈ 0.004 at s=0.5) at the cost of more candidates."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    width = num_hashes // bands
    bn = _banded(
        minhash_docs(new_df, id_col, text_col, shingle_n, num_hashes),
        F.col("minhash"), id_col, bands, width,
    ).alias("n")
    # ``history_bands``: the persisted state from ``band_history`` — a
    # daily pipeline hands it in so each day re-bands only the day, not
    # the whole history (the caller owns parameter consistency).
    bh = (
        history_bands
        if history_bands is not None
        else band_history(
            history_df, id_col, text_col, shingle_n, num_hashes, bands
        )
    ).alias("h")
    cands = (
        bn.join(
            bh,
            (F.col("n.band_id") == F.col("h.band_id"))
            & (F.col("n.band_hash") == F.col("h.band_hash")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"h.{id_col}").alias("hist_id"),
        )
        .distinct()
        .localCheckpoint()
    )
    shn = (
        new_df.join(F.broadcast(cands.select(F.col("new_id").alias(id_col)).distinct()),
                    id_col, "left_semi")
        .select(F.col(id_col).alias("new_id"), shingles(text_col, shingle_n).alias("sh_n"))
    )
    shh = (
        history_df.join(F.broadcast(cands.select(F.col("hist_id").alias(id_col)).distinct()),
                        id_col, "left_semi")
        .select(F.col(id_col).alias("hist_id"), shingles(text_col, shingle_n).alias("sh_h"))
    )
    verified = (
        cands.join(shn, "new_id")
        .join(shh, "hist_id")
        .select(
            "new_id",
            "hist_id",
            F.round(jaccard(F.col("sh_n"), F.col("sh_h")), 6).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    dup = verified.groupBy("new_id").agg(F.min("hist_id").alias("dup_of"))
    return (
        new_df.select(F.col(id_col))
        .join(dup, new_df[id_col] == dup["new_id"], "left")
        .select(
            id_col,
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )
