"""Corpus-level boilerplate removal and per-domain capping.

Two more passes a large-scale training-data pipeline runs between dedup and
mixing (net-new surface — the reference predates the use case; descendants
of its per-document trims like ``Longitudinal``'s sorted-history caps):

- **Segment-frequency boilerplate removal** (CCNet/C4-style): split each
  document into fixed-width word windows, count each *full* window's
  document frequency across the corpus, and rewrite documents with the
  windows that repeat in ≥ ``min_df`` distinct documents removed (nav bars,
  cookie banners, license headers — text that repeats verbatim across many
  documents is template, not content).
- **Per-domain cap**: keep a deterministic, rerun-stable sample of at most
  ``k`` documents per domain — the "no single domain dominates the corpus"
  guard applied after mixing rates (``scrub.weighted_sample``) and before
  packing.

Design for 100 TB:
- Segment doc-frequency is ONE hash aggregation over ``(digest, doc_id)``
  pairs — the shuffle carries a 16-byte md5 and a doc id, never segment
  text, and the count is map-side combinable.
- The hot set is tiny by construction (segments repeated across ≥ min_df
  documents are template fragments; cardinality grows with the number of
  *sites*, not corpus bytes), so the removal join BROADCASTS it as a
  left_anti — the corpus never shuffles for the filter itself.
- The document rebuild (regroup surviving segments by doc_id) is the one
  corpus-sized shuffle, inherent to any rewrite operator; it carries only
  surviving text once, keyed by a high-cardinality doc id (no skew).
- The cap is a window rank per domain over a hash order — shuffles
  ``(domain, key-hash)`` only; for pathologically hot domains the same
  pre-aggregation trick as ``operators/skew.py`` applies (rank within
  salted sub-groups first, keep k per sub-group, re-rank the union).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segment_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 8,
) -> DataFrame:
    """Explode documents into non-overlapping ``seg_words``-word windows.

    Output: (id, seg_idx, seg, is_full) — ``is_full`` marks windows with
    exactly ``seg_words`` words (tail stubs are never hot-set candidates,
    so a short common suffix can't trigger removal). Splitting is on a
    single space to match the oracle's ``string_split`` exactly.
    """
    w = F.split(F.col(text_col), " ")
    n_seg = F.ceil(F.size(w) / F.lit(float(seg_words))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(w, i * seg_words + 1, seg_words), " "),
    )
    exploded = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg"))
    )
    return exploded.withColumn(
        "is_full", F.size(F.split(F.col("seg"), " ")) == seg_words
    )


def hot_segments(segs: DataFrame, min_df: int = 3) -> DataFrame:
    """Full windows repeated across ≥ ``min_df`` distinct documents.

    Groups on the md5 digest so the shuffle never carries text; keeps one
    representative ``seg`` string per digest (min — deterministic) for
    reporting. Map-side combine applies to both aggregates.
    """
    return (
        segs.where(F.col("is_full"))
        .groupBy(F.md5("seg").alias("seg_digest"))
        .agg(
            F.min("seg").alias("seg"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .where(F.col("doc_freq") >= min_df)
    )


def remove_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 8,
    min_df: int = 3,
) -> DataFrame:
    """Rewrite each document with hot segments removed.

    Returns (id, n_segs, n_kept, clean_text): documents whose every window
    is boilerplate survive with ``clean_text = ''`` (the caller decides
    whether to drop empties — removal and filtering are separate passes).
    """
    segs = segment_table(docs, text_col, id_col, seg_words).localCheckpoint()
    hot = hot_segments(segs, min_df).select("seg_digest")
    kept = segs.join(
        F.broadcast(hot),
        F.md5(segs["seg"]) == hot["seg_digest"],
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = segs.groupBy(id_col).agg(F.count("*").alias("n_segs"))
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    k: int = 10,
    salt: str = "cap-v1",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Deterministic per-stratum cap: keep the ``k`` rows of each stratum
    with the smallest md5(key ∥ salt), ties broken by key.

    Hash order makes the kept set a uniform sample that is stable under
    reruns, repartitioning, and cluster size (same construction as
    ``scrub.hash_split``); changing ``salt`` re-rolls it. One shuffle on
    the stratum key.

    ``salt_buckets`` is the skew guard: with it, ranking runs in two
    phases — keep the top ``k`` within each of N hash sub-buckets of a
    stratum (bounding any task's sort at rows/N), then re-rank the ≤ N·k
    survivors. The stratum-global top-k is contained in the union of its
    sub-buckets' top-k sets, so the result is IDENTICAL to the one-phase
    form (tested) — use it when one domain dominates the corpus.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    if salt_buckets:
        sub = Window.partitionBy(
            stratum_col, F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
        ).orderBy(h.asc(), F.col(key_col).asc())
        df = (
            df.withColumn("_srn", F.row_number().over(sub))
            .where(F.col("_srn") <= k)
            .drop("_srn")
        )
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cap_budget_per_stratum(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """Budget-based per-stratum cap: walk each stratum in md5(key ∥ salt)
    hash order and keep documents while the stratum's RUNNING ``size_col``
    total stays ≤ ``budget`` (inclusive; the first over-budget document and
    everything after it is dropped).

    This is how corpus builds actually cap domains — by token budget, not
    document count: a domain of ten huge documents and one of ten thousand
    tiny ones get the same weight in the mix. Same determinism story as
    ``cap_per_stratum`` (hash order ⇒ rerun/cluster-size stable, salt
    re-rolls); one shuffle on the stratum key; per-stratum window state is
    a single running sum."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(size_col).over(w))
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )


def weighted_priority_sample(
    df: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    weight_col: str = "weight",
    k: int = 10,
    salt: str = "wps-v1",
    round_digits: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum
    (Efraimidis & Spirakis '06 / A-ES): keep the rows with the smallest
    exponential key e_i = -ln(u_i) / w_i, which realizes exactly the
    sequential weighted-draw-without-replacement law — heavier rows are
    proportionally likelier, but no stratum ever exceeds ``k`` rows.

    The uniform u_i is DERIVED, not drawn: u_i = (md5_hash60(key ∥ salt)+1)
    / (2^60+1) ∈ (0,1), so the sample is deterministic, rerun/partitioning
    stable, engine-portable (the md5-nibble hash replays in DuckDB — same
    construction as ``cap_per_stratum``, which this generalizes from
    uniform to weighted), and re-rolled by changing ``salt``. Keys are
    rounded to ``round_digits`` with a key tie-break so the ln/÷ float
    arithmetic can't flip a rank across engines.

    Rows with weight ≤ 0 are dropped (their inclusion probability is 0).
    One shuffle on the stratum key; the same two-phase ``salt_buckets``
    guard as ``cap_per_stratum`` applies if a stratum dominates (the
    priority key is per-row, so sub-bucket top-k containment holds
    unchanged)."""
    from telemetry_parquet_spark.datapipe.dedup import md5_hash60

    h = md5_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    pri = F.round(-F.log(u) / F.col(weight_col).cast("double"), round_digits)
    w = Window.partitionBy(stratum_col).orderBy(
        pri.asc(), F.col(key_col).asc()
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
