"""Distributed Bloom-filter pre-filtering for incremental (cross-corpus)
dedup.

The reference's cross-day dedup re-reads AND re-shuffles the full historical
corpus every day (union of prior deduped days → multi-key ``left_anti``,
``PioneerOnlineNewsDedupe.scala:97-121`` — ported faithfully as
``operators/dedup.py::incremental_dedup``). At 100 TB of history that daily
full-history shuffle is the inherited design's worst scaling edge. This
module keeps the OUTPUT exact while reducing the daily cost to:

1. **Build** (amortizable): one scan of the historical keys folded into a
   fixed-size bitmap. Spark's internal ``BloomFilterAggregate`` is not in
   the public function registry, so the filter is built from first
   principles with DataFrame ops: each key explodes into ``num_hashes``
   (word_idx, bit mask) pairs and ``bit_or`` aggregates them into an at-most
   ``num_bits/64``-row bitmap table. ``bit_or`` partial aggregation means
   the shuffle carries per-task partial bitmaps — bounded by
   ``num_bits/64 × tasks``, NOT by key count. Bitmaps for different days
   merge by ``bit_or`` on word_idx, so the build can be maintained
   incrementally (fold in yesterday's new keys) instead of rebuilt.
2. **Probe**: the day's new keys check their ``num_hashes`` bits against the
   broadcast bitmap (a ``num_bits/8``-byte table — megabytes at billions of
   keys). Definite negatives (no false negatives, by construction) skip
   history entirely.
3. **Exact verify**: only might-contain keys — true duplicates plus an
   ``fpp`` sliver of false positives — are checked against history, via a
   broadcast SEMI join (history streams, zero history shuffle), and the
   confirmed-duplicate key set (small) prunes the new day with a broadcast
   anti join.

Net: the historical corpus is scanned, never shuffled; every join
broadcasts; output equals the plain anti-join exactly (oracle-gated by
``dd_incremental_bloom``).

Sizing: for target false-positive rate p, bits-per-key ≈ -log2(p)/ln2 ≈
1.44·log2(1/p); ``num_hashes`` ≈ 0.7·bits_per_key. The defaults
(``num_bits=2**23``, ``num_hashes=5``) give p≈1% at ~1M historical keys —
callers at real scale pass ``num_bits`` sized to their history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.dedup import _hash_family


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """``num_hashes`` bit positions in [0, num_bits) for ``key`` — the
    XOR/rotate Carter-Wegman family (ANSI-overflow-safe, same construction
    as the MinHash family at ``dedup.py::_hash_family``)."""
    h1 = F.xxhash64(key, F.lit(101))
    h2 = F.xxhash64(key, F.lit(202))
    return F.array(
        *[F.pmod(_hash_family(h1, h2, i), F.lit(num_bits)) for i in range(num_hashes)]
    )


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    """Split a bit position into (64-bit word index, single-bit mask).
    ``F.shiftleft`` only takes Python-int bit counts, so the column-count
    shift goes through the SQL function, which accepts expressions."""
    word = (pos / 64).cast("int")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
    return word, mask


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Fold a key column into a Bloom bitmap table (word_idx int, bits long).

    At most ``num_bits/64`` rows regardless of key count; the ``bit_or``
    hash-agg combines map-side, so the shuffle is bounded by bitmap size ×
    task count. Merge two bitmaps (e.g. nightly increments) by unioning and
    re-aggregating ``bit_or(bits)`` per word_idx."""
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits ({num_bits}) must be a multiple of 64")
    pos = (
        keys.select(
            F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__pos")
        )
    )
    word, mask = _word_and_mask(F.col("__pos"))
    return (
        pos.select(word.alias("word_idx"), mask.alias("__mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Distinct keys of ``df`` flagged with Bloom membership: ``flag_col`` is
    False only for keys PROVABLY absent from the filtered set (no false
    negatives). The bitmap joins broadcast (it is at most ``num_bits/8``
    bytes); the only shuffle is the per-key ``bool_and``, whose map-side
    partials reduce it to one row per (task, key)."""
    k = df.select(key_col).distinct()
    pos = k.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__pos"),
    )
    word, mask = _word_and_mask(F.col("__pos"))
    probed = (
        pos.select(F.col(key_col), word.alias("word_idx"), mask.alias("__mask"))
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            F.col(key_col),
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__mask"))
                == F.col("__mask")
            ).alias("__hit"),
        )
    )
    return probed.groupBy(key_col).agg(F.bool_and("__hit").alias(flag_col))


def incremental_dedup_bloom(
    new_entries: DataFrame,
    history: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Rows of ``new_entries`` whose ``key_col`` does NOT appear in
    ``history`` — exactly the plain ``left_anti``'s output, without the
    full-history shuffle the plain form pays every run:

    - Bloom-definite-negative keys pass with no history access at all;
    - might-contain keys are verified by a broadcast semi join (history
      side scans but never shuffles or sorts);
    - the confirmed-duplicate key set prunes ``new_entries`` with a
      broadcast anti join.

    Exactness: Bloom filters have no false negatives, so every true
    duplicate reaches the verify step; false positives are eliminated there.
    Plan shape (no SortMergeJoin anywhere, history never exchanged on the
    key) is asserted in tests/test_bloom.py."""
    bloom = build_bloom(history.select(key_col), key_col, num_bits, num_hashes)
    flags = bloom_might_contain(
        new_entries, bloom, key_col, num_bits, num_hashes
    )
    candidates = flags.where(F.col("might_contain")).select(key_col)
    confirmed = (
        history.select(key_col)
        .join(F.broadcast(candidates), key_col, "left_semi")
        .distinct()
    )
    return new_entries.join(F.broadcast(confirmed), key_col, "left_anti")
