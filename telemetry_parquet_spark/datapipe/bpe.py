"""BPE merge-pair learning and encoding as fixed-point relational plans.

Completes the tokenizer path (vocab → merges → encode): iteratively count
adjacent symbol pairs over the word vocabulary, merge the most frequent
pair (deterministic tiebreak: count DESC, then (left, right) lexicographic
ASC), repeat N times — the Sennrich-style byte-pair-encoding loop, minus
the end-of-word marker (an orthogonal variant; pair identity here is plain
string concatenation).

Every step is exact integer/string arithmetic, so the whole ITERATIVE
algorithm carries a byte-exact DuckDB recursive-CTE oracle — the same
discipline that made ``operators/pagerank.py`` checkable (float-free
recurrence + deterministic tiebreaks = bit-identical cross-engine replay).

Scale design (100 TB corpora):
- the learning loop never touches the corpus: one corpus-wide shuffle
  builds the (word, freq) vocabulary, and every iteration runs over that
  vocab-sized table (explode pairs → groupBy (l, r) → 1-row argmax). At
  10^8 distinct words the per-iteration state is GBs, not TBs.
- the argmax is a single-row ``collect`` per merge — driver-sized, the
  same pattern as the partition-offset collect in
  ``operators/global_index.py`` (the alternative, a 1-row broadcast
  crossJoin, keeps the plan lazy but balloons expression depth for zero
  distributed-work savings).
- merge application is a Catalyst higher-order ``aggregate`` over each
  word's symbol array — greedy left-to-right non-overlapping, pure JVM
  codegen, no shuffle, no Python. State is ``localCheckpoint``ed per
  iteration so plan/expression depth stays O(1).
- encoding reuses the same trick: merges are applied to the DISTINCT-WORD
  table only, then the corpus gets a broadcast word→pieces join — the
  corpus is never re-tokenized per merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.text import tokens


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary from whitespace-tokenized lowercased text —
    the one corpus-wide shuffle of the BPE pipeline."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def chars(word: Column | str) -> Column:
    """Initial symbol sequence: the word's characters."""
    c = F.col(word) if isinstance(word, str) else word
    return F.filter(F.split(c, ""), lambda s: F.length(s) > 0)


def merge_apply(syms: Column, left: str, right: str) -> Column:
    """One BPE merge pass over a symbol array: greedy left-to-right
    non-overlapping replacement of adjacent (left, right) with left+right.

    Implemented as a Catalyst ``aggregate`` fold: append each symbol,
    except when the accumulator's last element is ``left`` and the incoming
    symbol is ``right`` — then replace the last element with the merged
    token. This IS the greedy scan: after a merge the last element becomes
    ``left+right`` ≠ ``left``, so an overlapping re-merge at the next
    position cannot fire (e.g. pair (a,a) on [a,a,a] → [aa,a], on
    [a,a,a,a] → [aa,aa])."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        hit = (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.when(F.size(syms) <= 1, syms).otherwise(
        F.aggregate(F.slice(syms, 2, F.size(syms) - 1), F.slice(syms, 1, 1), step)
    )


def _pair_list(syms: Column) -> Column:
    """Adjacent (l, r) structs — overlapping, per standard BPE counting."""
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def learn_bpe(
    words: DataFrame, num_merges: int = 16
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn up to ``num_merges`` merge rules from a (word, freq) table.

    Returns (merges, final_state): merges as [(step, left, right, merged,
    pair_count)] (1-based steps, in application order) and the final
    per-word symbol state (word, freq, syms). Stops early when no adjacent
    pair remains (every word fully merged to one symbol)."""
    syms = words.select(
        "word", "freq", chars("word").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        best = (
            syms.select("freq", F.explode(_pair_list(F.col("syms"))).alias("pr"))
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # 1 row — driver-sized argmax, see module docstring
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((step, l, r, l + r, cnt))
        syms = syms.withColumn("syms", merge_apply(F.col("syms"), l, r))
        # checkpoint on a stride (the pagerank lesson): each materialization
        # is a job, and a ≤4-merge-deep fold expression is cheap to re-run
        # for the next argmax; per-iteration checkpointing doubles job count
        # for no result difference.
        if step % 4 == 0:
            syms = syms.localCheckpoint()
    # returned lazily: the state sits ≤ 3 folds past the last stride
    # checkpoint, so depth stays O(1) without paying one more
    # materialization job here (the bench query consumes only ``merges``).
    return merges, syms


def learn_bpe_batched(
    words: DataFrame, num_merges: int = 16, batch_m: int = 8
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """``learn_bpe`` with PROVABLY-EQUIVALENT merge batching: per iteration,
    one pair-count job + ONE driver collect admits up to ``batch_m`` merges
    instead of one, so a 32k-merge production vocabulary costs ~32k/batch
    driver round-trips and count jobs instead of 32k (the learn_bpe
    docstring's honest limit).

    A rank-prefix p1..pk of the (cnt DESC, l, r) ordering is admitted only
    while every condition below holds, each SUFFICIENT for the batched
    selection to equal the strict sequential replay (same merges, same
    counts, same order):

    1. **Symbol-disjoint**: {l_j, r_j} ∩ {l_i, r_i} = ∅ for all i < j.
       Applying p_i then consumes only l_i/r_i occurrences, so p_j's
       adjacencies — and therefore its count — are untouched: at replay
       step j, cnt(p_j) still equals the original count we report.
    2. **Created pairs can't preempt**: applying p_i creates only pairs
       involving the new symbol m_i = l_i + r_i; any such pair (x, m_i) /
       (m_i, y) needs an original (x, l_i) / (r_i, y) adjacency, so its
       count is ≤ bound_i = max cnt over original context pairs of p_i
       (computed from the SAME count table, no extra corpus work). p_j is
       admitted only if max(bound_1..bound_{j-1}) < cnt(p_j) STRICTLY —
       ties could lose the (l, r) lexicographic tiebreak to a created
       pair, so equality stops the batch.
    3. **No aliasing**: if m_i string-equals a symbol already present in
       some pair, created-pair counts would ADD to an existing pair type
       and break bound reasoning — an aliasing admit closes the batch.
       Likewise m_i must be distinct across the batch (two merges whose
       concatenations collide, e.g. "ab"+"c" and "a"+"bc", would share a
       created-pair type).
    4. Originals ranked below p_j can only keep or DECREASE their counts
       (no new adjacency between pre-existing symbols is ever created
       absent aliasing), and equal-count originals sort lexicographically
       after p_j by the rank-prefix property — p_j wins the replay argmax.

    Application chains ``merge_apply`` folds in rank order — literally the
    sequential application — so equivalence rests only on the selection
    argument above. Property-tested batched == sequential == pure-Python
    reference on adversarial corpora (aliasing, ties, overlapping runs)
    and registered as ``bpe_learn_merges_batched`` under the SAME
    recursive-CTE oracle as the sequential query, so the driver itself
    re-proves the equivalence every round."""
    syms = words.select(
        "word", "freq", chars("word").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < num_merges:
        # localCheckpoint (eager), not persist (lazy): the count table has
        # three consumers below (top-k, context bounds, aliasing) and a
        # lazily-persisted relation measured ~40% SLOWER here — under AQE
        # the broadcast subquery and the probe side race to fill the cache
        # and parts of the vocab-pair aggregation re-run; the explicit
        # materialization job keeps every consumer on a real scan.
        counts = (
            syms.select("freq", F.explode(_pair_list(F.col("syms"))).alias("pr"))
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .localCheckpoint()
        )
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(batch_m)
            .select(
                F.col("l").alias("cl"),
                F.col("r").alias("cr"),
                F.col("cnt").alias("ccnt"),
                F.concat("l", "r").alias("cm"),
            )
        )
        # ONE pass over counts x broadcast(top) computes both the created-
        # pair context bounds (max cnt over (·,l)/(r,·) neighbours) and the
        # aliasing detector (merged string already a pair symbol) — the
        # conditions are disjoint filters of the same OR-join, so fusing
        # them halves the count-table traversals per batch.
        t = F.broadcast(top)
        is_ctx = (counts["r"] == t["cl"]) | (counts["l"] == t["cr"])
        is_ali = (counts["l"] == t["cm"]) | (counts["r"] == t["cm"])
        stats = (
            counts.join(t, is_ctx | is_ali)
            .groupBy("cl", "cr")
            .agg(
                F.max(F.when(is_ctx, F.col("cnt"))).alias("bound"),
                F.sum(F.when(is_ali, 1).otherwise(0)).alias("n_alias"),
            )
        )
        cand = (
            top.join(stats, ["cl", "cr"], "left")
            .orderBy(F.desc("ccnt"), F.asc("cl"), F.asc("cr"))
            .collect()  # ≤ batch_m rows — ONE driver round-trip per batch
        )
        counts.unpersist(False)  # release the checkpoint blocks per batch
        if not cand:
            break
        used: set[str] = set()
        merged_strs: set[str] = set()
        max_bound: int | None = None  # None = no created pairs possible yet
        batch: list[tuple[str, str, int]] = []
        closed = False
        for row in cand:
            l, r, cnt = row["cl"], row["cr"], row["ccnt"]
            if batch:
                if {l, r} & used or (l + r) in merged_strs:
                    break
                if max_bound is not None and max_bound >= cnt:
                    break
            batch.append((l, r, cnt))
            used |= {l, r}
            merged_strs.add(l + r)
            if row["bound"] is not None:
                b = int(row["bound"])
                max_bound = b if max_bound is None else max(max_bound, b)
            if row["n_alias"]:
                closed = True  # aliasing admit is valid but must be LAST
            if closed or len(merges) + len(batch) >= num_merges:
                break
        for l, r, cnt in batch:
            merges.append((len(merges) + 1, l, r, l + r, int(cnt)))
            syms = syms.withColumn("syms", merge_apply(F.col("syms"), l, r))
        if len(merges) < num_merges:
            syms = syms.localCheckpoint()  # ≤ batch_m folds deep per iteration
    return merges, syms


def encode_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply learned merges (in order) to the distinct-word table:
    (word, pieces). Chained codegen folds, checkpointed on a stride so the
    composed expression tree never exceeds a few merges deep."""
    out = words.select("word", chars("word").alias("pieces"))
    for i, (_, l, r, _m, _c) in enumerate(merges):
        out = out.withColumn("pieces", merge_apply(F.col("pieces"), l, r))
        if (i + 1) % 4 == 0:
            out = out.localCheckpoint()
    return out
