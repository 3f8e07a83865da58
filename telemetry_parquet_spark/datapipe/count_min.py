"""Count-min sketch — frequency estimates for EVERY term in bounded space,
the linear-sketch complement of the Misra-Gries top-k
(datapipe/heavy_hitters.py): MG answers "which terms are heavy", CMS
answers "how often is term X" for arbitrary X, and being LINEAR it merges
by plain elementwise addition — persistable as a tiny (depth × width)
count table and combinable across days/shards with a groupBy-sum.

Fully relational — no Python anywhere: each token contributes ``depth``
(row, bucket) increments via the engine-portable ``md5_hash60`` hash
(datapipe/dedup.py), so building the sketch is one explode + one
hash-aggregation whose output is depth·width rows regardless of corpus
size. Estimation is a broadcast join of the query terms against the
sketch and a MIN over the depth rows.

Guarantees (classic CMS): estimates never undercount
(``est ≥ true``); with width w and depth d, the overcount exceeds
2N/w with probability < (1/2)^d per term. Both engines share the md5
arithmetic, so the sketch CONTENT is bit-exact cross-engine — the driver
gate checks the actual counters, not just behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.dedup import md5_hash60


def _probes(term_col: str, depth: int, width: int):
    """The ``depth`` (row_i, bucket) probe structs for one term — salted
    md5_hash60 per row, bucket = hash mod width."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (
                    md5_hash60(F.concat(F.lit(f"cms{i}:"), F.col(term_col)))
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, term_col: str = "term", depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (row_i, bucket, cnt) — depth·width rows max.

    Terms are count-aggregated FIRST (one map-side-combinable shuffle,
    the ``vocab_table`` shape), then only the DISTINCT terms are hashed
    and their counts summed into cells — mathematically identical to
    hashing every occurrence (the cell value is Σ_terms count·indicator)
    but the depth×md5 work drops from corpus-sized to vocab-sized
    (isolated build stage, cold session at sf0.1: 19.7 s → 0.8 s, ≈23×;
    the whole ``cms_sketch_counts`` bench query, warm session, reads
    0.57 s in BENCH_r06)."""
    weighted = df.groupBy(term_col).agg(F.count("*").alias("__n"))
    return (
        weighted.select(
            F.explode(_probes(term_col, depth, width)).alias("p"), "__n"
        )
        .groupBy(F.col("p.row_i").alias("row_i"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__n").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Linear merge: union + elementwise sum. cms(A ∪ B) == merge(cms(A),
    cms(B)) exactly — the property test proves bit-equality."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(term, est): MIN over the term's depth probe cells; a cell absent
    from the sketch means zero occurrences hashed there → est 0. The
    sketch is depth·width rows → broadcast; the terms side never
    shuffles."""
    probes = terms.select(
        F.col(term_col).alias("term"), F.explode(_probes(term_col, depth, width)).alias("p")
    ).select("term", "p.row_i", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
