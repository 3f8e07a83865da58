"""Graph metrics: triangle counting and label-propagation communities.

Triangle counting is the MapReduce-classic degree-oriented algorithm
(Suri & Vassilvitskii, WWW '11; Cohen '09):
orient every undirected edge from its lower-(degree, id) endpoint to the
higher one, enumerate wedges only at each edge's SOURCE, and close them
against the oriented edge set. Orientation bounds the out-degree of every
node by O(sqrt(m)) on any graph (arboricity bound), so the wedge join emits
O(m^1.5) rows worst-case instead of the Σ deg² blow-up a naive
lowest-id orientation suffers on skewed (power-law) graphs — the difference
between "finishes" and "hot-node executor OOM" at 100 TB.

Shapes: two hash-joins keyed on node id (degree attach), one self-join on
the wedge apex, one equi-join on the closing (v, w) pair, one explode +
hash aggregation for per-node counts. All co-partitioned on their keys; no
cartesian anywhere. The result set is triangle-sized, never wedge-sized,
past the closing join.

The enumeration order differs from an id-ordered oracle but the TRIANGLE
SET is identical (each triangle has exactly one orientation-minimal apex),
so per-node counts match an a<b<c three-way-join oracle exactly.

``label_propagation`` is the deterministic synchronous variant of
Raghavan '07 community detection — see its docstring for the
integer-packed argmax that keeps an iterative, tie-breaking algorithm
exactly oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    partition_on: str | None = None,
) -> DataFrame:
    """Undirected edge set normalized to (a < b), loops dropped, distinct.

    ``partition_on`` ("a" or "b"): dedup via repartition-on-that-key +
    partition-local hash-agg instead of a (a, b) distinct — same edge set,
    but the result is hash-partitioned on the key, so a downstream
    consumer that persists it joins/aggregates on that key with ZERO
    further exchanges (guide §2.4; HashPartitioning(a) clusters equal
    (a, b) rows, so dropDuplicates needs no second shuffle). The explicit
    count pins the layout against AQE coalescing; it comes from conf, so
    it scales with the session, not with local[32]."""
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    base = edges.select(a.alias("a"), b.alias("b")).where(F.col("a") != F.col("b"))
    if partition_on is None:
        return base.distinct()
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return base.repartition(n_part, partition_on).dropDuplicates(["a", "b"])


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts.

    Input: an edge list (directed duplicates / loops tolerated — it is
    canonicalized first). Output: ``(node_id, n_triangles)`` for every node
    in at least one triangle.
    """
    # The edge relation fans out to three consumers (degree build ×2 via the
    # union, degree attach) and the oriented relation to three more (both
    # wedge sides + the closing join). Without materialization Spark replays
    # the full upstream derivation once PER REFERENCE — a 6× re-read of the
    # input at 100 TB. persist() keeps the plan lazy while each subtree is
    # computed exactly once per action (MEMORY_AND_DISK default, edge-sized).
    # Lazy return ⇒ no unpersist here; blocks follow the session residue
    # contract (evictable; release via session.clear_cached_relations).
    # Partitioned on "a" at dedup time (r13, guide §2.4) so the first degree
    # attach joins the cached relation with no exchange on the edge side.
    e = canonical_edges(edges, src, dst, partition_on="a").persist()

    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )

    # Orient each edge from the lower (deg, id) endpoint to the higher one.
    # struct comparison gives the lexicographic (deg, id) total order.
    with_deg = (
        e.join(deg.withColumnRenamed("id", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("id", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
    )
    ka = F.struct(F.col("deg_a").alias("deg"), F.col("a").alias("id"))
    kb = F.struct(F.col("deg_b").alias("deg"), F.col("b").alias("id"))
    # Partition the oriented relation on the wedge apex u before persisting
    # (r13, guide §2.4): the wedge self-join below reads BOTH sides from
    # this cache co-partitioned (and, via sortWithinPartitions, co-sorted)
    # on u — zero exchanges and zero per-consumer sorts for the largest
    # join in the query. Count pinned from conf against AQE coalescing.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    oriented = (
        with_deg.select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(ka < kb, kb).otherwise(ka).alias("vkey"),
        )
        .repartition(n_part, "u")
        .sortWithinPartitions("u")
        .persist()
    )

    # Wedges at the apex u: pairs (v, w) with u→v and u→w, emitted once in
    # orientation order (vkey < wkey) so each triangle closes exactly once.
    e1 = oriented.select("u", F.col("v"), F.col("vkey"))
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("w"), F.col("vkey").alias("wkey")
    )
    wedges = e1.join(e2, "u").where(F.col("vkey") < F.col("wkey"))

    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    triangles = wedges.join(closing, ["v", "w"]).select("u", "v", "w")

    return (
        triangles.select(
            F.explode(F.array("u", "v", "w")).alias("node_id")
        )
        .groupBy("node_id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_stride: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan '07),
    made DETERMINISTIC: every node starts as its own label; each iteration
    every node adopts the label with the highest neighbor-vote count, ties
    broken by the SMALLEST label. A fixed iteration count (not
    convergence-polling) keeps the whole run a pure function of the edge
    set — no randomized visit order, no oscillation sensitivity — so the
    algorithm carries an exact cross-engine oracle like fixed-point
    PageRank.

    The argmax is encoded ARITHMETICALLY so it stays a plain MAX aggregate:
    packed = cnt · 2³¹ + (2³¹ − 1 − label); max(packed) decodes to
    (max count, min label). Integer-only — bit-identical on any engine.

    Per iteration: one co-partitioned join (labels onto edge sources) and
    two hash aggregations (vote counts, packed argmax) — the PageRank
    shuffle budget. Labels are node-sized; lineage is truncated every
    ``checkpoint_stride`` iterations (localCheckpoint) so the plan doesn't
    grow with the iteration count. Hub skew: votes pre-aggregate map-side
    on (dst, label), so a hot destination receives at most
    #distinct-neighbor-labels rows per upstream partition."""
    M = 1 << 31

    e = canonical_edges(edges, src, dst)
    # Partitioned on u and persisted — NOT localCheckpoint, which reports
    # UnknownPartitioning under AQE — so each iteration's vote join reads
    # the edge relation CO-PARTITIONED on the join key and only the
    # node-sized label vector moves per iteration (r13, guide §2.4; the
    # edge-side exchange was the dominant per-iteration shuffle). The
    # explicit conf-derived count pins the layout against AQE coalescing.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    both = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .repartition(n_part, "u")
        .sortWithinPartitions("u")
        .persist()
    )
    lbl = (
        both.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    # Packed-argmax precondition: ids (hence labels, which are always
    # adopted from ids) must fit below 2^31 so the decode
    # ``2^31 - 1 - (p % 2^31)`` is exact, and vote counts must fit below
    # 2^32 so ``cnt * 2^31`` fits in int64 — cnt ≤ n_nodes - 1, which the
    # id bound already implies. 64-bit hashed ids would silently mis-decode;
    # fail loudly instead (the check is one tiny agg over the already
    # checkpointed node-sized relation).
    bounds = lbl.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    ).first()
    if bounds["hi"] is not None and (
        int(bounds["hi"]) >= M or int(bounds["lo"]) < 0
    ):
        # a negative id (e.g. a 64-bit hash) would overflow the packed
        # term into the count field and decode to a WRONG label with an
        # inflated vote — exactly the silent corruption this guard exists
        # to prevent; both bounds must hold
        raise ValueError(
            f"label_propagation's packed argmax requires node ids in "
            f"[0, 2^31); got [{bounds['lo']}, {bounds['hi']}]. Densify "
            f"ids first (e.g. row_number/dense_rank remap) or widen "
            f"the packing."
        )
    for i in range(iters):
        votes = (
            both.join(lbl, both["u"] == lbl["id"])
            .groupBy(F.col("v"), F.col("lbl"))
            .agg(F.count("*").alias("cnt"))
        )
        packed = F.max(
            F.col("cnt") * F.lit(M).cast("long")
            + (F.lit(M - 1).cast("long") - F.col("lbl"))
        ).alias("p")
        lbl = (
            votes.groupBy(F.col("v").alias("id"))
            .agg(packed)
            .select(
                "id",
                (F.lit(M - 1).cast("long") - F.col("p") % F.lit(M)).alias("lbl"),
            )
        )
        if (i + 1) % checkpoint_stride == 0 or i == iters - 1:
            lbl = lbl.localCheckpoint()
    return lbl.select(F.col("id").alias("node_id"), F.col("lbl").alias("community"))
