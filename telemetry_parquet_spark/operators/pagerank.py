"""Fixed-point PageRank — an iterative graph algorithm with a BYTE-EXACT
cross-engine oracle.

Iterative float PageRank can't be oracle-checked exactly (summation order
changes the low bits per engine/partitioning). This implementation runs the
whole recurrence in scaled INTEGER arithmetic: ranks are bigints scaled by
``scale`` (default 10^12), the damping factor is the exact rational 85/100,
and every step is integer multiply/divide — so any engine that executes the
same recurrence produces bit-identical ranks, which is exactly what the
``graph_pagerank`` DuckDB recursive-CTE oracle does. (Truncation loses
< 1 ulp of 10^-12 per step — irrelevant for ranking, decisive for
testability.)

Dangling mass is NOT redistributed (nodes without out-edges leak their rank
each step, the classic simplification); both engines implement the same
recurrence so the oracle stays exact. Teleport keeps every node ≥ the
baseline.

Scale notes (100 TB graphs):
- per iteration: one join of the edge list with the rank vector (shuffle on
  src) and one aggregation (shuffle on dst) — the standard distributed
  PageRank shape; edge list + degrees are computed once and reused
  (``localCheckpoint``), and each iteration's result is checkpointed so the
  plan stays O(1) deep instead of O(iterations);
- a skewed in-degree hub is one hot reduce key — AQE's skew handling or the
  salted-agg shape (operators/skew.py) applies unchanged;
- convergence detection (sum |Δrank|) would add one tiny aggregate per
  iteration; fixed ``iters`` keeps the oracle replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 2,
    salt_buckets: int | None = None,
    seed_mod: int | None = None,
) -> DataFrame:
    """Run ``iters`` synchronous PageRank steps over ``edges`` (src, dst —
    duplicates ignored) in scaled-integer arithmetic; returns (id, rank_s).

    rank'_d = (scale/N * (den-num))/den + (Σ_{s→d} rank_s/deg_s * num)/den
    with every division an integer division.

    ``salt_buckets``: hub-skew guard for the per-iteration reduce. A
    celebrity node's in-edges all land on one ``dst`` reduce key; with
    ``salt_buckets=N`` the sum runs in two phases — groupBy (dst, salt)
    partials, then merge per dst — bounding any single task's input to
    ~1/N of the hottest key (the operators/skew.py shape). Integer sums
    are associative+commutative, so the result is BIT-IDENTICAL to the
    direct groupBy (property-tested); default off because the extra
    shuffle only pays for itself under real skew (AQE handles the mild
    case).

    ``seed_mod`` switches to PERSONALIZED PageRank: the teleport mass goes
    only to the seed set (nodes with ``id % seed_mod == 0`` — a modulus
    predicate so an SQL oracle can share the membership test; a production
    seed set is any broadcastable membership column) and ranks initialize
    uniform over the seeds. Same scaled-integer recurrence, same exact
    oracle discipline; non-seed nodes earn rank only through incoming
    links from the seeds' neighborhoods.
    """
    # Build-phase shuffle discipline (r13 optimization, guide §2.4): dedup
    # via repartition-on-src + partition-local hash-agg (HashPartitioning(src)
    # clusters equal (src, dst) rows, so dropDuplicates adds NO second
    # exchange), and persist() — NOT localCheckpoint, which reports
    # UnknownPartitioning under AQE — so (a) the edge derivation runs ONCE
    # for its three consumers (nodes / deg / aug) instead of replaying the
    # upstream lineage per consumer, and (b) the src partitioning is visible
    # downstream: deg's groupBy("src") and aug's join on "src" both reuse it
    # with zero additional exchanges. The explicit partition count pins the
    # layout against AQE coalescing so the per-iteration join below stays
    # exchange-free on the big side (count from conf — scale-adaptive, not
    # a local constant).
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        edges.select("src", "dst")
        .repartition(n_part, "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_fixed_point: edge list is empty (no nodes)")
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # marker self-loops guarantee every node appears as a dst each step
    # (zero contribution), so teleport reaches in-degree-0 nodes too.
    # Re-partitioned on src and persisted: every iteration's contribution
    # join then reads aug CO-PARTITIONED on the join key — only the
    # node-sized rank vector moves per iteration, never the edge relation
    # (the dominant per-iteration exchange before this change).
    aug = (
        edges.join(deg, "src")
        .select("src", "dst", "d", F.lit(True).alias("is_real"))
        .unionByName(
            nodes.select(
                F.col("id").alias("src"),
                F.col("id").alias("dst"),
                F.lit(1).cast("long").alias("d"),
                F.lit(False).alias("is_real"),
            )
        )
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    if seed_mod is None:
        init = scale // n
        teleport = (init * (damp_den - damp_num)) // damp_den
        ranks = nodes.select("id", F.lit(init).cast("long").alias("rank_s"))
        tele_col = F.lit(teleport).cast("long")
    else:
        n_seeds = nodes.where(F.col("id") % seed_mod == 0).count()
        if n_seeds == 0:
            raise ValueError("pagerank_fixed_point: empty seed set")
        init = scale // n_seeds
        teleport = (init * (damp_den - damp_num)) // damp_den
        ranks = nodes.select(
            "id",
            F.when(F.col("id") % seed_mod == 0, F.lit(init))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank_s"),
        )
        tele_col = (
            F.when(F.col("dst") % seed_mod == 0, F.lit(teleport))
            .otherwise(F.lit(0))
            .cast("long")
        )
    for it in range(iters):
        contrib = aug.join(ranks, aug["src"] == ranks["id"]).select(
            "src",
            "dst",
            F.when(F.col("is_real"), F.expr("rank_s div d"))
            .otherwise(F.lit(0).cast("long"))
            .alias("c"),
        )
        if salt_buckets:
            # phase 1: the hot dst's rows split across salt_buckets partial
            # sums (salted on src, a deterministic column — no nondeterminism
            # under task retries); phase 2 merges the partials per dst.
            inc = (
                contrib.withColumn(
                    "__salt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets))
                )
                .groupBy("dst", "__salt")
                .agg(F.sum("c").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inc"))
            )
        else:
            inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            inc.select(
                F.col("dst").alias("id"),
                (
                    tele_col
                    + F.expr(f"(inc * {damp_num}) div {damp_den}")
                ).cast("long").alias("rank_s"),
            )
        )
        # checkpoint on a stride, not per-iteration: each materialization is
        # a full write of the rank vector, and lineage ≤ checkpoint_every
        # joins deep stays cheap to replan (measured 2× faster at stride 2
        # vs stride 1 at sf0.1 — same result, bit-for-bit)
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks
