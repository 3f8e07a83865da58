"""Fixed-point PageRank: exact agreement with a pure-Python reference and
ranking sanity on known graph shapes."""

from __future__ import annotations

from telemetry_parquet_spark.operators.pagerank import pagerank_fixed_point

SCALE = 10**12


def _python_pagerank(edges, iters=5, scale=SCALE, num=85, den=100):
    """Same recurrence, pure Python bigints."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    init = scale // n
    teleport = (init * (den - num)) // den
    ranks = {v: init for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += ranks[s] // deg[s]
        ranks = {v: teleport + (inc[v] * num) // den for v in nodes}
    return ranks


def _run(spark, edges, iters=5):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = pagerank_fixed_point(df, iters=iters).collect()
    return {r.id: r.rank_s for r in got}


def test_matches_python_reference_exactly(spark):
    # a small graph with a hub, a chain, a dangling node, and a cycle
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1),   # star around 1
        (5, 6), (6, 7),                                    # chain, 7 dangling
        (8, 9), (9, 10), (10, 8),                          # 3-cycle
        (2, 5),
    ]
    assert _run(spark, edges) == _python_pagerank(edges)


def test_hub_outranks_leaves(spark):
    edges = [(i, 100) for i in range(1, 20)] + [(100, 1)]
    ranks = _run(spark, edges)
    assert ranks[100] == max(ranks.values())
    # teleport floor: every node, including in-degree-0 leaves, is above 0
    assert min(ranks.values()) > 0


def test_salted_reduce_is_bit_identical(spark):
    """Hub-skew guard: the two-phase salted reduce (salt_buckets=N) must
    produce bit-for-bit the same ranks as the direct groupBy — integer sums
    commute, so splitting the hot dst key across salt partials cannot
    change any value. Exercised on a hub-skewed graph (one node receives
    most in-edges) where the guard is actually doing work."""
    # 200 leaves all pointing at the hub, plus structure around it
    edges = (
        [(i, 1000) for i in range(1, 201)]
        + [(1000, 1), (1000, 2), (1, 2), (2, 3), (3, 1)]
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    plain = {r.id: r.rank_s for r in pagerank_fixed_point(df, iters=4).collect()}
    for buckets in (2, 8):
        salted = {
            r.id: r.rank_s
            for r in pagerank_fixed_point(
                df, iters=4, salt_buckets=buckets
            ).collect()
        }
        assert salted == plain
    # and both agree with the pure-Python recurrence
    assert plain == _python_pagerank(edges, iters=4)


def test_iteration_count_changes_result_then_converges(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    one = _run(spark, edges, iters=1)
    five = _run(spark, edges, iters=5)
    # symmetric cycle: ranks equal across nodes at every iteration
    assert len(set(one.values())) == 1 and len(set(five.values())) == 1
    assert _python_pagerank(edges, iters=1) == one


def test_empty_edge_list_raises_clearly(spark):
    import pytest

    from pyspark.sql.types import LongType, StructField, StructType

    empty = spark.createDataFrame(
        [], StructType([StructField("src", LongType()), StructField("dst", LongType())])
    )
    with pytest.raises(ValueError, match="empty"):
        pagerank_fixed_point(empty)


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    """seed_mod teleport: a component with no seeds receives no teleport
    mass and its ranks drain geometrically (0.85^iters of its start), while
    the seeded component holds the mass. Seeds here: id % 7 == 0."""
    from telemetry_parquet_spark.operators.pagerank import pagerank_fixed_point

    # component A contains seeds {7, 14}; component B (ids 1..3) has none
    edges_a = [(7, 14), (14, 7), (7, 8), (8, 7)]
    edges_b = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges_a + edges_b, ["src", "dst"])
    ranks = {
        r["id"]: r["rank_s"]
        for r in pagerank_fixed_point(df, iters=5, seed_mod=7).collect()
    }
    mass_a = sum(v for k, v in ranks.items() if k in (7, 8, 14))
    mass_b = sum(v for k, v in ranks.items() if k in (1, 2, 3))
    assert mass_b < mass_a / 100  # B holds only the drained remnant
    assert ranks[8] > 0  # non-seed in the seeded component earns rank
    # B's remnant is exactly the undamped geometric leftover: non-seed
    # nodes start at 0 there, so after the first iteration it is 0
    assert mass_b == 0
