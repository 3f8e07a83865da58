"""Sequence packing: reconstruction (every token exactly once modulo
overlap), budget bound, and partitioning-independence of the assignment."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.packing import (
    chunk_documents,
    pack_chunks,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    vocab = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
            for i in range(40)]
    rows.append((40, ""))  # empty doc: still one (empty) chunk
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunks_reconstruct_documents(spark, docs):
    """Dropping the first `overlap` tokens of every chunk but the first and
    concatenating must reproduce the document exactly — i.e. every token
    appears exactly once modulo the deliberate overlap copies."""
    chunk_size, overlap = 16, 4
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=overlap)
    got = {
        r.doc_id: r.rebuilt
        for r in chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "chunk_text"))
                        ),
                        lambda s: F.when(
                            s["chunk_idx"] == 0, F.split(s["chunk_text"], " ")
                        ).otherwise(
                            F.slice(
                                F.split(s["chunk_text"], " "),
                                overlap + 1,
                                chunk_size,
                            )
                        ),
                    )
                ),
                " ",
            ).alias("rebuilt")
        )
        .collect()
    }
    for row in docs.collect():
        normalized = " ".join(row.text.split())
        assert got[row.doc_id].strip() == normalized, row.doc_id


def test_chunk_and_pack_budget_bounds(spark, docs):
    chunk_size, budget = 16, 64
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=4)
    assert chunks.where(F.col("n_tokens") > chunk_size).count() == 0
    packs = pack_sequences(docs, chunk_size=chunk_size, overlap=4, budget=budget)
    bad = packs.where(
        (F.col("total_tokens") > budget) | (F.col("n_chunks") > budget // chunk_size)
    )
    assert bad.count() == 0
    # every chunk lands in exactly one pack
    n_chunks = chunks.count()
    assert packs.agg(F.sum("n_chunks")).first()[0] == n_chunks


def test_pack_assignment_partitioning_independent(spark, docs):
    """The (bucket, pack_id) a chunk lands in is a pure function of the data
    — physical partitioning must not change it (the property that makes the
    operator deterministic on a 1000-executor cluster)."""
    chunks = chunk_documents(docs)

    def assignment(df):
        return {
            (r.doc_id, r.chunk_idx): (r.bucket, r.pack_id)
            for r in pack_chunks(df).collect()
        }

    assert assignment(chunks.repartition(17)) == assignment(chunks.coalesce(1))


def test_invalid_parameters_rejected(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_size=8, overlap=8)
    with pytest.raises(ValueError, match="budget"):
        pack_chunks(chunk_documents(docs), budget=8, chunk_size=16)
