"""CDC-source hardening (streaming/cdc_source.py): vacuum-gapped commit
logs, schema-evolution files, nested (unhashable) column types."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.streaming import cdc_source


def _drain(spark, root, ckpt, starting=None):
    cdc_source.register(spark)
    reader = spark.readStream.format(cdc_source.FORMAT_NAME).option(
        "root", root
    )
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    import uuid

    name = f"cdc_{uuid.uuid4().hex[:10]}"
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    return rows


def test_cdc_streams_across_vacuum_gaps(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):  # v1..v4
        S.append(
            spark, root,
            spark.createDataFrame([(i, float(i))], "k int, x double"),
        )
    S.create_tag(root, "keep", 2)  # retention leaves a GAP: {2, 4}
    S.vacuum(root, keep_last=1, orphan_grace_s=0.0)
    rows = _drain(spark, root, str(tmp_path / "c1"), starting=2)
    # one step spanning the gap (2 -> 4): exactly v3's and v4's inserts
    got = sorted(r.k for r in rows)
    assert got == [2, 3]
    assert all(r._change == "insert" for r in rows)
    # resuming from a VACUUMED version is a loud error, not silence
    with pytest.raises(Exception, match="vacuumed"):
        _drain(spark, root, str(tmp_path / "c2"), starting=1)


def test_cdc_reads_pre_evolution_files_as_null(spark, tmp_path):
    root = str(tmp_path / "t")
    S.append(spark, root, spark.createDataFrame([(1,)], "k int"))
    S.alter_add_column(root, "tag", "string")  # metadata-only widen
    S.append(
        spark, root,
        spark.createDataFrame([(2, "b")], "k int, tag string"),
    )
    # v3: delete the PRE-EVOLUTION row — its file (lacking `tag`) must
    # be readable by the CDC diff under the evolved schema
    S.delete_where(spark, root, "k = 1")
    rows = _drain(spark, root, str(tmp_path / "c"))
    by = {(r.k, r._change): r.tag for r in rows}
    assert by[(1, "insert")] is None  # missing column surfaced as NULL
    assert by[(1, "delete")] is None
    assert by[(2, "insert")] == "b"


def test_cdc_handles_array_and_map_columns(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"x": 1}), (2, [], {})],
        "k int, tags array<string>, props map<string,int>",
    )
    S.append(spark, root, df)
    S.delete_where(spark, root, "k = 2")
    rows = _drain(spark, root, str(tmp_path / "c"))
    ins = {r.k: (list(r.tags), dict(r.props)) for r in rows if r._change == "insert"}
    assert ins[1] == (["a", "b"], {"x": 1})
    dels = [r.k for r in rows if r._change == "delete"]
    assert dels == [2]
