"""Structured Streaming CDC SOURCE for the versioned snapshot table —
a PySpark 4 Python DataSource whose offsets ARE commit versions.

``spark.readStream.format("snapshot_changes").option("root", …)`` turns
the commit log (sources/snapshots.py) into a change stream: each
micro-batch covers a half-open version interval (start, end], one input
partition per version step, and every step's rows are the SAME
non-shared-files multiset diff ``table_changes`` computes — inserts and
deletes tagged in a ``_change`` column. Appends therefore stream ∝
appended data, COW deletes/merges ∝ their affected region, and pure
re-layouts (compaction, restore) contribute NOTHING; downstream the feed
drives watermarked aggregations or ``refresh_view_incremental`` state.

Executor-side reads use pyarrow directly (a DataSource ``read`` runs in
a worker with no SparkSession); the per-step multiset diff is a Counter
over the step's non-shared files only — bounded by the commit's change
volume, never the table. Offsets are ``{"version": N}`` dicts, so the
checkpoint replays exactly like any file-source offset log: restart
resumes at the last committed version.

The exactly-once SINK counterpart is
``pipelines.py::stream_commit_snapshots``; together they close the loop:
a table can be both produced and consumed as streams of atomic commits.
"""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructType

FORMAT_NAME = "snapshot_changes"


def _manifest(root: str, version: int) -> dict:
    with open(
        os.path.join(root, "_manifests", f"v{version:06d}.json")
    ) as f:
        return json.load(f)


def _latest(root: str) -> int:
    mdir = os.path.join(root, "_manifests")
    versions = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions)


class _StepPartition(InputPartition):
    def __init__(self, root: str, from_v: int, to_v: int):
        self.root = root
        self.from_v = from_v
        self.to_v = to_v


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.root = options["root"]
        self.start = int(options.get("startingversion", 0))
        self.fields = [f.name for f in schema.fields if f.name != "_change"]

    def initialOffset(self) -> dict:
        return {"version": self.start}

    def latestOffset(self) -> dict:
        return {"version": _latest(self.root)}

    def partitions(self, start: dict, end: dict):
        return [
            _StepPartition(self.root, v - 1, v)
            for v in range(start["version"] + 1, end["version"] + 1)
        ]

    def read(self, partition: _StepPartition):
        import pyarrow.parquet as pq

        mf = _manifest(partition.root, partition.from_v)
        mt = _manifest(partition.root, partition.to_v)
        f_only = [f for f in mf["files"] if f not in set(mt["files"])]
        t_only = [f for f in mt["files"] if f not in set(mf["files"])]

        # merge-on-read deletes: a DV delta re-includes the data files
        # its vectors reference; each side then diffs its LOGICAL rows
        # (own DVs masked out) — mirrors snapshots.py::table_changes.
        dv_f, dv_t = mf.get("dv", []), mt.get("dv", [])
        dv_delta = [d for d in dv_t if d not in set(dv_f)] + [
            d for d in dv_f if d not in set(dv_t)
        ]

        def dv_positions(dv_files):
            pos: dict[str, set[int]] = {}
            for d in dv_files:
                t = pq.read_table(os.path.join(partition.root, d))
                for f_, p_ in zip(
                    t.column("file").to_pylist(), t.column("pos").to_pylist()
                ):
                    pos.setdefault(f_, set()).add(p_)
            return pos

        touched = set(dv_positions(dv_delta)) if dv_delta else set()
        files_old = sorted(set(f_only) | (touched & set(mf["files"])))
        files_new = sorted(set(t_only) | (touched & set(mt["files"])))
        mask_old = dv_positions(dv_f) if dv_f else {}
        mask_new = dv_positions(dv_t) if dv_t else {}

        def rows(files, mask):
            for f in files:
                table = pq.read_table(
                    os.path.join(partition.root, f), columns=self.fields
                )
                dead = mask.get(f, ())
                for i, rec in enumerate(table.to_pylist()):
                    if i in dead:
                        continue
                    yield tuple(rec[c] for c in self.fields)

        diff = Counter(rows(files_new, mask_new))
        diff.subtract(Counter(rows(files_old, mask_old)))
        for row, n in diff.items():
            tag = "insert" if n > 0 else "delete"
            for _ in range(abs(n)):
                yield row + (tag,)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the streaming checkpoint's offset log


class SnapshotChangesDataSource(DataSource):
    """``format("snapshot_changes")`` — options: ``root`` (table path),
    ``startingVersion`` (default 0: stream every commit from the
    beginning; pass the current head to only stream future commits)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        root = self.options["root"]
        m = _manifest(root, _latest(root))
        schema = StructType.fromJson(json.loads(m["schema"]))
        return schema.add("_change", StringType())

    def streamReader(self, schema: StructType):
        return SnapshotChangesStreamReader(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(SnapshotChangesDataSource)
