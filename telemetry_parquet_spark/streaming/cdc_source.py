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

Vacuum-aware: steps pair consecutive SURVIVING versions (retention can
leave gaps — last-N plus tags plus retain-since), and the endpoint diff
across a gap is exact (the multiset diff needs only the two endpoint
manifests). A checkpoint whose resume version was itself vacuumed is a
LOUD error — the state at that version is unreconstructable, the same
rule Delta's change feed applies past its retention window.

Schema-evolution-aware: pre-evolution data files lack the newer columns;
each file is read with the columns it HAS and the missing ones surface
as NULL — the read_snapshot semantics, kept in parity here.

Executor-side reads use pyarrow directly (a DataSource ``read`` runs in
a worker with no SparkSession); the per-step multiset diff is a Counter
over the step's non-shared files only — bounded by the commit's change
volume, never the table (deletion-vector reads are filtered to the
step's files). Nested values (arrays/maps) are canonically frozen for
counting and yielded in their original shape. Offsets are
``{"version": N}`` dicts, so the checkpoint replays exactly like any
file-source offset log: restart resumes at the last committed version.

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


def _surviving(root: str) -> list[int]:
    """Commit versions still on disk, ascending — NOT necessarily
    contiguous once vacuum has expired old manifests."""
    mdir = os.path.join(root, "_manifests")
    return sorted(
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    )


def _latest(root: str) -> int:
    return _surviving(root)[-1]


def _freeze(v):
    """Canonical hashable encoding for the multiset diff (arrays/maps
    arrive as Python lists/dicts from pyarrow and are unhashable)."""
    if isinstance(v, list):
        return ("__l", tuple(_freeze(x) for x in v))
    if isinstance(v, dict):
        return (
            "__m",
            tuple(sorted((k, _freeze(x)) for k, x in v.items())),
        )
    return v


class _StepPartition(InputPartition):
    def __init__(self, root: str, from_v: int, to_v: int):
        self.root = root
        self.from_v = from_v
        self.to_v = to_v


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        from pyspark.sql.types import MapType

        self.root = options["root"]
        self.start = int(options.get("startingversion", 0))
        self.fields = [f.name for f in schema.fields if f.name != "_change"]
        # pyarrow materializes MAP values as lists of (k, v) pairs;
        # Spark's Python-DataSource row converter wants dicts — convert
        # on read (top-level map columns; the snapshot layer's schemas)
        self.map_cols = {
            f.name
            for f in schema.fields
            if isinstance(f.dataType, MapType)
        }

    def initialOffset(self) -> dict:
        return {"version": self.start}

    def latestOffset(self) -> dict:
        return {"version": _latest(self.root)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        alive = _surviving(self.root)
        if lo < hi and lo not in alive:
            raise ValueError(
                f"snapshot_changes: version {lo} was vacuumed — the "
                "stream's resume state is unreconstructable; restart "
                f"from a surviving version (earliest: {alive[0]})"
            )
        steps = [lo] + [v for v in alive if lo < v <= hi]
        return [
            _StepPartition(self.root, a, b)
            for a, b in zip(steps, steps[1:])
        ]

    def read(self, partition: _StepPartition):
        import pyarrow.parquet as pq

        mf = _manifest(partition.root, partition.from_v)
        mt = _manifest(partition.root, partition.to_v)
        from_files, to_files = set(mf["files"]), set(mt["files"])
        f_only = [f for f in mf["files"] if f not in to_files]
        t_only = [f for f in mt["files"] if f not in from_files]

        # merge-on-read deletes: a DV delta re-includes the data files
        # its vectors reference; each side then diffs its LOGICAL rows
        # (own DVs masked out) — mirrors snapshots.py::table_changes.
        dv_f, dv_t = mf.get("dv", []), mt.get("dv", [])
        dv_f_set, dv_t_set = set(dv_f), set(dv_t)
        dv_delta = [d for d in dv_t if d not in dv_f_set] + [
            d for d in dv_f if d not in dv_t_set
        ]

        def dv_positions(dv_files, only=None):
            """(file -> deleted positions), filtered to ``only`` files so
            mask reads cost ∝ the step's region, not the DV history."""
            pos: dict[str, set[int]] = {}
            for d in dv_files:
                t = pq.read_table(os.path.join(partition.root, d))
                for f_, p_ in zip(
                    t.column("file").to_pylist(), t.column("pos").to_pylist()
                ):
                    if only is not None and f_ not in only:
                        continue
                    pos.setdefault(f_, set()).add(p_)
            return pos

        touched = set(dv_positions(dv_delta)) if dv_delta else set()
        files_old = sorted(set(f_only) | (touched & from_files))
        files_new = sorted(set(t_only) | (touched & to_files))
        mask_old = dv_positions(dv_f, only=set(files_old)) if dv_f else {}
        mask_new = dv_positions(dv_t, only=set(files_new)) if dv_t else {}

        def rows(files, mask):
            for f in files:
                path = os.path.join(partition.root, f)
                have = set(pq.read_schema(path).names)
                cols = [c for c in self.fields if c in have]
                table = pq.read_table(path, columns=cols)
                dead = mask.get(f, ())
                for i, rec in enumerate(table.to_pylist()):
                    if i in dead:
                        continue
                    # pre-evolution files: absent columns surface NULL,
                    # the read_snapshot parity rule
                    yield tuple(
                        dict(v)
                        if c in self.map_cols and v is not None
                        else v
                        for c in self.fields
                        for v in (rec.get(c),)
                    )

        originals: dict = {}

        def counted(it):
            c: Counter = Counter()
            for row in it:
                key = tuple(_freeze(v) for v in row)
                originals.setdefault(key, row)
                c[key] += 1
            return c

        diff = counted(rows(files_new, mask_new))
        diff.subtract(counted(rows(files_old, mask_old)))
        for key, n in diff.items():
            tag = "insert" if n > 0 else "delete"
            row = originals[key]
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
