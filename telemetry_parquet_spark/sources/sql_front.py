"""SQL front door for snapshot tables: time-travel syntax over the
commit log.

``engine_sql(spark, sql, tables={name: root})`` lets a user write ONE
SQL statement against versioned snapshot tables (``sources/snapshots.py``)
with the time-travel syntax the public table formats expose:

- ``<name> VERSION AS OF <n>``        — manifest-pinned read of version n
- ``<name> TIMESTAMP AS OF <epoch>``  — resolved via ``version_as_of``
- ``DESCRIBE HISTORY <name>``         — the commit log as a DataFrame
- bare ``<name>``                     — the table HEAD at call time

Spark-first design: this is a *rewriter*, not an interpreter. Each
referenced ``(table, version)`` pair is registered once as a temp view
backed by ``read_snapshot``'s manifest-pinned file list, the time-travel
clause in the statement is replaced by the view name, and the statement
runs through ``spark.sql`` — Catalyst sees ordinary views, so predicate
pushdown, column pruning and AQE all apply unchanged. Cross-version
queries (join v1 against v3) are therefore ONE Catalyst plan, not a
driver-side loop over versions (driver-gated by
``snapshot_sql_cross_version``).

Rewrite scope and honesty: substitution is identifier-level regex over
ONLY the names in ``tables`` (word-bounded, case-sensitive); a string
literal containing such a phrase would also match. That is the documented
trade of a front door over a full parser — the engine API
(``read_snapshot`` et al.) remains the primary surface, this module is
the SQL-ergonomics layer on top.

Scale: registering a view costs one manifest read (file-list-sized);
no data moves until the statement executes. HEAD resolution pins the
version at registration, so a concurrent commit cannot make one
statement read two different tables.

Reference parity: the reference has no SQL front end at all (its jobs
are hard-wired Scala); net-new engine surface extending §2.13.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from telemetry_parquet_spark.sources.snapshots import (
    history,
    latest_version,
    read_snapshot,
    version_as_of,
)

_HISTORY_SCHEMA = StructType(
    [
        StructField("version", IntegerType(), False),
        StructField("action", StringType(), False),
        StructField("parent", IntegerType(), True),
        StructField("n_files", IntegerType(), False),
    ]
)


def describe_history(spark: SparkSession, root: str) -> DataFrame:
    """``DESCRIBE HISTORY`` — the commit log, oldest first, as a
    DataFrame (version, action, parent, n_files). Manifest-sized: one
    row per commit, no data files touched."""
    rows = [
        (h["version"], h["action"], h["parent"], h["n_files"])
        for h in history(root)
    ]
    return spark.createDataFrame(rows, _HISTORY_SCHEMA)


def _view_name(name: str, version: int) -> str:
    return f"__snap_{name}_v{version}"


def _register(
    spark: SparkSession, name: str, root: str, version: int
) -> str:
    view = _view_name(name, version)
    read_snapshot(spark, root, version).createOrReplaceTempView(view)
    return view


def engine_sql(
    spark: SparkSession, sql: str, tables: dict[str, str]
) -> DataFrame:
    """Run ``sql`` with time-travel syntax resolved against ``tables``
    (logical name -> snapshot root). See module docstring for the
    supported clauses and the rewrite contract."""
    m = re.fullmatch(
        r"\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        name = m.group(1)
        if name not in tables:
            raise KeyError(f"unknown snapshot table {name!r}")
        return describe_history(spark, tables[name])

    for name, root in tables.items():
        def _sub_version(mo: re.Match) -> str:
            return _register(spark, name, root, int(mo.group(1)))

        def _sub_timestamp(mo: re.Match) -> str:
            ts = float(mo.group(1))
            return _register(spark, name, root, version_as_of(root, ts))

        sql = re.sub(
            rf"\b{re.escape(name)}\s+VERSION\s+AS\s+OF\s+(\d+)",
            _sub_version,
            sql,
            flags=re.IGNORECASE,
        )
        sql = re.sub(
            rf"\b{re.escape(name)}\s+TIMESTAMP\s+AS\s+OF\s+"
            r"([0-9]+(?:\.[0-9]+)?)",
            _sub_timestamp,
            sql,
            flags=re.IGNORECASE,
        )
        # Bare references resolve to the HEAD pinned now — register under
        # the table's own name so no rewrite of the statement is needed.
        if re.search(rf"\b{re.escape(name)}\b", sql):
            read_snapshot(
                spark, root, latest_version(root)
            ).createOrReplaceTempView(name)
    return spark.sql(sql)
