"""Catalog: one named namespace over the engine's objects — snapshot
tables and materialized views — with the DDL that creates them from SQL.

Everything round 9 built (commit-log tables, branches, MVs, the scan/
join planners, the SQL front door) takes explicit paths; the catalog is
the thin durable layer that names them. State is one JSON registry under
the catalog root (atomic write-replace), objects default to
subdirectories of that root, and ``Catalog.sql`` wires the whole surface
together: every statement the front door supports, plus

- ``CREATE TABLE <t> AS SELECT …``        — CTAS: the SELECT runs through
  the same rewriter (time travel, other catalog tables), and the result
  commits as version 1 of a NEW snapshot table
- ``CREATE MATERIALIZED VIEW <v> AS SELECT <group cols + COUNT/SUM/AVG>
  FROM <t> GROUP BY …``                   — the restricted rollup shape
  (sql_front's MV parser) materialized via ``views.create_view`` and
  registered so later GROUP-BY aggregates on <t> answer from it
  automatically
- ``REFRESH MATERIALIZED VIEW <v>``       — incremental catch-up
  (``table_changes``-sized, never the base)
- ``DROP TABLE <t>`` / ``DROP MATERIALIZED VIEW <v>`` — unregister
  (files stay until vacuumed/removed out of band; a catalog drop is a
  metadata act, the table-format discipline)

Scale: the registry is object-count-sized JSON; reads resolve names to
roots and delegate — no data I/O in the catalog layer itself.

Reference parity: the reference's "catalog" is a hand-maintained S3
prefix convention per job (views/MainEventsView.scala:55 —
``s"$jobName/$schemaVersion/…"``). Net-new engine surface.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources import views as V
from telemetry_parquet_spark.sources.sql_front import (
    _AGG_ITEM,
    _split_assignments,
    engine_sql,
)


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "catalog.json")

    # -- registry ----------------------------------------------------
    def _load(self) -> dict:
        try:
            with open(self._path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"tables": {}, "views": {}}

    def _save(self, state: dict) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, self._path)  # atomic on POSIX

    def tables(self) -> dict[str, str]:
        return dict(self._load()["tables"])

    def views_for_sql(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for info in self._load()["views"].values():
            out.setdefault(info["base"], []).append(info["root"])
        return out

    # -- tables ------------------------------------------------------
    def register_table(self, name: str, root: str) -> None:
        state = self._load()
        if name in state["tables"]:
            raise ValueError(f"table {name!r} already cataloged")
        state["tables"][name] = os.path.abspath(root)
        self._save(state)

    def create_table(self, spark: SparkSession, name: str, df: DataFrame) -> str:
        if name in self._load()["tables"]:  # before any data is written
            raise ValueError(f"table {name!r} already cataloged")
        root = os.path.join(self.root, name)
        S.append(spark, root, df)
        self.register_table(name, root)
        return root

    def table_root(self, name: str) -> str:
        t = self._load()["tables"]
        if name not in t:
            raise KeyError(f"unknown table {name!r}")
        return t[name]

    def drop_table(self, name: str) -> None:
        state = self._load()
        if name not in state["tables"]:
            raise KeyError(f"unknown table {name!r}")
        dependents = [
            v for v, info in state["views"].items() if info["base"] == name
        ]
        if dependents:
            raise ValueError(
                f"table {name!r} has materialized views {dependents}; "
                "drop them first"
            )
        del state["tables"][name]
        self._save(state)

    # -- materialized views -------------------------------------------
    def create_materialized_view(
        self,
        spark: SparkSession,
        name: str,
        base: str,
        group_cols: list[str],
        sum_cols: list[str],
    ) -> str:
        state = self._load()
        if name in state["views"]:
            raise ValueError(f"view {name!r} already cataloged")
        base_root = self.table_root(base)
        view_root = os.path.join(self.root, f"_mv_{name}")
        V.create_view(spark, base_root, view_root, group_cols, sum_cols)
        state = self._load()
        state["views"][name] = {"root": view_root, "base": base}
        self._save(state)
        return view_root

    def refresh_view(self, spark: SparkSession, name: str) -> int:
        info = self._load()["views"].get(name)
        if info is None:
            raise KeyError(f"unknown materialized view {name!r}")
        return V.refresh_view(spark, info["root"])

    def drop_view(self, name: str) -> None:
        state = self._load()
        if name not in state["views"]:
            raise KeyError(f"unknown materialized view {name!r}")
        del state["views"][name]
        self._save(state)

    # -- SQL ----------------------------------------------------------
    def sql(self, spark: SparkSession, statement: str) -> DataFrame:
        """Run one statement against the catalog's namespace: catalog DDL
        (CTAS / CREATE MATERIALIZED VIEW / REFRESH / DROP) handled here,
        everything else delegated to the SQL front door with this
        catalog's tables AND views wired in — so a plain GROUP-BY
        aggregate automatically answers from a subsuming MV."""
        m = re.fullmatch(
            r"\s*CREATE\s+TABLE\s+(\w+)\s+AS\s+(SELECT\s+.+?)\s*;?\s*",
            statement, re.IGNORECASE | re.DOTALL,
        )
        if m:
            rows = engine_sql(spark, m.group(2), self.tables())
            self.create_table(spark, m.group(1), rows)
            return engine_sql(
                spark, f"SELECT COUNT(*) AS n_rows FROM {m.group(1)}",
                self.tables(),
            )

        m = re.fullmatch(
            r"\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+"
            r"SELECT\s+(.+?)\s+FROM\s+(\w+)\s+GROUP\s+BY\s+([\w\s,]+?)"
            r"\s*;?\s*",
            statement, re.IGNORECASE | re.DOTALL,
        )
        if m:
            name, select_list, base, group_sql = m.groups()
            group_cols = [c.strip() for c in group_sql.split(",")]
            sum_cols: list[str] = []
            for item in _split_assignments(select_list):
                if item in group_cols:
                    continue
                am = _AGG_ITEM.fullmatch(item)
                if not am:
                    raise ValueError(
                        f"CREATE MATERIALIZED VIEW: unsupported select "
                        f"item {item!r} (group cols + COUNT/SUM/AVG only)"
                    )
                if am.group(3) and am.group(3) not in sum_cols:
                    sum_cols.append(am.group(3))
            self.create_materialized_view(
                spark, name, base, group_cols, sum_cols or []
            )
            return spark.createDataFrame(
                [(name, base)], "view string, base string"
            )

        m = re.fullmatch(
            r"\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*",
            statement, re.IGNORECASE,
        )
        if m:
            v = self.refresh_view(spark, m.group(1))
            return spark.createDataFrame(
                [(m.group(1), v)], "view string, version int"
            )

        m = re.fullmatch(
            r"\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s*;?\s*",
            statement, re.IGNORECASE,
        )
        if m:
            self.drop_view(m.group(1))
            return spark.createDataFrame([(m.group(1),)], "dropped string")

        m = re.fullmatch(
            r"\s*DROP\s+TABLE\s+(\w+)\s*;?\s*", statement, re.IGNORECASE
        )
        if m:
            self.drop_table(m.group(1))
            return spark.createDataFrame([(m.group(1),)], "dropped string")

        return engine_sql(
            spark, statement, self.tables(), views=self.views_for_sql()
        )
