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
- ``DESCRIBE CATALOG HISTORY``           — the catalog commit log (one
  row per catalog version: which table versions it pins)

The catalog also carries its OWN commit log — the root of cross-table
atomicity (the role the catalog plays in the multi-table-transaction
designs of the public table formats). Each catalog version pins every
cataloged table at a specific table version:

- ``commit_snapshot()`` pins the current heads — a named, durable,
  cross-table CONSISTENT snapshot;
- ``read(name, catalog_version=…)`` / ``sql_at(stmt, catalog_version)``
  resolve bare table names at the pinned versions, so a multi-table
  query sees one transactionally-consistent world, not a torn mix of
  per-table heads read at slightly different times;
- ``transaction()`` makes multi-table writes atomic FOR CATALOG READERS:
  each per-table write stages as an invisible WAP commit, publication is
  per-table metadata-only, and the new catalog version (the only thing a
  catalog reader resolves through) lands in ONE ``O_EXCL`` commit — all
  tables advance together or none do. A crash between table publishes
  and the catalog commit leaves catalog readers on the old consistent
  pins (table-level readers may see individual tables ahead — the
  documented trade of catalog-rooted atomicity, same as the formats).

Scale: the registry is object-count-sized JSON; reads resolve names to
roots and delegate — no data I/O in the catalog layer itself. A catalog
commit is one tiny JSON manifest regardless of data size.

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
        ] + [
            v
            for v, info in state.get("join_views", {}).items()
            if name in (info["fact"], info["dim"])
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
            jv = self._load().get("join_views", {}).get(name)
            if jv is not None:
                from telemetry_parquet_spark.sources.join_views import (
                    refresh_join_view,
                )

                return refresh_join_view(spark, jv["root"])[0]
            raise KeyError(f"unknown materialized view {name!r}")
        return V.refresh_view(spark, info["root"])

    # -- materialized JOIN views (star rollups) -------------------------
    def create_join_view(
        self,
        spark: SparkSession,
        name: str,
        fact: str,
        dim: str,
        on: list[str],
        group_cols: list[str],
        sum_cols: list[str],
        aliases: dict[str, str] | None = None,
    ) -> str:
        """Catalog a fact⋈dim rollup (sources/join_views.py) under
        ``name``; both bases must be cataloged tables — the dependent
        guard in ``drop_table`` covers them. ``aliases`` renames the
        internal state columns (n_rows / sum_<col>) on every read —
        the DDL's AS names, so SELECTs see what CREATE declared."""
        from telemetry_parquet_spark.sources.join_views import (
            create_join_view as _create,
        )

        state = self._load()
        if name in state.get("join_views", {}) or name in state["views"]:
            raise ValueError(f"view {name!r} already cataloged")
        fact_root = self.table_root(fact)
        dim_root = self.table_root(dim)
        view_root = os.path.join(self.root, f"_jv_{name}")
        _create(
            spark, fact_root, dim_root, view_root,
            on=on, group_cols=group_cols, sum_cols=sum_cols,
        )
        state = self._load()
        state.setdefault("join_views", {})[name] = {
            "root": view_root, "fact": fact, "dim": dim,
            "aliases": aliases or {},
        }
        self._save(state)
        return view_root

    def read_join_view(
        self, spark: SparkSession, name: str, auto_refresh: bool = True
    ) -> DataFrame:
        jv = self._load().get("join_views", {}).get(name)
        if jv is None:
            raise KeyError(f"unknown materialized join view {name!r}")
        from telemetry_parquet_spark.sources.join_views import (
            read_join_view as _read,
        )

        df = _read(spark, jv["root"], auto_refresh=auto_refresh)
        for internal, public in (jv.get("aliases") or {}).items():
            df = df.withColumnRenamed(internal, public)
        return df

    def drop_view(self, name: str) -> None:
        state = self._load()
        if name in state["views"]:
            del state["views"][name]
        elif name in state.get("join_views", {}):
            del state["join_views"][name]
        else:
            raise KeyError(f"unknown materialized view {name!r}")
        self._save(state)

    # -- catalog commit log (cross-table consistency) ------------------
    def _log_dir(self) -> str:
        return os.path.join(self.root, "_catalog_log")

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir(), f"v{version:06d}.json")

    def _list_catalog_versions(self) -> list[int]:
        """Surviving catalog versions, ascending. NOT necessarily
        contiguous — ``vacuum`` expires old ones, so every reader must
        iterate this list, never ``range(head + 1)``."""
        try:
            names = os.listdir(self._log_dir())
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:-5]) for n in names if n.endswith(".json")
        )

    def catalog_version(self) -> int:
        """Latest catalog version, or -1 when no snapshot was ever
        committed (bare-registry catalogs stay fully usable)."""
        vs = self._list_catalog_versions()
        return vs[-1] if vs else -1

    def read_catalog_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as f:
            return json.load(f)

    def commit_snapshot(
        self,
        action: str = "pin",
        pins: dict[str, int] | None = None,
        extra: dict | None = None,
    ) -> int:
        """Commit a catalog version pinning EVERY cataloged table at a
        table version (``pins`` overrides per table; default = current
        head). ``O_EXCL`` on the catalog manifest is the linearization
        point — same optimistic-concurrency contract as table commits,
        retryable via ``snapshots.commit_with_retry``."""
        import time as _time

        tables = self.tables()
        resolved = {
            name: (pins or {}).get(name, S.latest_version(root))
            for name, root in tables.items()
        }
        parent = self.catalog_version()
        version = parent + 1
        os.makedirs(self._log_dir(), exist_ok=True)
        fd = os.open(
            self._commit_path(version),
            os.O_CREAT | os.O_EXCL | os.O_WRONLY,
        )
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "version": version,
                    "parent": parent if parent >= 0 else None,
                    "action": action,
                    "pins": resolved,
                    "committed_at": _time.time(),
                    **(extra or {}),  # e.g. the streaming sink's
                },                    # (stream, batch_id) stamp, atomic
                f,
            )
        return version

    def pins_at(self, catalog_version: int | None = None) -> dict[str, int]:
        """Table-name -> table-version pins of a catalog version (latest
        by default). Tables cataloged AFTER that snapshot are absent —
        a consistent read exposes only the world the snapshot saw."""
        v = (
            self.catalog_version()
            if catalog_version is None
            else catalog_version
        )
        if v < 0:
            raise ValueError("catalog has no committed snapshot yet")
        return dict(self.read_catalog_commit(v)["pins"])

    def read(
        self,
        spark: SparkSession,
        name: str,
        catalog_version: int | None = None,
    ) -> DataFrame:
        """Read a cataloged table — at HEAD (default), or at the version
        a specific catalog snapshot pinned it to (cross-table consistent
        time travel: pass ``cat.catalog_version()`` for the latest
        snapshot)."""
        root = self.table_root(name)
        if catalog_version is None:
            return S.read_snapshot(spark, root)
        pins = self.pins_at(catalog_version)
        if name not in pins:
            raise KeyError(
                f"table {name!r} is not pinned by catalog version "
                f"{catalog_version}: cataloged after that snapshot"
            )
        return S.read_snapshot(spark, root, pins[name])

    def sql_at(
        self, spark: SparkSession, statement: str, catalog_version: int
    ) -> DataFrame:
        """Run a QUERY with every bare table reference resolved at the
        catalog snapshot's pins — one transactionally-consistent
        multi-table world. Mutators are rejected (mutating 'the past'
        has no meaning); explicit ``AS OF`` clauses still work and
        escape the pins deliberately."""
        first = statement.strip().split(None, 1)[0].upper()
        if first not in ("SELECT", "WITH", "DESCRIBE", "EXPLAIN"):
            raise ValueError(
                f"sql_at: only queries run against a pinned catalog "
                f"version (got {first})"
            )
        pins = self.pins_at(catalog_version)
        return engine_sql(
            spark,
            statement,
            {n: r for n, r in self.tables().items() if n in pins},
            pins=pins,
        )

    def catalog_version_as_of(self, ts: float) -> int:
        """The latest catalog version committed at or before ``ts`` —
        cross-table time travel by timestamp, the catalog analog of
        ``snapshots.version_as_of``."""
        best = -1
        for v in self._list_catalog_versions():
            if self.read_catalog_commit(v)["committed_at"] <= ts:
                best = v
        if best < 0:
            raise FileNotFoundError(
                f"no catalog snapshot existed at timestamp {ts} "
                "(or it was vacuumed)"
            )
        return best

    def vacuum(
        self, keep_last_catalog: int = 1, keep_last_table: int = 1
    ) -> dict[str, list[str]]:
        """Catalog-aware retention — the ONLY safe way to vacuum
        cataloged tables. Table-level ``snapshots.vacuum`` knows nothing
        about catalog pins, so it could reclaim a table version some
        catalog snapshot still references and silently break every
        pinned read of that snapshot. This method first expires old
        catalog versions (keeping the last ``keep_last_catalog``), then
        vacuums each table with the SURVIVING catalog pins passed as
        explicit keeps — a retained catalog version is readable forever
        by construction. Returns removed files per table."""
        versions = self._list_catalog_versions()
        survivors = versions[-keep_last_catalog:] if versions else []
        for v in versions:
            if v not in survivors:
                os.remove(self._commit_path(v))
        pinned: dict[str, set[int]] = {}
        for v in survivors:
            for name, tv in self.read_catalog_commit(v)["pins"].items():
                pinned.setdefault(name, set()).add(tv)
        # stale views need their RECORDED base versions to survive — an
        # incremental catch-up diffs from that version's manifest, so
        # vacuuming it would wedge the view permanently
        state = self._load()
        for info in state["views"].values():
            vm = V.view_info(info["root"])
            pinned.setdefault(info["base"], set()).add(
                vm["mv_base_version"]
            )
        for info in state.get("join_views", {}).values():
            from telemetry_parquet_spark.sources.join_views import (
                join_view_info,
            )

            jm = join_view_info(info["root"])
            pinned.setdefault(info["fact"], set()).add(
                jm["jv_fact_version"]
            )
            pinned.setdefault(info["dim"], set()).add(
                jm["jv_dim_version"]
            )
        removed = {}
        for name, root in self.tables().items():
            removed[name] = S.vacuum(
                root,
                keep_last=keep_last_table,
                keep_versions=pinned.get(name, set()),
            )
        # view state tables (rollup MVs and join views) are snapshot
        # tables too: every refresh is a version, so retention applies —
        # no catalog pins reference them, plain keep_last suffices
        state = self._load()
        for name, info in {
            **state["views"],
            **state.get("join_views", {}),
        }.items():
            removed[name] = S.vacuum(
                info["root"], keep_last=keep_last_table
            )
        return removed

    def transaction(self, spark: SparkSession) -> "CatalogTransaction":
        return CatalogTransaction(self, spark)

    # -- SQL ----------------------------------------------------------
    def sql(self, spark: SparkSession, statement: str) -> DataFrame:
        """Run one statement against the catalog's namespace: catalog DDL
        (CTAS / CREATE MATERIALIZED VIEW / REFRESH / DROP) handled here,
        everything else delegated to the SQL front door with this
        catalog's tables AND views wired in — so a plain GROUP-BY
        aggregate automatically answers from a subsuming MV."""
        m = re.match(r"\s*EXPLAIN\s+", statement, re.IGNORECASE)
        if m:
            # EXPLAIN is side-effect-free: join views referenced by the
            # statement are REPORTED (what a read would do) but never
            # caught up here
            base = engine_sql(
                spark, statement, self.tables(),
                views=self.views_for_sql(),
            )
            inner = statement[m.end():]
            rows = []
            for name, jv in self._load().get("join_views", {}).items():
                if not re.search(rf"\b{re.escape(name)}\b", inner):
                    continue
                from telemetry_parquet_spark.sources.join_views import (
                    join_view_info,
                )

                info = join_view_info(jv["root"])
                f_lag = (
                    S.latest_version(info["jv_fact_root"])
                    - info["jv_fact_version"]
                )
                d_lag = (
                    S.latest_version(info["jv_dim_root"])
                    - info["jv_dim_version"]
                )
                mode = (
                    "noop" if not (f_lag or d_lag)
                    else "full" if d_lag
                    else "incremental"
                )
                rows.append(
                    (
                        "join_view",
                        f"{name}: refresh-on-read mode={mode} "
                        f"(fact lag {f_lag}, dim lag {d_lag} commits)",
                    )
                )
            if rows:
                base = base.unionAll(
                    spark.createDataFrame(rows, base.schema)
                )
            return base
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
            r"\s*CREATE\s+MATERIALIZED\s+JOIN\s+VIEW\s+(\w+)\s+AS\s+"
            r"SELECT\s+(.+?)\s+FROM\s+(\w+)\s+JOIN\s+(\w+)\s+"
            r"USING\s*\(\s*([\w\s,]+?)\s*\)\s+GROUP\s+BY\s+([\w\s,]+?)"
            r"\s*;?\s*",
            statement, re.IGNORECASE | re.DOTALL,
        )
        if m:
            name, select_list, fact, dim, on_sql, group_sql = m.groups()
            group_cols = [c.strip() for c in group_sql.split(",")]
            sum_cols: list[str] = []
            aliases: dict[str, str] = {}  # internal state col -> AS name
            for item in _split_assignments(select_list):
                if item in group_cols:
                    continue
                am = _AGG_ITEM.fullmatch(item)
                if not am:
                    raise ValueError(
                        f"CREATE MATERIALIZED JOIN VIEW: unsupported "
                        f"select item {item!r} (group cols + COUNT/SUM "
                        "only)"
                    )
                if am.group(2) and am.group(2).lower() == "avg":
                    # the join view serves RAW state (no rewrite layer to
                    # re-derive sum/count), so AVG would silently return
                    # the SUM under the AVG's alias — refuse loudly
                    raise ValueError(
                        "CREATE MATERIALIZED JOIN VIEW: AVG is not "
                        "derivable from the raw state a join view "
                        "serves; materialize SUM and COUNT(*) and "
                        "divide in the SELECT"
                    )
                if am.group(3) and am.group(3) not in sum_cols:
                    sum_cols.append(am.group(3))
                internal = (
                    f"sum_{am.group(3)}" if am.group(3) else "n_rows"
                )
                if am.group(4):
                    aliases[internal] = am.group(4)
            self.create_join_view(
                spark, name, fact, dim,
                on=[c.strip() for c in on_sql.split(",")],
                group_cols=group_cols, sum_cols=sum_cols,
                aliases=aliases,
            )
            return spark.createDataFrame(
                [(name, fact, dim)], "view string, fact string, dim string"
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

        m = re.fullmatch(
            r"\s*DESCRIBE\s+CATALOG\s+HISTORY\s*;?\s*",
            statement, re.IGNORECASE,
        )
        if m:
            rows = [
                (
                    c["version"],
                    c["action"],
                    json.dumps(c["pins"], sort_keys=True),
                )
                for c in (
                    self.read_catalog_commit(v)
                    for v in self._list_catalog_versions()
                )
            ]
            return spark.createDataFrame(
                rows, "version int, action string, pins string"
            )

        # join views are readable relations: catch each referenced one up
        # to its bases and register it (alias-renamed) for the statement
        for name in self._load().get("join_views", {}):
            if re.search(rf"\b{re.escape(name)}\b", statement):
                self.read_join_view(spark, name).createOrReplaceTempView(
                    name
                )
        return engine_sql(
            spark, statement, self.tables(), views=self.views_for_sql()
        )


class CatalogTransaction:
    """Multi-table atomic write, rooted in the catalog commit log.

    Usage::

        with cat.transaction(spark) as tx:
            tx.append("facts", new_facts)
            tx.append("dims", new_dims)
        # exiting the block publishes + commits ONE catalog version

    Each ``append`` stages a WAP commit — data lands but NO reader (head
    read, time travel, SQL, CDC, catalog) can see it. On clean exit the
    stages publish per table (metadata-only, rebased onto moved heads
    under the append-commutes rule) and one ``O_EXCL`` catalog commit
    pins the published versions — the all-or-nothing point for catalog
    readers. On exception, or ``abort()``, every stage is discarded and
    no table OR catalog version is created. Exactly-once: a transaction
    object commits at most once (stages are consumed)."""

    def __init__(self, cat: Catalog, spark: SparkSession):
        import uuid

        self._cat = cat
        self._spark = spark
        self._txn_id = uuid.uuid4().hex[:12]
        self._stages: list[tuple[str, str, str]] = []  # (name, root, wap)
        self._done = False

    def append(self, name: str, df: DataFrame) -> None:
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        root = self._cat.table_root(name)
        wap_id = f"txn-{self._txn_id}-{len(self._stages)}"
        S.stage_append(self._spark, root, df, wap_id)
        self._stages.append((name, root, wap_id))

    def delete_where(self, name: str, predicate) -> None:
        """Stage a merge-on-read delete — the cross-table 'remove this
        entity everywhere' case: matched positions freeze at stage time
        and publish as deletion vectors with the rest of the
        transaction, atomically for catalog readers."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        root = self._cat.table_root(name)
        wap_id = f"txn-{self._txn_id}-{len(self._stages)}"
        S.stage_delete_mor(self._spark, root, predicate, wap_id)
        self._stages.append((name, root, wap_id))

    def update_where(
        self, name: str, predicate, assignments: dict[str, object]
    ) -> None:
        """Stage a merge-on-read update (mask + updated copies, both
        frozen at stage time) — with append and delete_where this
        completes the transactional DML triangle."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        root = self._cat.table_root(name)
        wap_id = f"txn-{self._txn_id}-{len(self._stages)}"
        S.stage_update_mor(self._spark, root, predicate, assignments, wap_id)
        self._stages.append((name, root, wap_id))

    def abort(self) -> None:
        for _, root, wap_id in self._stages:
            try:
                S.discard_staged(root, wap_id)
            except FileNotFoundError:
                pass  # never staged / already consumed
        self._stages, self._done = [], True

    def commit(self) -> int:
        """Publish every staged append, then pin the results in one
        catalog commit. A publish failure (audit veto semantics live at
        publish time) aborts the REMAINING stages; already-published
        table versions stay — catalog readers never saw them, since the
        catalog commit is the last act and did not happen."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        for i, (name, root, wap_id) in enumerate(self._stages):
            try:
                # publish retries version-slot conflicts (it re-reads the
                # head and rebases per attempt); commute violations and
                # audit vetoes raise past the retry and abort the rest
                S.commit_with_retry(
                    lambda r=root, w=wap_id: S.publish_staged(
                        self._spark, r, w
                    ),
                    retries=8,
                )
            except Exception:
                self._stages = self._stages[i + 1:]
                self.abort()
                raise
        self._stages, self._done = [], True
        # Pins = table HEADS at catalog-commit time (re-resolved on each
        # O_EXCL retry), which by then contain every published stage.
        # Pinning the txn's own published versions instead would let a
        # LATER catalog commit pin an OLDER table version when two
        # transactions interleave publish and catalog-commit — heads keep
        # catalog pins monotone. The documented trade: a transaction's
        # catalog version is a snapshot of the world AT COMMIT, so it may
        # also include concurrent committed writes (read-committed at the
        # commit point — the table formats' snapshot-at-commit rule).
        return S.commit_with_retry(
            lambda: self._cat.commit_snapshot(action=f"txn-{self._txn_id}")
        )

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        elif not self._done:
            self.commit()
