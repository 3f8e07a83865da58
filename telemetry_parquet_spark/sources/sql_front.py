"""SQL front door for snapshot tables: time-travel syntax over the
commit log.

``engine_sql(spark, sql, tables={name: root})`` lets a user write ONE
SQL statement against versioned snapshot tables (``sources/snapshots.py``)
with the time-travel syntax the public table formats expose:

- ``<name> VERSION AS OF <n>``        — manifest-pinned read of version n
  (a quoted string resolves a TAG; ``'branch:<b>'`` or
  ``'branch:<b>@<k>'`` reads a branch head / branch sequence point)
- ``<name> TIMESTAMP AS OF <epoch>``  — resolved via ``version_as_of``
- ``DESCRIBE HISTORY <name>``         — the commit log as a DataFrame
- ``DESCRIBE DETAIL <name>``          — one-row head-state metadata
  (version, files, DVs, bytes, columns, constraints, tags, staged,
  branches)
- ``DESCRIBE STATS <name>``           — per-column metadata-aggregate
  coverage (min/max, sums, null counts; answerability of the fast paths)
- ``DESCRIBE BRANCHES <name>``        — one row per live branch
- ``CREATE BRANCH <b> ON <name> [VERSION AS OF <n|'tag'>]`` /
  ``DROP BRANCH <b> ON <name>`` /
  ``MERGE BRANCH <b> INTO <name>``    — branch lifecycle
  (sources/branches.py; merge keeps the branch — DROP is explicit)
- bare ``<name>``                     — the table HEAD at call time
- ``DELETE FROM <name> [WHERE …]``    — copy-on-write ``delete_where``
- ``UPDATE <name> SET … [WHERE …]``   — merge-on-read ``update_where_mor``
- ``INSERT INTO|OVERWRITE <name> SELECT …`` — ``append`` / ``overwrite``
  (the SELECT goes through the same rewriter: INSERT … SELECT from a
  time-traveled version works)
- ``MERGE INTO <name> USING (<select>) ON <k1>[, <k2> …] [WHEN
  clauses]`` — the COW upsert commit. No clauses (or the exact
  update-all/insert-all pair) = unconditional ``merge_into``; ordered
  conditional clauses (``WHEN MATCHED [AND <cond>] THEN UPDATE SET * |
  DELETE``, ``WHEN NOT MATCHED [AND <cond>] THEN INSERT *``, conditions
  over aliases ``t``/``s``; ``WHEN NOT MATCHED BY SOURCE [AND <cond>]
  THEN DELETE | UPDATE SET <col> = <expr>[, …]``, conditions and
  assignments over alias ``t`` only) = ``merge_into_conditional`` with
  clause-aware file detection; a malformed clause tail is a loud error
- eligible ``SELECT … FROM fact JOIN dim ON fk = dk WHERE <conjunctive
  dim filter>`` statements — and the semi shape ``… FROM fact WHERE fk
  IN (SELECT dk FROM dim WHERE …) [AND …]`` — route through
  ``plan_dpp_join`` (inner / left_semi): the filtered dim's transformed
  live set prunes FACT FILES from the manifest before the scan
  (``_try_dpp_rewrite``; any inadmissible shape or planner refusal
  falls through to the scan route, and ``EXPLAIN`` reports the decision
  or the miss reason statically)
- ``TABLE CHANGES <name> FROM <v|'tag'> TO <v|'tag'>`` — the CDC
  changes feed between two versions (``table_changes``; file-granular)
- ``SELECT * FROM <name> [VERSION AS OF …] TABLESAMPLE (n ROWS)`` —
  manifest-planned sample: scans only the file prefix covering n rows
- whole-table ``SELECT COUNT(*)/COUNT(c)/MIN(c)/MAX(c)/SUM(c)/AVG(c)
  FROM <name>`` and clustered-key ``GROUP BY`` — answered from manifest
  stats/sums with NO scan when exact (see the fast-path blocks below)
- ``OPTIMIZE <name> [ZORDER BY (…)]`` — ``compact_table``
- ``ALTER TABLE <name> SET PARTITION SPEC (bucket(8, c), day(d),
  truncate(4, s), identity(c2) | c2)`` / ``DROP PARTITION SPEC`` —
  partition-spec evolution (sources/partition_spec.py; metadata-only,
  old files never rewritten and keep pruning under their own spec)
- ``DESCRIBE SPEC <name>``            — one row per current-spec field
- ``DESCRIBE PARTITIONS <name>``      — the partitions metadata table:
  one row per live tuple (files / rows / bytes), manifest-sized
- ``ALTER TABLE <name> ADD COLUMN <c> <type>`` — metadata-only widen
- ``ALTER TABLE <name> ADD CONSTRAINT <c> CHECK (…) | UNIQUE (…)`` /
  ``DROP CONSTRAINT <c>`` — commit-time constraint DDL
- ``CREATE TAG <t> ON <name> [VERSION AS OF n]`` / ``DROP TAG`` —
  named version pins
- with ``views={name: [mv_roots]}``: a plain ``SELECT <group cols +
  COUNT/SUM/AVG> FROM <name> [GROUP BY …]`` answers from a subsuming
  materialized view (sources/views.py — staleness-checked, incrementally
  refreshed, view-sized); any other shape falls through to the scan
- ``VACUUM <name> [RETAIN n VERSIONS]`` / ``RESTORE <name> TO VERSION
  AS OF n`` — lifecycle maintenance
- ``EXPLAIN <statement>`` — routing decisions WITHOUT executing: the
  chosen route (materialized view + staleness / scan / which mutator),
  the version each table reference pins with its manifest file/byte/DV
  footprint, and per-view miss reasons (``explain_sql`` adds a
  result-cache hit/miss row when given the cache dir)
DML returns a one-row (action, version) DataFrame.

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
    read_manifest,
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


def describe_detail(spark: SparkSession, root: str) -> DataFrame:
    """``DESCRIBE DETAIL`` — one row of head-state metadata: version,
    file/DV counts, total bytes, schema column count, constraints, tags,
    staged (unpublished WAP) commits. Manifest-and-ref-sized — no data
    files are opened (sizes come from the filesystem entries the
    manifest lists)."""
    import json as _json
    import os as _os

    from pyspark.sql.types import LongType

    from telemetry_parquet_spark.sources.snapshots import (
        list_staged,
        list_tags,
        read_manifest,
    )

    v = latest_version(root)
    m = read_manifest(root, v)
    size = sum(
        _os.path.getsize(_os.path.join(root, f))
        for f in m["files"]
        if _os.path.exists(_os.path.join(root, f))
    )
    n_cols = len(_json.loads(m["schema"])["fields"])
    schema = StructType(
        [
            StructField("version", IntegerType(), False),
            StructField("action", StringType(), False),
            StructField("n_files", IntegerType(), False),
            StructField("n_dv", IntegerType(), False),
            StructField("size_bytes", LongType(), False),
            StructField("n_columns", IntegerType(), False),
            StructField("constraints", StringType(), False),
            StructField("tags", StringType(), False),
            StructField("staged", StringType(), False),
            StructField("branches", StringType(), False),
        ]
    )
    from telemetry_parquet_spark.sources.branches import list_branches

    return spark.createDataFrame(
        [
            (
                v,
                m["action"],
                len(m["files"]),
                len(m.get("dv", [])),
                size,
                n_cols,
                ",".join(sorted(m.get("constraints") or {})),
                ",".join(sorted(list_tags(root))),
                ",".join(list_staged(root)),
                ",".join(sorted(list_branches(root))),
            )
        ],
        schema,
    )


def describe_stats(spark: SparkSession, root: str) -> DataFrame:
    """``DESCRIBE STATS`` — one row per schema column of the HEAD: how
    much of the table's metadata-aggregate machinery can answer for it.
    Reports, per column: files carrying a min/max stat, files carrying a
    [sum, n_nonnull] entry, files carrying a footer null count, the total
    recorded nulls (when fully covered; -1 = unknown), and whether the
    whole-table MIN/MAX and SUM fast paths would currently engage
    (snapshot_minmax / snapshot_sum returning non-None). Manifest-sized,
    zero data I/O — the observability face of the metadata-aggregate
    layer, next to EXPLAIN and DESCRIBE DETAIL."""
    import json as _json

    from pyspark.sql.types import BooleanType, LongType

    from telemetry_parquet_spark.sources.snapshots import (
        read_manifest,
        snapshot_minmax,
        snapshot_sum,
    )

    v = latest_version(root)
    m = read_manifest(root, v)
    files = m["files"]
    stats, sums, nulls = m.get("stats", {}), m.get("sums", {}), \
        m.get("nulls", {})
    rows = []
    for f_ in _json.loads(m["schema"])["fields"]:
        col = f_["name"]
        n_stat = sum(1 for f in files if stats.get(f, {}).get(col))
        n_sum = sum(1 for f in files if col in sums.get(f, {}))
        covered_nulls = [
            nulls[f][col]
            for f in files
            if col in nulls.get(f, {})
        ]
        rows.append(
            (
                col,
                str(f_["type"]),
                len(files),
                n_stat,
                n_sum,
                len(covered_nulls),
                sum(covered_nulls) if len(covered_nulls) == len(files)
                else -1,
                snapshot_minmax(root, col, v, _manifest=m) is not None,
                snapshot_sum(root, col, v, _manifest=m) is not None,
            )
        )
    return spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("column", StringType(), False),
                StructField("dtype", StringType(), False),
                StructField("n_files", IntegerType(), False),
                StructField("n_minmax", IntegerType(), False),
                StructField("n_sums", IntegerType(), False),
                StructField("n_nullcounts", IntegerType(), False),
                StructField("total_nulls", LongType(), False),
                StructField("minmax_answerable", BooleanType(), False),
                StructField("sum_answerable", BooleanType(), False),
            ]
        ),
    )


def _view_name(name: str, version: int) -> str:
    return f"__snap_{name}_v{version}"


def _register(
    spark: SparkSession, name: str, root: str, version: int
) -> str:
    view = _view_name(name, version)
    read_snapshot(spark, root, version).createOrReplaceTempView(view)
    return view


def _split_assignments(s: str) -> list[str]:
    """Split a SET clause on top-level commas (paren/quote-aware)."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return parts


def _parse_set_assignments(s: str, ctx: str) -> dict[str, str]:
    """``col = expr[, col = expr …]`` → ordered dict; loud on anything
    the restricted grammar does not fully consume (no silent misreads)."""
    assigns: dict[str, str] = {}
    for part in _split_assignments(s):
        am = re.fullmatch(r"(\w+)\s*=\s*(.+)", part, re.DOTALL)
        if not am:
            raise ValueError(
                f"{ctx}: cannot parse SET assignment {part!r} "
                "(expected <col> = <expr>)"
            )
        col, expr = am.group(1), am.group(2).strip()
        if col in assigns:
            raise ValueError(f"{ctx}: column {col!r} assigned twice")
        assigns[col] = expr
    if not assigns:
        raise ValueError(f"{ctx}: empty SET assignment list")
    return assigns


def _resolve(tables: dict[str, str], name: str) -> str:
    if name not in tables:
        raise KeyError(f"unknown snapshot table {name!r}")
    return tables[name]


def _version_df(spark: SparkSession, action: str, version: int) -> DataFrame:
    return spark.createDataFrame(
        [(action, version)],
        StructType(
            [
                StructField("action", StringType(), False),
                StructField("version", IntegerType(), False),
            ]
        ),
    )


def _dml(
    spark: SparkSession, sql: str, tables: dict[str, str]
) -> DataFrame | None:
    """Dispatch the DML/maintenance statements; None -> not DML."""
    from telemetry_parquet_spark.sources import snapshots as S

    m = re.fullmatch(
        r"\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        root = _resolve(tables, m.group(1))
        where = m.group(2)
        if where:
            probe = _probe_eq_delete(root, where)
            if probe is not None:
                cols, vals, schema = probe
                v = S.delete_eq(
                    spark, root, _eq_values_df(spark, schema, cols, vals)
                )
                return _version_df(spark, "delete-eq", v)
        v = S.delete_where(spark, root, where or "1=1")
        return _version_df(spark, "delete", v)

    m = re.fullmatch(
        r"\s*UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        root = _resolve(tables, m.group(1))
        assignments = {}
        for part in _split_assignments(m.group(2)):
            col, expr = part.split("=", 1)
            assignments[col.strip()] = expr.strip()
        v = S.update_where_mor(
            spark, root, m.group(3) or "1=1", assignments
        )
        return _version_df(spark, "update-mor", v)

    m = re.fullmatch(
        r"\s*INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(SELECT\s+.+?|TABLE\s+\w+"
        r".*?|VALUES\s+.+?)\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        root = _resolve(tables, m.group(2))
        rows = engine_sql(spark, m.group(3), tables)
        if m.group(1).upper() == "OVERWRITE":
            return _version_df(
                spark, "overwrite", S.overwrite(spark, root, rows)
            )
        return _version_df(spark, "append", S.append(spark, root, rows))

    # Row-level MERGE (snapshots.merge_into / merge_into_conditional):
    # ``MERGE INTO t USING (<select>) ON k1[, k2 …]`` followed by zero
    # or more clauses. No clauses (or the exact update-all/insert-all
    # pair) routes to the unconditional COW merge; any conditional /
    # DELETE / insert-only shape routes to the conditional engine:
    # ``WHEN MATCHED [AND <cond>] THEN UPDATE SET * | DELETE`` (ordered,
    # first-match-wins), ``WHEN NOT MATCHED [AND <cond>] THEN INSERT
    # *``, and ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE |
    # UPDATE SET <col> = <expr>[, …]`` (target rows with no source key
    # match — the sync-to-snapshot shape; conditions/assignments over
    # alias t only). Conditions are SQL over aliases t (target) / s
    # (source);
    # ``ALL`` is accepted as a synonym of ``SET *`` / ``*``. The USING
    # subquery goes through the same rewriter, so merging FROM a
    # time-traveled version or another snapshot table works. Restricted
    # parse discipline: a clause tail the clause grammar does not fully
    # consume is a loud error, never a silent misread (conditions
    # containing a bare ' THEN ' — e.g. CASE expressions — are out of
    # shape).
    m = re.fullmatch(
        r"\s*MERGE\s+INTO\s+(\w+)\s+USING\s*\((.+)\)\s*"
        r"ON\s+(\w+(?:\s*,\s*\w+)*)"
        r"((?:\s+WHEN\s.+)?)\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        root = _resolve(tables, m.group(1))
        source = engine_sql(spark, m.group(2), tables)
        keys = [k.strip() for k in m.group(3).split(",") if k.strip()]
        rest = (m.group(4) or "").strip().rstrip(";").strip()
        if not rest or re.fullmatch(
            r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+(?:ALL|SET\s*\*)\s+"
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+(?:ALL|\*)",
            rest, re.IGNORECASE,
        ):
            v = S.merge_into(spark, root, source, keys)
            return _version_df(spark, "merge-into", v)
        clause_re = re.compile(
            r"WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(UPDATE\s+SET\s*\*|UPDATE\s+ALL|DELETE|INSERT\s+(?:\*|ALL)"
            r"|UPDATE\s+SET\s+.+?)"
            r"\s*(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
            re.IGNORECASE | re.DOTALL,
        )
        matched_clauses: list[tuple[str, str | None]] = []
        by_source_clauses: list = []
        not_matched_insert = False
        insert_condition: str | None = None
        pos = 0
        while pos < len(rest):
            c = clause_re.match(rest, pos)
            if not c:
                raise ValueError(
                    f"MERGE INTO: cannot parse clause tail at "
                    f"{rest[pos:pos + 60]!r} — supported: WHEN MATCHED "
                    "[AND <cond>] THEN UPDATE SET * | DELETE, WHEN NOT "
                    "MATCHED [AND <cond>] THEN INSERT *, WHEN NOT "
                    "MATCHED BY SOURCE [AND <cond>] THEN DELETE | "
                    "UPDATE SET <col> = <expr>[, …]"
                )
            kind = re.sub(r"\s+", " ", c.group(1).upper())
            cond, action = c.group(2), c.group(3)
            action_kw = action.split()[0].upper()
            cond = cond.strip() if cond else None
            if kind == "NOT MATCHED BY SOURCE":
                if action_kw == "DELETE":
                    by_source_clauses.append(("delete", cond))
                elif re.fullmatch(r"UPDATE\s+SET\s*\*", action,
                                  re.IGNORECASE):
                    raise ValueError(
                        "MERGE INTO: WHEN NOT MATCHED BY SOURCE cannot "
                        "UPDATE SET * — there is no source row; use "
                        "explicit SET <col> = <expr> over alias t"
                    )
                elif action_kw == "UPDATE":
                    assigns = _parse_set_assignments(
                        re.sub(r"^UPDATE\s+SET\s+", "", action,
                               flags=re.IGNORECASE),
                        "MERGE INTO: WHEN NOT MATCHED BY SOURCE",
                    )
                    by_source_clauses.append(("update", cond, assigns))
                else:
                    raise ValueError(
                        "MERGE INTO: WHEN NOT MATCHED BY SOURCE "
                        "supports only DELETE or UPDATE SET <col> = "
                        "<expr>"
                    )
            elif kind == "NOT MATCHED":
                if action_kw != "INSERT":
                    raise ValueError(
                        "MERGE INTO: WHEN NOT MATCHED supports only "
                        "INSERT *"
                    )
                if not_matched_insert:
                    raise ValueError(
                        "MERGE INTO: at most one WHEN NOT MATCHED clause"
                    )
                not_matched_insert, insert_condition = True, cond
            else:
                if action_kw == "INSERT":
                    raise ValueError(
                        "MERGE INTO: INSERT belongs to WHEN NOT MATCHED"
                    )
                if action_kw == "UPDATE" and not re.fullmatch(
                    r"UPDATE\s+(?:SET\s*\*|ALL)", action, re.IGNORECASE
                ):
                    raise ValueError(
                        "MERGE INTO: WHEN MATCHED supports only UPDATE "
                        "SET * (full-row replace) or DELETE — explicit "
                        "SET lists belong to WHEN NOT MATCHED BY SOURCE"
                    )
                matched_clauses.append(
                    ("update" if action_kw == "UPDATE" else "delete", cond)
                )
            pos = c.end()
        v = S.merge_into_conditional(
            spark, root, source, keys, matched_clauses,
            not_matched_insert=not_matched_insert,
            insert_condition=insert_condition,
            by_source_clauses=by_source_clauses or None,
        )
        return _version_df(spark, "merge-into-conditional", v)
    if re.match(r"\s*MERGE\s+INTO\b", sql, re.IGNORECASE):
        raise ValueError(
            "MERGE INTO: only the 'USING (<select>) ON <key list> "
            "[WHEN clauses]' form is supported"
        )

    m = re.fullmatch(
        r"\s*OPTIMIZE\s+(\w+)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        zcols = (
            [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
        )
        v = S.compact_table(
            spark, root, target_bytes=128 * 1024 * 1024, zorder_cols=zcols
        )
        return _version_df(spark, "optimize", v)

    m = re.fullmatch(
        r"\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?"
        r"\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        import time as _time

        root = _resolve(tables, m.group(1))
        if m.group(3) and m.group(3).upper() == "HOURS":
            removed = S.vacuum(
                root,
                keep_last=1,
                retain_since=_time.time() - 3600 * int(m.group(2)),
            )
        else:
            removed = S.vacuum(root, keep_last=int(m.group(2) or 1))
        return _version_df(spark, f"vacuum:{len(removed)}_files",
                           S.latest_version(root))

    m = re.fullmatch(
        r"\s*RESTORE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        v = S.restore_table(root, int(m.group(2)))
        return _version_df(spark, "restore", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>,\s]+?)"
        r"\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        v = S.alter_add_column(root, m.group(2), m.group(3).strip())
        return _version_df(spark, f"add-column:{m.group(2)}", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        v = S.alter_drop_column(root, m.group(2))
        return _version_df(spark, f"drop-column:{m.group(2)}", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
        r"CHECK\s*\((.+)\)\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        root = _resolve(tables, m.group(1))
        v = S.add_check_constraint(spark, root, m.group(2), m.group(3))
        return _version_df(spark, f"add-constraint:{m.group(2)}", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
        r"UNIQUE\s*\(([\w\s,]+)\)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        cols = [c.strip() for c in m.group(3).split(",")]
        v = S.add_unique_constraint(spark, root, m.group(2), cols)
        return _version_df(spark, f"add-unique:{m.group(2)}", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+EQUALITY\s+DELETE\s+COLUMNS"
        r"\s*\(([\w\s,]*)\)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
        v = S.set_eq_delete_cols(root, cols)
        return _version_df(spark, "set-eq-delete-cols", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))
        name = m.group(2)
        head = S.read_manifest(root, S.latest_version(root))
        if name in (head.get("unique_keys") or {}):
            v = S.drop_unique_constraint(root, name)
        else:
            v = S.drop_check_constraint(root, name)
        return _version_df(spark, f"drop-constraint:{name}", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+SET\s+PARTITION\s+SPEC\s*"
        r"\((.+)\)\s*;?\s*",
        sql, re.IGNORECASE | re.DOTALL,
    )
    if m:
        from telemetry_parquet_spark.sources.partition_spec import (
            PartitionField,
            set_partition_spec,
        )

        root = _resolve(tables, m.group(1))
        fields = []
        for part in re.split(r",(?![^(]*\))", m.group(2)):
            part = part.strip()
            fm = re.fullmatch(
                r"(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)", part
            )
            if fm:
                transform = fm.group(1).lower()
                n = int(fm.group(2)) if fm.group(2) else None
                if n is not None and transform not in (
                    "bucket", "truncate"
                ):
                    # day(8, ts) would otherwise parse and silently
                    # record a meaningless n in the committed spec
                    raise ValueError(
                        f"SET PARTITION SPEC: {transform} takes no n "
                        f"argument (got {part!r})"
                    )
                fields.append(PartitionField(fm.group(3), transform, n))
            elif re.fullmatch(r"\w+", part):
                fields.append(PartitionField(part, "identity"))
            else:
                raise ValueError(
                    f"SET PARTITION SPEC: cannot parse field {part!r} "
                    "(expected col, identity(col), day(col), hour(col), "
                    "month(col), year(col), bucket(n, col) or "
                    "truncate(n, col))"
                )
        v = set_partition_spec(root, fields)
        return _version_df(spark, f"set-spec:{len(fields)}_fields", v)

    m = re.fullmatch(
        r"\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+PARTITION\s+SPEC\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        from telemetry_parquet_spark.sources.partition_spec import (
            drop_partition_spec,
        )

        v = drop_partition_spec(_resolve(tables, m.group(1)))
        return _version_df(spark, "drop-spec", v)

    m = re.fullmatch(
        r"\s*CREATE\s+TAG\s+([\w.-]+)\s+ON\s+(\w+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(2))
        v = S.create_tag(
            root, m.group(1),
            int(m.group(3)) if m.group(3) else None,
        )
        return _version_df(spark, f"create-tag:{m.group(1)}", v)

    m = re.fullmatch(
        r"\s*DROP\s+TAG\s+([\w.-]+)\s+ON\s+(\w+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(2))
        S.delete_tag(root, m.group(1))
        return _version_df(
            spark, f"drop-tag:{m.group(1)}", S.latest_version(root)
        )

    from telemetry_parquet_spark.sources import branches as B

    m = re.fullmatch(
        r"\s*CREATE\s+BRANCH\s+(\w+)\s+ON\s+(\w+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+'))?\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(2))
        ref = m.group(3)
        frm = None if ref is None else (
            ref[1:-1] if ref.startswith("'") else int(ref)
        )
        B.create_branch(root, m.group(1), frm)
        return _version_df(
            spark, f"create-branch:{m.group(1)}", S.latest_version(root)
        )

    m = re.fullmatch(
        r"\s*DROP\s+BRANCH\s+(\w+)\s+ON\s+(\w+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        B.delete_branch(_resolve(tables, m.group(2)), m.group(1))
        return _version_df(
            spark, f"drop-branch:{m.group(1)}",
            S.latest_version(_resolve(tables, m.group(2))),
        )

    m = re.fullmatch(
        r"\s*MERGE\s+BRANCH\s+(\w+)\s+INTO\s+(\w+)\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(2))
        v = B.merge_branch(spark, root, m.group(1), delete=False)
        return _version_df(spark, f"merge-branch:{m.group(1)}", v)

    # CDC as a statement: the Delta/Iceberg changes-feed surface.
    # Versions accept ints or tag names; cost stays file-granular
    # (table_changes diffs only non-shared + DV-touched files).
    m = re.fullmatch(
        r"\s*TABLE\s+CHANGES\s+(\w+)\s+FROM\s+(\d+|'[^']+')"
        r"\s+TO\s+(\d+|'[^']+')\s*;?\s*",
        sql, re.IGNORECASE,
    )
    if m:
        root = _resolve(tables, m.group(1))

        def _v(g: str) -> int:
            return S.resolve_ref(root, g[1:-1]) if g.startswith("'") \
                else int(g)

        return S.table_changes(spark, root, _v(m.group(2)), _v(m.group(3)))
    return None


_AGG_ITEM = re.compile(
    r"(?:(COUNT)\s*\(\s*\*\s*\)|(SUM|AVG)\s*\(\s*(\w+)\s*\))"
    r"(?:\s+AS\s+(\w+))?",
    re.IGNORECASE,
)


def _parse_plain_aggregate(sql: str):
    """``(table, group_cols, aggs, out_cols)`` for a plain ``SELECT
    <group cols + COUNT/SUM/AVG> FROM <t> [GROUP BY …]``, else None —
    the shared admission parse of the MV-rewrite and EXPLAIN paths.
    Anything with WHERE, JOIN, expressions or HAVING is deliberately
    rejected so those shapes take the ordinary scan route."""
    from telemetry_parquet_spark.sources.views import Agg

    m = re.fullmatch(
        r"\s*SELECT\s+(.+?)\s+FROM\s+(\w+)"
        r"(?:\s+GROUP\s+BY\s+([\w\s,]+?))?\s*;?\s*",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        return None
    name = m.group(2)
    group_cols = (
        [c.strip() for c in m.group(3).split(",")] if m.group(3) else []
    )
    out_cols, aggs = [], []
    for item in _split_assignments(m.group(1)):
        if item in group_cols:
            out_cols.append(item)
            continue
        am = _AGG_ITEM.fullmatch(item)
        if not am:
            return None  # expression we don't parse -> normal path
        if am.group(1):  # COUNT(*)
            agg = Agg("count", alias=am.group(4))
        else:
            agg = Agg(am.group(2).lower(), am.group(3), am.group(4))
        aggs.append(agg)
        out_cols.append(agg.out)
    if not aggs:
        return None
    return name, group_cols, aggs, out_cols


def _try_mv_rewrite(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
    views: dict[str, list[str]],
) -> DataFrame | None:
    """Route a plain ``SELECT <group cols + COUNT/SUM/AVG> FROM <t>
    [GROUP BY …]`` through the table's cataloged materialized views
    (sources/views.py) — None when the statement has any other shape or
    no view subsumes it, so the caller falls through to the normal scan
    path. The restricted-shape parse is deliberate: anything with WHERE,
    JOIN, expressions or HAVING takes the ordinary route."""
    from telemetry_parquet_spark.sources.views import answer_aggregate

    parsed = _parse_plain_aggregate(sql)
    if not parsed:
        return None
    name, group_cols, aggs, out_cols = parsed
    if name not in views or name not in tables:
        return None
    try:
        df, used = answer_aggregate(
            spark, tables[name], views[name], group_cols, aggs,
            require_rewrite=True,
        )
    except RuntimeError:
        return None  # no view subsumes -> honest fallback to the scan
    return df.select(*out_cols)


_STAR_JOIN = re.compile(
    r"\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t1>\w+)\s+JOIN\s+"
    r"(?P<t2>\w+)\s+ON\s+(?P<c1>\w+)\s*=\s*(?P<c2>\w+)"
    r"\s+WHERE\s+(?P<where>.+?)"
    r"(?:\s+GROUP\s+BY\s+(?P<group>[\w\s,]+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>[\w\s,]+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# the semi shape: SELECT … FROM fact WHERE fk IN (SELECT dk FROM dim
# WHERE <dim conj>) [AND <fact conj>] — the allowlist filter as SQL
_STAR_SEMI = re.compile(
    r"\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t1>\w+)"
    r"\s+WHERE\s+(?P<c1>\w+)\s+IN\s*\(\s*SELECT\s+(?P<c2>\w+)"
    r"\s+FROM\s+(?P<t2>\w+)\s+WHERE\s+(?P<dimwhere>.+?)\s*\)"
    r"(?:\s+AND\s+(?P<factwhere>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>[\w\s,]+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>[\w\s,]+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_LIT = r"(?:'[^']*'|-?\d+(?:\.\d+)?)"
_CONJUNCT = re.compile(
    rf"(\w+)\s*(?:"
    rf"=\s*(?P<eq>{_LIT})"
    rf"|IN\s*\(\s*(?P<in>{_LIT}(?:\s*,\s*{_LIT})*)\s*\)"
    rf"|BETWEEN\s+(?P<lo>{_LIT})\s+AND\s+(?P<hi>{_LIT})"
    rf"|(?P<op><=|>=)\s*(?P<cmp>{_LIT})"
    rf")\s*",
    re.IGNORECASE,
)


def _sql_literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _parse_conjuncts(where: str) -> list | None:
    """Conjunctions of ``col = lit`` / ``col IN (…)`` / ``col BETWEEN
    lo AND hi`` / ``col <= lit`` / ``col >= lit`` → planner predicate
    objects, or None when ANY piece is out of shape (disjunctions,
    cross-column comparisons, functions — the honest scan fallback)."""
    from telemetry_parquet_spark.sources.scan_planner import Eq, In, Range

    preds, pos = [], 0
    s = where.strip()
    while pos < len(s):
        m = _CONJUNCT.match(s, pos)
        if not m:
            return None
        col = m.group(1)
        if m.group("eq") is not None:
            preds.append(Eq(col, _sql_literal(m.group("eq"))))
        elif m.group("in") is not None:
            vals = re.findall(_LIT, m.group("in"))
            preds.append(In(col, tuple(_sql_literal(v) for v in vals)))
        elif m.group("lo") is not None:
            preds.append(Range(col, _sql_literal(m.group("lo")),
                               _sql_literal(m.group("hi"))))
        else:
            v = _sql_literal(m.group("cmp"))
            preds.append(
                Range(col, None, v) if m.group("op") == "<="
                else Range(col, v, None)
            )
        pos = m.end()
        if pos < len(s):
            am = re.match(r"AND\s+", s[pos:], re.IGNORECASE)
            if not am:
                return None
            pos += am.end()
    return preds or None


_EQ_DELETE_MAX_TUPLES = 10_000


def _probe_eq_delete(root: str, where: str):
    """Static admission check for the metadata-only DELETE route —
    manifest only, no Spark job (so EXPLAIN can report the decision
    without paying for it). The WHERE must be a conjunction of
    ``col = lit`` / ``col IN (…)`` over DISTINCT columns, every column
    declared via ``set_eq_delete_cols``; the key set is the cross
    product of the conjuncts' value sets, capped at
    ``_EQ_DELETE_MAX_TUPLES`` (beyond that a broadcast key batch stops
    being "small by design" — honest COW fallback). Returns
    ``(cols, tuples)`` or None (→ copy-on-write route)."""
    import itertools

    from telemetry_parquet_spark.sources.scan_planner import Eq, In
    from telemetry_parquet_spark.sources.snapshots import (
        latest_version,
        read_manifest,
    )

    try:
        m = read_manifest(root, latest_version(root))
    except FileNotFoundError:
        return None
    declared = m.get("eq_delete_cols")
    if not declared:
        return None
    preds = _parse_conjuncts(where)
    if not preds:
        return None
    import json as _json

    from pyspark.sql.types import StructType as _ST

    schema = _ST.fromJson(_json.loads(m["schema"]))
    type_of = {f.name: f.dataType.typeName() for f in schema.fields}
    # literal/column type gate: the eq route materializes literals as
    # typed key tuples, so routing is admitted ONLY where the tuple
    # match is bit-identical to Spark's own predicate semantics —
    # integer literals on integer columns (range-checked: an
    # out-of-range literal would cast to NULL and blow up delete_eq
    # where COW is a silent no-op) and string literals on string
    # columns. Float/decimal (coercion-promoted comparisons diverge:
    # float32(0.1) ≠ 0.1 as double; decimal casts ROUND) and
    # date/timestamp (invalid strings cast to NULL) stay on the COW
    # path — GDPR-ish point deletes key on ids and strings, which this
    # covers. Out-of-shape → honest COW, never a semantics change.
    _INT_RANGE = {
        "byte": (-128, 127), "short": (-32768, 32767),
        "integer": (-2**31, 2**31 - 1), "long": (-2**63, 2**63 - 1),
    }
    _OK_TYPES = {
        "byte": (int,), "short": (int,), "integer": (int,),
        "long": (int,), "string": (str,),
    }
    low = {c.lower(): c for c in declared}
    cols: list[str] = []
    value_sets: list[tuple] = []
    for p in preds:
        if isinstance(p, Eq):
            vals = (p.value,)
        elif isinstance(p, In):
            vals = tuple(p.values)
        else:
            return None  # ranges/comparisons: not a key-tuple delete
        canon = low.get(p.col.lower())
        if canon is None or canon in cols:
            return None  # undeclared or duplicated column
        if any(v is None for v in vals):
            return None  # NULL never equality-matches; COW handles it
        tname = type_of.get(canon, "").split("(")[0]
        allowed = _OK_TYPES.get(tname)
        if allowed is None:
            return None  # non-int/string column type: COW handles it
        if any(
            isinstance(v, bool) or not isinstance(v, allowed)
            for v in vals
        ):
            return None  # literal type outside the column's class
        rng = _INT_RANGE.get(tname)
        if rng and any(not (rng[0] <= v <= rng[1]) for v in vals):
            return None  # out-of-range int would cast to NULL
        cols.append(canon)
        value_sets.append(vals)
    n = 1
    for vs in value_sets:
        n *= len(vs)
        if n > _EQ_DELETE_MAX_TUPLES:
            return None
    return cols, list(itertools.product(*value_sets)), schema


def _eq_values_df(spark, schema, cols: list[str], vals: list) -> DataFrame:
    """Key tuples → a DataFrame typed EXACTLY as the table's columns
    (``delete_eq`` refuses type mismatches; SQL literals arrive as
    python ints/strs). Takes the schema the probe already parsed —
    no second manifest read on the DML hot path."""
    from pyspark.sql import functions as F

    types = {f.name: f.dataType for f in schema.fields}
    df = spark.createDataFrame([tuple(map(str, t)) for t in vals],
                               ", ".join(f"{c} string" for c in cols))
    return df.select(
        *[F.col(c).cast(types[c]).alias(c) for c in cols]
    )


def _probe_dpp(sql: str, tables: dict[str, str]):
    """Static admission check for the star-join DPP route — manifests
    only, no Spark job (so EXPLAIN can report the decision without
    paying for the live set). Returns ``("miss", reason)`` or
    ``("candidate", info)`` where info carries everything
    ``engine_sql`` needs to call ``plan_dpp_join``."""
    import json as _json

    from pyspark.sql.types import StructType as _ST

    sm = _STAR_SEMI.fullmatch(sql)
    m = sm or _STAR_JOIN.fullmatch(sql)
    if not m:
        return (
            "miss",
            "not a bare fact JOIN dim ON k1 = k2 WHERE … nor a "
            "fk IN (SELECT dk FROM dim WHERE …) filter",
        )
    how = "left_semi" if sm else "inner"
    t1, t2 = m.group("t1"), m.group("t2")
    if t1 not in tables or t2 not in tables or t1 == t2:
        return ("miss", "both join sides must be cataloged tables")
    if "." in m.group("items"):
        return ("miss", "qualified select items — scan route")
    if sm:
        dim_where = _parse_conjuncts(m.group("dimwhere"))
        fact_where = (
            _parse_conjuncts(m.group("factwhere"))
            if m.group("factwhere")
            else []
        )
        if dim_where is None or fact_where is None:
            return ("miss", "WHERE not a conjunction of col-op-literal")
        preds = dim_where + fact_where
        outer_conjuncts = fact_where
    else:
        preds = _parse_conjuncts(m.group("where"))
        if preds is None:
            return ("miss", "WHERE not a conjunction of col-op-literal")
        outer_conjuncts = []

    def _head_schema(name):
        root = tables[name]
        mf = read_manifest(root, latest_version(root))
        return mf, {
            f.name.lower()
            for f in _ST.fromJson(_json.loads(mf["schema"])).fields
        }

    m1, cols1 = _head_schema(t1)
    m2, cols2 = _head_schema(t2)
    c1, c2 = m.group("c1"), m.group("c2")

    def _owner(col):
        a, b = col.lower() in cols1, col.lower() in cols2
        if a == b:
            return None  # both or neither: ambiguous
        return t1 if a else t2

    o1, o2 = _owner(c1), _owner(c2)
    if o1 is None or o2 is None or o1 == o2:
        return ("miss", "cannot attribute the ON columns to one side each")
    if sm and (o1 != t1 or o2 != t2):
        # the semi's direction is fixed by the syntax: fk belongs to
        # the outer (fact) table, dk to the subquery (dim) table
        return ("miss", "IN-subquery columns bound to the wrong sides")
    key_of = {o1: c1, o2: c2}

    def _spec_field(mf, col):
        return next(
            (
                f
                for f in (mf.get("partition_spec") or {}).get("fields", [])
                if f["col"].lower() == col.lower()
            ),
            None,
        )

    # the FACT is the side whose CURRENT spec partitions its join key
    fld1 = _spec_field(m1, key_of.get(t1, ""))
    fld2 = _spec_field(m2, key_of.get(t2, ""))
    if fld1 is not None:
        fact, dim = t1, t2
        fld = fld1
    elif fld2 is not None and not sm:
        fact, dim = t2, t1
        fld = fld2
    else:
        return (
            "miss",
            ("the outer table's partition spec carries no field on the "
             "IN column — scan route")
            if sm
            else ("neither side's partition spec carries a field on its "
                  "join key — scan route"),
        )
    fact_cols = cols1 if fact == t1 else cols2
    dim_cols = cols2 if fact == t1 else cols1
    dim_preds, fact_preds = [], []
    outer = {id(p) for p in outer_conjuncts}
    for p in preds:
        on_fact = p.col.lower() in fact_cols
        on_dim = p.col.lower() in dim_cols
        if on_fact == on_dim:
            return ("miss", f"predicate column {p.col!r} is ambiguous")
        if id(p) in outer and not on_fact:
            # a dim-only column in the semi's OUTER scope is INVALID
            # SQL (it cannot resolve against the fact table); routing
            # it as a dim predicate would silently ANSWER what the
            # scan route correctly rejects — fall through so Catalyst
            # raises its own unresolved-column error
            return (
                "miss",
                f"outer predicate column {p.col!r} is not a fact "
                "column — scan route (which will reject it)",
            )
        (fact_preds if on_fact else dim_preds).append(p)
    if not dim_preds:
        return ("miss", "no dim predicate — the live set would be total")
    return (
        "candidate",
        {
            "fact": fact,
            "dim": dim,
            "how": how,
            "fkey": key_of[fact],
            "dkey": key_of[dim],
            "transform": f"{fld.get('transform', 'identity')}"
                         f"({fld['col']})",
            "dim_predicates": dim_preds,
            "fact_predicates": fact_preds,
            "items": m.group("items"),
            "group": m.group("group"),
            "order": m.group("order"),
        },
    )


def _try_dpp_rewrite(
    spark: SparkSession, sql: str, tables: dict[str, str]
) -> DataFrame | None:
    """Route an eligible star-join statement through
    ``join_planner.plan_dpp_join`` — manifest-side dynamic partition
    pruning the plain scan rewrite can never get (Spark's own DPP
    cannot engage on plain parquet + manifest tuples). Same restricted-
    shape parse discipline as the MV router: any inadmissible piece, or
    a planner refusal (cross-typed keys, shared columns), falls through
    to the ordinary scan route — never a changed answer."""
    verdict, info = _probe_dpp(sql, tables)
    if verdict != "candidate":
        return None
    from telemetry_parquet_spark.sources.join_planner import plan_dpp_join

    try:
        joined, _plan = plan_dpp_join(
            spark,
            tables[info["fact"]],
            tables[info["dim"]],
            (info["fkey"], info["dkey"]),
            how=info.get("how", "inner"),
            dim_predicates=info["dim_predicates"],
            fact_predicates=info["fact_predicates"],
        )
    except ValueError:
        return None  # planner refusal -> honest scan fallback
    joined.createOrReplaceTempView("__dpp_star_join")
    stmt = f"SELECT {info['items']} FROM __dpp_star_join"
    if info["group"]:
        stmt += f" GROUP BY {info['group']}"
    if info["order"]:
        stmt += f" ORDER BY {info['order']}"
    return spark.sql(stmt)


_MUTATOR_KIND = {
    "DELETE": "DELETE (copy-on-write file rewrite commit)",
    "UPDATE": "UPDATE (merge-on-read deletion-vector commit)",
    "INSERT": "INSERT (append / overwrite commit)",
    "OPTIMIZE": "OPTIMIZE (compaction rewrite commit)",
    "VACUUM": "VACUUM (retention delete, destructive)",
    "RESTORE": "RESTORE (rollback-as-commit)",
    "ALTER": "ALTER TABLE (metadata-only commit)",
    "CREATE": "CREATE (tag / branch / table DDL)",
    "DROP": "DROP (tag / branch / constraint DDL)",
    "MERGE": "MERGE (BRANCH: metadata fast-forward or rebase; "
             "INTO: copy-on-write upsert commit)",
}


def explain_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
    views: dict[str, list[str]] | None = None,
    cache_dir: str | None = None,
) -> DataFrame:
    """``EXPLAIN <statement>`` through the front door: one (aspect,
    detail) row per routing decision, computed from MANIFESTS ALONE —
    nothing executes, commits, refreshes, or reads a data file. Reports:

    - ``statement``  — query, or which commit-log mutator would run
    - ``route``      — ``materialized-view <root>`` (with a staleness
      row: the rewrite would incrementally catch the view up at read
      time) when a cataloged view subsumes a plain aggregate, per-view
      ``mv_miss`` reasons otherwise, else ``scan``
    - ``pin``        — per referenced (table, version): resolved version
      (HEAD / AS-OF / tag), file count, manifest byte total, outstanding
      deletion vectors — the exact inputs the scan would be planned from
    - ``result_cache`` — hit/miss under the version-pinned key, when the
      cache directory is supplied

    The observability face of the services the engine already routes
    through silently (`_try_mv_rewrite`, `plan_snapshot_scan`,
    `cached_sql`): EXPLAIN shows the decision without paying for the
    answer."""
    from telemetry_parquet_spark.sources.snapshots import (
        read_manifest,
        resolve_ref,
    )

    stmt = sql.strip().rstrip(";").strip()
    first = stmt.split(None, 1)[0].upper() if stmt else ""
    rows: list[tuple[str, str]] = []
    if first in _MUTATOR_KIND:
        kind, route = _MUTATOR_KIND[first], "commit-log mutator"
        if first == "DELETE":
            # route-aware: the eq-delete admission check is manifest-
            # only, so EXPLAIN can report it without a Spark job
            dm = re.fullmatch(
                r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)",
                stmt, re.IGNORECASE | re.DOTALL,
            )
            probe = (
                _probe_eq_delete(tables[dm.group(1)], dm.group(2))
                if dm and dm.group(1) in tables
                else None
            )
            if probe is not None:
                cols, vals, _schema = probe
                kind = (
                    "DELETE (metadata-only equality-delete commit: "
                    f"{len(vals)} key tuple(s) over ({', '.join(cols)}))"
                )
                route = "commit-log mutator (equality-delete, no file "\
                        "rewrite, no detection scan)"
                rows.append((
                    "eq_delete_interplay",
                    "commits an OUTSTANDING key set: COW mutators "
                    "(copy-on-write DELETE/UPDATE/MERGE, staging, "
                    "branching) refuse until compact_table "
                    "materializes it",
                ))
        rows.append(("statement", kind))
        rows.append(("route", route))
        if first == "MERGE" and re.match(
            r"MERGE\s+INTO\b", stmt, re.IGNORECASE
        ):
            kinds = [
                re.sub(r"\s+", " ", k.upper())
                for k in re.findall(
                    r"WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED"
                    r"|MATCHED)\b",
                    stmt, re.IGNORECASE,
                )
            ]
            if kinds:
                rows.append((
                    "merge_clauses",
                    f"{kinds.count('MATCHED')} matched, "
                    f"{kinds.count('NOT MATCHED')} not-matched, "
                    f"{kinds.count('NOT MATCHED BY SOURCE')} "
                    "not-matched-by-source",
                ))
            if "NOT MATCHED BY SOURCE" in kinds:
                rows.append((
                    "merge_detection",
                    "BY-SOURCE clause present: detection adds an "
                    "all-files anti-join pass (key-range pruning is "
                    "invalid for those clauses); matched-clause "
                    "detection stays key-range-pruned",
                ))
            elif kinds:
                rows.append((
                    "merge_detection",
                    "clause-aware: only files where a matched row "
                    "FIRES a clause rewrite; detection scan bounded "
                    "by the source key envelope",
                ))
    else:
        rows.append(("statement", "query"))
        route = "scan"
        parsed = _parse_plain_aggregate(stmt) if views else None
        if parsed:
            name, group_cols, aggs, _ = parsed
            if name in (views or {}) and name in tables:
                from telemetry_parquet_spark.sources.views import (
                    RewriteMiss,
                    probe_aggregate,
                )

                for vroot in views[name]:
                    try:
                        p = probe_aggregate(vroot, group_cols, aggs)
                    except RewriteMiss as e:
                        rows.append(("mv_miss", f"{vroot}: {e}"))
                        continue
                    route = f"materialized-view {vroot}"
                    rows.append(
                        (
                            "view_staleness",
                            f"view at base v{p['view_base_version']}, "
                            f"base head v{p['base_head']}, lag "
                            f"{p['stale_commits']} commits"
                            + (
                                " (incremental catch-up at read)"
                                if p["stale_commits"]
                                else " (fresh)"
                            ),
                        )
                    )
                    break
        if route == "scan" and re.match(
            r"\s*SELECT\b.*\b(JOIN|IN\s*\(\s*SELECT)\b",
            stmt, re.IGNORECASE | re.DOTALL,
        ):
            # the star-join DPP decision, statically (no live-set job)
            verdict, info = _probe_dpp(stmt, tables)
            if verdict == "candidate":
                route = (
                    f"dpp-join [{info['how']}] (fact={info['fact']} "
                    f"pruned by {info['transform']} live set of "
                    f"dim={info['dim']})"
                )
            else:
                rows.append(("dpp_miss", info))
        rows.insert(1, ("route", route))
    for name in sorted(tables):
        if not re.search(rf"\b{re.escape(name)}\b", stmt):
            continue
        root = tables[name]
        pinned: list[tuple[int | str, str]] = []
        for mo in re.finditer(
            rf"\b{re.escape(name)}\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+')",
            stmt,
            re.IGNORECASE,
        ):
            g = mo.group(1)
            if g.startswith("'branch:"):
                pinned.append((g[1:-1], g))
                continue
            v = resolve_ref(root, g[1:-1]) if g.startswith("'") else int(g)
            pinned.append((v, g))
        for mo in re.finditer(
            rf"\b{re.escape(name)}\s+TIMESTAMP\s+AS\s+OF\s+"
            r"([0-9]+(?:\.[0-9]+)?)",
            stmt,
            re.IGNORECASE,
        ):
            pinned.append(
                (version_as_of(root, float(mo.group(1))), mo.group(1))
            )
        if not pinned:
            pinned.append((latest_version(root), "HEAD"))
        for v, ref in pinned:
            if isinstance(v, str):  # branch ref: chain lives elsewhere
                rows.append(("pin", f"{name} @ {v}"))
                continue
            m = read_manifest(root, v)
            rows.append(
                (
                    "pin",
                    f"{name} @ v{v} ({ref}): {len(m['files'])} files, "
                    f"{sum((m.get('sizes') or {}).values())} bytes, "
                    f"{len(m.get('dv') or [])} deletion vectors",
                )
            )
    if cache_dir is not None:
        import os as _os

        from telemetry_parquet_spark.sources.result_cache import _key

        digest, _ = _key(stmt, tables)
        hit = _os.path.exists(
            _os.path.join(cache_dir, digest, "_PINS.json")
        )
        rows.append(
            ("result_cache", f"{'hit' if hit else 'miss'} key={digest[:12]}")
        )
    return spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("aspect", StringType(), False),
                StructField("detail", StringType(), False),
            ]
        ),
    )


def engine_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
    views: dict[str, list[str]] | None = None,
    pins: dict[str, int] | None = None,
) -> DataFrame:
    """Run ``sql`` with time-travel syntax resolved against ``tables``
    (logical name -> snapshot root). Queries rewrite onto manifest-pinned
    temp views; DML and maintenance statements (``DELETE FROM`` —
    copy-on-write, ``UPDATE … SET`` — merge-on-read, ``INSERT
    INTO/OVERWRITE … SELECT``, ``OPTIMIZE [ZORDER BY (…)]``, ``VACUUM
    [RETAIN n VERSIONS]``, ``RESTORE … TO VERSION AS OF n``) dispatch to
    the commit-log mutators and return a one-row (action, version)
    DataFrame. With ``views`` (table name -> materialized-view roots), a
    plain GROUP-BY aggregate over a cataloged table answers from a
    subsuming view (staleness-checked, incrementally refreshed) instead
    of scanning the fact data — any other shape, or no subsuming view,
    falls through to the ordinary scan path. With ``pins`` (table name ->
    version), BARE references resolve to the pinned version instead of
    HEAD — the catalog's cross-table consistent-snapshot hook; explicit
    ``AS OF`` clauses are untouched, and MV routing is bypassed (a view
    answers at base HEAD, which a pinned read must not see). See module
    docstring for the rewrite contract."""
    m = re.match(r"\s*EXPLAIN\s+", sql, re.IGNORECASE)
    if m:
        return explain_sql(spark, sql[m.end():], tables, views=views)
    if views and not pins:  # a pinned read must not answer at base HEAD
        mv = _try_mv_rewrite(spark, sql, tables, views)
        if mv is not None:
            return mv
    m = re.fullmatch(
        r"\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        return describe_history(spark, _resolve(tables, m.group(1)))
    m = re.fullmatch(
        r"\s*DESCRIBE\s+DETAIL\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        return describe_detail(spark, _resolve(tables, m.group(1)))
    m = re.fullmatch(
        r"\s*DESCRIBE\s+STATS\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        return describe_stats(spark, _resolve(tables, m.group(1)))
    m = re.fullmatch(
        r"\s*DESCRIBE\s+PARTITIONS\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        # NOTE: no function-local snapshots imports here — a local
        # `latest_version`/`read_manifest` binding would shadow the
        # module-level names for ALL of engine_sql and break earlier
        # paths with UnboundLocalError (the DESCRIBE BRANCHES
        # StringType incident, same class)
        import json as _json

        root = _resolve(tables, m.group(1))
        head = read_manifest(root, latest_version(root))
        rows_meta = head.get("rows", {})
        sizes = head.get("sizes", {})
        parts_meta = head.get("partitions") or {}

        def _pkey(f: str) -> tuple:
            e = parts_meta.get(f)
            return (
                (e["spec_id"], _json.dumps(e["values"]))
                if e is not None
                # pre-spec / rewrite-orphaned files surface explicitly
                # instead of silently vanishing from the rollup
                else (-1, "(untupled)")
            )

        agg: dict = {}
        for f in head["files"]:
            # [n_files, rows, bytes, rows_known, bytes_known]
            g = agg.setdefault(_pkey(f), [0, 0, 0, True, True])
            g[0] += 1
            if f in sizes:
                g[2] += int(sizes[f])
            else:
                g[4] = False  # unknown size -> -1, never a silent 0
            if f in rows_meta:
                g[1] += int(rows_meta[f])
            else:
                g[3] = False  # unknown rows for some file -> report -1
        # outstanding deletion vectors: subtract each vector's per-file
        # sidecar delta from its file's group so LIVE row counts are
        # reported; a vector without the breakdown (pre-format sidecar)
        # marks every group's rows unknown (-1) rather than overstating
        from telemetry_parquet_spark.sources import snapshots as _S

        live_files = set(head["files"])
        for dvf in head.get("dv") or []:
            side = _S._read_dv_agg_sidecar(root, dvf)
            per_file = (side or {}).get("per_file")
            if per_file is None:
                for g in agg.values():
                    g[3] = False
                break
            for f, delta in per_file.items():
                if f in live_files:
                    agg[_pkey(f)][1] -= int(delta["n"])
        if head.get("eq"):
            # outstanding equality deletes: per-tuple masked counts are
            # unknown until read time — report -1, never overstate
            for g in agg.values():
                g[3] = False
        from pyspark.sql.types import LongType

        return spark.createDataFrame(
            [
                (sid, vals, n, r if rk else -1, b if bk else -1)
                for (sid, vals), (n, r, b, rk, bk) in sorted(agg.items())
            ],
            StructType(
                [
                    StructField("spec_id", IntegerType(), False),
                    StructField("partition", StringType(), False),
                    StructField("n_files", IntegerType(), False),
                    StructField("n_rows", LongType(), False),
                    StructField("bytes", LongType(), False),
                ]
            ),
        )
    m = re.fullmatch(
        r"\s*DESCRIBE\s+SPEC\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        root = _resolve(tables, m.group(1))
        head = read_manifest(root, latest_version(root))
        spec = head.get("partition_spec") or {}
        rows = [
            (spec["spec_id"], i, f["col"], f["transform"], f.get("n"))
            for i, f in enumerate(spec.get("fields", []))
        ]
        return spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("spec_id", IntegerType(), False),
                    StructField("position", IntegerType(), False),
                    StructField("column", StringType(), False),
                    StructField("transform", StringType(), False),
                    StructField("n", IntegerType(), True),
                ]
            ),
        )
    m = re.fullmatch(
        r"\s*DESCRIBE\s+BRANCHES\s+(\w+)\s*;?\s*", sql, re.IGNORECASE
    )
    if m:
        from telemetry_parquet_spark.sources.branches import (
            list_branches,
            read_branch_manifest,
        )

        root = _resolve(tables, m.group(1))
        rows = []
        for b, head in sorted(list_branches(root).items()):
            bm = read_branch_manifest(root, b, head)
            rows.append(
                (b, head, bm["base_version"], bm.get("append_only", True))
            )
        from pyspark.sql.types import BooleanType

        return spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("branch", StringType(), False),
                    StructField("head", IntegerType(), False),
                    StructField("base_version", IntegerType(), False),
                    StructField("append_only", BooleanType(), False),
                ]
            ),
        )
    dml = _dml(spark, sql, tables)
    if dml is not None:
        return dml

    from telemetry_parquet_spark.sources.snapshots import resolve_ref

    # Metadata-only aggregates: a bare whole-table SELECT of COUNT(*) /
    # COUNT(col) / MIN(col) / MAX(col) / SUM(col) / AVG(col) terms (optionally
    # version-pinned) answers from the manifest alone — zero data I/O,
    # no scan in the plan. COUNT(*) comes from per-file footer row
    # counts (MOR versions subtract their deletion vectors); MIN/MAX
    # fold the per-file column stats; SUM/COUNT(col) fold the per-file
    # [sum, n_nonnull] entries commits record, minus the deletion
    # vectors' sidecar deltas — each exact only for integer columns with
    # full coverage (snapshots.snapshot_minmax / snapshot_sum) — any
    # unanswerable term falls through to the ordinary scan rewrite.
    # Branch refs fall through too (branch manifests live elsewhere).
    # Unaliased terms get SPARK'S native output names (count(1), sum(c),
    # min(c), max(c), avg(c), count(c)) so the statement's schema is the
    # SAME whether the fast path engages or the scan fallback runs — a
    # layout change can never silently rename a client's columns.
    # Documented type trade: the fast paths type every integer aggregate
    # BIGINT (the exact manifest fold), while the scan fallback carries
    # Spark's native aggregate types (MIN of an INT column is INT,
    # nullable) — layout-sensitive clients should pin casts as well as
    # aliases.
    def _pinned_version(tname: str, ref: str | None):
        """The version a fast path must answer at: an explicit VERSION
        AS OF (number or tag), else the catalog pin, else head — ONE
        implementation for the three metadata fast-path blocks below."""
        root_ = tables[tname]
        if ref is not None:
            return (resolve_ref(root_, ref[1:-1])
                    if ref.startswith("'") else int(ref))
        return None if pins is None else pins.get(tname)

    m = re.fullmatch(
        r"\s*SELECT\s+((?:COUNT\(\*\)|(?:MIN|MAX|SUM|COUNT|AVG)\(\w+\))"
        r"(?:\s+AS\s+\w+)?"
        r"(?:\s*,\s*(?:COUNT\(\*\)|(?:MIN|MAX|SUM|COUNT|AVG)\(\w+\))"
        r"(?:\s+AS\s+\w+)?)*)\s+FROM\s+(\w+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+'))?"
        r"(?:\s+WHERE\s+(\w+)\s*=\s*('[^']*'|-?\d+))?\s*;?\s*",
        sql,
        re.IGNORECASE,
    )
    if m and m.group(2) in tables and m.group(4) and not (
        m.group(3) or ""
    ).startswith("'branch:"):
        # predicate pushdown to METADATA: COUNT(*)/SUM/MIN/MAX over
        # ``WHERE key = literal`` folds only the files single-valued at
        # the probe (snapshots.snapshot_filtered_agg) — "count
        # yesterday's partition" with zero data I/O on a clustered
        # layout; any unanswerable shape (straddling files, COUNT(col)/
        # AVG terms, non-integer aggregates) falls through to the scan.
        from telemetry_parquet_spark.sources.snapshots import (
            snapshot_filtered_agg,
        )

        root = tables[m.group(2)]
        v = _pinned_version(m.group(2), m.group(3))
        lit = m.group(5)
        value = lit[1:-1] if lit.startswith("'") else int(lit)
        terms = [
            (t[0].split("(")[0].upper(), t[1], t[2])
            for t in re.findall(
                r"(COUNT\(\*\)|(?:MIN|MAX|SUM|COUNT|AVG)\((\w+)\))"
                r"(?:\s+AS\s+(\w+))?",
                m.group(1),
                re.IGNORECASE,
            )
        ]
        if all(
            kd in ("SUM", "MIN", "MAX") or (kd == "COUNT" and not c)
            for kd, c, _ in terms
        ):
            sum_cols = list(dict.fromkeys(
                c for kd, c, _ in terms if kd == "SUM"
            ))
            minmax_cols = list(dict.fromkeys(
                c for kd, c, _ in terms if kd in ("MIN", "MAX")
            ))
            agg = snapshot_filtered_agg(
                root, m.group(4), value, sum_cols, v,
                minmax_cols=minmax_cols,
            )
            if agg is not None:
                from pyspark.sql.types import LongType

                nsc = len(sum_cols)
                sidx = {c: 1 + i for i, c in enumerate(sum_cols)}
                midx = {
                    c: 1 + nsc + 2 * j for j, c in enumerate(minmax_cols)
                }
                names, vals = [], []
                for kd, c, alias in terms:
                    names.append(
                        alias
                        or ("count(1)" if kd == "COUNT"
                            else f"{kd.lower()}({c})")
                    )
                    if kd == "COUNT":
                        vals.append(int(agg[0]))
                    elif kd == "SUM":
                        vals.append(int(agg[sidx[c]]))
                    else:
                        vals.append(
                            int(agg[midx[c] + (1 if kd == "MAX" else 0)])
                        )
                return spark.createDataFrame(
                    [tuple(vals)],
                    StructType(
                        [
                            StructField(n_, LongType(), False)
                            for n_ in names
                        ]
                    ),
                )
    if m and m.group(2) in tables and not m.group(4) and not (
        m.group(3) or ""
    ).startswith("'branch:"):
        from telemetry_parquet_spark.sources.snapshots import (
            snapshot_minmax,
            snapshot_row_count,
            snapshot_sum,
        )

        root = tables[m.group(2)]
        v = _pinned_version(m.group(2), m.group(3))
        names, vals, kinds = [], [], []
        minmax_cache: dict[str, tuple | None] = {}
        sum_cache: dict[str, tuple | None] = {}
        for term, colname, alias in re.findall(
            r"(COUNT\(\*\)|(?:MIN|MAX|SUM|COUNT|AVG)\((\w+)\))"
            r"(?:\s+AS\s+(\w+))?",
            m.group(1),
            re.IGNORECASE,
        ):
            kind = term.split("(")[0].upper()
            if kind == "COUNT" and not colname:
                names.append(alias or "count(1)")
                vals.append(snapshot_row_count(root, v))
                kinds.append("long")
                continue
            if kind in ("SUM", "COUNT", "AVG"):
                if colname not in sum_cache:
                    sum_cache[colname] = snapshot_sum(root, colname, v)
                sc = sum_cache[colname]
                if sc is None:
                    names = []  # unanswerable term: whole statement scans
                    break
                names.append(alias or f"{kind.lower()}({colname})")
                if kind == "AVG":
                    # SQL AVG over BIGINT is a double; ONE division of
                    # the two exact manifest integers — the same value
                    # any engine computes from (SUM, COUNT)
                    vals.append(float(sc[0]) / float(sc[1]))
                    kinds.append("double")
                else:
                    vals.append(sc[0] if kind == "SUM" else sc[1])
                    kinds.append("long")
                continue
            if colname not in minmax_cache:
                minmax_cache[colname] = snapshot_minmax(root, colname, v)
            mm = minmax_cache[colname]
            if mm is None:
                names = []  # unanswerable term: whole statement scans
                break
            names.append(alias or f"{kind.lower()}({colname})")
            vals.append(mm[0] if kind == "MIN" else mm[1])
            kinds.append("long")
        if names:
            from pyspark.sql.types import DoubleType, LongType

            return spark.createDataFrame(
                [tuple(vals)],
                StructType(
                    [
                        StructField(
                            n_,
                            DoubleType() if k_ == "double" else LongType(),
                            False,
                        )
                        for n_, k_ in zip(names, kinds)
                    ]
                ),
            )

    # Manifest-planned sampling: ``SELECT * FROM t [VERSION AS OF …]
    # TABLESAMPLE (n ROWS)`` scans only the sorted-path file prefix whose
    # recorded row counts cover n (snapshots.sample_rows) — a 10k-row
    # sample of a 100 TB table reads a handful of files, deterministic
    # per manifest (not a uniform random sample; see sample_rows).
    sm = re.fullmatch(
        r"\s*SELECT\s+\*\s+FROM\s+(\w+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+'))?"
        r"\s+TABLESAMPLE\s*\(\s*(\d+)\s+ROWS\s*\)\s*;?\s*",
        sql,
        re.IGNORECASE,
    )
    if sm and sm.group(1) in tables and not (
        sm.group(2) or ""
    ).startswith("'branch:"):
        from telemetry_parquet_spark.sources.snapshots import sample_rows

        root = tables[sm.group(1)]
        v = _pinned_version(sm.group(1), sm.group(2))
        return sample_rows(spark, root, int(sm.group(3)), v)

    # Metadata-only GROUP BY: ``SELECT <key>, COUNT(*)/SUM(col)… FROM t
    # [VERSION AS OF …] GROUP BY <key>`` answers from the manifest alone
    # when the layout clusters the key — every file single-valued on it
    # (snapshots.snapshot_groupby_metadata; the manifest-stats recovery
    # of the metadata GROUP BY hive partitioning gives away for free).
    # Any unanswerable shape falls through to the ordinary scan rewrite.
    gm = re.fullmatch(
        r"\s*SELECT\s+((?:\w+\s*,\s*)+)"
        r"((?:COUNT\(\*\)|(?:SUM|MIN|MAX)\(\w+\))"
        r"(?:\s+AS\s+\w+)?"
        r"(?:\s*,\s*(?:COUNT\(\*\)|(?:SUM|MIN|MAX)\(\w+\))"
        r"(?:\s+AS\s+\w+)?)*)"
        r"\s+FROM\s+(\w+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+'))?"
        r"\s+GROUP\s+BY\s+(\w+(?:\s*,\s*\w+)*)"
        r"\s*(?:ORDER\s+BY\s+(\w+(?:\s*,\s*\w+)*)\s*)?;?\s*",
        sql,
        re.IGNORECASE,
    )
    if gm:
        keys = [k.strip() for k in gm.group(1).split(",") if k.strip()]
        gb_keys = [k.strip() for k in gm.group(5).split(",")]
        ob = gm.group(6)
        ob_keys = None if ob is None else [k.strip() for k in ob.split(",")]
    if (
        gm
        and gm.group(3) in tables
        and [k.lower() for k in keys] == [k.lower() for k in gb_keys]
        and (
            ob_keys is None
            or [k.lower() for k in ob_keys] == [k.lower() for k in keys]
        )
        and not (gm.group(4) or "").startswith("'branch:")
    ):
        from telemetry_parquet_spark.sources.snapshots import (
            snapshot_groupby_metadata,
        )

        root = tables[gm.group(3)]
        v = _pinned_version(gm.group(3), gm.group(4))
        terms = [
            (t[0].split("(")[0].upper(), t[1], t[2])
            for t in re.findall(
                r"(COUNT\(\*\)|(?:SUM|MIN|MAX)\((\w+)\))(?:\s+AS\s+(\w+))?",
                gm.group(2),
                re.IGNORECASE,
            )
        ]
        sum_cols = list(dict.fromkeys(
            c for kd, c, _ in terms if kd == "SUM"
        ))
        minmax_cols = list(dict.fromkeys(
            c for kd, c, _ in terms if kd in ("MIN", "MAX")
        ))
        folded = snapshot_groupby_metadata(
            root, keys, sum_cols, v, minmax_cols=minmax_cols
        )
        if folded:  # empty = zero non-empty files; let the scan say so
            # NOTE: StringType comes from the module-level import — a
            # local import here would shadow it for the WHOLE function
            # and break earlier uses (UnboundLocalError)
            from pyspark.sql.types import LongType

            # folded rows: (*keys, n_rows, <sums>, <min/max pairs>)
            nk, nsc = len(keys), len(sum_cols)
            sidx = {c: nk + 1 + i for i, c in enumerate(sum_cols)}
            midx = {
                c: nk + 1 + nsc + 2 * j for j, c in enumerate(minmax_cols)
            }

            def _term_val(g, kd, c):
                if kd == "COUNT":
                    return int(g[nk])
                if kd == "SUM":
                    return int(g[sidx[c]])
                return int(g[midx[c] + (1 if kd == "MAX" else 0)])

            fields = [
                StructField(
                    k,
                    StringType() if isinstance(folded[0][j], str)
                    else LongType(),
                    False,
                )
                for j, k in enumerate(keys)
            ]
            rows_out = [
                (
                    *[
                        g[j] if isinstance(g[j], str) else int(g[j])
                        for j in range(nk)
                    ],
                    *[_term_val(g, kd, c) for kd, c, _ in terms],
                )
                for g in folded
            ]
            for kd, c, alias in terms:
                # Spark-native default names: schema parity with the
                # scan fallback (see the whole-table block's note)
                nm = alias or (
                    "count(1)" if kd == "COUNT" else f"{kd.lower()}({c})"
                )
                fields.append(StructField(nm, LongType(), False))
            return spark.createDataFrame(rows_out, StructType(fields))

    # Star-join DPP route: an eligible ``SELECT … FROM fact JOIN dim ON
    # fk = dk WHERE <dim filter…>`` (HEAD reads only — a pinned read
    # must plan at its pin, which the prober does not) goes through
    # plan_dpp_join so the dim filter prunes FACT FILES from the
    # manifest before the scan. Honest fallback on any inadmissible
    # shape or planner refusal.
    if not pins:
        dpp = _try_dpp_rewrite(spark, sql, tables)
        if dpp is not None:
            return dpp

    for name, root in tables.items():
        def _sub_version(mo: re.Match) -> str:
            g = mo.group(1)
            # a number pins a version; a quoted string resolves a TAG,
            # or 'branch:<b>[@<k>]' a branch head / sequence point
            if g.startswith("'branch:"):
                from telemetry_parquet_spark.sources.branches import (
                    read_branch,
                )

                ref = g[len("'branch:"):-1]
                b, _, k = ref.partition("@")
                view = f"__snap_{name}_b_{b}_{k or 'head'}"
                read_branch(
                    spark, root, b, int(k) if k else None
                ).createOrReplaceTempView(view)
                return view
            v = resolve_ref(root, g[1:-1]) if g.startswith("'") else int(g)
            return _register(spark, name, root, v)

        def _sub_timestamp(mo: re.Match) -> str:
            ts = float(mo.group(1))
            return _register(spark, name, root, version_as_of(root, ts))

        sql = re.sub(
            rf"\b{re.escape(name)}\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+')",
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
        # Bare references resolve to the HEAD pinned now (or the caller's
        # pinned version) — register under the table's own name so no
        # rewrite of the statement is needed.
        if re.search(rf"\b{re.escape(name)}\b", sql):
            v = (pins or {}).get(name, None)
            read_snapshot(
                spark, root, latest_version(root) if v is None else v
            ).createOrReplaceTempView(name)
    return spark.sql(sql)
