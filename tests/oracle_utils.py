"""Local emulation of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive exact value multiset
(columns sorted by name). Exact cell equality — any float that differs in
the low bits here would hash-mismatch in the driver, so queries must be
written deterministically (see queries/registry.py docstring)."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    rows = [tuple(r) for r in df.collect()]
    return df.columns, rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def hugeint_columns(con, sql: str) -> list[str]:
    """Names of result columns DuckDB types as HUGEINT/UHUGEINT (int128).

    DuckDB's ``SUM`` over an INTEGER/BIGINT input widens to HUGEINT; the
    driver's canonicalizer renders int128 differently from Spark's BIGINT
    (float-like ``-16.0`` vs ``-16``), so a value-identical result still
    records ``hash_match: false`` — the CORRECTNESS_r05
    ``quality_linear_score`` red row. The local ``fetchall()`` path returns
    lossless Python ints and can't see the difference, hence this
    type-level lint: every oracle integer aggregate must be cast
    (``CAST(SUM(...) AS BIGINT)``). ``DESCRIBE`` binds and plans without
    executing, so this is cheap even for recursive-CTE oracles."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [name for name, typ, *_ in rows if "HUGEINT" in typ.upper()]


def trailing_zero_decimal_cells(con, sql: str) -> list[str]:
    """Result columns holding a DECIMAL cell whose string has a trailing
    zero after the decimal point (e.g. ``1251869314.00``, ``985204043.60``).

    The driver's canonicalizer renders such cells differently on the
    Spark and DuckDB sides (one side drops the trailing zeros), so a
    value-identical result still records ``hash_match: false`` — the
    CORRECTNESS_r09 8-red bug class (``snapshot_time_travel`` et al.),
    the same family as the r05 HUGEINT miss. Running the ORACLE side
    alone suffices: value parity is enforced separately, so the oracle's
    cells are the Spark cells. Queries must re-key money outputs to
    BIGINT cents (see queries/table_service.py ``_SUM``)."""
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    bad: set[str] = set()
    for row in cur.fetchall():
        for col, v in zip(cols, row):
            if isinstance(v, Decimal):
                s = str(v)
                if "." in s and s != s.rstrip("0"):
                    bad.add(col)
    return sorted(bad)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    scols, srows = spark_result(spark_df)
    dcols, drows = duckdb_result(con, sql)
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duckdb={len(drows)}")
    sc = canon_rows(scols, srows)
    dc = canon_rows(dcols, drows)
    if sc != dc:
        only_s = [r for r in sc if r not in set(dc)][:5]
        only_d = [r for r in dc if r not in set(sc)][:5]
        problems.append(
            f"values differ; sample only-in-spark={only_s} only-in-duckdb={only_d}"
        )
    return problems
