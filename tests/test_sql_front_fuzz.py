"""SQL front door fuzz corpus (sources/sql_front.py).

The router is ~1.4k lines of exact-match (``re.fullmatch``) statement
regexes over a growing surface; the realistic bug classes are (a) a
recognized statement whose case/whitespace variant silently misses the
route and falls to a DIFFERENT behavior, and (b) a near-miss statement
that silently matches SOMETHING instead of erroring. This corpus pins
the contract from the round-10 verdict:

1. **Mutation invariance** — keyword-case and whitespace mutations of
   every RECOGNIZED read-only statement produce the identical result
   (collected, sorted) as the canonical spelling, across a seeded sweep.
2. **Unrecognized → vanilla Catalyst unchanged** — statements the
   router does not claim produce exactly what ``spark.sql`` produces
   over equivalently registered plain temp views.
3. **Near-miss → loud error** — corrupting one keyword of a recognized
   statement (char dropped / doubled / junk appended) either raises
   (router ValueError/KeyError or Catalyst parse/analysis error) or —
   only for corruptions that remain VALID vanilla SQL — returns the
   vanilla result; it must never silently reroute to a different
   statement family (asserted via the action column on DML shapes).
4. **DML case-routing** — lowercase/mixed-case DML still dispatches to
   the commit-log mutators (action column proves the route), never to
   the scan path.
"""

from __future__ import annotations

import os
import random
import re

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.snapshots import (
    append,
    create_tag,
    latest_version,
)
from telemetry_parquet_spark.sources.sql_front import engine_sql

_KEYWORD = re.compile(r"^[A-Z][A-Z_]*$")  # canonical keywords are CAPS


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def _mutate_case(stmt: str, rng: random.Random) -> str:
    """Random-case every ALL-CAPS keyword token; identifiers (written
    lowercase in the corpus) and quoted strings stay untouched."""
    parts = stmt.split("'")
    for i in range(0, len(parts), 2):  # even segments: outside quotes
        toks = re.split(r"(\W+)", parts[i])
        parts[i] = "".join(
            "".join(
                c.lower() if rng.random() < 0.5 else c for c in t
            )
            if _KEYWORD.match(t)
            else t
            for t in toks
        )
    return "'".join(parts)


def _mutate_space(stmt: str, rng: random.Random) -> str:
    parts = stmt.split("'")
    for i in range(0, len(parts), 2):
        parts[i] = re.sub(
            r" ",
            lambda _: rng.choice([" ", "  ", "\t", " \t ", "   "]),
            parts[i],
        )
    return "'".join(parts)


@pytest.fixture(scope="module")
def table(spark, sf_dir, tmp_path_factory):
    """orders snapshot: v1 append, a tag, a day(o_orderdate) spec, and
    a spec'd second append so every statement family has substance."""
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )

    root = str(tmp_path_factory.mktemp("fuzz") / "t")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    append(spark, root, orders.where(F.col("o_orderkey") % 2 == 0))
    create_tag(root, "base")
    set_partition_spec(root, [PartitionField("o_orderdate", "day")])
    append(spark, root, orders.where(F.col("o_orderkey") % 2 == 1))
    return root


# canonical READ-ONLY statements: keywords CAPS, identifiers lowercase
_READONLY = [
    "DESCRIBE HISTORY t",
    "DESCRIBE DETAIL t",
    "DESCRIBE STATS t",
    "DESCRIBE SPEC t",
    "DESCRIBE PARTITIONS t",
    "DESCRIBE BRANCHES t",
    "SELECT COUNT(*) AS n FROM t",
    "SELECT * FROM t VERSION AS OF 1",
    "SELECT * FROM t VERSION AS OF 'base'",
    "SELECT o_orderpriority, COUNT(*) AS n FROM t "
    "GROUP BY o_orderpriority",
    "TABLE CHANGES t FROM 1 TO 3",
    "SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF 9999999999",
    # deterministic per manifest version -> mutation-invariant
    "SELECT * FROM t TABLESAMPLE (50 ROWS)",
]


def test_readonly_mutation_invariance(spark, table):
    rng = random.Random(0xC0FFEE)
    t = {"t": table}
    for stmt in _READONLY:
        want = _multiset(engine_sql(spark, stmt, t))
        for _ in range(6):
            mutant = _mutate_space(_mutate_case(stmt, rng), rng)
            if rng.random() < 0.5:
                mutant += ";"
            if rng.random() < 0.5:
                mutant = "   " + mutant
            got = _multiset(engine_sql(spark, mutant, t))
            assert got == want, f"{mutant!r} diverged from {stmt!r}"


def test_unrecognized_matches_vanilla_catalyst(spark, table):
    """Statements the router does not claim must equal spark.sql over a
    plain temp view of the same pinned snapshot."""
    from telemetry_parquet_spark.sources.snapshots import read_snapshot

    read_snapshot(spark, table).createOrReplaceTempView("vanilla_t")
    t = {"t": table}
    corpus = [
        # shapes outside every fast path and DDL family
        "SELECT o_orderstatus, AVG(o_totalprice) AS a FROM t "
        "WHERE o_orderkey % 7 = 1 GROUP BY o_orderstatus HAVING COUNT(*) > 2",
        "SELECT DISTINCT o_orderpriority FROM t",
        "WITH x AS (SELECT o_custkey, COUNT(*) AS n FROM t GROUP BY 1) "
        "SELECT MAX(n) AS m FROM x",
        "SELECT t1.o_orderkey FROM t t1 JOIN t t2 "
        "ON t1.o_orderkey = t2.o_orderkey WHERE t1.o_orderkey < 50",
        "SELECT COUNT(*) AS n FROM t WHERE o_orderpriority LIKE '%URGENT%'",
    ]
    rng = random.Random(7)
    for stmt in corpus:
        got = _multiset(engine_sql(spark, stmt, t))
        want = _multiset(spark.sql(stmt.replace(" t ", " vanilla_t ")
                                   .replace(" t,", " vanilla_t,")))
        assert got == want, stmt
        # and its mutants agree too
        mutant = _mutate_space(_mutate_case(stmt, rng), rng)
        assert _multiset(engine_sql(spark, mutant, t)) == want, mutant


def test_near_miss_is_loud_never_a_silent_reroute(spark, table):
    """Corrupt one keyword per statement: the router must raise (its own
    loud error or Catalyst's) — or, when the corruption happens to stay
    valid vanilla SQL, produce the vanilla answer. What it must NEVER do
    is execute a DIFFERENT statement family (detected here as a
    mutation-produced (action, version) DataFrame)."""
    t = {"t": table}
    rng = random.Random(42)
    base = [
        "DESCRIBE HISTORY t",
        "DESCRIBE PARTITIONS t",
        "OPTIMIZE t",
        "VACUUM t RETAIN 5 VERSIONS",
        "DELETE FROM t WHERE o_orderkey < 0",
        "ALTER TABLE t SET PARTITION SPEC (day(o_orderdate))",
        "ALTER TABLE t SET PARTITION SPEC (month(o_orderdate))",
        "ALTER TABLE t SET PARTITION SPEC (year(o_orderdate))",
        "CREATE TAG t2 ON t",
        "MERGE BRANCH b INTO t",
        "RESTORE t TO VERSION AS OF 1",
        "TABLE CHANGES t FROM 1 TO 3",
        # conditional MERGE: every keyword corruption must land in the
        # loud clause-tail error or the MERGE INTO prefix error, never
        # silently run a DIFFERENT clause routing
        "MERGE INTO t USING (SELECT * FROM t VERSION AS OF 1) "
        "ON o_orderkey WHEN MATCHED AND s.o_orderkey < 0 THEN DELETE "
        "WHEN NOT MATCHED AND s.o_orderkey < 0 THEN INSERT *",
    ]
    head_before = latest_version(table)
    for stmt in base:
        words = [w for w in re.findall(r"[A-Z_]+", stmt) if len(w) > 2]
        for _ in range(4):
            w = rng.choice(words)
            corrupted = rng.choice(
                [w[:-1], w + w[-1], w + "X", w[0] + w]
            )
            mutant = re.sub(rf"\b{w}\b", corrupted, stmt, count=1)
            if mutant == stmt:
                continue
            try:
                out = engine_sql(spark, mutant, t)
            except Exception:
                continue  # loud error: the contract
            cols = set(out.columns)
            assert cols != {"action", "version"}, (
                f"near-miss {mutant!r} silently rerouted to a mutator"
            )
            # a surviving mutant must be valid vanilla SQL — force
            # evaluation so analysis errors surface here, loudly
            out.collect()
    # none of the surviving near-misses committed anything
    assert latest_version(table) == head_before


def test_dml_routes_case_insensitively(spark, sf_dir, tmp_path):
    """Mixed-case DML dispatches to the mutators (action column proves
    the route), and the mutation is the one asked for."""
    root = str(tmp_path / "dml")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    append(spark, root, orders.limit(200))
    t = {"t": root}
    out = engine_sql(
        spark, "delete from t where o_orderkey % 2 = 0", t
    ).first()
    assert out.action == "delete"
    out = engine_sql(
        spark,
        "Update t set o_orderstatus = 'x' WHERE o_orderkey % 3 = 0", t,
    ).first()
    assert out.action == "update-mor"
    out = engine_sql(
        spark, "optimize t zorder by (o_custkey)", t
    ).first()
    assert out.action == "optimize"
    n = engine_sql(spark, "select count(*) AS n from t", t).first().n
    from telemetry_parquet_spark.sources.snapshots import read_snapshot

    assert n == read_snapshot(spark, root).count()
    assert n == orders.limit(200).where("o_orderkey % 2 <> 0").count()
