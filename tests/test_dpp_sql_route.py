"""Star-join DPP through the SQL front door
(sources/sql_front.py::_try_dpp_rewrite + _probe_dpp).

Contract under test: an eligible ``SELECT … FROM fact JOIN dim ON fk =
dk WHERE <conjunctive dim filter>`` routes through plan_dpp_join and
produces EXACTLY the vanilla-scan answer; every inadmissible shape or
planner refusal falls through to the scan route (same answer, different
plan); EXPLAIN reports the decision statically (no live-set job); and
keyword-case/whitespace mutants route identically (the fuzz-corpus
discipline)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.sql_front import (
    _parse_conjuncts,
    _probe_dpp,
    engine_sql,
)


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    """bucket(8, fk) fact + plain dim, disjoint column names."""
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )

    base = tmp_path_factory.mktemp("dppsql")
    froot, droot = str(base / "f"), str(base / "d")
    fact = spark.range(0, 5000).select(
        (F.col("id") % 100).alias("fk"), F.col("id").alias("val"))
    dim = spark.range(0, 100).select(
        F.col("id").alias("dk"), (F.col("id") % 10).alias("grp"))
    S.append(spark, froot, fact)
    set_partition_spec(froot, [PartitionField("fk", "bucket", 8)])
    S.compact_table(spark, froot, target_bytes=1 << 26)
    S.append(spark, droot, dim)
    return {"f": froot, "dm": droot}


def _vanilla(spark, t, stmt):
    """The same statement over plain temp views of the table heads."""
    S.read_snapshot(spark, t["f"]).createOrReplaceTempView("vf")
    S.read_snapshot(spark, t["dm"]).createOrReplaceTempView("vd")
    return spark.sql(
        stmt.replace("FROM f ", "FROM vf ")
        .replace("JOIN dm ", "JOIN vd ")
        .replace("FROM dm ", "FROM vd ")
        .replace("FROM dm)", "FROM vd)")
    )


_STMT = (
    "SELECT grp, COUNT(*) AS n, SUM(val) AS sv FROM f JOIN dm "
    "ON fk = dk WHERE dk IN (3, 7) AND grp <= 9 GROUP BY grp"
)


def test_routed_statement_matches_vanilla(spark, star):
    verdict, info = _probe_dpp(_STMT, star)
    assert verdict == "candidate"
    assert info["fact"] == "f" and info["dim"] == "dm"
    got = sorted(tuple(r) for r in engine_sql(spark, _STMT, star).collect())
    want = sorted(tuple(r) for r in _vanilla(spark, star, _STMT).collect())
    assert got == want and got  # non-empty


def test_mutants_route_identically(spark, star):
    rng = random.Random(0xD99)
    want = sorted(tuple(r) for r in engine_sql(spark, _STMT, star).collect())
    for _ in range(4):
        mutant = "".join(
            c.lower() if rng.random() < 0.5 else c for c in _STMT
        )
        mutant = re.sub(
            r" ", lambda _m: rng.choice([" ", "  ", "\t"]), mutant
        )
        got = sorted(
            tuple(r) for r in engine_sql(spark, mutant, star).collect()
        )
        assert got == want, mutant


def test_inadmissible_shapes_fall_through_to_scan(spark, star):
    """Disjunctions, cross-column predicates, qualified items, fact-only
    filters: the probe reports the miss, the answer stays vanilla."""
    cases = [
        # OR -> not a conjunction
        ("SELECT grp, COUNT(*) AS n FROM f JOIN dm ON fk = dk "
         "WHERE dk = 3 OR dk = 7 GROUP BY grp", "conjunction"),
        # cross-column comparison
        ("SELECT grp, COUNT(*) AS n FROM f JOIN dm ON fk = dk "
         "WHERE val = dk GROUP BY grp", "conjunction"),
        # no dim predicate -> live set total
        ("SELECT grp, COUNT(*) AS n FROM f JOIN dm ON fk = dk "
         "WHERE val <= 4000 GROUP BY grp", "no dim predicate"),
    ]
    for stmt, why in cases:
        verdict, reason = _probe_dpp(stmt, star)
        assert verdict == "miss" and why in reason, (stmt, reason)
        got = sorted(
            tuple(r) for r in engine_sql(spark, stmt, star).collect()
        )
        want = sorted(
            tuple(r) for r in _vanilla(spark, star, stmt).collect()
        )
        assert got == want, stmt


def test_unpartitioned_fact_misses(spark, star, tmp_path):
    froot2 = str(tmp_path / "plainf")
    S.append(
        spark, froot2,
        spark.range(0, 100).select(
            (F.col("id") % 10).alias("fk"), F.col("id").alias("val")
        ),
    )
    t = {"f": froot2, "dm": star["dm"]}
    verdict, reason = _probe_dpp(
        "SELECT COUNT(*) AS n FROM f JOIN dm ON fk = dk WHERE dk = 3",
        t,
    )
    assert verdict == "miss" and "partition spec" in reason


def test_explain_reports_the_dpp_decision(spark, star):
    route = {
        r.aspect: r.detail
        for r in engine_sql(spark, "EXPLAIN " + _STMT, star).collect()
    }["route"]
    assert route.startswith("dpp-join")
    assert "bucket(fk)" in route
    # miss case carries the reason
    rows = {
        r.aspect: r.detail
        for r in engine_sql(
            spark,
            "EXPLAIN SELECT grp, COUNT(*) AS n FROM f JOIN dm ON fk = dk "
            "WHERE dk = 3 OR dk = 7 GROUP BY grp",
            star,
        ).collect()
    }
    assert rows["route"] == "scan" and "conjunction" in rows["dpp_miss"]


def test_conjunct_parser_shapes():
    from telemetry_parquet_spark.sources.scan_planner import Eq, In, Range

    got = _parse_conjuncts(
        "a = 5 AND b IN ('x', 'y') AND c BETWEEN 1 AND 9 AND d >= 2.5"
    )
    assert got == [
        Eq("a", 5), In("b", ("x", "y")), Range("c", 1, 9),
        Range("d", 2.5, None),
    ]
    for bad in ("a = 5 OR b = 2", "a = b", "f(a) = 5", "a = 5 AND",
                "NOT a = 5"):
        assert _parse_conjuncts(bad) is None, bad


_SEMI_STMT = (
    "SELECT fk, COUNT(*) AS n, SUM(val) AS sv FROM f "
    "WHERE fk IN (SELECT dk FROM dm WHERE grp = 3) AND val >= 100 "
    "GROUP BY fk ORDER BY fk"
)


def test_semi_shape_routes_and_matches_vanilla(spark, star):
    """fk IN (SELECT dk FROM dim WHERE …) routes as a left_semi DPP
    join; answers equal the vanilla correlated-IN evaluation."""
    verdict, info = _probe_dpp(_SEMI_STMT, star)
    assert verdict == "candidate" and info["how"] == "left_semi"
    got = [tuple(r) for r in engine_sql(spark, _SEMI_STMT, star).collect()]
    want = [tuple(r) for r in _vanilla(spark, star, _SEMI_STMT).collect()]
    assert got == want and got
    route = {
        r.aspect: r.detail
        for r in engine_sql(spark, "EXPLAIN " + _SEMI_STMT, star).collect()
    }["route"]
    assert route.startswith("dpp-join [left_semi]")


def test_semi_subquery_fact_conjunct_is_equivalent(spark, star):
    """A fact-column conjunct INSIDE the subquery is a correlated
    reference in SQL; classifying it as a fact predicate is equivalent
    (the subquery is all-or-nothing per outer row) — proven against
    Spark's own evaluation."""
    stmt = (
        "SELECT COUNT(*) AS n FROM f WHERE fk IN "
        "(SELECT dk FROM dm WHERE grp = 3 AND val <= 2000)"
    )
    assert _probe_dpp(stmt, star)[0] == "candidate"
    got = engine_sql(spark, stmt, star).first().n
    want = _vanilla(spark, star, stmt).first().n
    assert got == want


def test_semi_misses_fall_through(spark, star):
    # wrong direction: the IN column belongs to the dim
    v, why = _probe_dpp(
        "SELECT COUNT(*) AS n FROM f WHERE dk IN "
        "(SELECT fk FROM dm WHERE grp = 3)",
        star,
    )
    assert v == "miss"
    # no dim filter in the subquery -> not our shape (regex needs WHERE)
    v2, _ = _probe_dpp(
        "SELECT COUNT(*) AS n FROM f WHERE fk IN (SELECT dk FROM dm)",
        star,
    )
    assert v2 == "miss"
    # still answerable by the scan route
    got = engine_sql(
        spark,
        "SELECT COUNT(*) AS n FROM f WHERE fk IN (SELECT dk FROM dm)",
        star,
    ).first().n
    want = _vanilla(
        spark, star,
        "SELECT COUNT(*) AS n FROM f WHERE fk IN (SELECT dk FROM dm)",
    ).first().n
    assert got == want


def test_outer_dim_only_conjunct_misses_not_answers(spark, star):
    """An outer-scope conjunct on a dim-only column is INVALID SQL: the
    probe must MISS (never silently answer n=0) so the scan route can
    raise Catalyst's own unresolved-column error."""
    stmt = (
        "SELECT COUNT(*) AS n FROM f WHERE fk IN "
        "(SELECT dk FROM dm WHERE dk = 3) AND grp = 5"
    )
    v, why = _probe_dpp(stmt, star)
    assert v == "miss" and "outer predicate" in why
    with pytest.raises(Exception):  # Catalyst AnalysisException
        engine_sql(spark, stmt, star).collect()
