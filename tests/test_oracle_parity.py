"""Every oracle-declared query must match DuckDB exactly at sf0.001 —
the local pre-flight for the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from telemetry_parquet_spark.queries import all_oracles, all_queries
from tests.oracle_utils import compare, duckdb_conn, hugeint_columns

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracleless_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_no_hugeint_columns(name, con):
    """No oracle may return HUGEINT — the driver renders int128 differently
    from Spark BIGINT even when values are identical (r05 red row)."""
    bad = hugeint_columns(con, ORACLES[name])
    assert not bad, (
        f"{name}: oracle columns typed HUGEINT {bad} — wrap the aggregate "
        "in CAST(... AS BIGINT) so the driver's canonicalizer matches Spark"
    )


def test_hugeint_lint_catches_bare_integer_sum(con):
    """The lint itself: a bare SUM(INTEGER) oracle (the exact
    quality_linear_score bug class) must be flagged pre-driver."""
    assert hugeint_columns(con, "SELECT SUM(r_regionkey) AS s FROM region") == ["s"]
    assert (
        hugeint_columns(
            con, "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region"
        )
        == []
    )
