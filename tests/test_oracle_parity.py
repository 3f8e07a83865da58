"""Every oracle-declared query must match DuckDB exactly at sf0.001 —
the local pre-flight for the driver's CORRECTNESS gate."""

from __future__ import annotations

import os

import pytest

from telemetry_parquet_spark.queries import all_oracles, all_queries
from tests.oracle_utils import (
    compare,
    duckdb_conn,
    hugeint_columns,
    trailing_zero_decimal_cells,
)

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


DRIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="module")
def driver_sf_con():
    """DuckDB over sf0.01 — the scale the DRIVER hashes at. The
    trailing-zero lint must run here too: sf0.001 missed 4 of the 8
    r09 reds (their trailing-zero cells only appear at sf0.01)."""
    c = duckdb_conn(DRIVER_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_no_trailing_zero_decimals(name, con, driver_sf_con):
    """No oracle output may contain a DECIMAL cell with a trailing zero
    after the point — the driver canonicalizer renders those differently
    per engine (CORRECTNESS_r09: 8 value-identical queries hash-red).
    Checked at the test SF and at sf0.01, the driver's hashing SF."""
    for label, c in (("sf-test", con), ("sf0.01", driver_sf_con)):
        bad = trailing_zero_decimal_cells(c, ORACLES[name])
        assert not bad, (
            f"{name} [{label}]: columns {bad} hold trailing-zero DECIMAL "
            "cells — the driver hash-reds these even when values match; "
            "re-key to BIGINT (e.g. cents via the table_service._SUM "
            "pattern)"
        )


def test_trailing_zero_lint_catches_decimal_sum(con):
    """The lint itself: a scale-2 DECIMAL total ending in '0' (the exact
    snapshot_time_travel bug class) must be flagged pre-driver."""
    assert trailing_zero_decimal_cells(
        con, "SELECT CAST(1.10 AS DECIMAL(25,2)) AS sum_price"
    ) == ["sum_price"]
    assert trailing_zero_decimal_cells(
        con, "SELECT CAST(1.23 AS DECIMAL(25,2)) AS ok_price"
    ) == []
    assert trailing_zero_decimal_cells(
        con, "SELECT CAST(110 AS BIGINT) AS sum_price_cents"
    ) == []


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
