from __future__ import annotations

import os
import sys

import pytest

# repo root on sys.path so `telemetry_parquet_spark` and `__spark_entry__`
# import without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from telemetry_parquet_spark.session import get_session

    spark = get_session("tps-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
