"""Named-query registry.

Every operator from SURVEY.md §2 that is SQL-expressible registers here twice:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` and a DuckDB oracle SQL
string over the same tables. The driver (and ``tests/test_oracle_parity.py``)
runs both and compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- aggregate arithmetic over doubles goes through DECIMAL casts (exact,
  order-independent sums) and is cast back to DOUBLE at the end — a raw
  ``sum(double)`` differs between engines (and between Spark task orderings)
  in the low bits;
- every top-k / first-per-group has a total tie-break order.

Queries without an oracle entry (approximate sketches, streaming, ML) get the
driver's weaker rows-only check and carry their own pytest coverage.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a named query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dec(col, precision: int = 18, scale: int = 2):
    """Cast to decimal for order-independent exact aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")
