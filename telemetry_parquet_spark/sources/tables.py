"""Table loading over the driver-provided synthetic star schema.

Stands in for the reference's two scan families:
- derived-parquet scans (``spark.read.parquet``, reference
  ``MainEventsView.scala:52``) — identical here;
- the dimension-pruned Heka raw scan (``SyncView.scala:53-62``) — in our
  engine a partitioned-parquet scan whose pruning Catalyst performs from
  ``WHERE`` clauses on partition columns (see ``sources/writers.py`` for the
  partitioned layout producer).

At 100 TB the fact tables (lineitem/orders/events/documents) are read as
Hive-partitioned datasets; predicate + column pushdown reaches the parquet
reader automatically because every query in ``queries/`` is declared with
DataFrame expressions (verify with ``plans/explain.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (``<sf_dir>/<name>.parquet``).

    ``events.ts`` is written as a parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as nanos-since-epoch (legacy conf,
    safe to set dynamically) and floor-convert to a microsecond timestamp —
    the same truncation DuckDB applies, so oracle comparisons agree."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Pin UTC regardless of the caller's session: day keys / epoch math in the
    # query pack must agree with the (UTC-naive) oracle even when the driver
    # builds its own SparkSession without a timeZone conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        # The generator has shipped two layouts for ``ts``: TIMESTAMP(NANOS)
        # (reads as BIGINT nanos under the legacy conf) and plain
        # TIMESTAMP(MICROS) (reads natively). Adapt to whichever is present.
        # Either way, normalize to TIMESTAMP_NTZ: DuckDB's timestamps are
        # naive — a tz-aware TimestampType here would surface as arrow
        # timestamp[us, tz=UTC] vs the oracle's naive timestamp[us] in any
        # arrow-level comparison.
        ts_kind = df.schema["ts"].dataType.typeName()
        if ts_kind == "long":
            ts_expr = F.timestamp_micros(F.expr("ts div 1000"))
        else:
            ts_expr = F.col("ts")
        return df.withColumn("ts", ts_expr.cast("timestamp_ntz"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views for the SQL front-door."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
