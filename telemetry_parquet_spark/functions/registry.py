"""SQL-function registration — the §2.11 ``registerUDFs`` surface
(``udfs.scala:21-27``): expose the engine's scalar library to the SQL
front-door so ``spark.sql("SELECT block_id(client_id, 100) ...")`` works.

Where the reference registered Scala UDFs (hll_create/hll_cardinality/
bucketed), our versions are either built-ins already (HLL sketch family in
Spark ≥3.5) or expression builders; only genuinely row-level rewrites
(normalize_iso_timestamp) register as real UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType


def register_udfs(spark: SparkSession) -> None:
    """Register the engine's SQL-callable functions (idempotent)."""
    from telemetry_parquet_spark.functions.dates import _normalize_iso_offset

    spark.udf.register(
        "normalize_iso_timestamp", _normalize_iso_offset, StringType()
    )

    # block_id / bucketed exist as expression builders; SQL callers get thin
    # Python wrappers with the same semantics.
    import zlib

    spark.udf.register(
        "block_id",
        lambda s, n: (zlib.crc32(str(s).encode()) % n) if s is not None else None,
        IntegerType(),
    )

    def _bucketed(value, splits):
        if value is None:
            return None
        for s in sorted(splits):
            if value <= s:
                return int(s)
        return int(max(splits) + 1)

    spark.udf.register("bucketed", _bucketed, IntegerType())
