"""Query registry — import all query modules so their ``@query`` decorators run."""

from telemetry_parquet_spark.queries.registry import ORACLE, QUERIES

# Importing for registration side effects:
from telemetry_parquet_spark.queries import relational  # noqa: F401, E402
from telemetry_parquet_spark.queries import semistructured  # noqa: F401, E402
from telemetry_parquet_spark.queries import windows  # noqa: F401, E402
from telemetry_parquet_spark.queries import datapipe  # noqa: F401, E402
from telemetry_parquet_spark.queries import temporal  # noqa: F401, E402
from telemetry_parquet_spark.queries import streaming  # noqa: F401, E402
from telemetry_parquet_spark.queries import advanced  # noqa: F401, E402
from telemetry_parquet_spark.queries import tpch  # noqa: F401, E402
from telemetry_parquet_spark.queries import tpch2  # noqa: F401, E402
from telemetry_parquet_spark.queries import ingestion  # noqa: F401, E402
from telemetry_parquet_spark.queries import scalar_extra  # noqa: F401, E402
from telemetry_parquet_spark.queries import longitudinal  # noqa: F401, E402
from telemetry_parquet_spark.queries import ml_media  # noqa: F401, E402


def all_queries():
    return dict(QUERIES)


def all_oracles():
    return dict(ORACLE)
