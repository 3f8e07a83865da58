"""Deterministic-HLL queries (datapipe/hll_det.py): register content,
distinct estimates (both correction branches), and the daily-merge
mergeability proof — all under EXACT DuckDB oracles because the sketch is
built on the engine-portable ``md5_hash60`` and the estimate arithmetic is
fixed-order over exact integer register sums (the theta/CMS discipline).

Companion to ``a7_hll_distinct_users`` (Spark-native DataSketches HLL,
rows-only by nature): same estimator family, relational state, hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.hll_det import ALPHA, M, MAXR, P
from telemetry_parquet_spark.queries.corpus import _md5h60_sql
from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

_AM2 = float(ALPHA * M * M)          # alpha_m * m^2, same bits both engines
_P2MAXR = float(1 << MAXR)           # 2^51, exact in double


def _reg_cte(group_expr: str, key_expr: str, table: str, where: str) -> str:
    """DuckDB replay of hll_det_registers: hash distinct (group, key) pairs
    (max absorbs duplicates, so hashing distinct pairs is equivalent and
    keeps the md5 subquery off the raw fact rows), split bucket/window,
    max-rho per register."""
    return f"""
d AS (
  SELECT DISTINCT {group_expr} AS g, CAST({key_expr} AS VARCHAR) AS k
  FROM {table} WHERE {where}
),
hv AS (SELECT g, {_md5h60_sql('k')} AS h FROM d),
b AS (
  SELECT g, h >> {60 - P} AS bucket,
         h & ((CAST(1 AS BIGINT) << {60 - P}) - 1) AS w
  FROM hv
),
reg AS (
  SELECT g, bucket,
         CAST(MAX(CASE WHEN w = 0 THEN {MAXR}
                       ELSE {MAXR} - length(bin(w)) END) AS INT) AS m_rho
  FROM b GROUP BY 1, 2
)
"""


def _est_sql(exact_cte: str, group_alias: str) -> str:
    """Estimate SELECT over the ``reg`` CTE, fixed evaluation order
    mirroring hll_det_estimates operation for operation."""
    return f"""
pg AS (
  SELECT g, COUNT(*) AS n_set,
         SUM(CAST(power(2, {MAXR} - m_rho) AS BIGINT)) AS s_present
  FROM reg GROUP BY 1
),
e AS (
  SELECT g, n_set,
         {_AM2!r} * ({_P2MAXR!r} / CAST(
           ({M} - n_set) * CAST(power(2, {MAXR}) AS BIGINT) + s_present
           AS DOUBLE)) AS raw
  FROM pg
),
{exact_cte}
SELECT e.g AS {group_alias},
       CAST(e.n_set AS INT) AS n_buckets_set,
       round(CASE WHEN e.raw <= {2.5 * M!r} AND ({M} - e.n_set) > 0
                  THEN {float(M)!r} * ln({float(M)!r} / ({M} - e.n_set))
                  ELSE e.raw END, 4) AS est_distinct,
       CAST(ex.exact AS BIGINT) AS exact_distinct
FROM e JOIN ex ON ex.g = e.g
"""


_EVENTS_REG = _reg_cte(
    "event_type", "user_id", "events", "user_id IS NOT NULL"
)


@query(
    "hll_det_register_table",
    oracle=f"""
    WITH {_EVENTS_REG}
    SELECT g AS event_type, CAST(bucket AS BIGINT) AS bucket, m_rho
    FROM reg
    """,
)
def hll_det_register_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register CONTENT per event type — the persistable m-row-max
    sketch state a daily pipeline stores (A7 analog of the theta/CMS
    sketch-content gates). Every (bucket, max-rho) value is hash-checked
    cross-engine."""
    from telemetry_parquet_spark.datapipe.hll_det import hll_det_registers

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    return hll_det_registers(events, "event_type", "user_id").select(
        "event_type", "bucket", "m_rho"
    )


@query(
    "hll_det_distinct_users",
    oracle=f"""
    WITH {_EVENTS_REG},
    {_est_sql('''ex AS (
      SELECT event_type AS g, COUNT(DISTINCT user_id) AS exact
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )''', 'event_type')}
    """,
)
def hll_det_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate per event type next to the exact count —
    at this cardinality (≲ m) the linear-counting correction branch is the
    live path; the raw branch is covered by hll_det_orderkey_estimates."""
    from telemetry_parquet_spark.datapipe.hll_det import (
        hll_det_estimates,
        hll_det_registers,
    )

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    reg = hll_det_registers(events, "event_type", "user_id")
    est = hll_det_estimates(reg, "event_type")
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_buckets_set", "est_distinct", "exact_distinct"
    )


@query(
    "hll_det_orderkey_estimates",
    oracle=f"""
    WITH {_reg_cte("l_returnflag", "l_orderkey", "lineitem", "TRUE")},
    {_est_sql('''ex AS (
      SELECT l_returnflag AS g, COUNT(DISTINCT l_orderkey) AS exact
      FROM lineitem GROUP BY 1
    )''', 'l_returnflag')}
    """,
)
def hll_det_orderkey_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-orderkey estimate per return flag: cardinality ≫ 2.5·m, so
    the RAW harmonic-mean branch (not linear counting) is the live path —
    together with hll_det_distinct_users both estimator branches are
    driver-gated."""
    from telemetry_parquet_spark.datapipe.hll_det import (
        hll_det_estimates,
        hll_det_registers,
    )

    li = load_table(spark, sf_dir, "lineitem")
    reg = hll_det_registers(li, "l_returnflag", "l_orderkey")
    est = hll_det_estimates(reg, "l_returnflag")
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag", "n_buckets_set", "est_distinct", "exact_distinct"
    )


@query(
    "hll_det_daily_merge",
    # oracle = the DIRECT whole-corpus register table: a green row proves
    # cross-engine that per-day register tables merged by max equal the
    # sketch of the union (max is associative/commutative/idempotent) —
    # the property that lets a daily pipeline persist m-row sketches and
    # never re-touch history. Theta proved it for KMV re-ranking
    # (theta_daily_merge); this is the HLL half.
    oracle=f"""
    WITH {_EVENTS_REG}
    SELECT g AS event_type, CAST(bucket AS BIGINT) AS bucket, m_rho
    FROM reg
    """,
)
def hll_det_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build registers PER (event_type, day), then merge each type's day
    sketches by max — emitted content is gated against the direct
    whole-corpus sketch."""
    from telemetry_parquet_spark.datapipe.hll_det import (
        hll_det_merge,
        hll_det_registers,
    )

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    ev = events.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    ).withColumn(
        "g", F.concat_ws("\x1f", "event_type", F.col("day").cast("string"))
    )
    daily = hll_det_registers(ev, "g", "user_id")
    merged = hll_det_merge(
        daily.withColumn(
            "event_type", F.split("g", "\x1f").getItem(0)
        ),
        "event_type",
    )
    return merged.select("event_type", "bucket", "m_rho")
