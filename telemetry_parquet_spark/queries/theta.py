"""KMV / theta-sketch queries (datapipe/theta.py): sketch content, distinct
estimates, and the pairwise audience-overlap matrix — all under EXACT DuckDB
oracles because the sketch is built on the engine-portable md5_hash60 and
the estimate arithmetic mirrors operation-for-operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.corpus import _md5h60_sql
from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

K = 32
_HS = 1 << 60

_SKETCH_CTE = f"""
d AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id IS NOT NULL
),
hv AS (
  SELECT DISTINCT event_type, {_md5h60_sql('k')} AS h FROM d
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
  FROM hv
),
sk AS (SELECT * FROM r WHERE rank <= {K}),
t AS (
  SELECT event_type, COUNT(*) AS n_sample,
         CASE WHEN COUNT(*) >= {K} THEN MAX(h) ELSE {_HS} END AS theta
  FROM sk GROUP BY event_type
)
"""


@query(
    "theta_sketch_users",
    oracle=f"""
    WITH {_SKETCH_CTE}
    SELECT event_type, CAST(rank AS INT) AS rank, CAST(h AS BIGINT) AS h
    FROM sk
    """,
)
def theta_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch CONTENT per event type: the {K} smallest distinct-user
    hashes — the persistable rows a daily audience pipeline stores and
    merges (re-rank the unioned samples). The driver gate checks every
    (rank, hash) value, the CMS/quantile sketch-content discipline."""
    from telemetry_parquet_spark.datapipe.theta import kmv_sketch

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    return kmv_sketch(events, "event_type", "user_id", k=K).select(
        "event_type", F.col("rank").cast("int").alias("rank"), "h"
    )


@query(
    "theta_distinct_users",
    oracle=f"""
    WITH {_SKETCH_CTE},
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT t.event_type,
           round(CASE WHEN t.n_sample >= {K}
                      THEN {float(K - 1)!r} * ({float(_HS)!r} / CAST(t.theta AS DOUBLE))
                      ELSE CAST(t.n_sample AS DOUBLE) END, 6) AS est_distinct,
           CAST(ex.exact AS BIGINT) AS exact_distinct
    FROM t JOIN ex USING (event_type)
    """,
)
def theta_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct estimate (k−1)·2^60/θ next to the exact relational
    count — the estimator plus its own honesty column, exactness-gated
    because both are deterministic (the sim_adc_recall_eval pattern)."""
    from telemetry_parquet_spark.datapipe.theta import (
        kmv_distinct_estimates,
        kmv_sketch,
    )

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    sk = kmv_sketch(events, "event_type", "user_id", k=K)
    est = kmv_distinct_estimates(sk, "event_type", k=K)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "est_distinct", "exact_distinct"
    )


@query(
    "theta_audience_overlap",
    oracle=f"""
    WITH {_SKETCH_CTE},
    pr AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             least(a.theta, b.theta) AS theta
      FROM t a JOIN t b ON a.event_type < b.event_type
    ),
    inter AS (
      SELECT p.group_a, p.group_b, COUNT(*) AS n_ret
      FROM pr p
      JOIN sk x ON x.event_type = p.group_a AND x.h < p.theta
      JOIN sk y ON y.event_type = p.group_b AND y.h = x.h
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT group_a, group_b, COUNT(*) AS n_uni FROM (
        SELECT DISTINCT p.group_a, p.group_b, x.h
        FROM pr p JOIN sk x
          ON (x.event_type = p.group_a OR x.event_type = p.group_b)
         AND x.h < p.theta
      ) GROUP BY 1, 2
    ),
    ex AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             COUNT(*) AS exact
      FROM d a JOIN d b ON a.k = b.k AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.group_a, p.group_b,
           CAST(COALESCE(i.n_ret, 0) AS BIGINT) AS n_retained,
           round(CAST(COALESCE(i.n_ret, 0) AS DOUBLE)
                 * ({float(_HS)!r} / CAST(p.theta AS DOUBLE)), 6)
             AS est_intersection,
           round(CAST(COALESCE(u.n_uni, 0) AS DOUBLE)
                 * ({float(_HS)!r} / CAST(p.theta AS DOUBLE)), 6)
             AS est_union,
           CAST(COALESCE(ex.exact, 0) AS BIGINT) AS exact_intersection
    FROM pr p
    LEFT JOIN inter i USING (group_a, group_b)
    LEFT JOIN uni u USING (group_a, group_b)
    LEFT JOIN ex USING (group_a, group_b)
    """,
)
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The theta-sketch payoff: every pairwise audience intersection AND
    union estimate from sketch-sized tables alone (HLL cannot intersect),
    next to the exact relational intersection. At 100 TB the overlap
    matrix for G groups costs G·k sketch rows at query time — the corpus
    was touched once, by the sketch build."""
    from telemetry_parquet_spark.datapipe.theta import (
        kmv_pair_set_estimates,
        kmv_sketch,
    )

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    sk = kmv_sketch(events, "event_type", "user_id", k=K)
    est = kmv_pair_set_estimates(sk, "event_type", k=K)
    # exact pairwise intersections via per-user group-set expansion (the
    # basket_part_pairs shape): ONE scan + one map-side-combinable
    # collect_set instead of a distinct pipeline computed on both sides
    # of a user-keyed self-join; the expansion stays Σ|user's groups|²/2,
    # bounded by the group count, never corpus²
    gsets = (
        events.select("event_type", "user_id")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("__gs"))
    )
    exact = (
        gsets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("__gs"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("__gs"), i + 2, F.size(F.col("__gs"))
                            ),
                            lambda y: F.struct(
                                x.alias("group_a"), y.alias("group_b")
                            ),
                        ),
                    )
                )
            ).alias("__p")
        )
        .select(F.col("__p.group_a"), F.col("__p.group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("exact_intersection"))
    )
    return est.join(exact, ["group_a", "group_b"], "left").select(
        "group_a",
        "group_b",
        "n_retained",
        "est_intersection",
        "est_union",
        F.coalesce("exact_intersection", F.lit(0))
        .cast("bigint")
        .alias("exact_intersection"),
    )


@query(
    "theta_daily_merge",
    # oracle = the DIRECT whole-corpus sketch: a green row is the
    # cross-engine, driver-checked proof that per-day sketches merged by
    # re-ranking equal the sketch of the union — the property that lets a
    # daily pipeline persist k-row sketch tables and never re-touch
    # history. (Proof sketch: any globally k-smallest hash is necessarily
    # among its own day's k smallest, so the union of day samples contains
    # the global top-k; property-tested in test_theta.py, re-proven here
    # by the driver against DuckDB.)
    oracle=f"""
    WITH {_SKETCH_CTE}
    SELECT event_type, CAST(rank AS INT) AS rank, CAST(h AS BIGINT) AS h
    FROM sk
    """,
)
def theta_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a KMV sketch PER (event_type, day), then merge each type's
    day sketches by re-ranking the unioned samples — the daily-pipeline
    persistence path — and emit the merged content, gated against the
    direct whole-corpus sketch."""
    from pyspark.sql import Window

    from telemetry_parquet_spark.datapipe.theta import kmv_sketch

    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    ev = events.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    ).withColumn(
        "g", F.concat_ws("\x1f", "event_type", F.col("day").cast("string"))
    )
    daily = kmv_sketch(ev, "g", "user_id", k=K)
    samples = daily.select(
        F.split("g", "\x1f").getItem(0).alias("event_type"), "h"
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        samples.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .select("event_type", F.col("rank").cast("int").alias("rank"), "h")
    )
