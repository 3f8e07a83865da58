"""Longitudinal-view queries — the reference's downstream consumer shape
(``docs/longitudinal_examples.md``): one row per client holding parallel
arrays ordered newest-first, queried by array indexing and parallel UNNEST.

These run the A6 CollectList machinery (null-retaining co-sorted collect,
``CollectList.scala:15-166``) end-to-end under the correctness gate: build
the per-user arrays with the operator, then zip/unnest them back to rows and
compare against the window-function oracle — if the co-sort ever drifted
between columns, the (idx, ts, type, value) tuples would mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table


def _longitudinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user longitudinal row: parallel arrays (ts/type/value) ordered
    newest-first, built with the A6 collect-sort machinery."""
    from telemetry_parquet_spark.operators.topk import collect_top_k_per_group

    events = load_table(spark, sf_dir, "events")
    collected = collect_top_k_per_group(
        events,
        keys=["user_id"],
        order_cols=[("ts", True), ("event_id", True)],
        payload_cols=["event_type", "value"],
        k=1_000_000,
        out_col="items",
    )
    return collected.select(
        "user_id",
        F.transform("items", lambda x: x["ts"]).alias("ts_arr"),
        F.transform("items", lambda x: x["event_type"]).alias("type_arr"),
        F.transform("items", lambda x: x["value"]).alias("value_arr"),
    )


@query(
    "longitudinal_unnest",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INT)
             AS idx,
           ts, event_type, value
    FROM events
    """,
)
def longitudinal_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-user parallel arrays (A6), then parallel-UNNEST them back
    (arrays_zip + posexplode — Presto's CROSS JOIN UNNEST(a, b) analog).
    idx is 1-based, newest first, exactly the consumer docs' contract."""
    lon = _longitudinal(spark, sf_dir)
    zipped = lon.select(
        "user_id",
        F.posexplode(F.arrays_zip("ts_arr", "type_arr", "value_arr")).alias(
            "pos", "z"
        ),
    )
    return zipped.select(
        "user_id",
        (F.col("pos") + 1).cast("int").alias("idx"),
        F.col("z.ts_arr").alias("ts"),
        F.col("z.type_arr").alias("event_type"),
        F.col("z.value_arr").alias("value"),
    )


@query(
    "longitudinal_newest",
    oracle="""
    SELECT user_id, event_type AS newest_type, value AS newest_value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def longitudinal_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing on the longitudinal row: ``arr[1]`` = the newest
    submission (1-based, docs/longitudinal_examples.md)."""
    lon = _longitudinal(spark, sf_dir)
    return lon.select(
        "user_id",
        F.element_at("type_arr", 1).alias("newest_type"),
        F.element_at("value_arr", 1).alias("newest_value"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT 'view' AS stage, 1 AS stage_idx,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'click', 2, CAST((SELECT COUNT(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'purchase', 3, CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): a user reaches stage k
    only via an event strictly AFTER their first stage-(k-1) event — the
    classic product-analytics funnel as chained min-aggregates.

    Scale shape: each stage is one filtered min-agg (map-side combinable)
    plus a user-keyed join against the previous stage's user-sized result
    — co-partitioned on user_id, no window over the event stream, no
    per-user sequence materialization."""
    events = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None) -> DataFrame:
        src = events.where(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(prev, "user_id").where(F.col("ts") > F.col("__t"))
        return src.groupBy("user_id").agg(F.min("ts").alias("__t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    rows = [("view", 1, v), ("click", 2, c), ("purchase", 3, p)]
    out = None
    for stage, idx, df in rows:
        one = df.agg(
            F.lit(stage).alias("stage"),
            F.lit(idx).alias("stage_idx"),
            F.count("*").alias("n_users"),
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; n_active counts
    distinct users from each cohort active at each day offset — the
    telemetry engagement query the reference lineage existed to serve.

    Scale shape: first-seen is one min-agg; the activity relation is a
    DISTINCT projection (both map-side combinable, both keyed on
    user_id so the join co-partitions); the output is cohorts × offsets,
    dashboard-sized at any event volume."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_seen = events.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = events.distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("int").alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "rolling_weekly_active",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM active)
    SELECT d.day,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN active a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day. Distinct-over-a-sliding-window
    does not decompose into a running sum, so the exact form is a range
    join of the day spine (calendar-sized, broadcast) against the
    DISTINCT (user, day) activity relation — compare count is
    days × active-days-within-7, never events². The at-scale approximate
    sibling is the mergeable HLL column (A7 family): per-day sketches
    unioned over the trailing window."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    active = events.distinct()
    days = active.select("day").distinct()
    return (
        active.alias("a")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("a.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("a.user_id").alias("wau"))
    )


MIN_PAIR_SUPPORT = 3
TOP_BASKET_PAIRS = 100


@query(
    "basket_part_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT {TOP_BASKET_PAIRS}
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (association-rules support counting):
    part pairs ordered together in ≥ {MIN_PAIR_SUPPORT} orders, top-k by
    (support desc, pair). Baskets are built with ONE map-side-combinable
    `collect_set` aggregation (the set dedups repeated lineitems of the
    same part, so support counts orders, not line items) and the ordered
    pairs are generated with array ops inside each basket — the compare
    count stays Σ|basket|²/2, bounded by basket size, never catalog²,
    but the corpus is scanned and shuffled ONCE where the previous
    self-join shape ran the distinct pipeline on both join sides."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("__parts"))
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__parts"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("__parts"), i + 2, F.size(F.col("__parts"))
                        ),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("__p")
    )
    return (
        pairs.select(F.col("__p.part_a"), F.col("__p.part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= MIN_PAIR_SUPPORT)
        .orderBy(F.col("n_orders").desc(), F.col("part_a"), F.col("part_b"))
        .limit(TOP_BASKET_PAIRS)
    )


@query(
    "ab_test_zscores",
    oracle="""
    WITH users AS (
      SELECT DISTINCT user_id, user_id % 2 AS arm FROM events
    ), arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM users
    ), conv AS (
      SELECT e.event_type,
             CAST(SUM(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM (SELECT DISTINCT event_type, user_id FROM events) e
      JOIN users u USING (user_id)
      GROUP BY e.event_type
    )
    SELECT event_type, n0, n1, c0, c1,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
           round(CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                 ELSE (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                      / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                             * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                             * (1.0 / n0 + 1.0 / n1)) END, 6) AS z
    FROM conv, arms
    """,
)
def ab_test_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per conversion metric: users hash into two
    arms (deterministic ``user_id % 2`` — the assignment a real experiment
    framework persists), conversion = the user emitted that event type at
    least once, z = pooled two-proportion statistic. The experimentation
    readout every telemetry consumer builds on top of the raw events.

    Scale: ONE distinct over (event_type, user_id) (map-side combinable)
    joined to the user→arm table co-partitioned on user_id; arm totals are
    a 1-row broadcast crossJoin. z is codegen arithmetic on integer-
    derived doubles rounded to 6dp — exact cross-engine. Degenerate arms
    (p pooled ∈ {0, 1} → division by zero) surface as NULL z on both
    engines rather than a silent drop."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.select("user_id")
        .distinct()
        .withColumn("arm", F.pmod("user_id", F.lit(2)))
    )
    arms = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    conv = (
        events.select("event_type", "user_id")
        .distinct()
        .join(users, "user_id")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("c0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
        )
    )
    j = conv.crossJoin(F.broadcast(arms))
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = F.try_divide(
        p0 - p1,
        F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
        ),
    )
    return j.select(
        "event_type",
        "n0",
        "n1",
        "c0",
        "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 6).alias("z"),
    )


@query(
    "path_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), cnt AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    """,
)
def path_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event path:
    (from_type, to_type, count, row-normalized probability) — the
    navigation-flow readout behind sankey/journey dashboards and simple
    next-event predictors.

    Scale: ONE shuffle on user_id for the lead() window (deterministic
    (ts, event_id) order), then a states²-bounded count agg — the output
    is |event_types|², dashboard-sized at any event volume. The
    probability normalization windows the POST-AGG matrix, not the event
    stream."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    ordered = events.select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    cnt = (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("from_type")),
            6,
        ).alias("p"),
    )
