"""Semi-structured layer: JSON extraction, map/array aggregates, explodes,
scalar date/string functions (SURVEY.md §2.8-§2.9 and A2-A5).

``events.props`` is a JSON-string column (the stand-in for ping documents,
FIXTURES.md F-6); ``documents.text`` drives the token/array explodes. The
map-aggregate queries build genuine MapType columns in-flight and run the
operator library's UDAF rewrites, then explode back to rows so the DuckDB
oracle can check values without nested-type hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import dec, query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "events_flatten",
    oracle="""
    SELECT
      event_id,
      user_id,
      event_type,
      CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
      strftime(ts, '%Y%m%d') AS day_key,
      date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) * 1000
        AS ts_millis,
      value
    FROM events
    WHERE user_id IS NOT NULL AND props IS NOT NULL
    """,
)
def events_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the MainEventsView flatten (MainEventsView.scala:74-100) on
    our events table — not-null filters (P1), JSON field extraction (P4/P5,
    F14), `unix_timestamp*1000` epoch math (F1), `yyyyMMdd` day key (F5).

    Filters and the two-column pushdown reach the parquet scan (see
    tests/test_plans.py)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("user_id").isNotNull() & F.col("props").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
            F.date_format("ts", "yyyyMMdd").alias("day_key"),
            (F.unix_timestamp("ts") * 1000).alias("ts_millis"),
            "value",
        )
    )


@query(
    "x1_token_explode",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    )
    GROUP BY token
    """,
)
def x1_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded array explode (X1, MainEventsView.scala:86) + lateral token
    fan-out (X2): empty/null texts produce no rows."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.when(F.length("text") > 0, F.split("text", " "))
        ).alias("token"),
    )
    return tokens.groupBy("token").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "a4_map_sum",
    oracle="""
    SELECT user_id, event_type AS k,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
    FROM events
    GROUP BY user_id, event_type
    """,
)
def a4_map_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 AggMapSum rewrite (AggMapSum.scala:10-58): build a real MapType
    column per row, pointwise-sum per key across the group with the operator
    library, explode back to entry rows for the oracle."""
    from telemetry_parquet_spark.operators.aggregates import agg_map_sum

    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.create_map(F.col("event_type"), dec("value")).alias("m"),
    )
    summed = agg_map_sum(events, keys=["user_id"], map_col="m")
    return summed.select(
        "user_id", F.explode("m").alias("k", "v")
    ).withColumn("v", F.col("v").cast("double"))


@query(
    "a3_map_first",
    oracle="""
    SELECT user_id, event_type AS k, CAST(first_value AS DOUBLE) AS v
    FROM (
      SELECT user_id, event_type, value AS first_value
      FROM events
      WHERE value IS NOT NULL
      QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
    )
    """,
)
def a3_map_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 AggMapFirst rewrite (AggMapFirst.scala:10-54): first non-null map
    value per key across the group, "first" = (ts, event_id) order."""
    from telemetry_parquet_spark.operators.aggregates import agg_map_first

    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.create_map(F.col("event_type"), F.col("value")).alias("m"),
    )
    first = agg_map_first(
        events, keys=["user_id"], map_col="m", order_cols=["ts", "event_id"]
    )
    return first.select("user_id", F.explode("m").alias("k", "v"))


@query(
    "a2_row_first",
    oracle="""
    SELECT user_id, event_type, ts, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
    """,
)
def a2_row_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 AggRowFirst rewrite (AggRowFirst.scala:11-49): array<struct> input,
    keep the first struct per distinct id across the group (id = event_type,
    first = (ts, event_id) order), then explode the surviving array."""
    from telemetry_parquet_spark.operators.aggregates import agg_row_first

    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.array(
            F.struct(
                F.col("event_type"), F.col("ts"), F.col("value")
            )
        ).alias("items"),
    )
    firsts = agg_row_first(
        events,
        keys=["user_id"],
        array_col="items",
        id_field="event_type",
        order_cols=["ts", "event_id"],
    )
    item = F.explode("items")
    return firsts.select("user_id", item.alias("item")).select(
        "user_id",
        F.col("item.event_type").alias("event_type"),
        F.col("item.ts").alias("ts"),
        F.col("item.value").alias("value"),
    )


@query(
    "a5_search_counts_pivot",
    oracle="""
    SELECT
      user_id,
      CAST(COUNT(*) FILTER (WHERE event_type IN ('click','view','purchase'))
        AS BIGINT) AS search_count_all,
      CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
        AS search_count_click,
      CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
        AS search_count_view,
      CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        AS search_count_purchase
    FROM events
    GROUP BY user_id
    """,
)
def a5_search_counts_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 AggSearchCounts rewrite (AggSearchCounts.scala:10-86): filtered
    pivot-sum with an allowlist and an _all total, flat star-expandable
    columns. Built on array<struct<engine,source,count>> via the operator
    library."""
    from telemetry_parquet_spark.operators.aggregates import agg_search_counts

    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.array(
            F.struct(
                F.lit("default").alias("engine"),
                F.col("event_type").alias("source"),
                F.lit(1).cast("long").alias("count"),
            )
        ).alias("search_counts"),
    )
    out = agg_search_counts(
        events,
        keys=["user_id"],
        array_col="search_counts",
        valid_sources=["click", "view", "purchase"],
    )
    return out


@query(
    "f_date_functions",
    oracle="""
    SELECT
      o_orderkey,
      strftime(o_orderdate, '%Y%m%d') AS day_key,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
        AS INT) AS days_since_2024,
      strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
        AS due_date,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    """,
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date library (F3-F6): yyyyMMdd day keys, year/month parts,
    datediff, date_add, truncation — normalize*Timestamp analogs
    (utils/package.scala:122-147)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("day_key"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_2024"),
        F.date_format(
            F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@query(
    "f_string_functions",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name) AS name_upper,
      substring(c_name, 1, 8) AS name_prefix,
      CAST(length(c_name) AS INT) AS name_len,
      concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
      string_split(c_name, '#')[1] AS name_head,
      lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
      replace(lower(c_mktsegment), 'a', '@') AS seg_mangled
    FROM customer
    """,
)
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string library (F7-F8 naming, F22 split/array ops)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("#", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.split("c_name", "#").getItem(0).alias("name_head"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(
            F.lower("c_mktsegment"), F.lit("a"), F.lit("@")
        ).alias("seg_mangled"),
    )


@query(
    "json_union_coercion",
    oracle="""
    WITH src AS (
      SELECT doc_id,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN '{"s":"t' || doc_id || '","n":' || doc_id ||
                      ',"d":' || doc_id || '.5,"b":true}'
          WHEN 1 THEN '{"s":' || doc_id || ',"n":' || doc_id ||
                      '.5,"d":' || doc_id || ',"b":"true"}'
          WHEN 2 THEN '{"s":true,"n":"x","d":' || doc_id || '.25,"b":false}'
          ELSE '{bad json'
        END AS payload
      FROM documents
    ), parsed AS (
      SELECT doc_id, TRY_CAST(payload AS JSON) AS j FROM src
    )
    SELECT doc_id,
      CASE WHEN json_type(j, '$.s') IN
                ('VARCHAR', 'BIGINT', 'UBIGINT', 'DOUBLE', 'BOOLEAN')
           THEN json_extract_string(j, '$.s') END AS s_str,
      CASE WHEN json_type(j, '$.n') IN ('BIGINT', 'UBIGINT')
           THEN CAST(json_extract(j, '$.n') AS BIGINT) END AS n_int,
      CASE WHEN json_type(j, '$.d') = 'DOUBLE'
           THEN CAST(json_extract(j, '$.d') AS DOUBLE) END AS d_double,
      CASE WHEN json_type(j, '$.b') = 'BOOLEAN'
           THEN CAST(json_extract(j, '$.b') AS BOOLEAN) END AS b_bool,
      j IS NOT NULL AS parsed_ok
    FROM parsed
    """,
)
def json_union_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON2Avro union-as-optional coercion semantics
    (reference avro/JSON2Avro.scala:60-133) over Spark VARIANT:

    - string target accepts string/int/decimal/double/bool tokens,
      stringified (``parseString``, :60-73);
    - int target accepts ONLY integer tokens — doubles and numeric strings
      become null (``parseInt``, :75-81);
    - double target accepts ONLY non-integer numeric tokens — an integer
      token is rejected, exactly as json4s maps 2 to JInt, never JDouble
      (``parseDouble``, :88-94);
    - boolean target accepts only true/false (``parseBoolean``, :96-102);
    - union [null, T] degrades mismatches to null instead of failing the
      row (``parse`` UNION branch, :116-117), and a malformed document
      nulls every field (try_parse_json) — the ingestion never throws.

    The mixed-type corpus is synthesized per doc_id so every coercion row
    is deterministic and DuckDB replays the same rules via json_type()."""
    docs = load_table(spark, sf_dir, "documents")
    payload = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.format_string('{"s":"t%s","n":%s,"d":%s.5,"b":true}',
                            "doc_id", "doc_id", "doc_id"),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.format_string('{"s":%s,"n":%s.5,"d":%s,"b":"true"}',
                            "doc_id", "doc_id", "doc_id"),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.format_string('{"s":true,"n":"x","d":%s.25,"b":false}', "doc_id"),
        )
        .otherwise(F.lit("{bad json"))
    )
    # materialize the parsed variant + per-field sub-variants in their own
    # projections: every coercion below references them several times, and
    # variant expressions run interpreted (no codegen CSE) — without the
    # barrier Catalyst inlines parseJson ~10× per row
    parsed = docs.select("doc_id", F.try_parse_json(payload).alias("__v"))
    fields = parsed.select(
        "doc_id",
        F.col("__v").isNotNull().alias("parsed_ok"),
        *[
            F.try_variant_get(F.col("__v"), f"$.{f}", "variant").alias(f"__{f}")
            for f in ("s", "n", "d", "b")
        ],
    )

    def typ(f: str):
        return F.schema_of_variant(F.col(f"__{f}"))

    def get(f: str, t: str):
        return F.try_variant_get(F.col(f"__{f}"), "$", t)

    is_num_str = typ("s").isin("STRING", "BIGINT", "DOUBLE", "BOOLEAN") | typ(
        "s"
    ).startswith("DECIMAL")
    is_double = (typ("d") == "DOUBLE") | typ("d").startswith("DECIMAL")
    return fields.select(
        "doc_id",
        F.when(is_num_str, get("s", "string")).alias("s_str"),
        F.when(typ("n") == "BIGINT", get("n", "bigint")).alias("n_int"),
        F.when(is_double, get("d", "double")).alias("d_double"),
        F.when(typ("b") == "BOOLEAN", get("b", "boolean")).alias("b_bool"),
        "parsed_ok",
    )
