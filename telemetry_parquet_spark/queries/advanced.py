"""Advanced/derived query pack: ranking suite, cube, having-join (Q18
shape), domain extraction, TF-IDF, embedding centroids, salted-skew
aggregation, quality filtering. Completes SURVEY §2 rows O1-O2, F9, W-suite
and adds LLM-pipeline analytics with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import dec, query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "o2_top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey ASC
    LIMIT 10
    """,
)
def o2_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 global top-k (AddonRecommender.scala:179-182 driver-side sort →
    TakeOrderedAndProject here: per-partition k-heaps, no global sort)."""
    from telemetry_parquet_spark.operators.topk import top_k

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("total_spend"))
    )
    return top_k(agg, [F.desc("total_spend"), F.asc("c_custkey")], 10)


@query(
    "w4_rank_suite",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      CAST(rank() OVER w AS INT) AS rnk,
      CAST(dense_rank() OVER w AS INT) AS drnk,
      CAST(ntile(4) OVER w AS INT) AS quartile,
      round(percent_rank() OVER w, 6) AS pct_rank,
      round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def w4_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking surface (net-new beyond the reference's single
    row_number, §2.5): rank/dense_rank/ntile/percent_rank/cume_dist."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "cube_order_volume",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (net-new, §2.4 notes their absence in the
    reference)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: join + agg + HAVING on the aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .where(F.col("__qty") > 120)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("__qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "f9_domain_extraction",
    oracle="""
    SELECT source || '.org' AS domain, COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def f9_domain_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 getDomain (pioneer/package.scala:18-32) driven through real URL
    strings built from the documents table; grouped domain counts."""
    from telemetry_parquet_spark.functions.strings import get_domain

    docs = load_table(spark, sf_dir, "documents")
    # two-label hosts so the trimmed domain stays source-dependent
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".org/p"))
    return (
        docs.select(get_domain(url).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        t -> length(t) > 0)) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — inverted-index analytics entirely
    in relational ops: token explode → tf → df → joined scoring → per-doc
    rank. The df side is a broadcast (vocabulary ≪ corpus)."""
    from telemetry_parquet_spark.datapipe.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; embedded as a literal
    scored = tf.join(F.broadcast(df_), "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 3)
        .drop("__rn")
    )


@query(
    "embedding_centroids",
    oracle="""
    WITH dims AS (
      SELECT label,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val,
             generate_subscripts(embedding, 1) AS dim_idx
      FROM embeddings
    )
    SELECT label, CAST(dim_idx AS INT) AS dim_idx,
           round(AVG(val), 4) + 0.0 AS centroid_val
    FROM dims
    GROUP BY label, dim_idx
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors, exploded to
    (label, dim_idx, value) — the aggregation an IVF index build runs.
    posexplode gives the dimension index; rounding absorbs float sum-order
    differences."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("__i", "val")
    )
    return dims.groupBy("label", (F.col("__i") + 1).cast("int").alias("dim_idx")).agg(
        (F.round(F.avg("val"), 4) + F.lit(0.0)).alias("centroid_val")
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): the hot-key-safe
    plan — phase 1 on (key, salt), phase 2 merges partials — must produce
    exactly the direct groupBy's result (the oracle)."""
    from telemetry_parquet_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "total_value": ("sum", F.sum(dec("value"))),
            "n": ("sum", F.count(F.lit(1))),
        },
        salt_buckets=8,
        salt_on="event_id",
    )
    return out.select(
        "event_type", F.col("total_value").cast("double").alias("total_value"), "n"
    )


@query(
    "quality_filter",
    oracle="""
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
        len(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0))
          AS n_tok,
        CAST(len(list_filter(string_split_regex(text, '\\s+'),
               t -> list_contains(['the','a','of','and','to','in','is','it'],
                                  lower(t)))) AS DOUBLE)
          / len(list_filter(string_split_regex(text, '\\s+'),
                            t -> length(t) > 0)) AS sw_ratio
      FROM documents WHERE length(text) > 0
    )
    WHERE n_tok >= 20 AND sw_ratio >= 0.05
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate: keep documents passing token-count and
    stopword-density rules — a plain WHERE over the quality features
    (pushdown-friendly; no UDF)."""
    from telemetry_parquet_spark.datapipe.text import quality_features

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    feats = quality_features(docs)
    return feats.where(
        (F.col("q_n_tokens") >= 20) & (F.col("q_stopword_ratio") >= 0.05)
    ).select("doc_id", "n_chars")


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_base_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_base_price', sum_base_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (melt) over an aggregate — the inverse of the
    A5 pivot shape (``MainSummaryView.scala`` search-counts). Spark's native
    ``DataFrame.unpivot`` expands rows without a shuffle (the only exchange
    is the upstream groupBy); at 100 TB the melt is a map-side projection."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(dec("l_discount")).cast("double").alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "sum_disc"],
        "measure",
        "value",
    )


@query(
    "stat_moments_by_flag",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
      CAST(n AS BIGINT) AS n_items,
      ROUND(sqrt(((n * sxx) - (sx * sx)) / (n * (n - 1))), 6) AS std_qty,
      ROUND(sqrt(((n * syy) - (sy * sy)) / (n * (n - 1))), 6) AS std_price,
      ROUND(((n * sxy) - (sx * sy))
        / (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy))), 9)
        AS corr_qty_price
    FROM s
    """,
)
def stat_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev_samp / corr) via exact sufficient
    statistics: decimal sums of x, x², xy (order-independent, mergeable —
    the single-pass map-side-combinable form that scales to 100 TB), then
    one identical double-arithmetic epilogue per group on both engines.
    Outputs are rounded (6 dp for stddevs, 9 dp for corr): the decimal sums
    exceed 2^53 so each engine's decimal->double cast can differ by ulps;
    rounding absorbs that while native stddev/corr would stay order-dependent."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"])
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        F.round(
            F.sqrt(((n * sxx) - (sx * sx)) / (n * (n - F.lit(1.0)))), 6
        ).alias("std_qty"),
        F.round(
            F.sqrt(((n * syy) - (sy * sy)) / (n * (n - F.lit(1.0)))), 6
        ).alias("std_price"),
        F.round(
            ((n * sxy) - (sx * sy))
            / (F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))),
            9,
        ).alias("corr_qty_price"),
    )
