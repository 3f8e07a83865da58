"""Quantile-sketch queries (datapipe/qsketch.py) with sketch-content oracles.

``qsketch_histograms`` is the persistable per-(lang, source) partial sketch;
``qsketch_quantiles`` merges the partials per lang (the groupBy-sum merge a
day-partitioned 100 TB corpus would run) and reads bounded-error quantiles
off the merged bins. Both oracles recompute the SAME integer binning in
DuckDB, so the driver compares actual sketch state bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import qsketch
from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

QS = (50, 90, 99)

_BIN = qsketch.duckdb_bin_sql("n_chars")

_PART_CTE = f"""
part AS (
  SELECT lang, source, b.bin_lo AS bin_lo, b.bin_hi AS bin_hi,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT lang, source, {_BIN} AS b
        FROM documents WHERE n_chars IS NOT NULL)
  GROUP BY 1, 2, 3, 4
)
"""


@query(
    "qsketch_histograms",
    oracle=f"WITH {_PART_CTE} SELECT * FROM part",
)
def qsketch_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) log-linear histogram sketch of document lengths —
    one map-side-combinable aggregate; the result is the mergeable artifact
    a daily pipeline would persist next to its HLL columns."""
    docs = load_table(spark, sf_dir, "documents")
    return qsketch.histogram(docs, "n_chars", "lang", "source")


@query(
    "qsketch_quantiles",
    oracle=f"""
    WITH {_PART_CTE},
    merged AS (
      SELECT lang, bin_lo, bin_hi, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM part GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT lang, bin_lo, bin_hi, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin_lo)
                  AS BIGINT) AS cum
      FROM merged
    ),
    tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total
            FROM merged GROUP BY lang)
    SELECT lang, q, CAST(MIN(bin_hi) AS BIGINT) AS q_bound,
           CAST(MIN(total) AS BIGINT) AS total
    FROM cum JOIN tot USING (lang), LATERAL unnest([50, 90, 99]) AS u(q)
    WHERE cum * 100 >= q * total
    GROUP BY lang, q
    """,
)
def qsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge the per-source partial sketches per lang (groupBy-sum — the
    sketch's merge operator) and read p50/p90/p99 bounds: the smallest
    bin_hi whose cumulative count reaches q% of the total, compared in pure
    integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    part = qsketch.histogram(docs, "n_chars", "lang", "source")
    merged = part.groupBy("lang", "bin_lo", "bin_hi").agg(
        F.sum("cnt").alias("cnt")
    )
    return qsketch.quantiles_from_hist(merged, ["lang"], QS)
