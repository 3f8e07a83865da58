"""Batch job orchestration — SURVEY.md §3 lifecycle / O4 / Y9-Y10.

The reference's job skeleton (``BatchJobBase.scala``): CLI conf → session →
``for (d <- datesBetween(from, to))`` → scan/transform/write one day →
accumulator report → conditional stop. Re-expressed as a small runner whose
per-day unit of work is a function ``(spark, day) -> DataFrame`` and whose
metrics come from ``DataFrame.observe`` (A10) instead of accumulators.
"""

from __future__ import annotations

import argparse
import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from telemetry_parquet_spark.sources.writers import write_partitioned


def dates_between(from_day: str, to_day: str) -> list[str]:
    """Inclusive yyyyMMdd range (BatchJobBase.scala:29-38)."""
    start = dt.datetime.strptime(from_day, "%Y%m%d").date()
    end = dt.datetime.strptime(to_day, "%Y%m%d").date()
    if end < start:
        return []
    return [
        (start + dt.timedelta(days=i)).strftime("%Y%m%d")
        for i in range((end - start).days + 1)
    ]


def yesterday() -> str:
    """Default day argument (BatchJobBase.scala:41-45, UTC)."""
    return (dt.datetime.now(dt.timezone.utc).date() - dt.timedelta(days=1)).strftime(
        "%Y%m%d"
    )


def job_arg_parser(name: str) -> argparse.ArgumentParser:
    """Y10: the reference's common CLI surface (Scallop `from`/`to`/bucket,
    BatchJobBase.scala:40-54) as argparse."""
    p = argparse.ArgumentParser(prog=name)
    p.add_argument("--from", dest="from_day", default=None, help="yyyyMMdd")
    p.add_argument("--to", dest="to_day", default=None, help="yyyyMMdd")
    p.add_argument("--output", required=True, help="dataset root path")
    p.add_argument("--limit", type=int, default=None)
    return p


@dataclass
class DayResult:
    day: str
    rows: int
    metrics: dict[str, int] = field(default_factory=dict)


def run_daily(
    spark: SparkSession,
    compute_day: Callable[[SparkSession, str], DataFrame],
    output_path: str,
    from_day: str | None = None,
    to_day: str | None = None,
    date_col: str = "submission_date_s3",
    files_per_partition: int | None = 1,
) -> list[DayResult]:
    """Per-day loop with atomic day overwrite: each day is computed,
    observed, and dynamic-overwritten independently (re-running any day is
    idempotent — the reference's reprocessing-safety discipline)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    to_day = to_day or yesterday()
    from_day = from_day or to_day
    results: list[DayResult] = []
    for day in dates_between(from_day, to_day):
        df = compute_day(spark, day)
        if date_col not in df.columns:
            df = df.withColumn(date_col, F.lit(day))
        obs = Observation(f"day_{day}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        write_partitioned(
            observed, output_path, [date_col], files_per_partition
        )
        metrics = {k: int(v) for k, v in obs.get.items()}
        results.append(DayResult(day=day, rows=metrics.get("rows", 0), metrics=metrics))
    return results
