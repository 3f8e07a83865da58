"""Plan introspection helpers — assert the physical plan is the one we want
(pushdown reached the scan, the join went broadcast, codegen is on).

Used by tests/test_plans.py; at 100 TB these properties are the difference
between reading kilobytes and reading the lake.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (ReadSchema) — column-pruning check."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_nested_loop_join(df: DataFrame) -> bool:
    return "BroadcastNestedLoopJoin" in formatted_plan(df) or "CartesianProduct" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (formatted mode
    numbers each operator as '(n) Exchange' with its partitioning on the
    Arguments line; broadcast exchanges are 'BroadcastExchange' and are NOT
    counted — they are not shuffles)."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.MULTILINE))


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. AQE defers codegen planning
    (the adaptive wrapper reports 0 subtrees before execution), so plan with
    AQE off for the inspection only."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # a Dataset's physical plan is cached at first use; derive a fresh
        # (optimizer-identity) Dataset so planning re-runs under AQE-off
        from pyspark.sql import functions as F

        replanned = df.where(F.lit(True))
        buf = io.StringIO()
        with redirect_stdout(buf):
            replanned.explain("codegen")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
        return int(m.group(1)) if m else 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
