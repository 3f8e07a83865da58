"""Python UDTF / Pandas-UDAF fallback paths (SURVEY.md §2.11).

The engine's policy is built-ins first (every shipped operator is expression
based); these are the documented LAST-RESORT mechanisms, kept small and
tested so the fallback story is real:

- ``ParseEventsUDTF``: a Python UDTF doing the positional-event parse — the
  semantics ``sources/json_ingest.events_view`` implements with variant
  expressions. Exists to demonstrate the UDTF surface (Spark ≥3.5) for
  parses that genuinely cannot be expressed declaratively.
- ``weighted_median``: a grouped-agg Pandas UDF (Arrow-batched) — the
  fallback shape for aggregates with no expression rewrite.

Both are slow paths (Python workers in the loop); never use them where an
expression form exists.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="ts bigint, category string, method string, object string, "
                 "string_value string, map_values map<string,string>")
class ParseEventsUDTF:
    """Explode a JSON array-of-positional-arrays string into typed event
    rows; malformed entries are skipped (Events.scala:32-80 semantics)."""

    def eval(self, events_json: str):  # noqa: D102
        if not events_json:
            return
        try:
            events = json.loads(events_json)
        except (ValueError, TypeError):
            return
        if not isinstance(events, list):
            return
        for e in events:
            if not isinstance(e, list) or len(e) < 4:
                continue
            ts, category, method, obj = e[0], e[1], e[2], e[3]
            if not isinstance(ts, int) or not all(
                isinstance(x, str) for x in (category, method, obj)
            ):
                continue
            sval = e[4] if len(e) > 4 and isinstance(e[4], str) else None
            mv = None
            if len(e) > 5 and isinstance(e[5], dict):
                mv = {
                    str(k): ("null" if v is None else str(v).lower()
                             if isinstance(v, bool) else str(v))
                    for k, v in e[5].items()
                }
            yield ts, category, method, obj, sval, mv


@F.pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg Pandas UDF: weight-cumulative median — an aggregate with
    no built-in expression form (the UDAF fallback shape)."""
    df = pd.DataFrame({"v": values, "w": weights}).dropna().sort_values("v")
    if df.empty:
        return None
    cum = df["w"].cumsum()
    total = df["w"].sum()
    return float(df.loc[cum >= total / 2, "v"].iloc[0])
