"""Batch sessionization (SURVEY.md §2.10 net-new surface).

No reference counterpart (the reference is strictly batch-daily); semantics
follow Structured Streaming's session windows: a session is a maximal run of
events per key where consecutive gaps are <= ``gap_seconds``.

Implementation: lag-gap flag + cumulative sum — two window passes over one
shuffle on the key (the second window reuses the first's partitioning since
the partition keys match; Spark plans a single Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append a per-key ``session_id`` column (1-based, in time order).

    Gap semantics are SECOND-BOUNDARY (``unix_timestamp`` truncation):
    a new session starts when more than ``gap_seconds`` whole-second
    boundaries separate consecutive events — byte-identical to the
    driver oracle's ``date_diff('second', …)`` contract. Sub-second gap
    remainders are not counted, by design (not an accident of
    truncation: both engines define the gap this way)."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = W.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_seconds)
    ).cast("int")
    cum = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("__new_session", new_session).withColumn(
        session_col, F.sum("__new_session").over(cum).cast("long")
    ).drop("__new_session")
