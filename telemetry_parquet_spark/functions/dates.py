"""Date/timestamp normalization (SURVEY.md F2-F6).

Reference semantics from ``src/main/scala/com/mozilla/telemetry/utils/package.scala``:
- ``normalizeISOTimestamp`` (:100-120): re-emit an ISO timestamp whose zone
  offset may be outside the range downstream parsers accept; offsets < -12:00
  are wrapped up by +12h steps, offsets > +14:00 wrapped down by -12h steps,
  preserving the instant. No Spark built-in understands out-of-range offsets,
  so this is the library's one true scalar UDF — kept off hot paths.
- ``normalizeYYYYMMDDTimestamp`` (:122-125), ``normalizeEpochTimestamp``
  (:127-129), ``yesterdayAsYYYYMMDD`` (:145-147): pure built-ins here.
- F5 epoch-millis → yyyyMMdd day key (``SyncPingConversion.scala:546`` — the
  reference's 3-`y` pattern bug is NOT reproduced; we emit the intended
  ``yyyyMMdd``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ISO_OFFSET_RE = re.compile(r"^(?P<body>.*?)(?P<sign>[+-])(?P<hh>\d{2}):(?P<mm>\d{2})$")


def _normalize_iso_offset(ts: str | None) -> str | None:
    """Wrap out-of-range zone offsets into [-12:00, +14:00], preserving the
    instant — the wall-clock text shifts along with the offset, exactly as
    the reference's formatter-with-zone reprint does (utils/package.scala:
    100-120; oracle table UtilsTest.scala:47-62: -13:00→-01:00, +15:00→+03:00).
    """
    if ts is None:
        return None
    m = ISO_OFFSET_RE.match(ts)
    if not m:
        return ts
    sign = -1 if m.group("sign") == "-" else 1
    offset_min = sign * (int(m.group("hh")) * 60 + int(m.group("mm")))
    wrapped = offset_min
    while wrapped < -12 * 60:
        wrapped += 12 * 60
    while wrapped > 14 * 60:
        wrapped -= 12 * 60
    if wrapped == offset_min:
        return ts
    import datetime as _dt

    try:
        parsed = _dt.datetime.fromisoformat(ts)
    except ValueError:
        return ts
    out = parsed.astimezone(_dt.timezone(_dt.timedelta(minutes=wrapped)))
    return out.isoformat()


@F.pandas_udf(StringType())
def normalize_iso_timestamp_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over the scalar rewrite: Python is unavoidable
    (no builtin understands out-of-range offsets) but the transfer is
    columnar — no per-row serialization like a plain F.udf."""
    return s.map(_normalize_iso_offset, na_action="ignore")


def normalize_iso_timestamp(col: Column | str) -> Column:
    """F2 — see module docstring. pandas_udf (row-level string rewrite, no
    builtin exists; Arrow batching keeps it off the slow per-row path)."""
    c = F.col(col) if isinstance(col, str) else col
    return normalize_iso_timestamp_udf(c)


def normalize_yyyymmdd(col: Column | str) -> Column:
    """F3: '20180901' → '2018-09-01T00:00:00Z'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(
        F.to_date(c, "yyyyMMdd"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )


def normalize_epoch_days(col: Column | str) -> Column:
    """F4: epoch-days → ISO UTC timestamp string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(
        F.timestamp_seconds(c.cast("long") * 86400), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )


def yyyymmdd_day_key(ts_millis: Column | str) -> Column:
    """F5: epoch-millis → 'yyyyMMdd' day key."""
    c = F.col(ts_millis) if isinstance(ts_millis, str) else ts_millis
    return F.date_format(F.timestamp_millis(c.cast("long")), "yyyyMMdd")


def yesterday_yyyymmdd() -> Column:
    """F6: UTC yesterday as 'yyyyMMdd' (BatchJobBase.scala:41-45)."""
    return F.date_format(F.date_sub(F.current_date(), 1), "yyyyMMdd")
