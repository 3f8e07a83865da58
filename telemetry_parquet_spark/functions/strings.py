"""String/name functions (SURVEY.md F7-F9, F22).

- camelize/uncamelize: schema-name conversion with the reference's
  irregular-case table (``utils/package.scala:25-69``) — driver-side Python
  (schema concern, never row data).
- snakify: CamelCase → snake_case for partition dimension names
  (``Partitioning.scala:19-20``).
- get_domain: host extraction with malformed-URL fallbacks + last-2-labels
  eTLD-ish trim (``pioneer/package.scala:18-32``) — pure built-ins
  (parse_url + split/slice), no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Irregular snake↔camel cases from the reference's special-case table
# (utils/package.scala:33-55); extend as schemas need.
_IRREGULAR = {
    "memory_mb": "memoryMB",
    "virtual_max_mb": "virtualMaxMB",
    "l2cache_kb": "l2cacheKB",
    "l3cache_kb": "l3cacheKB",
    "speed_mhz": "speedMHz",
    "d2d_enabled": "D2DEnabled",
    "dwrite_enabled": "DWriteEnabled",
    "gpu_active": "GPUActive",
    "ram": "RAM",
}
_IRREGULAR_REV = {v: k for k, v in _IRREGULAR.items()}


def camelize(name: str) -> str:
    """snake_case → camelCase (driver-side; schema names only)."""
    if name in _IRREGULAR:
        return _IRREGULAR[name]
    head, *rest = name.split("_")
    return head + "".join(p.capitalize() for p in rest)


def uncamelize(name: str) -> str:
    """camelCase → snake_case (driver-side; schema names only)."""
    if name in _IRREGULAR_REV:
        return _IRREGULAR_REV[name]
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


def snakify(name: str) -> str:
    """CamelCase → snake_case for partition dimension names."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower()


def get_domain(url: Column | str) -> Column:
    """F9: host of a URL, trimmed to its last two labels ('a.b.c.com' →
    'c.com'); malformed URLs fall back to the first path-ish segment after
    the scheme, mirroring the reference's two URI fallbacks."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.try_parse_url(c, F.lit("HOST"))
    # fallback: strip scheme, take up to first '/', then strip port/userinfo
    stripped = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    fallback = F.regexp_extract(stripped, r"^([^/?#]+)", 1)
    fallback = F.regexp_replace(fallback, r"^.*@", "")
    fallback = F.regexp_replace(fallback, r":\d+$", "")
    eff = F.when(host.isNotNull() & (F.length(host) > 0), host).otherwise(fallback)
    labels = F.split(eff, r"\.")
    last2 = F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(eff)
    return F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(None)).otherwise(last2)
