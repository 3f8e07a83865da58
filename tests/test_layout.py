"""Z-order layout: the data-skipping property, proven from parquet footers.

Min/max skipping is only as good as the per-file value rectangles. After
``cluster_zorder`` on (x, y), BOTH columns' per-file ranges must shrink to
a fraction of the domain; a linear sort narrows only its own column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.layout import cluster_zorder, zorder_code


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per-file (max-min) widths for each column, from footer statistics."""
    widths = {c: [] for c in cols}
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        for c in cols:
            widths[c].append(hi[c] - lo[c])
    return {c: sum(v) / len(v) for c, v in widths.items()}


def _grid(spark, n=65536, side=256):
    """n points uniformly covering a side×side grid, in hash order."""
    return spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(side - 1))).alias("x"),
        (F.xxhash64("id", F.lit(7)).bitwiseAND(F.lit(side - 1))).alias("y"),
    )


def test_zorder_narrows_both_columns(spark, tmp_path):
    df = _grid(spark)
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    cluster_zorder(df, "x", "y", num_partitions=16).write.parquet(zordered)

    lin = _file_ranges(linear, ("x", "y"))
    zo = _file_ranges(zordered, ("x", "y"))
    # linear sort: x tight, y full-domain — a y-filter skips NOTHING
    assert lin["x"] < 64 and lin["y"] > 192
    # z-order: BOTH columns' per-file ranges are a fraction of the domain,
    # so min/max pruning works for filters on either column. (The trade is
    # balance, not area: x widens vs the linear sort, y collapses from
    # full-domain to under half — that's what makes 2-D skipping possible.)
    assert zo["x"] < 128 and zo["y"] < 128
    assert zo["y"] < 0.5 * lin["y"]


def test_zorder_code_locality(spark):
    """Points close in (x, y) share long code prefixes: the code of (x, y)
    and (x+1, y) differ less on average than random pairs (sanity on the
    interleave construction)."""
    rows = (
        spark.range(1000)
        .select(
            zorder_code(
                (F.col("id") % 256), ((F.col("id") * 7) % 256)
            ).alias("z"),
            (F.col("id") % 256).alias("x"),
            ((F.col("id") * 7) % 256).alias("y"),
        )
        .collect()
    )
    # spot-check the interleave against a pure-Python reference
    def spread(v):
        v &= 0xFFFF
        for s, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            v = (v | (v << s)) & m
        return v

    for r in rows[:100]:
        assert r.z == spread(r.x) | (spread(r.y) << 1)
