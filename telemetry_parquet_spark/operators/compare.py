"""Dataset comparator — equivalence oracle between two DataFrames.

Spark-first port of the reference's ``DatasetComparator``
(``src/main/scala/com/mozilla/telemetry/views/DatasetComparator.scala:73-160``):
column-set diff, per-column null counts in a single pass, row counts, distinct
counts, and symmetric multiset ``except`` on key columns. Doubles as the test
suite's DataFrame-equality helper.

Scale: every check is a single aggregation or a pair of exceptAll jobs — no
driver-side row materialization; at 100 TB the except check shuffles on the
selected key columns only (project before comparing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row with the null count of every column, computed in a single pass
    (reference ``DatasetComparator.scala:113-123``)."""
    cols = columns or df.columns
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(c)
            for c in cols
        ]
    )


def distinct_count(df: DataFrame, column: str) -> int:
    return df.select(column).distinct().count()


@dataclass
class ComparisonResult:
    """Mirrors the reference's single-row JSON result record
    (``DatasetComparator.scala:43-55``)."""

    columns_only_in_left: list[str] = field(default_factory=list)
    columns_only_in_right: list[str] = field(default_factory=list)
    left_rows: int = 0
    right_rows: int = 0
    left_minus_right: int = 0
    right_minus_left: int = 0
    null_count_diffs: dict[str, tuple[int, int]] = field(default_factory=dict)

    @property
    def equivalent(self) -> bool:
        return (
            not self.columns_only_in_left
            and not self.columns_only_in_right
            and self.left_rows == self.right_rows
            and self.left_minus_right == 0
            and self.right_minus_left == 0
            and not self.null_count_diffs
        )


def compare_datasets(
    left: DataFrame,
    right: DataFrame,
    key_columns: list[str] | None = None,
) -> ComparisonResult:
    """Full comparison: schema diff → null-count drift → row counts →
    symmetric exceptAll on ``key_columns`` (default: common columns)."""
    res = ComparisonResult()
    lcols, rcols = set(left.columns), set(right.columns)
    res.columns_only_in_left = sorted(lcols - rcols)
    res.columns_only_in_right = sorted(rcols - lcols)
    common = sorted(lcols & rcols)
    keys = key_columns or common

    # row counts ride in the same single pass as the null counts — a
    # separate count() doubled each side's full scan
    lagg = left.agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(c)
            for c in common
        ],
    ).collect()[0].asDict()
    ragg = right.agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(c)
            for c in common
        ],
    ).collect()[0].asDict()
    res.left_rows = lagg.pop("__n")
    res.right_rows = ragg.pop("__n")
    lnulls, rnulls = lagg, ragg
    for c in common:
        if lnulls[c] != rnulls[c]:
            res.null_count_diffs[c] = (lnulls[c], rnulls[c])

    lkeys = left.select(*keys)
    rkeys = right.select(*keys)
    res.left_minus_right = lkeys.exceptAll(rkeys).count()
    res.right_minus_left = rkeys.exceptAll(lkeys).count()
    return res


def assert_dataframes_equal(
    left: DataFrame, right: DataFrame, key_columns: list[str] | None = None
) -> None:
    """Raise AssertionError with the comparator's findings if not equivalent."""
    res = compare_datasets(left, right, key_columns)
    assert res.equivalent, f"datasets differ: {res}"
