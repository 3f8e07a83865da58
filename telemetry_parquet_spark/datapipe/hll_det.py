"""Deterministic HyperLogLog on the engine-portable ``md5_hash60``.

The A7 surface (reference: spark-hyperloglog ``hll_create`` /
``HyperLogLogMerge`` / ``hll_cardinality``, udfs.scala:12-26) ships twice in
this repo:

- ``operators/aggregates.py`` wraps Spark's native Apache DataSketches HLL
  (``hll_sketch_agg``) — the production path, binary sketches, but its
  murmur-based register state is not replayable in another engine, so
  ``a7_hll_distinct_users`` is driver-checked rows-only.
- THIS module is the same estimator built from relational primitives on
  ``md5_hash60`` (the theta/CMS/simhash discipline): register state is a
  plain (group, bucket, m_rho) table and the Flajolet-Fu-Gandouet-Meunier
  estimate is fixed-order arithmetic over exact integers, so DuckDB replays
  the WHOLE sketch — content and estimate — and the driver hash-gates it
  exactly.

Layout of the 60-bit hash: top ``p`` bits select the register (bucket),
the remaining ``W = 60 - p`` bits feed rho = leading-zero count + 1
(computed as ``W + 1 - bitlength(w)`` via ``length(bin(w))``, identical in
Spark and DuckDB). Registers merge by MAX — per-day sketches unioned and
re-maxed equal the whole-corpus sketch bit for bit (associativity of max),
which is what lets a daily pipeline persist m-row register tables and never
re-touch history.

Estimate (fixed evaluation order, both engines):
    S     = (m - n_set) * 2^(W+1) + sum(2^(W+1 - m_rho))   -- exact int64
    raw   = alpha_m * m^2 * 2^(W+1) / S
    est   = m * ln(m / V)   if raw <= 2.5 m and V = m - n_set > 0
            raw             otherwise
rounded to 4 dp. S is an exact integer (max m * 2^(W+1) = 2^61 at p=10),
so the only cross-engine float risk is one ln/div chain over exact inputs —
identical after rounding.

Scale: the corpus is touched once by the register build (map-side combinable
max, shuffle = m rows per group); everything downstream is register-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.dedup import md5_hash60

P = 10                # register-index bits
M = 1 << P            # 1024 registers
W = 60 - P            # rho window width
MAXR = W + 1          # rho for an all-zero window; also the 2^ scale
ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_det_registers(
    df: DataFrame, group_col: str, key_col: str, p: int = P
) -> DataFrame:
    """(group, bucket, m_rho): the dense-max register table per group — the
    persistable, mergeable sketch state. Duplicate keys are absorbed by the
    max (no distinct pre-pass needed); the shuffle carries at most
    ``2^p`` rows per group after map-side partial max."""
    m_bits, w_bits = p, 60 - p
    h = md5_hash60(F.col(key_col).cast("string"))
    hashed = df.select(
        F.col(group_col),
        F.shiftright(h, w_bits).alias("bucket"),
        h.bitwiseAND(F.lit((1 << w_bits) - 1)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(F.col("w")))
    )
    return (
        hashed.withColumn("rho", rho)
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").cast("int").alias("m_rho"))
    )


def hll_det_merge(registers: DataFrame, group_col: str) -> DataFrame:
    """Merge register tables (e.g. per-day sketches re-grouped to a coarser
    key): max is associative/commutative/idempotent, so the merged table
    equals the sketch built directly on the unioned keys."""
    return registers.groupBy(group_col, "bucket").agg(
        F.max("m_rho").cast("int").alias("m_rho")
    )


def hll_det_estimates(
    registers: DataFrame, group_col: str, p: int = P
) -> DataFrame:
    """(group, n_buckets_set, est_distinct): the HLL estimate with the
    small-range linear-counting correction, in the fixed evaluation order
    documented in the module docstring."""
    m = 1 << p
    maxr = 60 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    per_group = registers.groupBy(group_col).agg(
        F.count("*").alias("n_set"),
        F.sum(F.pow(F.lit(2.0), F.lit(maxr) - F.col("m_rho")).cast("long"))
        .alias("s_present"),
    )
    s_total = (
        (F.lit(m).cast("long") - F.col("n_set")) * F.lit(1 << maxr).cast("long")
        + F.col("s_present")
    )
    raw = (
        F.lit(float(alpha * m * m))
        * (F.lit(float(1 << maxr)) / s_total.cast("double"))
    )
    v = F.lit(m).cast("long") - F.col("n_set")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        group_col,
        F.col("n_set").cast("int").alias("n_buckets_set"),
        F.round(est, 4).alias("est_distinct"),
    )
