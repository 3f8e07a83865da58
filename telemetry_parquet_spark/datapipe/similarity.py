"""Embedding similarity search over array<float> columns.

Baseline: brute-force cosine top-k — the query side is broadcast, the dot
product is a JVM-side higher-order fold in double precision, and top-k
compiles to TakeOrderedAndProject (per-partition k-heaps, no global sort).

Scale path: LSH bucketing via random hyperplane signs (cosine-LSH) — each
vector maps to a small bit signature; candidates come from an equi-join on
the signature, cutting the compared set by ~2^bits. An IVF-style variant
(cluster assignment with pyspark.ml KMeans, probe nearest centroids) uses the
same final exact-rescore stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays in double precision (left-to-right
    deterministic fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_presplit(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the norms supplied from precomputed columns —
    bit-identical (same fold, same product, same guard), but the hot
    rescore paths compute each vector's norm ONCE instead of once per
    candidate pair (higher-order folds are interpreted, not codegen'd, so
    dropping 2 of 3 per-pair folds is the cheapest large win; measured in
    SCALE.md)."""
    d = na * nb
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_top_k(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine_sim",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k against a constant query vector (broadcast as a
    literal array — no join, no shuffle; only the top-k merge)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(F.col(vec_col), q)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        df.select(F.col(id_col), score.alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def pairwise_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k corpus neighbors for each query row — the query batch rides
    into a ``mapInPandas`` as a driver-side float64 matrix (batch KNN
    contract: n_queries is bounded, exactly the bound the previous
    broadcast-join shape assumed), every corpus Arrow batch is scored in
    ONE (batch × dim) @ (dim × n_queries) matmul, and each batch emits
    only its per-query top-k — the corpus is touched once with NO join
    and the only shuffle is the trimmed candidate set into the final
    rank window. The earlier expression route materialized the full
    |corpus|·|batch| pair set through an interpreted higher-order dot
    fold (BroadcastNestedLoopJoin; guide §4's row-at-a-time boundary in
    codegen clothing).

    Semantics are unchanged from the expression route: cosine =
    dot/(‖c‖·‖q‖) in float64, rows with a zero (or null) vector on
    either side keep score 0.0, rounding is half-away-from-zero to 6
    digits (Spark ``F.round``), and ties rank by (score desc, id asc).
    The per-batch trim orders by that same key, so it is a superset of
    the global top-k by construction. For large query sets use
    ``lsh_bucket_top_k``. With ``exclude_self`` a corpus row whose id
    equals the query id is dropped before ranking (the KNN-graph shape,
    where the query batch is itself a slice of the corpus)."""
    from pyspark.sql import Window as W

    q_rows = queries.select(query_id, vec_col).collect()
    qids = np.array([int(r[0]) for r in q_rows], dtype=np.int64)
    nq = len(qids)
    dim = next(
        (len(r[1]) for r in q_rows if r[1] is not None), 1
    )

    def _to_mat(vals) -> np.ndarray:
        # null vector -> zero vector: the expression route scored those
        # rows 0.0 via the d > 0 guard, and a zero vector reproduces
        # exactly that (denominator 0 -> score 0.0)
        return np.stack(
            [
                np.zeros(dim)
                if v is None
                else np.asarray(v, dtype=np.float64)
                for v in vals
            ]
        )

    qm = _to_mat([r[1] for r in q_rows]) if nq else np.zeros((0, dim))
    qn = np.sqrt((qm * qm).sum(axis=1))
    out_schema = f"{query_id} long, {corpus_id} long, cosine_sim double"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            cids = pdf[corpus_id].to_numpy(dtype=np.int64)
            cm = _to_mat(pdf[vec_col])
            cn = np.sqrt((cm * cm).sum(axis=1))
            denom = cn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(denom > 0, (cm @ qm.T) / denom, 0.0)
            # F.round(_, 6): HALF_UP = half away from zero
            r = s * 1e6
            cos = np.where(r >= 0, np.floor(r + 0.5), np.ceil(r - 0.5)) / 1e6
            parts = []
            for j in range(nq):
                col, ids = cos[:, j], cids
                if exclude_self:
                    m_ok = ids != qids[j]
                    col, ids = col[m_ok], ids[m_ok]
                top = np.lexsort((ids, -col))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            query_id: qids[j],
                            corpus_id: ids[top],
                            "cosine_sim": col[top],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = corpus.select(F.col(corpus_id), F.col(vec_col)).mapInPandas(
        score, out_schema
    )
    w = W.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


# ---------------------------------------------------------------------------
# Cosine-LSH (random hyperplanes) — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit i = (vec · plane_i) >= 0."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(
            F.when(dot(vec_col, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i))
            .otherwise(F.lit(0).cast("long"))
        )
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def table_seed(seed: int, t: int) -> int:
    """Per-table hyperplane seed (table 0 == the single-table config)."""
    return seed + 7919 * t


SIG_SCALE = 1_000_000


def quantize_plane(plane: list[float], scale: int = SIG_SCALE) -> list[int]:
    """floor(x * scale + 0.5) per component — the same one-multiply-one-
    add-one-floor recipe the k-means family uses, IEEE-identical in any
    engine."""
    import math

    return [int(math.floor(x * scale + 0.5)) for x in plane]


def int_sigs_udf(dim: int, bits: int, tables: int, seed: int = 42):
    """ALL tables' signatures in ONE Arrow pass: quantize the vector and
    every hyperplane to int64 (floor(x·10⁶ + 0.5)), take the integer
    matmul (batch × dim) @ (dim × tables·bits), read the sign bits, pack
    per table. Returns a pandas_udf emitting array<long> of length
    ``tables``.

    Exactness: the dots are INTEGERS bounded by dim · (0.6·10⁶) · (5·10⁶)
    ≈ 2·10¹⁴ < 2⁵³, so they are exact in int64 AND as int-valued doubles
    under ANY summation order — the oracle's `list_inner_product` over the
    same quantized lists yields bit-identical signs with no dependence on
    either engine's fold order (stronger than the float-fold signature,
    whose cross-engine equality leaned on both engines happening to sum
    sequentially). Perf: replaces tables·bits interpreted per-element
    folds per vector with one numpy matmul per Arrow batch."""
    planes = [
        p
        for t in range(tables)
        for p in _hyperplanes(dim, bits, table_seed(seed, t))
    ]
    qp = np.array(
        [quantize_plane(p) for p in planes], dtype=np.int64
    )  # (tables*bits, dim)
    weights = np.array([1 << i for i in range(bits)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        qm = np.floor(m * float(SIG_SCALE) + 0.5).astype(np.int64)
        signs = (qm @ qp.T >= 0).astype(np.int64)  # (batch, tables*bits)
        per_table = [
            signs[:, t * bits:(t + 1) * bits] @ weights
            for t in range(tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return sigs


def lsh_bucket_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    bits: int = 8,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = False,
    multiprobe: bool = False,
    tables: int = 1,
    sig_mode: str = "fold",
) -> DataFrame:
    """Approximate per-query top-k: bucket corpus and queries by hyperplane
    signature, equi-join buckets (shuffle on the signature — ~2^bits
    reduction), exact cosine rescore within buckets, rank per query.

    Three recall knobs, all deterministic (hence exactly oracle-able):
    - ``bits``: fewer bits = bigger buckets = more candidates (AND
      amplification; each extra bit multiplies the per-neighbor collision
      probability by p = 1 - angle/pi).
    - ``multiprobe``: additionally probes every 1-bit-flipped signature.
      The QUERY side explodes into bits+1 probe rows — a bits+1× query-
      side shuffle, the corpus side unchanged — and within one table each
      (query, candidate) pair arises at most once (a candidate's single
      signature equals exactly one probe value), so no dedup is needed.
    - ``tables``: L independent hyperplane sets, candidates = union of the
      per-table buckets (OR amplification: P(candidate) = 1-(1-p^bits)^L).
      This is the knob that actually buys recall on weakly clustered data
      — measured frontier in SCALE.md — at cost L× the signature join.
      A pair can collide in several tables, so the multi-table path
      dedups (query, candidate) BEFORE the window rank; single-table
      plans are unchanged (no explode, no dedup).
    - ``sig_mode``: "fold" computes each signature bit as a JVM
      higher-order fold (no Python anywhere); "int" computes ALL
      signatures in one Arrow matmul over int64-quantized vectors and
      planes (``int_sigs_udf``) — a DIFFERENT (quantized) but equally
      deterministic hash family whose cross-engine exactness is
      order-free (integer dots < 2^53), and the right choice once
      tables×bits folds dominate (the bench default for the multi-table
      config; measured in SCALE.md).
    """
    from pyspark.sql import Window as W

    if sig_mode not in ("fold", "int"):
        raise ValueError(f"unknown sig_mode {sig_mode!r}")

    def sig_for(df_vec: Column, t: int) -> Column:
        planes = _hyperplanes(dim, bits, table_seed(seed, t))
        return lsh_signature(df_vec, planes)

    sig_arr = (
        int_sigs_udf(dim, bits, tables, seed) if sig_mode == "int" else None
    )

    if tables == 1:

        def one_sig(df: DataFrame, idc: str, vname: str, nname: str) -> DataFrame:
            sig = (
                sig_arr(F.col(vec_col))[0]
                if sig_arr is not None
                else sig_for(F.col(vec_col), 0)
            )
            return df.select(
                F.col(idc),
                F.col(vec_col).alias(vname),
                norm(F.col(vec_col)).alias(nname),
                sig.alias("__sig0"),
            )

        c = one_sig(corpus, corpus_id, vec_col, "__cn").withColumnRenamed(
            "__sig0", "__sig"
        )
        qbase = one_sig(queries, query_id, "__qv", "__qn")
        if multiprobe:
            probes = F.array(
                F.col("__sig0"),
                *[
                    F.col("__sig0").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(bits)
                ],
            )
            q = qbase.select(
                query_id, "__qv", "__qn", F.explode(probes).alias("__sig")
            )
        else:
            q = qbase.withColumnRenamed("__sig0", "__sig")
        scored = c.join(q, "__sig").select(
            query_id,
            corpus_id,
            F.round(
                cosine_presplit(
                    F.col(vec_col), F.col("__qv"), F.col("__cn"), F.col("__qn")
                ),
                6,
            ).alias("cosine_sim"),
        )
    else:
        # (table, signature) composite bucket key on both sides; the
        # explode is L rows per vector (corpus AND query), the equi-join
        # runs on (__tbl, __sig), and the union of per-table candidate
        # sets is deduplicated before ranking.
        def tagged(
            df: DataFrame, idc: str, keep_vec: str, keep_norm: str, probe: bool
        ) -> DataFrame:
            if sig_arr is not None:
                # one Arrow pass computes every table's signature; the
                # explode then reads array elements instead of folding
                base = df.select(
                    F.col(idc),
                    F.col(vec_col).alias(keep_vec),
                    norm(F.col(vec_col)).alias(keep_norm),
                    sig_arr(F.col(vec_col)).alias("__sigs"),
                )
                sig_of = lambda t: F.col("__sigs")[t]  # noqa: E731
            else:
                base = df.select(
                    F.col(idc),
                    F.col(vec_col).alias(keep_vec),
                    norm(F.col(vec_col)).alias(keep_norm),
                    F.col(vec_col).alias("__rawv"),
                )
                sig_of = lambda t: sig_for(F.col("__rawv"), t)  # noqa: E731
            entries = []
            for t in range(tables):
                s = sig_of(t)
                entries.append(F.struct(F.lit(t).alias("t"), s.alias("s")))
                if probe:
                    entries.extend(
                        F.struct(
                            F.lit(t).alias("t"),
                            s.bitwiseXOR(F.lit(1 << i).cast("long")).alias("s"),
                        )
                        for i in range(bits)
                    )
            return base.select(
                idc,
                keep_vec,
                keep_norm,
                F.explode(F.array(*entries)).alias("__p"),
            ).select(
                idc,
                keep_vec,
                keep_norm,
                F.col("__p.t").alias("__tbl"),
                F.col("__p.s").alias("__sig"),
            )

        c = tagged(corpus, corpus_id, "__cv", "__cn", False)
        q = tagged(queries, query_id, "__qv", "__qn", multiprobe)
        # (Scoring before the distinct is deliberate: deduping (query,
        # candidate) pairs first would shuffle the vector arrays and costs
        # more than the duplicate rescore folds it saves — measured at
        # sf0.1; the dominant cost here is the 64 signature folds per
        # vector, inherent to tables x bits.)
        scored = (
            c.join(q, ["__tbl", "__sig"])
            .select(
                query_id,
                corpus_id,
                F.round(
                    cosine_presplit(
                        F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
                    ),
                    6,
                ).alias("cosine_sim"),
            )
            .distinct()
        )
    if exclude_self:
        scored = scored.where(F.col(corpus_id) != F.col(query_id))
    w = W.partitionBy(query_id).orderBy(F.desc("cosine_sim"), F.asc(corpus_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def lsh_probe_matmul_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    bits: int = 6,
    k: int = 3,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = False,
    scale: int = SIG_SCALE,
    multiprobe: bool = True,
    tables: int = 1,
    self_corpus: bool = False,
) -> DataFrame:
    """LSH top-k with a per-BUCKET integer matmul rescore — the scale
    shape of ``lsh_bucket_top_k(sig_mode='int')`` once the candidate set
    (Hamming-1 probe ball, or the multi-table union) dominates cost.
    ``multiprobe=True, tables=1`` is the probe config; ``multiprobe=False,
    tables=L`` the OR-amplified multi-table config.

    The fold-rescore variant pays one interpreted 64-element fold per
    candidate PAIR (≈ (bits+1)·|Q|·|C|/2^bits pairs); here each signature
    bucket is cogrouped (query probes × corpus rows) and scored in ONE
    (nq_b × dim) @ (dim × nc_b) int64 matmul per bucket — Arrow moves each
    vector ONCE per bucket membership (corpus 1×, queries bits+1×), never
    once per pair. Scores are integer micro-cosines over
    floor(x·10⁶ + 0.5)-quantized vectors (the ``matmul_batch_top_k``
    recipe): the dot is an exact int64 < 2⁵³ under any summation order,
    so the score is cross-engine exact AND the per-bucket top-k trim key
    (cos_micros desc, id asc) is the final rank key with integer ties —
    the trim is a superset of the global top-k by construction, no
    rounding margin needed. Within one table a (query, candidate) pair
    arises at most once (a candidate's single signature equals exactly
    one probe value), so no dedup stage exists. Zero-quantized-norm
    vectors are excluded on both sides (cosine undefined; the oracle
    filters identically).

    With ``tables`` > 1 (the OR-amplified multi-table config) both sides
    explode over (table, signature) composite buckets and a pair can
    collide in several tables — always with the SAME integer score, so a
    ``distinct`` over the trimmed (query, candidate, score) rows restores
    set semantics. The per-bucket trim stays a superset of the global
    top-k: within any one bucket each candidate appears once, the
    candidates beating a global-top-k member there are a subset of its
    global beaters, so it survives every bucket's trim.

    ``self_corpus=True`` is the KNN-GRAPH fast path (queries == corpus,
    the sim_knn_graph_lsh* shape): instead of scanning, signing, and
    shuffling the same vectors twice (once per cogroup side), each vector
    is tagged ONCE with role flags — its exact-signature row serves as
    both query probe and candidate; multiprobe bit-flip rows are
    query-only — and each bucket rescored by a single-sided
    ``groupBy().applyInPandas``. Halves the parquet scans, the Arrow
    signature passes, and the vector shuffle bytes; scores, trims, and
    output rows are IDENTICAL to the two-sided path (same bucket members,
    same matmul). ``queries`` is ignored for data in this mode (ids are
    taken from the corpus side; ``query_id`` names the output column).

    Shuffle ledger: one hash partition of each side by (table, signature)
    (vectors, not pairs; ONE side when self_corpus) + ≤
    k·tables·(bits+1)·|Q| trimmed rows into the dedup/final window — one
    exchange, not two: the pairs are hash-partitioned by query id, which
    clusters the multi-table ``distinct`` (subset of its keys) AND the
    final window. At 100 TB the bucket count (tables·2^bits) bounds
    parallelism — production raises bits with the corpus, keeping buckets
    cache-sized."""
    from pyspark.sql import Window as W

    def _quant(pdf_vecs: pd.Series) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf_vecs])
        return np.floor(m * float(scale) + 0.5).astype(np.int64)

    sig_arr = int_sigs_udf(dim, bits, tables, seed)
    out_schema = f"{query_id} long, {corpus_id} long, cos_micros long"

    def _score_block(
        q_vecs: pd.Series, q_ids: np.ndarray,
        c_vecs: pd.Series, c_ids: np.ndarray,
    ) -> pd.DataFrame:
        if len(q_ids) == 0 or len(c_ids) == 0:
            return pd.DataFrame(
                {query_id: [], corpus_id: [], "cos_micros": []}
            )
        qm = _quant(q_vecs)
        cm = _quant(c_vecs)
        qn2 = (qm * qm).sum(axis=1)
        cn2 = (cm * cm).sum(axis=1)
        qok, cok = qn2 > 0, cn2 > 0
        qm, qids, qn2 = qm[qok], q_ids[qok], qn2[qok]
        cm, cids, cn2 = cm[cok], c_ids[cok], cn2[cok]
        if len(qids) == 0 or len(cids) == 0:
            return pd.DataFrame(
                {query_id: [], corpus_id: [], "cos_micros": []}
            )
        s = (qm @ cm.T) / (
            np.sqrt(qn2.astype(np.float64))[:, None]
            * np.sqrt(cn2.astype(np.float64))[None, :]
        )
        micros = np.floor(s * 1e6 + 0.5).astype(np.int64)
        parts = []
        for i in range(len(qids)):
            row, ids = micros[i], cids
            if exclude_self:
                m_ok = ids != qids[i]
                row, ids = row[m_ok], ids[m_ok]
            top = np.lexsort((ids, -row))[:k]
            parts.append(
                pd.DataFrame(
                    {
                        query_id: qids[i],
                        corpus_id: ids[top],
                        "cos_micros": row[top],
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def entries_for(t: int, probe: bool, with_role: bool) -> list:
        s = F.col("__sigs")[t]
        mk = (
            (lambda sig, cand: F.struct(
                F.lit(t).alias("t"), sig.alias("s"),
                F.lit(cand).alias("c")))
            if with_role
            else (lambda sig, cand: F.struct(
                F.lit(t).alias("t"), sig.alias("s")))
        )
        out = [mk(s, True)]
        if probe:
            out.extend(
                mk(s.bitwiseXOR(F.lit(1 << i).cast("long")), False)
                for i in range(bits)
            )
        return out

    if self_corpus:
        base = corpus.select(
            F.col(corpus_id), F.col(vec_col),
            sig_arr(F.col(vec_col)).alias("__sigs"),
        )
        entries = [
            e for t in range(tables)
            for e in entries_for(t, multiprobe, True)
        ]
        tag = base.select(
            corpus_id, vec_col, F.explode(F.array(*entries)).alias("__p")
        ).select(
            corpus_id, vec_col,
            F.col("__p.t").alias("__tbl"), F.col("__p.s").alias("__sig"),
            F.col("__p.c").alias("__cand"),
        )
        # Pin the bucket-shuffle width (conf-driven, scale-adaptive): the
        # per-bucket matmuls are the compute here, and their cost is
        # invisible to AQE's byte-based coalescing — left adaptive, the
        # small single shuffle coalesces to ONE partition and the
        # tables·2^bits Python group calls run serially (measured 2×
        # slower at sf0.1). An explicit width keeps the Python stage as
        # wide as the session's shuffle parallelism.
        n_parts = int(
            corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        tag = tag.repartition(n_parts, "__tbl", "__sig")

        def rescore_self(key, pdf: pd.DataFrame) -> pd.DataFrame:
            c_pdf = pdf[pdf["__cand"]]
            return _score_block(
                pdf[vec_col], pdf[corpus_id].to_numpy(dtype=np.int64),
                c_pdf[vec_col], c_pdf[corpus_id].to_numpy(dtype=np.int64),
            )

        scored = (
            tag.groupby("__tbl", "__sig")
            .applyInPandas(rescore_self, out_schema)
        )
    else:
        def tagged(df: DataFrame, idc: str, vname: str, probe: bool) -> DataFrame:
            base = df.select(
                F.col(idc), F.col(vec_col).alias(vname),
                sig_arr(F.col(vec_col)).alias("__sigs"),
            )
            entries = [
                e for t in range(tables) for e in entries_for(t, probe, False)
            ]
            return base.select(
                idc, vname, F.explode(F.array(*entries)).alias("__p")
            ).select(
                idc, vname,
                F.col("__p.t").alias("__tbl"), F.col("__p.s").alias("__sig"),
            )

        c = tagged(corpus, corpus_id, vec_col, False)
        q = tagged(queries, query_id, "__qv", multiprobe)

        def rescore(key, q_pdf: pd.DataFrame, c_pdf: pd.DataFrame):
            return _score_block(
                q_pdf["__qv"], q_pdf[query_id].to_numpy(dtype=np.int64),
                c_pdf[vec_col], c_pdf[corpus_id].to_numpy(dtype=np.int64),
            )

        scored = (
            q.groupby("__tbl", "__sig")
            .cogroup(c.groupby("__tbl", "__sig"))
            .applyInPandas(rescore, out_schema)
        )
    if tables > 1:
        # same pair from several tables carries the same integer score;
        # hash-partition by query id FIRST so the distinct (query id is a
        # subset of its grouping keys) and the final window share this one
        # exchange instead of shuffling the pair set twice.
        scored = scored.repartition(F.col(query_id)).distinct()
    w = W.partitionBy(query_id).orderBy(
        F.desc("cos_micros"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def quantize_int8(vec: Column, eps: float = 1e-12):
    """Symmetric per-vector int8 quantization: scale = max|x| (floored at
    ``eps`` so zero vectors stay defined), q_i = round(x_i·127/scale).

    Returns (codes array<int>, scale double). 4× storage reduction for
    vector stores with bounded cosine error (error-bound-tested). Pure
    column expressions — deterministic IEEE double arithmetic with
    identical operation order on any engine, so results are byte-exact
    cross-engine (both Spark and DuckDB round half away from zero);
    dequantize as q_i·scale/127."""
    scale = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(eps),
    )
    codes = F.transform(
        vec, lambda x: F.round(x.cast("double") * 127 / scale).cast("int")
    )
    return codes, scale


def matmul_batch_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    scale: int = SIG_SCALE,
) -> DataFrame:
    """EXACT batch KNN as dense linear algebra: the query batch rides into
    a ``mapInPandas`` as a driver-side int64 matrix (batch KNN contract:
    n_queries is bounded), every corpus Arrow batch is scored in ONE
    (batch × dim) @ (dim × n_queries) integer matmul, and each partition
    emits only its per-query top-k — so the corpus is touched once with
    NO join and the only shuffle is k · n_queries · n_partitions rows
    into the final rank window (vs ``pairwise_top_k``'s materialized
    broadcast-join pair set).

    Scores are integer micro-cosines over floor(x·10⁶ + 0.5)-quantized
    vectors: the dot is an exact int64 (< 2⁵³, any summation order), and
    ``floor(dot / (‖a‖·‖b‖) · 10⁶ + 0.5)`` is a fixed chain of correctly-
    rounded IEEE ops on identical inputs — deterministic across numpy,
    Spark, and DuckDB (the bm25_micros recipe), so the whole operator
    carries an exact oracle. The per-partition trim orders by the SAME
    (cos_micros desc, id asc) key as the final window, which makes the
    trim a superset of the global top-k by construction. Zero-norm
    vectors are excluded (cosine undefined)."""
    q_rows = queries.select(query_id, vec_col).collect()
    qm = np.array(
        [
            np.floor(np.asarray(r[1], dtype=np.float64) * scale + 0.5)
            for r in q_rows
        ],
        dtype=np.int64,
    )
    qids = np.array([int(r[0]) for r in q_rows], dtype=np.int64)
    qn2 = (qm * qm).sum(axis=1)
    keep = qn2 > 0
    qm, qids, qn2 = qm[keep], qids[keep], qn2[keep]
    qnorm = np.sqrt(qn2.astype(np.float64))
    nq = len(qids)
    out_schema = f"{query_id} long, {corpus_id} long, cos_micros long"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            cids = pdf[corpus_id].to_numpy(dtype=np.int64)
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cm = np.floor(m * scale + 0.5).astype(np.int64)
            cn2 = (cm * cm).sum(axis=1)
            ok = cn2 > 0
            cids, cm, cn2 = cids[ok], cm[ok], cn2[ok]
            if len(cids) == 0:
                continue
            cnorm = np.sqrt(cn2.astype(np.float64))
            s = (cm @ qm.T) / (cnorm[:, None] * qnorm[None, :])
            micros = np.floor(s * 1e6 + 0.5).astype(np.int64)
            parts = []
            for j in range(nq):
                col = micros[:, j]
                ids = cids
                if exclude_self:
                    m_ok = ids != qids[j]
                    col, ids = col[m_ok], ids[m_ok]
                top = np.lexsort((ids, -col))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            query_id: qids[j],
                            corpus_id: ids[top],
                            "cos_micros": col[top],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    from pyspark.sql import Window as W

    scored = corpus.select(
        F.col(corpus_id), F.col(vec_col)
    ).mapInPandas(score, out_schema)
    w = W.partitionBy(query_id).orderBy(
        F.desc("cos_micros"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )
