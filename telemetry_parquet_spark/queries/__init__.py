"""Query registry — import all query modules so their ``@query`` decorators run."""

from telemetry_parquet_spark.queries.registry import ORACLE, QUERIES

# Importing for registration side effects:
from telemetry_parquet_spark.queries import relational  # noqa: F401, E402
from telemetry_parquet_spark.queries import semistructured  # noqa: F401, E402
from telemetry_parquet_spark.queries import windows  # noqa: F401, E402
from telemetry_parquet_spark.queries import datapipe  # noqa: F401, E402
from telemetry_parquet_spark.queries import temporal  # noqa: F401, E402
from telemetry_parquet_spark.queries import streaming  # noqa: F401, E402
from telemetry_parquet_spark.queries import advanced  # noqa: F401, E402
from telemetry_parquet_spark.queries import tpch  # noqa: F401, E402
from telemetry_parquet_spark.queries import tpch2  # noqa: F401, E402
from telemetry_parquet_spark.queries import ingestion  # noqa: F401, E402
from telemetry_parquet_spark.queries import scalar_extra  # noqa: F401, E402
from telemetry_parquet_spark.queries import longitudinal  # noqa: F401, E402
from telemetry_parquet_spark.queries import ml_media  # noqa: F401, E402
from telemetry_parquet_spark.queries import corpus  # noqa: F401, E402
from telemetry_parquet_spark.queries import bpe  # noqa: F401, E402
from telemetry_parquet_spark.queries import lm  # noqa: F401, E402
from telemetry_parquet_spark.queries import qsketch  # noqa: F401, E402
from telemetry_parquet_spark.queries import semantic  # noqa: F401, E402
from telemetry_parquet_spark.queries import pipeline  # noqa: F401, E402
from telemetry_parquet_spark.queries import pq  # noqa: F401, E402
from telemetry_parquet_spark.queries import entity  # noqa: F401, E402
from telemetry_parquet_spark.queries import theta  # noqa: F401, E402
from telemetry_parquet_spark.queries import graph  # noqa: F401, E402
from telemetry_parquet_spark.queries import retrieval  # noqa: F401, E402
from telemetry_parquet_spark.queries import layout  # noqa: F401, E402
from telemetry_parquet_spark.queries import hll  # noqa: F401, E402
from telemetry_parquet_spark.queries import kmeans  # noqa: F401, E402

# The driver evaluates exactly the first 50 entries of ``queries()`` in
# registration order. Until every query has appeared green in some
# CORRECTNESS_r{N}, each round front-loads the names still missing a driver
# hash-verdict; previously-verified queries follow in registration order and
# fill the rest of the 50-slot window (re-confirmation). The list is static
# (no file I/O at import time) and is refreshed by hand from the latest
# CORRECTNESS_r{N}.json each round.
#
# Round-8 window (see CORRECTNESS_CUMULATIVE.md for the full ledger; after
# round 7 the registry is fully green — 168/170 oracled queries hash-green
# at their latest driver row, 0 red — so this round is new-surface first,
# then staleness rotation, exactly as the r7 verdict ordered):
# 1. Queries new in round 8 plus the two round-7 additions registered after
#    the r07 window was pinned (layout_zorder_keys, ts_hypertable_rollup) —
#    the only names with no driver row at all.
# 2. The full r04-stale cohort (23 names) — the oldest verdicts left.
# 3. The r05 cohort fills the remaining slots alphabetically; overflow
#    rotates to round 9.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-checked (new in round 8 / post-window round 7)
    "bm25_indexed_topk",
    "sim_knn_graph_lsh_tables",
    "layout_zorder_keys",
    "ts_hypertable_rollup",
    "hll_det_register_table",
    "hll_det_distinct_users",
    "hll_det_orderkey_estimates",
    "hll_det_daily_merge",
    "ml_kmeans_assignments",
    "ml_kmeans_centroids",
    "stream_hll_registers",
    "skip_bloom_point_lookup",
    "sim_ivf_det_topk",
    # latest driver row r04
    "dd_incremental_bloom",
    "dd_minhash_near_dup_pairs",
    "dd_ngram_jaccard_pairs",
    "dd_prefix_fingerprint_groups",
    "dd_simhash_near_dup_pairs",
    "f_date_functions",
    "f_string_functions",
    "json_union_coercion",
    "lang_id",
    "mix_sampled_corpus",
    "mm_image_near_dup",
    "p7_column_expressions",
    "pack_sequences",
    "pii_redaction",
    "rep_repetition_features",
    "sim_brute_force_topk",
    "sim_ivf_exact_topk",
    "sim_ivf_probe_topk",
    "split_train_holdout",
    "text_stats",
    "w1_latest_order_per_customer",
    "w2_running_order_total",
    "x1_token_explode",
    # latest driver row r05 (alphabetical; the rest of the r05 cohort —
    # from dd_repeated_spans on — rotates to round 9's window)
    "a1_earliest_event_per_user",
    "a2_row_first",
    "a3_map_first",
    "a4_map_sum",
    "a5_search_counts_pivot",
    "a7_hll_distinct_users",
    "a8_counts_per_nation",
    "a9_null_counts",
    "analyze_column_stats",
    "bp_boilerplate_removal",
    "bp_hot_segments",
    "cap_budget_per_source",
    "cap_per_source",
    "corpus_global_order",
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries():
    return _ordered(dict(QUERIES))


def all_oracles():
    return _ordered(dict(ORACLE))
