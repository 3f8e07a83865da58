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

# The driver evaluates exactly the first 50 entries of ``queries()`` in
# registration order. Until every query has appeared green in some
# CORRECTNESS_r{N}, each round front-loads the names still missing a driver
# hash-verdict; previously-verified queries follow in registration order and
# fill the rest of the 50-slot window (re-confirmation). The list is static
# (no file I/O at import time) and is refreshed by hand from the latest
# CORRECTNESS_r{N}.json each round.
#
# Round-7 window (see CORRECTNESS_CUMULATIVE.md for the full ledger; after
# round 6 the registry is fully green — 145/145 oracled queries hash-green at
# their latest driver row — so this round is pure staleness rotation):
# 1. Queries new in round 7 (no driver row yet).
# 2. The 22 queries whose latest driver verdict is r02 (the TPC-H pack and
#    five round-2 extras) — the stalest cohort; r04 proved layout drift can
#    silently break old-green rows, so convert "green long ago" into
#    current evidence.
# 3. The r04 cohort (28 names) fills the remaining slots in registration
#    order; any overflow past slot 50 rotates to round 8.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # new in round 7
    "ml_als_recall_eval",
    "bpe_learn_merges_batched",
    "er_fuzzy_customer_pairs",
    "er_entity_groups",
    "ts_gap_fill_interpolate",
    "ab_test_zscores",
    "theta_sketch_users",
    "theta_distinct_users",
    "theta_audience_overlap",
    "theta_daily_merge",
    "path_transition_matrix",
    "ts_anomaly_days",
    "graph_triangle_count",
    "bm25_topk_docs",
    "sim_knn_graph",
    "sim_knn_graph_lsh",
    "sample_weighted_priority",
    "ts_ohlc_bars",
    "stream_ohlc_bars",
    "graph_label_prop",
    "sim_knn_graph_lsh_probe",
    "stream_heavy_hitters",
    "graph_personalized_pagerank",
    # latest driver row r02
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q22_inactive_customers",
    "w4_rank_suite",
    "tfidf_top_terms",
    "skew_salted_agg",
    "quality_filter",
    "unpivot_lineitem_measures",
    "stat_moments_by_flag",
    # latest driver row r04
    "contamination_ngram_overlap",
    "dd_duplicate_components",
    "dd_embedding_cosine_pairs",
    "dd_embedding_near_dup_lsh",
    "dd_exact_dedup_groups",
    # (dd_incremental_bloom, dd_minhash_near_dup_pairs,
    # dd_ngram_jaccard_pairs,
    # dd_prefix_fingerprint_groups,
    # dd_simhash_near_dup_pairs,
    # f_date_functions, f_string_functions,
    # json_union_coercion, lang_id, mix_sampled_corpus, mm_image_near_dup,
    # p7_column_expressions, pack_sequences, pii_redaction,
    # rep_repetition_features, sim_brute_force_topk, sim_ivf_exact_topk,
    # sim_ivf_probe_topk, split_train_holdout, text_stats,
    # w1_latest_order_per_customer, w2_running_order_total and
    # x1_token_explode overflow the 50-slot window this round — they rotate
    # to round 8's head; all are green in r04 and in the local parity suite.
    # Eleven more r04 names moved into the overflow as the late-round-7
    # queries (graph_triangle_count, bm25_topk_docs, sim_knn_graph,
    # sim_knn_graph_lsh, sample_weighted_priority, ts_ohlc_bars,
    # stream_ohlc_bars, graph_label_prop, sim_knn_graph_lsh_probe,
    # stream_heavy_hitters, graph_personalized_pagerank) took their
    # window slots: new-surface first, staleness rotation second.)
    # The two post-window round-7 additions (layout_zorder_keys,
    # ts_hypertable_rollup) are deliberately NOT front-loaded — evicting
    # r02-stale names mid-round would defeat the rotation; they join the
    # never-driver-checked head of round 8's window together with the r04
    # overflow above.
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries():
    return _ordered(dict(QUERIES))


def all_oracles():
    return _ordered(dict(ORACLE))
