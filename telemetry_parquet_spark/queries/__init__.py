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
from telemetry_parquet_spark.queries import table_service  # noqa: F401, E402

# The driver evaluates exactly the first 50 entries of ``queries()`` in
# registration order. Until every query has appeared green in some
# CORRECTNESS_r{N}, each round front-loads the names still missing a driver
# hash-verdict; previously-verified queries follow in registration order and
# fill the rest of the 50-slot window (re-confirmation). The list is static
# (no file I/O at import time) and is refreshed by hand from the latest
# CORRECTNESS_r{N}.json each round.
#
# Round-12 window (CORRECTNESS_r11 was 49/50 green — the 50th is the
# documented no-oracle ML row; every registered query's latest oracled
# verdict is green). Per the r11 verdict this round FINISHES the
# staleness re-certification: (1) the 5 never-checked round-12 queries
# (conditional MERGE, composite bucket join, semi/SQL DPP, equality
# deletes), (2) ALL 44 queries whose latest driver row is r07 —
# several sit directly on infrastructure rewritten this round
# (read_snapshot/_read_logical, join_planner composite rework), (3) one
# churn re-check: snapshot_rollup_mor rides the partition-rollup fold
# that gained the equality-delete refusal (5+44+1 = 50). After this
# round every query's row is ≤ 2 rounds old — keep the rotation
# steady-state.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # new in round 12 — never driver-checked
    "snapshot_merge_conditional",
    "snapshot_bucket_join_composite",
    "snapshot_dpp_semi",
    "snapshot_dpp_sql",
    "snapshot_mor_equality_delete",
    # latest driver row r07 — the complete remaining cohort (44)
    "dd_duplicate_components",
    "dd_embedding_cosine_pairs",
    "dd_embedding_near_dup_lsh",
    "dd_exact_dedup_groups",
    "er_entity_groups",
    "er_fuzzy_customer_pairs",
    "graph_label_prop",
    "graph_personalized_pagerank",
    "graph_triangle_count",
    "ml_als_recall_eval",
    "path_transition_matrix",
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
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_filter",
    "sample_weighted_priority",
    "sim_knn_graph",
    "skew_salted_agg",
    "stat_moments_by_flag",
    "stream_heavy_hitters",
    "stream_ohlc_bars",
    "tfidf_top_terms",
    "theta_audience_overlap",
    "theta_daily_merge",
    "theta_distinct_users",
    "theta_sketch_users",
    "ts_anomaly_days",
    "ts_gap_fill_interpolate",
    "ts_ohlc_bars",
    "unpivot_lineitem_measures",
    "w4_rank_suite",
    # churn re-check: the partition rollup fold gained the eq refusal
    "snapshot_rollup_mor",
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries():
    return _ordered(dict(QUERIES))


def all_oracles():
    return _ordered(dict(ORACLE))
