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
# Round-10 window (see CORRECTNESS_CUMULATIVE.md for the full ledger;
# cumulative state after r09: 198 green, 8 hash-red — all 8 reds were
# value-identical DECIMAL outputs the driver canonicalizer renders
# differently per engine; round 10 re-keyed them (plus 4 siblings) to
# BIGINT cents):
# 1. The 12 re-keyed table-format/MV/branch/join-view/catalog queries.
# 2. The r05-stale cohort (oldest verdicts left), then the r06 cohort
#    alphabetically; mm_decoded_features onward rotates to round 11.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # changed in round 10 — the 8 r09 hash-reds plus their 4 siblings, all
    # re-keyed from DECIMAL sum_price to BIGINT sum_price_cents (the driver
    # canonicalizer drops trailing-zero decimals; values were verified exact
    # locally both rounds). Re-verify these first.
    "snapshot_time_travel",
    "snapshot_merge_upsert",
    "snapshot_mor_delete",
    "snapshot_merge_evolve",
    "snapshot_wap_publish",
    "snapshot_branch_merge",
    "jv_star_rollup",
    "mv_rewrite_rollup",
    "snapshot_mor_update",
    "snapshot_incremental_view",
    "snapshot_join_planned",
    "catalog_txn_consistent_read",
    # rescore backend changed in round 10 (per-bucket int64 matmul,
    # output re-keyed to integer micro-cosines) — re-verify with the batch
    "sim_knn_graph_lsh_probe",
    "sim_knn_graph_lsh_tables",
    "sim_knn_graph_lsh",
    # new in round 10 — branch refs + catalog pins composed in one SQL
    # statement; DSIR fixed-point importance selection (never
    # driver-checked)
    "catalog_sql_branch_join",
    "dsir_importance_select",
    "snapshot_metadata_count",
    "snapshot_metadata_minmax",
    "snapshot_metadata_sum",
    "snapshot_metadata_groupby",
    "snapshot_partition_evolution",
    "snapshot_bucket_join",
    "snapshot_partition_rollup",
    # latest driver row r05 — the stalest cohort (rotation, per the ledger)
    "stream_sliding_halfhour",
    "stream_static_enrich",
    "stream_stream_view_purchase",
    "stream_tumbling_hourly",
    "stream_user_running_stats",
    "token_counting",
    "u1_union_by_name",
    "u2_except_all",
    "u3_intersect",
    "vocab_table",
    "w3_event_gaps",
    "zorder_codes",
    # latest driver row r06 — the next-stalest cohort fills the window
    "asof_last_purchase_before_view",
    "basket_part_pairs",
    "blocklist_filter",
    "bpe_learn_merges",
    "chunk_documents",
    "cms_sketch_counts",
    "cms_term_estimates",
    "comparator_summary",
    "corpus_e2e_curation",
    "cube_order_volume",
    "dd_incremental_near_dup",
    "dd_semantic_prune",
    "embedding_centroids",
    "encode_bpe_ids",
    # (remaining r06 names — events_flatten_variant on, alphabetical —
    # rotate to round 11's window; slots went to the new metadata
    # SUM / GROUP BY queries and the partition-spec family —
    # evolution, bucket-aligned join, partition rollup — above)
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def all_queries():
    return _ordered(dict(QUERIES))


def all_oracles():
    return _ordered(dict(ORACLE))
