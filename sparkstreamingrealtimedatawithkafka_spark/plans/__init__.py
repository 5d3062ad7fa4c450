from sparkstreamingrealtimedatawithkafka_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
    register,
    reorder,
)

# Importing the catalog modules populates REGISTRY.
from sparkstreamingrealtimedatawithkafka_spark.plans import (  # noqa: F401,E402
    relational,
    text_llm,
    events,
    streaming_queries,
    connectors,
    ml,
)

# The driver hash-checks exactly the FIRST 50 queries() entries in
# registration order (CORRECTNESS_r01.json stopped at registration #50),
# and errors `no_oracle` on any checked entry without SQL.
#
# ---- r13+ window: STALENESS ROTATION (r12 verdict ask #2). The r12
# round closed the certification burn-down — every oracle-backed entry
# (284/284) is driver-certified in some committed CORRECTNESS_r*.json —
# so the window's purpose changes from coverage to freshness. Policy,
# computed by tools/certification.py:rotation_window(WINDOW_ROUND - 1):
# the parity pair stays pinned first (the driver smoke-checks the
# reference surface every round), and the remaining 48 slots are the
# oracle-backed entries with the OLDEST last-driver-certified round
# (ties by name), selected from artifacts of rounds < WINDOW_ROUND so
# the current round's own driver run never feeds its own selection.
# A new oracle-backed entry has no certification history, sorts to the
# very front, and therefore cannot escape the window until certified —
# the rotation subsumes the r12 no-escape invariant.
#
# tests/test_catalog_window.py pins (a) this list == the policy output
# and (b) WINDOW_ROUND == newest git-tracked CORRECTNESS round + 1, so
# each round open (when the driver commits the previous round's
# artifact) forces a recompute and re-certification recency has a floor
# that only improves.
WINDOW_ROUND = 15

# rotation_window(14): parity pair + the 48 stalest — the r8-vintage
# text/UDAF tier (4), the r9 batch (43: the agg/stats tier, the events
# analytics block, merge/privacy/setop surfaces, the connector sinks,
# and the streaming alarm tail), and the r10 leftover (1).
DRIVER_WINDOW = [
    "flagship_entity_count",
    "pipeline_parity_udf",
    # last certified r8 (4):
    "text_chunker",
    "text_winnowing_fingerprints",
    "udaf_grouped_agg_pandas",
    "web_url_normalize",
    # last certified r9 (43):
    "agg_argmax_minby",
    "agg_correlation_matrix",
    "agg_countmin_sketch",
    "agg_higher_moments",
    "agg_linear_regression",
    "decontaminate_ngram_overlap",
    "dedup_ngram_jaccard",
    "events_anomaly_zscore",
    "events_asof_nearest",
    "events_cohort_retention",
    "events_funnel_conversion",
    "events_gapfill_resample",
    "events_growth_accounting",
    "events_json_extract",
    "events_rolling_wau",
    "events_sessionization_stats",
    "events_transition_matrix",
    "geo_grid_distance_join",
    "graph_link_prediction_jaccard",
    "join_bucketed_colocated",
    "lateral_topk_per_brand",
    "merge_scd2_history",
    "merge_upsert_scd1",
    "ml_confusion_metrics",
    "ml_score_logistic",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "q16_supplier_cnt",
    "q21_sole_blame_suppliers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "sink_partitioned_parquet",
    "source_csv_json_roundtrip",
    "streaming_cusum_alarms",
    "streaming_dedup_keys",
    "streaming_topk_trending",
    "text_bpe_token_count",
    "unpivot_melt",
    "web_domain_quota",
    "web_robots_filter",
    "window_analytics",
    "window_function_suite",
    # last certified r10 (1):
    "ab_test_welch_t",
]

reorder(DRIVER_WINDOW, window=50)
