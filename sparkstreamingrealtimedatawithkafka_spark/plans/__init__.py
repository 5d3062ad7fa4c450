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
WINDOW_ROUND = 14

# rotation_window(13): parity pair + the 48 stalest — the r7-vintage
# tier from `agg_distinct_counts` (10, ties by name) and the r8 batch
# (38: the dedup/LSH family, the events time-series block, the graph
# family, and the streaming-stateful tail).
DRIVER_WINDOW = [
    "flagship_entity_count",
    "pipeline_parity_udf",
    # last certified r7 (10):
    "agg_distinct_counts",
    "agg_stats_distribution",
    "dedup_exact_docs",
    "join_anti_customers_no_urgent",
    "join_semi_orders_bigqty",
    "pipeline_corpus_clean",
    "q1_pricing_summary",
    "text_langid",
    "text_quality",
    "text_token_stats",
    # last certified r8 (38):
    "dedup_cc_clusters_star",
    "dedup_incremental_batch",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_snm_multipass",
    "dedup_sorted_neighborhood",
    "emb_pca_power_iteration",
    "events_asof_last_purchase",
    "events_clamped_running_balance",
    "events_cusum_changepoint",
    "events_holt_linear_forecast",
    "events_interval_overlap",
    "events_seasonal_decompose",
    "events_session_window",
    "events_ts_subsequence_search",
    "events_ts_znorm_search",
    "events_tumbling_daily",
    "graph_community_lpa",
    "graph_kcore",
    "graph_pagerank_copurchase",
    "graph_triangle_count",
    "ml_tree_ensemble_score",
    "multimodal_audio_fingerprint",
    "multimodal_decode_pgm",
    "privacy_dp_noisy_counts",
    "search_bm25_topk",
    "setop_union_intersect_except",
    "sim_incremental_topk",
    "sim_topk_bruteforce",
    "sim_topk_int8_quantized",
    "split_train_valid_test",
    "sql_recursive_cte",
    "streaming_dedup_within_watermark",
    "streaming_incremental_topk",
    "streaming_multi_sink_fanout",
    "streaming_stateful_user_stats",
    "streaming_stream_stream_join",
    "streaming_windowed_counts",
]

reorder(DRIVER_WINDOW, window=50)
