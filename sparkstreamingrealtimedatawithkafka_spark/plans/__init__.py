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
WINDOW_ROUND = 13

# rotation_window(12): parity pair + the 48 stalest — exactly the
# r1-vintage TPC-H/setop/agg block (20), the r4 window/limit pair (2),
# the r5 batch (17), and the r6 batch through `scalar_string_functions`
# (9, ties by name; the next-stalest tier, r7, starts at
# `agg_distinct_counts`).
DRIVER_WINDOW = [
    "flagship_entity_count",
    "pipeline_parity_udf",
    # last certified r1 (20):
    "agg_corr_price_qty",
    "agg_cube_flag_status",
    "agg_rollup_flag_status",
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_rich_customers",
    "q3_shipping_priority",
    "q4_order_priority",
    "q7_volume_shipping",
    "setop_except_urgent_customers",
    "setop_nation_intersect",
    "setop_union_priorities",
    "sql_surface_cte_union_all",
    "text_fingerprint_clusters",
    "text_posexplode_tokens",
    # last certified r4 (2):
    "events_window_range_frame",
    "order_limit_top_orders",
    # last certified r5 (17):
    "agg_approx_sketches",
    "agg_grouping_multi",
    "date_functions_revenue",
    "dedup_embedding_cosine",
    "events_cdc_snapshot_diff",
    "events_sliding_24h_12h",
    "multimodal_pipeline",
    "pack_training_sequences",
    "pivot_status_by_flag",
    "q13_customer_distribution",
    "q5_regional_revenue",
    "range_join_size_buckets",
    "streaming_session_window",
    "text_lang_source_stats",
    "text_rolling_fingerprint",
    "topk_parts_per_brand",
    "window_running_total",
    # last certified r6 (9, ties by name):
    "audit_expectations_suite",
    "dedup_ppjoin_prefix",
    "events_from_json_struct",
    "events_outlier_mad_2pass",
    "grouped_map_normalize",
    "part_skyline_pareto",
    "q6_forecast_revenue",
    "quantile_bucket_assignment",
    "scalar_string_functions",
]

reorder(DRIVER_WINDOW, window=50)
