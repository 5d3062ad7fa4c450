"""Plan-shape regression guards: the scale story asserted, not just
narrated. If a refactor un-pushes a filter, drops a broadcast, or sneaks a
Python eval into a JVM-only plan, these fail."""

from __future__ import annotations

import pytest

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

from conftest import SF_DIR  # single source of truth for the fixture dir


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_the_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    scan = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in scan and "l_quantity" in scan


def test_q3_no_cartesian_and_topk_shape(spark):
    plan = _plan(spark, "q3_shipping_priority")
    # customer's join strategy is AQE's stats-driven choice (broadcast at
    # this scale, sort-merge at 100 TB) — assert only the invariants
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k never fully sorts


def test_q5_star_join_fixed_dims_broadcast(spark):
    plan = _plan(spark, "q5_regional_revenue")
    # nation/region are pinned broadcast (fixed 25/5 rows); customer and
    # supplier joins are AQE's choice. 5 joins; none may degenerate.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_no_explicit_broadcast_of_sf_proportional_tables():
    """customer/part/supplier grow linearly with SF (150k/200k/10k rows per
    SF) — an explicit F.broadcast pin on them OOMs at the 100 TB target.
    Fixed dims (region/nation), literal VALUES dims and 1-row aggregates
    may pin; everything else must be left to AQE."""
    import inspect

    from sparkstreamingrealtimedatawithkafka_spark.plans import relational

    src = inspect.getsource(relational)
    for var in ("cust", "supp", "part"):
        assert f"F.broadcast({var})" not in src, (
            f"SF-proportional table '{var}' is broadcast-pinned"
        )


def test_flagship_is_jvm_only(spark):
    plan = _plan(spark, "flagship_entity_count")
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan
    assert "Batched: true" in plan  # vectorized parquet read


def test_udf_pipeline_is_arrow_not_row_pickling(spark):
    plan = _plan(spark, "pipeline_parity_udf")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python is forbidden


def test_lsh_shuffles_ids_not_token_arrays(spark):
    # Token arrays must be joined back AFTER pair generation: the hash
    # aggregation over (band, bhash) sees only the id. The registered
    # entry's final plan starts from verify_jaccard's localCheckpoint
    # (the candidate stage runs as its own eager execution), so the guard
    # inspects the candidate pipeline's plan directly.
    from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX
    from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import (
        bucket_pairs,
        minhash_band_table,
    )
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

    docs = t(spark, SF_DIR, "documents")
    sh = docs.select("doc_id", TX.word_shingles("text", 2).alias("sh"))
    cand = bucket_pairs(
        minhash_band_table(sh, "doc_id", "sh", 64, 16), ["band", "bhash"]
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    agg_inputs = [
        seg.split("\n")[0]
        for seg in plan.split("HashAggregate")[1:]
        if "bhash" in seg.split("\n")[0]
    ]
    assert agg_inputs, "expected a bucket aggregation on (band, bhash)"
    assert all("tok" not in seg for seg in agg_inputs)


def test_order_limit_uses_take_ordered(spark):
    plan = _plan(spark, "order_limit_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort for a limit


@pytest.mark.parametrize("name", ["pipeline_corpus_clean"])
def test_corpus_clean_single_shuffle(spark, name):
    plan = _plan(spark, name)
    # one Exchange for the dedup window; the filters must not add more
    assert plan.count("Exchange hashpartitioning") == 1


def test_embedding_cosine_dedup_is_equi_join_on_bands(spark):
    plan = _plan(spark, "dedup_embedding_cosine")
    # sign-LSH blocking must plan as hash joins keyed on the band columns;
    # the cosine threshold and id ordering ride along as join filters. A
    # cartesian / nested-loop product here is the n^2 failure mode.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashJoin") >= 2  # one per band


def test_global_sort_is_range_partitioned(spark):
    plan = _plan(spark, "orderby_global_sort")
    # total sort must distribute via sampled range partitioning — never a
    # single-partition sort or a TakeOrdered (which would cap the output)
    assert "Exchange rangepartitioning" in plan
    assert "TakeOrderedAndProject" not in plan


def test_bernoulli_sample_is_narrow(spark):
    plan = _plan(spark, "sample_hash_bernoulli")
    # hash-membership sampling is a pure filter: no shuffle anywhere
    assert "Exchange" not in plan


def test_frame_sample_is_arrow_map_no_shuffle(spark):
    plan = _plan(spark, "multimodal_frame_sample")
    # fan-out decode is a narrow Arrow-batched map: no exchange anywhere
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_partitioned_parquet_read_prunes_partitions(spark):
    """sink_partitioned_parquet's read side must prune the lang partition
    at planning time: the scan's PartitionFilters carry the lang predicate
    and only the en directory's files are listed."""
    df = REGISTRY["sink_partitioned_parquet"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lang" in pf, f"lang predicate not in PartitionFilters: {pf}"


def test_lateral_decorrelates_to_window_group_limit(spark):
    """The LATERAL per-group ordered LIMIT must decorrelate into
    WindowGroupLimit (map-side top-k pruning: <=k rows per group per
    partition reach the shuffle) — never a per-group re-execution or a
    cartesian expansion."""
    plan = _plan(spark, "lateral_topk_per_brand")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_gapfill_grid_is_distributed_generate(spark):
    """The gap-fill grid comes from sequence+explode executor-side (a
    Generate node), not a driver-built range; the fill is a single window
    over the series key."""
    plan = _plan(spark, "events_gapfill_resample")
    assert "Generate explode" in plan
    assert plan.count("Window") >= 1


def test_bitmap_distinct_is_two_phase_no_expand(spark):
    """The bitmap pipeline replaces COUNT(DISTINCT)'s Expand-based
    rewrite: partial bitmap OR per (group, bucket), popcount-sum after —
    no Expand node anywhere."""
    plan = _plan(spark, "agg_bitmap_exact_distinct")
    assert "Expand" not in plan
    assert "bitmap_construct_agg" in plan or "bitmap_count" in plan


def test_bm25_stats_broadcast_and_windowed_topk(spark):
    """search_bm25_topk: the one-row (N, avgdl) stats join must be a
    broadcast (never a shuffled cartesian), the global top-10 must take the
    window-limit path rather than a full global sort materialization, and
    the scoring stays JVM-only."""
    plan = _plan(spark, "search_bm25_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan


def test_split_assignment_is_single_pass_jvm(spark):
    """split_train_valid_test: the md5 assignment is a pure projection —
    the only shuffles are the per-split aggregate's two phases (the
    COUNT(DISTINCT lang) rewrite adds one exchange over the 3-row
    intermediate; the corpus itself shuffles once), no Python eval."""
    plan = _plan(spark, "split_train_valid_test")
    assert plan.count("Exchange") <= 2
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan


def test_fuzzy_blocking_is_equi_join_not_cartesian(spark):
    """fuzzy_match_levenshtein candidates come from the banded equi-path
    (bucket_pairs aggregation), never a cartesian or theta-only join."""
    plan = _plan(spark, "fuzzy_match_levenshtein")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_clustered_read_pushes_time_predicate(spark):
    """sink_range_clustered_parquet's read-back must push the shipdate
    range to the scan (PushedFilters), where the range-clustered files'
    narrow min/max stats turn it into row-group skips."""
    plan = _plan(spark, "sink_range_clustered_parquet")
    scan = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in scan, f"shipdate range not pushed: {scan}"


def test_recursive_cte_fact_side_single_agg(spark):
    """sql_recursive_cte: the fact table aggregates once (no per-iteration
    fact scans) and joins the 84-row month dimension without a cartesian."""
    plan = _plan(spark, "sql_recursive_cte")
    assert "CartesianProduct" not in plan
    assert plan.count("orders.parquet") <= 1 or plan.count("Scan parquet") <= 1


def test_interval_overlap_is_binned_hash_join(spark):
    """events_interval_overlap must join on the day-bin equi key with the
    overlap predicate as a residual — never a nested-loop over all
    interval pairs."""
    plan = _plan(spark, "events_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_pack_sequences_prefix_sum_is_two_level(spark):
    """pack_training_sequences: the corpus-sized cumsum must run windowed
    by chunk (parallel), the chunk-offset table must come back via a
    BROADCAST join (it is #docs/4096 rows), and block membership must be
    a distributed Generate — never a driver loop."""
    plan = _plan(spark, "pack_training_sequences")
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan
    # exactly one single-partition window (the tiny chunk-offset prefix);
    # the corpus-sized window is partitioned by chunk
    assert plan.count("Window [") <= 2


def test_hard_negatives_corpus_never_shuffles(spark):
    """mine_hard_negatives: queries broadcast through a nested-loop join
    (the label filter is a non-equi predicate), corpus side stays
    shuffle-free until the per-query window rank."""
    plan = _plan(spark, "mine_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_cdc_diff_is_single_scan(spark):
    """events_cdc_snapshot_diff: both snapshots must come from ONE pass
    over events (the explode-tag trick), not one scan per snapshot."""
    plan = _plan(spark, "events_cdc_snapshot_diff")
    assert plan.count("events.parquet") <= 1 or plan.count("Scan parquet") <= 1
    assert "Generate explode" in plan


def test_session_paths_rank_filter_is_group_limited(spark):
    """events_session_paths: the rank<=3 filter must plan as a
    WindowGroupLimit (map-side top-k pruning), and the path-frequency
    LIMIT as TakeOrderedAndProject — never a global sort."""
    plan = _plan(spark, "events_session_paths")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_incremental_dedup_is_equi_join_on_bands(spark):
    """dedup_incremental_batch: delta-vs-index candidates must come from
    an equi-join on (band, bhash) — no cartesian, no nested loop."""
    plan = _plan(spark, "dedup_incremental_batch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_buckets_broadcast_back(spark):
    """quantile_bucket_assignment: the bucket->decile map (histogram-sized)
    must come back via a broadcast join; rows never sort globally."""
    plan = _plan(spark, "quantile_bucket_assignment")
    assert "BroadcastHashJoin" in plan
    assert "Sort [cents" not in plan


def test_pareto_rank_window_is_bucket_partitioned(spark):
    """revenue_pareto_curve: the rank/cumsum window over the
    SF-proportional part aggregate must be PARTITIONED BY the histogram
    bucket (parallel across 1024 buckets); the only unpartitioned window
    allowed is the fixed-size bucket-offset prefix, which must sit behind
    a broadcast. A bare `windowspecdefinition(cents DESC...)` (no
    partition key) over part rows is the single-partition funnel the r5
    review flagged."""
    import re

    plan = _plan(spark, "revenue_pareto_curve")
    # part-level window carries bkt as its partition spec
    assert re.search(r"windowspecdefinition\(bkt#\d+L, cents#\d+L DESC", plan)
    # no unpartitioned window ordered by cents (the old global-rank shape)
    assert not re.search(r"windowspecdefinition\(cents#\d+L DESC", plan)
    # bucket offsets come back via broadcast, not a corpus shuffle
    assert "BroadcastHashJoin" in plan


def test_chunk_overlap_is_shuffle_free(spark):
    """text_chunk_overlap claims a pure generate/map plan: no Exchange at
    all — chunking must never shuffle the corpus."""
    plan = _plan(spark, "text_chunk_overlap")
    assert "Exchange" not in plan
    assert "Generate explode" in plan


def test_pagerank_iterations_are_equi_joins(spark):
    """graph_pagerank_copurchase: every propagation round must be an
    equi-join on the rank key — no cartesian, no nested loop, and the
    edge table must come from checkpointed blocks (one materialization),
    so the final plan holds no basket re-expansion."""
    plan = _plan(spark, "graph_pagerank_copurchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_sampling_prefix_sum_is_two_level(spark):
    """sample_weighted_systematic: the order-stream cumsum must run
    windowed by chunk (parallel) with the chunk offsets broadcast back;
    the only unpartitioned window is over the tiny chunk table."""
    import re

    plan = _plan(spark, "sample_weighted_systematic")
    assert re.search(r"windowspecdefinition\(chunk#\d+L, o_orderkey", plan)
    assert not re.search(r"windowspecdefinition\(o_orderkey#\d+L ASC", plan)
    assert "BroadcastHashJoin" in plan


def test_growth_accounting_is_join_shaped_not_windowed(spark):
    """events_growth_accounting: lifecycle classification must come from
    keyed self-joins, never a window over each user's full history."""
    plan = _plan(spark, "events_growth_accounting")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_ewma_fold_has_no_window_or_second_pass(spark):
    """events_ewma_smoothing: one shuffle on user_id, the fold inside the
    aggregation's project — no window operator, no join."""
    plan = _plan(spark, "events_ewma_smoothing")
    assert "Window" not in plan
    assert "Join" not in plan


def test_triangle_count_is_degree_oriented_hash_joins(spark):
    """graph_triangle_count: wedge enumeration and closure check must be
    hash equi-joins over the checkpointed oriented edge list — no
    cartesian, no nested loop, no basket re-expansion in the final plan
    (the oriented list materializes once)."""
    plan = _plan(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # closure probe is a left-semi hash join
    assert "LeftSemi" in plan


def test_bloom_prefilter_bitmap_broadcasts(spark):
    """join_bloom_prefilter: both bitmap probes must be BROADCAST hash
    joins (the 2048-word bitmap is tiny by construction); the exact
    verification is the only non-broadcast join allowed."""
    plan = _plan(spark, "join_bloom_prefilter")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_item_item_topk_is_group_limited(spark):
    """rec_item_item_cosine: the per-item top-3 must plan as
    WindowGroupLimit so shuffle groups prune map-side."""
    plan = _plan(spark, "rec_item_item_cosine")
    assert "WindowGroupLimit" in plan


def test_reservoir_sample_is_group_limited(spark):
    """sample_reservoir_per_key: rank-<=k over md5 order must plan as
    WindowGroupLimit — a bounded per-group heap, never a full sort of a
    skewed group."""
    plan = _plan(spark, "sample_reservoir_per_key")
    assert "WindowGroupLimit" in plan


def test_phrase_search_filters_terms_at_the_generate_stage(spark):
    """search_phrase_positional: each posting side must filter to ITS
    query term before any exchange — the shuffle carries two terms'
    postings, not the exploded corpus."""
    plan = _plan(spark, "search_phrase_positional")
    import re

    # the term predicates appear as filters on the exploded token column
    assert re.search(r"Filter.*= merge", plan) or "merge)" in plan
    assert re.search(r"Filter.*= join", plan) or "join)" in plan
    assert "CartesianProduct" not in plan


def test_checksum_diff_drilldown_buckets_broadcast(spark):
    """reconcile_checksum_diff: the changed-bucket set must broadcast
    back as semi-join filters on both snapshots; only pruned rows reach
    the full-outer diff."""
    plan = _plan(spark, "reconcile_checksum_diff")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "FullOuter" in plan


def test_seasonal_backtest_joins_on_daily_grid(spark):
    """events_seasonal_naive_backtest: the lag join must run on the
    aggregated (type, day) grid, not raw events — the plan reads the
    checkpointed daily grid, so no second events scan appears."""
    plan = _plan(spark, "events_seasonal_naive_backtest")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0  # grid is checkpointed RDD blocks


def test_target_encoding_is_one_agg_one_join(spark):
    """feature_target_encoding_loo: LOO must be algebra over the category
    totals — one aggregation + one equi-join, no window, no second fact
    aggregation."""
    plan = _plan(spark, "feature_target_encoding_loo")
    assert "Window" not in plan
    assert plan.count("HashAggregate") <= 4  # partial+final of ONE agg (+AQE variants)


def test_attribution_rank_windows_are_purchase_partitioned(spark):
    """events_attribution_position: the first/last/middle classification
    windows must partition by the purchase id — conversion-path-sized
    partitions, never unpartitioned."""
    import re

    plan = _plan(spark, "events_attribution_position")
    assert re.search(r"windowspecdefinition\(pid#", plan)
    assert "CartesianProduct" not in plan


def test_ml_scoring_stays_in_codegen(spark):
    """Model inference compiled to expressions must never cross into
    Python (that is the entire point of the ml_* family): no
    BatchEvalPython/ArrowEvalPython nodes, and the tree ensemble's scan
    must prune to exactly the feature + group columns."""
    for name in ("ml_score_logistic", "ml_tree_ensemble_score"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    tree = _plan(spark, "ml_tree_ensemble_score")
    schema = tree.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" in schema and "l_orderkey" not in schema


def test_web_domain_quota_single_domain_shuffle(spark):
    """The ranking window and the per-domain rollup must share ONE
    domain-keyed exchange — the aggregate reuses the window's
    partitioning rather than reshuffling."""
    plan = _plan(spark, "web_domain_quota")
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(domain", plan)) == 1
    assert "EvalPython" not in plan


def test_web_url_normalize_no_python_and_pruned(spark):
    plan = _plan(spark, "web_url_normalize")
    assert "EvalPython" not in plan
    schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    # URL synthesis + canonicalization needs only these three columns
    assert "text" not in schema and "n_chars" not in schema


def test_privacy_entries_exact_integer_plans(spark):
    for name in ("privacy_k_anonymity", "privacy_dp_noisy_counts"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_graph_khop_no_cartesian(spark):
    plan = _plan(spark, "graph_khop_reach")
    assert "CartesianProduct" not in plan


def test_robots_ruleset_broadcasts_and_prunes_rank(spark):
    """The ruleset join must be a broadcast (rules are KB-scale) and the
    most-specific-rule pick (rn=1) must plan as WindowGroupLimit."""
    plan = _plan(spark, "web_robots_filter")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_feature_hashing_shuffles_vocabulary_not_pairs(spark):
    """The corpus-sized exchange is keyed on the term (vocabulary
    aggregation); bucketing happens AFTER — no (doc, bucket) shuffle."""
    import re

    plan = _plan(spark, "ml_feature_hashing")
    assert re.search(r"Exchange hashpartitioning\(tok", plan)
    assert "EvalPython" not in plan


def test_link_prediction_topk_never_sorts(spark):
    plan = _plan(spark, "graph_link_prediction_jaccard")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_arrow_udf_uses_arrow_eval_plane(spark):
    """useArrow=True must plan as ArrowEvalPython — if it degrades to
    pickled BatchEvalPython the 10-100x batching win silently vanishes."""
    plan = _plan(spark, "udf_arrow_scalar")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_higher_moments_single_fact_aggregate(spark):
    """All four power sums + count come from ONE map-side-combinable
    aggregate over the scan; no joins, no window, no Python."""
    plan = _plan(spark, "agg_higher_moments")
    assert "EvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_mad_medians_broadcast_back(spark):
    """Both two-pass medians must re-enter the fact stream as BROADCAST
    joins (group-vocabulary rows), and no unpartitioned window may touch
    SF-proportional input (windows run over bucket tables / single-bucket
    values only)."""
    plan = _plan(spark, "events_outlier_mad_2pass")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan


def test_pseudonymize_pure_map_plus_agg(spark):
    plan = _plan(spark, "privacy_pseudonymize_stable")
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_sql_udf_inlines_to_codegen(spark):
    """SQL UDFs must inline — the plan may contain no Python eval node
    and no real join for the 2-row table-function domain filter."""
    plan = _plan(spark, "sql_udf_create_function")
    assert "EvalPython" not in plan


def test_expectations_single_scan(spark):
    """N rules = ONE aggregate over ONE scan (+ a one-row unpivot);
    no joins, no windows, no Python."""
    plan = _plan(spark, "audit_expectations_suite")
    assert "EvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("FileScan parquet") == 1


def test_na_functions_stay_in_codegen(spark):
    plan = _plan(spark, "dataframe_na_functions")
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_ts_split_fold_table_broadcasts(spark):
    """The K-row fold table must ride a broadcast nested loop; the fact
    table is scanned once."""
    plan = _plan(spark, "split_time_series_purged")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("FileScan parquet") == 1


def test_observe_collects_metrics_in_plan(spark):
    """df.observe() must plan as CollectMetrics fused into the scan
    stage — no extra exchange below the observation point."""
    plan = _plan(spark, "observe_metrics_audit")
    assert "CollectMetrics" in plan
    assert "EvalPython" not in plan


def test_countmin_counters_broadcast(spark):
    """The 1024-cell sketch joins the probe side as a BROADCAST; no
    Python anywhere."""
    plan = _plan(spark, "agg_countmin_sketch")
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_pca_gram_is_arrow_batched_no_vector_shuffle(spark):
    """The only corpus-sized stage is the Arrow-batched partial-Gram map
    (MapInArrow); vectors must never self-join; ONE scan feeds it. The
    entry checkpoints this stage, so the guard plans the factored-out
    builder directly."""
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        _pca_gram_parts,
    )

    df = _pca_gram_parts(t(spark, SF_DIR, "embeddings"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Join" not in plan and "Exchange" not in plan
    assert plan.count("FileScan parquet") == 1


def test_modern_sql_plans_plain_aggregate(spark):
    plan = _plan(spark, "sql_modern_surface")
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_poisson_bootstrap_no_python_no_window(spark):
    """B replicate lanes come from in-row Generate + CASE weights inside
    codegen; no Python, no window, and no shuffle that grows with B
    (the aggregate is keyed on priority x replicate)."""
    plan = _plan(spark, "sample_poisson_bootstrap")
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert plan.count("FileScan parquet") == 2  # replicate pass + point pass


def test_confusion_metrics_single_scan(spark):
    """All four confusion cells from ONE aggregate; metrics are row-local
    arithmetic after it — no joins, no Python, no second scan."""
    plan = _plan(spark, "ml_confusion_metrics")
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_calibration_bounded_aggregate(spark):
    plan = _plan(spark, "ml_calibration_bins")
    assert "EvalPython" not in plan
    assert "Join" not in plan and "Sort" not in plan


def test_dynamic_partition_pruning_reaches_fact_scan(spark):
    """The dim filter must inject a dynamicpruning expression into the
    fact scan's partition filters — without it the fact side reads every
    day directory and DPP silently degraded to a plain join."""
    plan = _plan(spark, "source_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower()


def test_join_hints_are_honored(spark):
    """SHUFFLE_HASH(c) must plan a ShuffledHashJoin and MERGE(n) a
    SortMergeJoin — a silently ignored hint is worse than none."""
    plan = _plan(spark, "sql_join_hints")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" in plan


def test_cache_table_plans_in_memory_scan(spark):
    """The CACHE TABLE intermediate must be read via InMemoryTableScan —
    a missed cache is a silent full recompute. Planned directly (the
    entry localCheckpoints its result, which hides the upstream plan)."""
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

    t(spark, SF_DIR, "orders").createOrReplaceTempView("orders_cache_src")
    spark.sql("UNCACHE TABLE IF EXISTS orders_hot_t")
    spark.sql(
        "CACHE TABLE orders_hot_t AS SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS c"
        " FROM orders_cache_src WHERE o_orderstatus = 'O'"
    )
    try:
        df = spark.sql(
            "SELECT o_orderpriority, COUNT(*) AS n FROM orders_hot_t GROUP BY 1"
        )
        df.collect()  # AQE: the cache stage appears in the FINAL plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryRelation" in plan  # Spark 4: 'Scan In-memory table'
        assert "TableCacheQueryStage" in plan
    finally:
        spark.sql("UNCACHE TABLE orders_hot_t")


def test_clamped_balance_windows_are_user_partitioned(spark):
    """events_clamped_running_balance: both stacked windows (running sum,
    running min of it) must carry user_id in their partition spec — the
    closed-form identity only beats the sequential recurrence if the
    windows stay keyed; an unpartitioned window here would serialize the
    whole fact table."""
    import re

    plan = _plan(spark, "events_clamped_running_balance")
    assert re.search(r"windowspecdefinition\(user_id#\d+L", plan)
    # no window without a partition column (bare orderBy over the facts)
    assert not re.search(r"windowspecdefinition\((?:ts_us|event_id)#\d+L", plan)


def test_markov_normalizes_in_window_not_join(spark):
    """events_markov_transitions: one scan of the fact table (LAG +
    pair-count), with the per-prev normalization done by a window over
    the vocabulary-sized pair table — not a join back to a second
    aggregate (which would re-scan events)."""
    plan = _plan(spark, "events_markov_transitions")
    assert plan.count("events.parquet") <= plan.count("Scan parquet")
    assert sum(
        "events.parquet" in ln for ln in plan.splitlines() if "Scan parquet" in ln
    ) == 1
    assert "Join" not in plan.split("HashAggregate")[0]  # no join above the pairs agg


def test_quantile_normalize_ref_broadcasts(spark):
    """ml_quantile_normalize: the 20-row ventile reference table must come
    back via BroadcastHashJoin; rank windows must be partitioned by lang."""
    import re

    plan = _plan(spark, "ml_quantile_normalize")
    assert "BroadcastHashJoin" in plan
    assert re.search(r"windowspecdefinition\(lang#\d+", plan)


def test_nullsafe_join_plans_hash_not_nested_loop(spark):
    """join_nullsafe_eq: `<=>` must stay a hash-joinable equality —
    BroadcastHashJoin, never the BroadcastNestedLoopJoin an OR-of-IS-NULL
    rewrite degenerates to."""
    plan = _plan(spark, "join_nullsafe_eq")
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_winnowing_is_pure_codegen_until_the_group(spark):
    """text_winnowing_fingerprints: shingle hashing + window-min selection
    run as nested higher-order expressions inside codegen — no Python
    eval, one Generate for the fingerprint explode, and the exchanges are
    the compute-rebalance repartition plus the fingerprint groupBy.

    The no-inlined-recompute assertions pin the r6 finding: a plain
    explode triggers InferFiltersFromGenerate, whose size(fps)>0 filter
    gets the whole fingerprint chain inlined and re-evaluates the token
    hashes once per shingle (measured 157 s vs 1.9 s at sf0.01). The
    guard fails if anyone swaps explode_outer back or the optimizer
    regresses: no Filter may contain the hashing chain, and the
    per-shingle lambda must slice an ATTRIBUTE, not an inlined
    transform."""
    plan = _plan(spark, "text_winnowing_fingerprints")
    assert "EvalPython" not in plan
    assert plan.count("Generate explode") == 1
    assert plan.count("Exchange") <= 3  # rebalance + fp groupBy (+ AQE)
    assert "slice(transform(" not in plan
    for line in plan.splitlines():
        if "Filter" in line:
            assert "aggregate(" not in line, "hash chain inlined into a Filter"


def test_ppjoin_is_equi_join_shaped(spark):
    """dedup_ppjoin_prefix: candidates come from an EQUI-join on prefix
    tokens and the verify stage joins back on doc ids — never a cartesian
    or nested loop; the quadratic block lives only in the oracle."""
    plan = _plan(spark, "dedup_ppjoin_prefix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_windows_are_bucket_partitioned(spark):
    """part_skyline_pareto: both fact-level windows carry a partition key
    (bkt for strictly-cheaper, price_cents for same-price); the only
    unpartitioned window is the prefix max over the domain-bounded bucket
    table, and the bucket offsets come back via broadcast. A bare
    range-frame window ordered by price_cents with no partition key over
    part rows would be the revenue_pareto_curve single-partition funnel."""
    import re

    plan = _plan(spark, "part_skyline_pareto")
    assert re.search(r"windowspecdefinition\(bkt#\d+L, price_cents#\d+L ASC", plan)
    assert not re.search(r"windowspecdefinition\(price_cents#\d+L ASC", plan)
    assert "BroadcastHashJoin" in plan


def test_snm_rank_window_is_bucket_partitioned(spark):
    """dedup_sorted_neighborhood: the global sort rank must come from the
    two-level shape — row_number windows partitioned by the key-prefix
    bucket, offsets broadcast back; a bare windowspecdefinition over
    (k, doc_id) with no partition key would be the single-partition global
    sort SNM is notorious for."""
    import re

    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import _snm_ranked
    from sparkstreamingrealtimedatawithkafka_spark.sources.registry import load_table

    ranked = _snm_ranked(load_table(spark, SF_DIR, "documents"))
    stage1 = ranked._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"windowspecdefinition\(bkt#\d+, k#\d+ ASC", stage1)
    assert not re.search(r"windowspecdefinition\(k#\d+ ASC", stage1)
    # the full plan (rank stage checkpointed): offsets broadcast back, the
    # neighborhood expansion is an equi-join, nothing funnels to one task
    plan = _plan(spark, "dedup_sorted_neighborhood")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # (the plan's one Exchange SinglePartition is the bucket-offset prefix
    # window over the domain-bounded bucket-count table — the accepted
    # two-level pattern, same as pack_blocks / weighted sampling)


def test_cusum_windows_are_user_partitioned(spark):
    """events_cusum_changepoint: same invariant as the clamped balance it
    derives from — both stacked windows keyed by user_id, no bare
    orderBy-only window over the facts."""
    import re

    plan = _plan(spark, "events_cusum_changepoint")
    assert re.search(r"windowspecdefinition\(user_id#\d+L", plan)
    assert not re.search(r"windowspecdefinition\((?:ts_us|event_id)#\d+L", plan)


def test_udtf_table_argument_partitions_by_lang(spark):
    """udtf_table_argument: the TABLE(...) PARTITION BY lang argument must
    plan a hash exchange on lang feeding the Python UDTF — per-partition
    ordered eval is the surface's contract, not a coincidence."""
    plan = _plan(spark, "udtf_table_argument")
    # Spark aliases the PARTITION BY key as partition_by_0 and plans
    # exchange-on-key + in-partition sort feeding the Python UDTF
    assert "hashpartitioning(partition_by_0" in plan
    assert "Sort [partition_by_0" in plan
    assert "PythonUDTF" in plan


def test_file_metadata_provenance_has_no_join(spark):
    """source_file_metadata_provenance: _metadata is generated AT THE SCAN
    — the per-file audit must be scan → aggregate, never a join against a
    file manifest."""
    plan = _plan(spark, "source_file_metadata_provenance")
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_ts_subsequence_twins_plan_shape(spark):
    """The r7 time-series twins: no Python in the plan, top-k planned as
    TakeOrderedAndProject (never a full sort), no Cartesian blow-up —
    every cross join is against a broadcast one-row/w-row frame or the
    domain-bounded types x days grid."""
    for name in ("events_ts_subsequence_search", "events_ts_znorm_search"):
        plan = _plan(spark, name)
        for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert python_node not in plan, name
        assert "TakeOrderedAndProject" in plan, name


def test_incremental_topk_plan_shape(spark):
    """sim_incremental_topk: queries broadcast over the corpus (the
    brute-force posture — corpus never shuffles for the join) and the
    whole plan stays JVM-side."""
    plan = _plan(spark, "sim_incremental_topk")
    assert "BroadcastNestedLoopJoin" in plan
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan
