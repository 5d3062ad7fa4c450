"""Guards for the driver's 50-entry correctness window.

The driver hash-checks exactly the first 50 ``queries()`` entries in
registration order and errors on any of them lacking an oracle
(CORRECTNESS_r01.json evidence). These tests pin the window's invariants so
a refactor can't silently push an operator family out of the checked set.
"""

from __future__ import annotations

from sparkstreamingrealtimedatawithkafka_spark import plans


def test_window_is_exactly_the_priority_list():
    names = list(plans.queries())
    assert names[: len(plans.DRIVER_WINDOW)] == plans.DRIVER_WINDOW


def test_every_windowed_entry_has_an_oracle():
    names = list(plans.queries())[:50]
    oracles = plans.oracle_sql()
    assert [n for n in names if n not in oracles] == []


def test_window_covers_every_operator_family():
    """Every operator family must keep AT LEAST ``need`` members inside the
    window. Membership is a pool, not a pinned list — the r5 verdict asked
    for round-over-round rotation of multi-round-green slots, so the guard
    protects family coverage while letting individual slots rotate."""
    window = set(list(plans.queries())[:50])
    families = {
        "parity": ({"flagship_entity_count", "pipeline_parity_udf"}, 2),
        "joins": ({"join_semi_orders_bigqty", "join_anti_customers_no_urgent",
                   "range_join_size_buckets", "events_asof_last_purchase",
                   "events_interval_overlap"}, 4),
        "recurrence_sequences": ({"events_clamped_running_balance",
                                  "events_cep_pattern",
                                  "events_markov_transitions"}, 1),
        "grouping": ({"agg_grouping_multi", "agg_distinct_counts",
                      "agg_stats_distribution"}, 2),
        "setops": ({"setop_union_intersect_except"}, 1),
        "sketches_quantiles": ({"agg_approx_sketches",
                                "quantile_bucket_assignment",
                                "agg_distinct_counts"}, 1),
        "event_time": ({"events_tumbling_daily", "events_sliding_24h_12h",
                        "events_session_window", "events_interval_overlap"}, 3),
        "graph": ({"graph_pagerank_copurchase", "graph_kcore",
                   "graph_community_lpa", "graph_link_prediction_jaccard",
                   "graph_khop_reach", "graph_triangle_count"}, 2),
        "forecast_changepoint": ({"events_cusum_changepoint",
                                  "events_holt_linear_forecast",
                                  "events_ewma_smoothing"}, 2),
        "privacy": ({"privacy_dp_noisy_counts", "privacy_k_anonymity",
                     "privacy_l_diversity", "privacy_pseudonymize_stable"}, 1),
        "embeddings_ml": ({"emb_pca_power_iteration",
                           "emb_centroids_by_label"}, 1),
        "streaming": ({"streaming_entity_count", "streaming_windowed_counts",
                       "streaming_session_window", "streaming_stream_stream_join",
                       "streaming_dedup_within_watermark",
                       "streaming_stateful_user_stats",
                       "streaming_cdc_upsert"}, 6),
        "text": ({"text_token_stats", "text_quality", "text_langid",
                  "text_chunker", "pipeline_corpus_clean",
                  "text_rolling_fingerprint",
                  "text_winnowing_fingerprints"}, 5),
        "search": ({"search_bm25_topk", "text_tfidf_keywords"}, 1),
        "dedup": ({"dedup_exact_docs", "dedup_minhash_lsh", "dedup_simhash",
                   "dedup_embedding_cosine", "dedup_incremental_batch",
                   "pipeline_full_dedup"}, 5),
        # the exact-similarity triad: the self-routing entry must stay
        # in-window (it is the user-facing default; its route decision is
        # hash-checked), plus at least one direct member
        "exact_similarity_triad": ({"dedup_similarity_auto"}, 1),
        "exact_similarity_direct": ({"dedup_ppjoin_prefix",
                                     "dedup_sorted_neighborhood"}, 1),
        "streaming_fanout": ({"streaming_multi_sink_fanout"}, 1),
        "splits": ({"split_train_valid_test"}, 1),
        "similarity": ({"sim_topk_bruteforce", "sim_ivf_topk",
                        "sim_topk_int8_quantized"}, 3),
        "multimodal": ({"multimodal_pipeline", "multimodal_decode_pgm",
                        "multimodal_audio_fingerprint"}, 2),
        "model_scoring": ({"ml_tree_ensemble_score", "ml_score_logistic"}, 1),
        "web_curation": ({"web_url_normalize", "web_domain_quota",
                          "web_robots_filter"}, 1),
    }
    for family, (members, need) in families.items():
        got = len(members & window)
        assert got >= need, (
            f"family {family}: {got} members in window, need >= {need}"
        )
