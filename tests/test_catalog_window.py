"""Guards for the driver's 50-entry correctness window.

The driver hash-checks exactly the first 50 ``queries()`` entries in
registration order and errors on any of them lacking an oracle
(CORRECTNESS_r01.json evidence). These tests pin the window's invariants so
a refactor can't silently push an operator family out of the checked set.
"""

from __future__ import annotations

import sys
from pathlib import Path

from sparkstreamingrealtimedatawithkafka_spark import plans

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from certification import ever_driver_certified  # noqa: E402


def test_window_is_exactly_the_priority_list():
    names = list(plans.queries())
    assert names[: len(plans.DRIVER_WINDOW)] == plans.DRIVER_WINDOW


def test_every_windowed_entry_has_an_oracle():
    names = list(plans.queries())[:50]
    oracles = plans.oracle_sql()
    assert [n for n in names if n not in oracles] == []


def test_window_covers_every_operator_family():
    """Every operator family must keep AT LEAST ``need`` members CERTIFIED —
    in the current window OR driver-green in a committed CORRECTNESS round
    (``tools/certification.py``). The r5-r7 verdicts pushed round-over-round
    rotation of multi-round-green slots toward never-certified entries; a
    window-only floor pinned the window solid (r8 finding), so the floor is
    now over window ∪ history: a family can rotate out only AFTER the driver
    has actually certified its members. Parity stays pinned in-window (it is
    the reference surface the driver smoke-checks every round)."""
    window = set(list(plans.queries())[:50])
    certified = window | ever_driver_certified()
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
    assert families["parity"][0] <= window, "parity must stay in-window"
    for family, (members, need) in families.items():
        ghosts = sorted(members - set(plans.REGISTRY))
        assert not ghosts, (
            f"family {family} pool names not in the registry (typo would "
            f"silently weaken the floor): {ghosts}"
        )
        got = len(members & certified)
        assert got >= need, (
            f"family {family}: {got} members certified (window ∪ driver "
            f"history), need >= {need}"
        )


def test_no_oracle_backed_entry_escapes_certification():
    """The r12 closure invariant, kept permanently: every oracle-bearing
    registry entry is either already driver-certified (a committed
    CORRECTNESS round) or in the CURRENT window (so the next driver run
    certifies it). A new oracle-backed entry therefore cannot be added
    without entering the window until certified — certification debt can
    never silently re-accumulate. Rows-only entries are excluded by
    contract (they can never hash-certify; each is pytest-pinned per
    CATALOG.md)."""
    window = set(list(plans.queries())[:50])
    oracle_backed = set(plans.oracle_sql())
    uncovered = sorted(
        (oracle_backed & set(plans.REGISTRY))
        - ever_driver_certified()
        - window
    )
    assert uncovered == [], (
        f"oracle-backed entries neither driver-certified nor in the "
        f"current window: {uncovered}"
    )


def test_window_rotates_toward_rarely_certified_entries():
    """Certification-debt burndown is structural (r7 verdict ask #4): while
    many entries have never been driver-certified, each round's window must
    carry a meaningful batch of FRESH ones. Fresh = driver-certified in at
    most ONE round — so the guard stays green when the current round's
    CORRECTNESS file lands (each in-window entry gains exactly one
    certification), but forces rotation once a batch has been certified
    twice. Floor scales down with remaining debt so late rounds can't
    deadlock."""
    from certification import driver_history

    window = set(list(plans.queries())[:50])
    hist = driver_history()
    certified_rounds = {
        name: sum(1 for ok in rounds.values() if ok)
        for name, rounds in hist.items()
    }
    fresh_pool = {
        n for n in plans.REGISTRY if certified_rounds.get(n, 0) <= 1
    }
    need = min(10, len(fresh_pool))
    fresh = len(window & fresh_pool)
    assert fresh >= need, (
        f"window carries {fresh} fresh (<=1x-certified) entries; need >= "
        f"{need} ({len(fresh_pool)} fresh entries remain in the registry)"
    )
