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


def test_window_is_the_staleness_rotation():
    """Post-closure window policy (r12 verdict ask #2): with the
    certification burn-down complete, the window must equal
    ``rotation_window(WINDOW_ROUND - 1)`` — parity pair pinned, then the
    48 oracle-backed entries with the oldest last-certified driver round
    (ties by name). The policy reads only CORRECTNESS artifacts of rounds
    < WINDOW_ROUND, so the assertion is stable when the current round's
    own artifact lands (the r8-r11 burn-down guard's grace property,
    kept). This replaces test_window_rotates_toward_rarely_certified_
    entries: its fresh pool (<=1x-certified) was a burn-down construct;
    staleness rank is the post-closure generalization."""
    from certification import rotation_window

    assert plans.DRIVER_WINDOW == rotation_window(plans.WINDOW_ROUND - 1)


def test_window_round_tracks_committed_driver_artifacts():
    """Forcing function for the rotation: WINDOW_ROUND must be exactly one
    past the newest GIT-TRACKED CORRECTNESS round. The driver writes
    CORRECTNESS_r{N}.json after round N's final commit (untracked — this
    guard stays green for the round-N judge) and it is committed at round
    N+1 open, at which point this test goes red until the builder bumps
    WINDOW_ROUND and recomputes the window — so the window can never
    silently serve two rounds and re-certification recency has a floor
    that only improves."""
    import re
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    rounds = [int(re.search(r"_r0*(\d+)\.json$", p).group(1)) for p in tracked]
    assert rounds, "no committed CORRECTNESS artifacts — cannot anchor"
    assert plans.WINDOW_ROUND == max(rounds) + 1, (
        f"WINDOW_ROUND={plans.WINDOW_ROUND} but newest committed driver "
        f"artifact is r{max(rounds)}: recompute DRIVER_WINDOW via "
        f"tools/certification.py:rotation_window and bump WINDOW_ROUND"
    )
