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
    window = set(list(plans.queries())[:50])
    families = {
        "parity": {"flagship_entity_count", "pipeline_parity_udf"},
        "joins": {"join_semi_orders_bigqty", "join_anti_customers_no_urgent",
                  "range_join_size_buckets", "events_asof_last_purchase"},
        "grouping": {"agg_grouping_multi"},
        "setops": {"setop_union_intersect_except"},
        "sketches": {"agg_approx_sketches"},
        "event_time": {"events_tumbling_daily", "events_sliding_24h_12h",
                       "events_session_window"},
        "streaming": {"streaming_entity_count", "streaming_windowed_counts",
                      "streaming_session_window", "streaming_stream_stream_join",
                      "streaming_dedup_within_watermark",
                      "streaming_stateful_user_stats"},
        "text": {"text_token_stats", "text_quality", "text_langid",
                 "text_chunker", "pipeline_corpus_clean"},
        "dedup": {"dedup_exact_docs", "dedup_minhash_lsh", "dedup_simhash",
                  "dedup_embedding_cosine"},
        "similarity": {"sim_topk_bruteforce", "sim_ivf_topk"},
        "multimodal": {"multimodal_pipeline"},
    }
    for family, members in families.items():
        assert members <= window, f"family {family} fell out of the driver window"
