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
# and errors `no_oracle` on any checked entry without SQL. This list puts
# one oracle-backed entry per operator family (SURVEY.md §2 + §2.10) inside
# that window: reference parity, relational core, event-time, streaming,
# text analysis, dedup, similarity, multimodal. Everything else stays
# registered after the window with local-harness + pytest coverage.
DRIVER_WINDOW = [
    # ---- r12 window: certification closure, the FINAL burn-down round
    # (r11 verdict ask #1). Exactly 52 catalog entries had never appeared
    # in any CORRECTNESS_r*.json at r12 open; 47 of them are
    # oracle-bearing and ALL 47 are in this window, so after this round
    # every oracle-bearing entry (284/284) is driver-certified. The 5
    # remaining never-certified entries are the rows-only contract set
    # (`events_rolling_wau_hll`, `agg_hll_sketch_mergeable`,
    # `kmeans_clusters`, `sim_ivf_kmeans_topk`,
    # `streaming_stream_stream_left_join`) — structurally excluded from
    # the hash window, each permanently covered by the pinning pytest
    # named in CATALOG.md.
    #
    # Structural keepers (3 — the window is exactly 50, so 47 fresh
    # leaves exactly 3 slots): the parity pair stays pinned in-window
    # (tests/test_catalog_window.py — the driver smoke-checks the
    # reference surface every round), and the third slot goes to
    # `sim_ivf_topk` per r11 verdict ask #6: it is the oracle-bearing
    # twin of the rows-only `sim_ivf_kmeans_topk`, keeping the
    # un-certifiable entry's neighboring plan driver-touched. The r11
    # keepers `streaming_entity_count` / `pipeline_full_dedup` rotate
    # out: each is 3×+ driver-certified (r9/r10/r11) and the parity pin
    # consumes two of the three available slots.
    "flagship_entity_count",
    "pipeline_parity_udf",
    "sim_ivf_topk",
    # Fresh batch (47): every remaining never-driver-certified
    # oracle-bearing entry, pre-verified hash-green via
    # `tools/driver_sim.py --only` at sf0.01 (commit 52b9ec2) and
    # re-verified before this list landed.
    # events_* tail (10):
    "events_map_functions",
    "events_dedup_first_per_key",
    "events_variant_props",
    "variant_explode_props",
    "events_session_dynamic_gap",
    "events_chi2_independence",
    "events_ewma_smoothing",
    "events_seasonal_naive_backtest",
    "events_attribution_position",
    "cogroup_click_attribution",
    # analytics over orders/lineitem (3):
    "customer_rfm_segments",
    "revenue_pareto_curve",
    "scd2_point_in_time_lookup",
    # sampling family (5):
    "sample_weighted_systematic",
    "sample_poisson_bootstrap",
    "sample_hash_bernoulli",
    "sample_stratified_per_lang",
    "sample_reservoir_per_key",
    # text / corpus tail (12):
    "text_gopher_repetition",
    "text_docfreq_score",
    "text_pii_redact",
    "text_chunk_overlap",
    "text_bigram_lm",
    "text_vocab_growth",
    "corpus_overlap_matrix",
    "corpus_mixture_weights",
    "corpus_source_entropy",
    "bpe_pair_merge",
    "search_phrase_positional",
    "fuzzy_match_twostage",
    # dedup / similarity / embeddings (4):
    "dedup_cc_clusters",
    "rec_item_item_cosine",
    "mine_hard_negatives",
    "emb_centroids_by_label",
    # dataframe / vector surface (5):
    "dataframe_na_functions",
    "dataframe_transpose",
    "vector_array_functions",
    "vector_mapinarrow_stats",
    "udf_arrow_scalar",
    # ml / splits / reconciliation / observability (4):
    "feature_target_encoding_loo",
    "split_time_series_purged",
    "reconcile_checksum_diff",
    "observe_metrics_audit",
    # streaming tail (4):
    "streaming_corpus_clean",
    "streaming_ewma_stateful",
    "streaming_window_unique_users",
    "streaming_dead_letter_queue",
]

reorder(DRIVER_WINDOW, window=50)
