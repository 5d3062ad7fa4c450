"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines:

1. the FULL record {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...}, "sf": ..., probes, normalized totals,
   "delta_vs_prev": {...}} — commit this line as tools/bench_rN_local.json;
2. a COMPACT summary (same scalars, delta summary instead of the per-key
   maps) printed LAST so it survives the round driver's ~2000-char stdout
   tail window and parses (the full line outgrew it at 73 keys).

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). A small warmup query absorbs JVM/codegen startup so the
numbers measure the plans, not the JVM boot.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

# Headline set: the reference-parity pipeline, the relational core, event-time
# semantics, and the LLM-pipeline operators (SURVEY.md §2 / §2.10).
BENCH_QUERIES = [
    "flagship_entity_count",
    "pipeline_parity_udf",
    "pipeline_corpus_clean",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "topk_parts_per_brand",
    "window_running_total",
    "agg_rollup_flag_status",
    "events_tumbling_daily",
    "events_sessionization_stats",
    "events_json_extract",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_two_stage",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "events_asof_last_purchase",
    "streaming_windowed_counts",
    "streaming_stateful_user_stats",
    # round-2 additions (keys above stay fixed for round-over-round
    # comparability; these extend coverage to the new families)
    "q2_min_cost_supplier",
    "q9_product_profit",
    "pipeline_full_dedup",
    "decontaminate_ngram_overlap",
    "text_gopher_repetition",
    "sim_ivf_topk",
    "events_funnel_conversion",
    "events_cohort_retention",
    "join_bucketed_colocated",
    # round-4 additions (keys above stay fixed for comparability)
    "events_variant_props",
    "events_gapfill_resample",
    "vector_mapinarrow_stats",
    # round-5 additions (keys above stay fixed for comparability)
    "search_bm25_topk",
    "events_transition_matrix",
    "agg_exact_percentiles",
    "split_train_valid_test",
    "fuzzy_match_twostage",
    "pack_training_sequences",
    "events_cdc_snapshot_diff",
    # round-6 additions (keys above stay fixed for comparability)
    "revenue_pareto_curve",
    "multimodal_decode_pgm",
    "sim_topk_int8_quantized",
    "graph_pagerank_copurchase",
    "sample_weighted_systematic",
    "events_ewma_smoothing",
    "dedup_containment",
    # late round-6 additions (keys above stay fixed for comparability)
    "ml_tree_ensemble_score",
    "web_url_normalize",
    "graph_link_prediction_jaccard",
    "agg_weighted_median_2pass",
    # third-session round-6 additions (keys above stay fixed)
    "events_outlier_mad_2pass",
    "agg_countmin_sketch",
    "emb_pca_power_iteration",
    "sample_poisson_bootstrap",
    "graph_community_lpa",
    "multimodal_image_dhash",
    "audit_expectations_suite",
    "events_clamped_running_balance",
    "events_cep_pattern",
    "ab_cuped_adjustment",
    "graph_kcore",
    "multimodal_audio_fingerprint",
    # sixth-session round-6 additions (keys above stay fixed)
    "text_winnowing_fingerprints",
    "geo_grid_distance_join",
    # eighth-session round-6 additions (keys above stay fixed).
    # dedup_ppjoin_prefix is deliberately NOT a bench key: the sf0.1
    # fixture's frozen vocabulary puts exact prefix blocking in its
    # documented degenerate regime (~40 s; see SURVEY eighth-session scale
    # triage) — benching it would measure the corpus, not the engine.
    "part_skyline_pareto",
    "dedup_sorted_neighborhood",
    "events_cusum_changepoint",
    "events_holt_linear_forecast",
    # round-7 additions (keys above stay fixed for comparability).
    # dedup_similarity_auto IS benchable at sf0.1 where raw PPJoin was
    # not: the pre-flight gate (est 12.8M > 1M budget) routes this
    # corpus to the linear SNM path — benching it measures the router
    # doing its job.
    "dedup_similarity_auto",
    # the recall-hardened form of the triad's linear member: exactly the
    # single-pass shape twice under rotated keys + a pair-key union
    "dedup_snm_multipass",
]


def _rec_round(p: Path) -> int:
    return int("".join(ch for ch in p.stem if ch.isdigit()))


def baseline_records(repo: Path, env) -> list[Path]:
    """Candidate baseline records, oldest -> newest; [-1] is the baseline.

    Selection contract (r8 + r9 advice): the CURRENT round's own record
    must never become the baseline — a same-round re-run would compute
    deltas against itself (~0) and mask regression vs the prior round.
    File state alone CANNOT distinguish the driver's close-of-round-N run
    from the builder's first run of round N+1 (both see CORRECTNESS_rN
    newest and bench_rN_local present), so the default serves the
    unattended driver: exclude any local record whose round is >= the max
    driver-artifact round. The driver writes CORRECTNESS_rN before
    running bench, so its baseline is bench_r{N-1}_local — a true
    round-over-round comparison, never this round's own code. Builder
    runs inside round N+1 set $BENCH_ROUND=N+1 explicitly (records with
    round < BENCH_ROUND are eligible, i.e. bench_rN_local is the
    baseline). $BENCH_PREV_RECORD overrides with an exact path.
    Contract pinned by tests/test_bench_baseline.py."""
    override = env.get("BENCH_PREV_RECORD")
    if override:
        return [Path(override)]
    round_override = env.get("BENCH_ROUND")
    if round_override:
        cutoff = int(round_override)
    else:
        driver_rounds = [
            _rec_round(p)
            for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json")
            for p in repo.glob(pat)
        ]
        cutoff = max(driver_rounds, default=0)
    return sorted(
        (
            p
            for p in repo.glob("tools/bench_r*_local.json")
            if _rec_round(p) < cutoff
        ),
        key=_rec_round,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = None

    spark = build_session(app_name="ssk-bench", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))

    # Warmup: boot codegen + parquet reader, the Python UDF worker pool, and
    # the streaming micro-batch engine (all fixed per-process costs a
    # long-running cluster amortizes; the per-query numbers below measure
    # the plans). A full warmup sweep of every bench query at sf0.001 was
    # tried and measured no better — the heavy entries are bound by real
    # work + allocation pressure, not first-compilation cost.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm_sf = "/root/testdata/sf0.001"
    REGISTRY["pipeline_parity_udf"].fn(spark, warm_sf).write.format("noop").mode(
        "overwrite"
    ).save()
    REGISTRY["streaming_windowed_counts"].fn(spark, warm_sf).write.format("noop").mode(
        "overwrite"
    ).save()

    # Host-speed probe: q1 at sf0.01, min-of-3 — a fixed CPU-bound plan
    # whose runtime moves only with host load/speed, never with this
    # repo's changes. Round-over-round comparisons divide per-query times
    # by (probe_sec / prior probe_sec) to cancel the 1.2-1.4x whole-host
    # drift that otherwise masquerades as regressions (r3-r5 lesson).
    probe_dir = "/root/testdata/sf0.01"
    probe_sec = None
    for _ in range(3):
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY["q1_pricing_summary"].fn(spark, probe_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        e = time.time() - t0
        probe_sec = e if probe_sec is None else min(probe_sec, e)
    probe_sec = round(probe_sec, 3)

    # min of 2 runs per query: single local[32] runs vary ±2x on GC/paging
    # noise; the min is the reproducible plan cost. Before each run:
    # deterministic unpersist of orphan checkpoint blocks from PRIOR runs
    # (System.gc() + ContextCleaner is async and races the next timing —
    # measured a checkpointing entry degrade 13s -> 40s within one session
    # purely from accumulated orphans), then the explicit GC that keeps one
    # query's heap debt from landing as a multi-second old-gen pause inside
    # a *later* query's timing (observed: unchanged queries swinging
    # 1.1s <-> 5.2s run-over-run without it).
    from tools.perf_protocol import _clear_orphan_persistent_rdds

    def _probe_now() -> float:
        best = None
        for _ in range(3):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            t0 = time.time()
            REGISTRY["q1_pricing_summary"].fn(spark, probe_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            e = time.time() - t0
            best = e if best is None else min(best, e)
        return round(best, 3)

    # Mid-run probe SERIES (r11): the drift analysis
    # (tools/bench_drift_r11.json) caught the probe moving 0.58 -> 0.29
    # WITHIN one run — start/end probes (v2's mean) under-sample host
    # oscillation on minute timescales, so any single-scalar
    # normalization carries that variance. Re-probe every PROBE_EVERY
    # keys; probe_series records (after_n_keys, probe_sec), and v4 below
    # normalizes each key by its SEGMENT's probe mean — piecewise-flat
    # load assumption instead of run-flat. ~4 s overhead per run.
    PROBE_EVERY = 18
    probe_series: list[dict] = [{"after_n_keys": 0, "probe_sec": probe_sec}]

    times: dict[str, float] = {}
    for i, name in enumerate(BENCH_QUERIES):
        if i and i % PROBE_EVERY == 0:
            probe_series.append(
                {"after_n_keys": i, "probe_sec": _probe_now()}
            )
        best = None
        for _ in range(2):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)

    # End-of-run probe: the same q1@sf0.01 min-of-3 re-measured AFTER the
    # keys. If probe_sec_end drifts from probe_sec the host load CHANGED
    # mid-run and per-key comparisons against other runs need the wider of
    # the two windows — single-probe normalization silently assumes the
    # run-long load was flat (observed ±25% graph-key wobble traced to
    # exactly this).
    probe_end = None
    for _ in range(3):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY["q1_pricing_summary"].fn(spark, probe_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        e = time.time() - t0
        probe_end = e if probe_end is None else min(probe_end, e)
    probe_end = round(probe_end, 3)

    # PARALLEL probe: q1 at the BENCH sf (sf0.1 by default), min-of-3.
    # The r11 drift root-cause (tools/bench_drift_r11.json) showed the
    # sf0.01 CPU probe is blind to a whole drift dimension: at r11 open
    # 68/73 keys ran >=1.2x slower than the r9 record (median 1.459x,
    # including plans untouched since round 1) while the CPU probe matched
    # r9's level exactly at one iteration — the host had lost multi-core /
    # memory-bandwidth throughput, which a single-plan sf0.01 run never
    # exercises. q1@sf0.1 is a fixed 32-way parallel scan+aggregate whose
    # runtime moves only with whole-host parallel throughput; normalizing
    # by it reconciled the r11-open raw total to within 2.3% of r9's
    # record. v3 = raw_total * (prev parallel probe / this parallel
    # probe-mean) when the previous record carries one, else vs
    # PROBE_PAR_REF (the r9-record q1@sf0.1 level, the last
    # healthy-host point).
    probe_par = None
    for _ in range(3):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        e = time.time() - t0
        probe_par = e if probe_par is None else min(probe_par, e)
    probe_par = round(probe_par, 3)

    # Memory-bandwidth probe (r11): the numpy triad over LLC-busting
    # arrays, min-of-3, ~2 s. The r11 drift investigation measured this
    # host's bandwidth swinging 10.25 -> 2.32 GB/s phase-to-phase while
    # single-core CPU moved <12% (tools/bench_drift_r11.json) — and the
    # scan/shuffle-heavy sf0.1 plans are bandwidth-bound. Recorded, not
    # normalized-by: it tells the reader which host phase a record was
    # taken in.
    mem_bw = None
    try:
        import numpy as np

        n = 32_000_000  # 3 x 256 MiB float64
        b_, c_, a_ = np.ones(n), np.ones(n), np.empty(n)
        best = None
        for _ in range(3):
            t0 = time.time()
            np.add(b_, c_, out=a_)
            e = time.time() - t0
            best = e if best is None else min(best, e)
        mem_bw = round(3 * n * 8 / best / 1e9, 2)
        del a_, b_, c_
    except ImportError:
        pass

    total = round(sum(times.values()), 3)
    # Probe-normalized totals: raw_total scaled by PROBE_REF / probe cancels
    # whole-host load drift, so BENCH_rN vs BENCH_r{N-1} comparison needs no
    # judge arithmetic. PROBE_REF is the idle-host q1@sf0.01 min-of-3
    # (tools/perf_protocol.py). v1 (r6 ask #6) normalized by the START probe
    # only — silently assuming run-long load was flat; v2 (r7 ask #3)
    # normalizes by the MEAN of the start/end probes, the unbiased estimate
    # when load drifts mid-run (the interleaved-A/B finding).
    from tools.perf_protocol import PROBE_PAR_REF, PROBE_REF

    probe_mean = round((probe_sec + probe_end) / 2, 3)

    # Per-key delta vs the PREVIOUS COMMITTED record at matched probe
    # (r7 ask #3): scale the previous run's per-key seconds to THIS run's
    # probe level (prev_sec * probe_mean / prev_probe_mean), then delta =
    # this_sec - prev_sec_at_matched_probe. Positive = slower than last
    # round beyond what host load explains; launch jitter still applies to
    # sub-second keys (documented r7: ±0.1s).
    delta_vs_prev: dict[str, float] = {}
    prev_record = None
    prev_files = baseline_records(REPO, os.environ)
    if prev_files:
        prev_record = prev_files[-1].name
        prev = json.loads(prev_files[-1].read_text())
        pp = [x for x in (prev.get("probe_sec"), prev.get("probe_sec_end")) if x]
        prev_probe_mean = sum(pp) / len(pp) if pp else None
        if prev.get("sf") != sf:
            prev_probe_mean = None  # cross-sf deltas are meaningless
        if prev_probe_mean:
            for k, v in times.items():
                pv = prev.get("queries", {}).get(k)
                if pv is not None:
                    delta_vs_prev[k] = round(
                        v - pv * probe_mean / prev_probe_mean, 3
                    )

    record = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "probe_sec": probe_sec,
        "probe_sec_end": probe_end,
        "probe_mean": probe_mean,
        "probe_ref": PROBE_REF,
        "normalized_total": round(total * PROBE_REF / probe_sec, 3),
        "normalized_total_v2": round(total * PROBE_REF / probe_mean, 3),
        "probe_par_sec": probe_par,
        "probe_par_ref": PROBE_PAR_REF,
        "normalized_total_v3": round(total * PROBE_PAR_REF / probe_par, 3),
        "mem_bw_gbps": mem_bw,
        "probe_series": probe_series + [
            {"after_n_keys": len(BENCH_QUERIES), "probe_sec": probe_end}
        ],
        "normalized_total_v4": _v4_total(
            times, list(BENCH_QUERIES), probe_series, probe_end, PROBE_REF
        ),
        "prev_record": prev_record,
        "delta_vs_prev": delta_vs_prev,
    }
    # Full record first (the per-key map — save this line as the committed
    # tools/bench_rN_local.json), then the COMPACT summary line LAST: the
    # round driver keeps only the final ~2000 chars of stdout and parses
    # the JSON it finds there; the full line outgrew that window at 73
    # keys (BENCH_r06/r07 both record parsed:null with the head of the
    # line truncated away). The compact line carries every scalar + a
    # delta summary and always fits (pinned by
    # tests/test_catalog_integrity.py), so the per-round BENCH artifact is
    # machine-readable again; per-key detail lives in the committed
    # local record.
    print(json.dumps(record))
    print(json.dumps(compact_record(record)))
    spark.stop()


def _v4_total(
    times: dict,
    key_order: list,
    probe_series: list,
    probe_end: float,
    probe_ref: float,
) -> float:
    """Piecewise probe-normalized total: each key scaled by
    probe_ref / (mean of the probes bracketing its segment). Robust to
    the within-run host oscillation v1/v2's run-flat assumption misses
    (tools/bench_drift_r11.json)."""
    marks = probe_series + [
        {"after_n_keys": len(key_order), "probe_sec": probe_end}
    ]
    total = 0.0
    for i, name in enumerate(key_order):
        seg = 0
        while seg + 1 < len(marks) - 1 and marks[seg + 1]["after_n_keys"] <= i:
            seg += 1
        local = (marks[seg]["probe_sec"] + marks[seg + 1]["probe_sec"]) / 2
        total += times[name] * probe_ref / local
    return round(total, 3)


def compact_record(record: dict) -> dict:
    """The full bench record minus its two per-key maps, plus a delta
    summary — size-bounded regardless of key count."""
    dv = sorted(record.get("delta_vs_prev", {}).values())
    compact = {
        k: v
        for k, v in record.items()
        if k not in ("queries", "delta_vs_prev", "probe_series")
    }
    compact["n_queries"] = len(record.get("queries", {}))
    compact["delta_summary"] = (
        {
            "n": len(dv),
            "sum": round(sum(dv), 3),
            "max": dv[-1],
            "min": dv[0],
            "regressed_gt_0p2s": sum(1 for x in dv if x > 0.2),
        }
        if dv
        else None
    )
    compact["per_key_detail"] = "committed tools/bench_r*_local.json"
    return compact


if __name__ == "__main__":
    main()
