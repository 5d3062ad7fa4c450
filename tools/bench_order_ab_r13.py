"""Drift-robust order-sensitivity A/B (r12 advice item #3).

The r12 A/B (tools/bench_order_ab_r12.json) compared one forward pass
against one reversed pass; the host accelerated 1.75x within that session
(probe_par 0.889 -> 0.508), so the head/tail mean ratios (0.481 vs 0.729)
could not separate position effects from drift, and the r12 conclusion
("no detectable position penalty") over-claimed. This re-run uses the
ABBA design the advice named: FOUR passes over the same 12-key subset in
pass order forward, reversed, reversed, forward. Each key's forward
estimate is mean(F1, F2) and its reversed estimate is mean(R1, R2); the
mean pass position of both estimates is identical (2.5 of 4), so any
LINEAR host drift across the session cancels exactly, and slow quadratic
drift cancels to first order. Secondary view: every pass is bracketed by
the q1@sf0.1 parallel probe, and per-pass probe-normalized times are
reported so a non-linear drift phase is visible rather than silently
folded into the position estimate.

Decision rule (stated before running): position-independence holds if the
head-half and tail-half mean ABBA ratios agree within the same-order
replicate noise — quantified as the mean |F2-F1|/mean(F1,F2) per half.

Run: python tools/bench_order_ab_r13.py  (writes bench_order_ab_r13.json)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
# Same 12-key subset as the r12 A/B (spans scan-agg, window, join,
# UDF/text, dedup-LSH, graph-iterative, streaming planes).
KEYS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_running_total",
    "agg_rollup_flag_status",
    "join_bucketed_colocated",
    "pipeline_parity_udf",
    "text_gopher_repetition",
    "dedup_minhash_lsh",
    "events_cohort_retention",
    "graph_community_lpa",
    "sim_topk_bruteforce",
    "streaming_stateful_user_stats",
]


def _run_one(spark, name: str) -> float:
    best = None
    for _ in range(2):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return round(best, 3)


def _probe(spark) -> float:
    best = None
    for _ in range(3):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return round(best, 3)


def main() -> None:
    spark = build_session(
        app_name="order-ab-abba", master="local[32]", shuffle_partitions=32
    )
    # same warmups as bench.py
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = "/root/testdata/sf0.001"
    for w in ("pipeline_parity_udf", "streaming_windowed_counts"):
        REGISTRY[w].fn(spark, warm).write.format("noop").mode("overwrite").save()

    probes = [_probe(spark)]
    passes: list[dict[str, float]] = []
    for order in (KEYS, list(reversed(KEYS)), list(reversed(KEYS)), KEYS):
        passes.append({k: _run_one(spark, k) for k in order})
        probes.append(_probe(spark))
    f1, r1, r2, f2 = passes

    fwd = {k: round((f1[k] + f2[k]) / 2, 3) for k in KEYS}
    rev = {k: round((r1[k] + r2[k]) / 2, 3) for k in KEYS}
    ratio = {k: round(rev[k] / fwd[k], 3) for k in KEYS}
    n = len(KEYS)
    head = [ratio[k] for k in KEYS[: n // 2]]
    tail = [ratio[k] for k in KEYS[n // 2:]]
    # replicate noise at matched order+position-mean: how far apart the
    # two same-order passes sit, per half — the yardstick the head/tail
    # ratio gap must clear to count as a position effect.
    noise = {
        "fwd_rel_spread": round(
            sum(abs(f2[k] - f1[k]) / fwd[k] for k in KEYS) / n, 3
        ),
        "rev_rel_spread": round(
            sum(abs(r2[k] - r1[k]) / rev[k] for k in KEYS) / n, 3
        ),
    }
    # secondary: per-pass probe-normalized totals (non-linear drift check)
    pass_totals = [round(sum(p.values()), 3) for p in passes]
    pass_probe_mean = [
        round((probes[i] + probes[i + 1]) / 2, 3) for i in range(4)
    ]
    out = {
        "protocol": __doc__.strip().split("\n\n")[0],
        "sf_dir": SF_DIR,
        "pass_order": ["fwd", "rev", "rev", "fwd"],
        "probes_between_passes": probes,
        "pass_totals": pass_totals,
        "pass_probe_mean": pass_probe_mean,
        "pass_totals_probe_normalized": [
            round(t * probes[0] / p, 3)
            for t, p in zip(pass_totals, pass_probe_mean)
        ],
        "forward_mean": fwd,
        "reversed_mean": rev,
        "ratio_rev_over_fwd": ratio,
        "head_half_mean_ratio": round(sum(head) / len(head), 3),
        "tail_half_mean_ratio": round(sum(tail) / len(tail), 3),
        "replicate_noise": noise,
        "passes": {"f1": f1, "r1": r1, "r2": r2, "f2": f2},
    }
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
