"""Order-sensitivity A/B for the r12 canary-interleaved run order.

The r12 protocol (bench.py) moved the bench keys from fixed list order to
canary-interleaved order. Per-key comparability against records taken in
the OLD order assumes a key's min-of-2 time (after deterministic orphan
unpersist + GC) does not depend on its position in the run. This tool
measures that assumption directly: a 12-key subset spanning the plan
planes (scan-agg, window, join, UDF/text, dedup-LSH, graph-iterative,
streaming) is timed twice within ONE session — forward order, then
reversed order — with the standard per-key discipline. If position
mattered (heap debt, codegen-cache pressure), the reversed pass would
show a systematic head-vs-tail skew; host drift between the passes is
bounded by the same q1 parallel probe bench.py records.

Run: python tools/bench_order_ab_r12.py  (writes bench_order_ab_r12.json)
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
        app_name="order-ab", master="local[32]", shuffle_partitions=32
    )
    # same warmups as bench.py
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = "/root/testdata/sf0.001"
    for w in ("pipeline_parity_udf", "streaming_windowed_counts"):
        REGISTRY[w].fn(spark, warm).write.format("noop").mode("overwrite").save()

    probe_start = _probe(spark)
    fwd = {k: _run_one(spark, k) for k in KEYS}
    probe_mid = _probe(spark)
    rev = {k: _run_one(spark, k) for k in reversed(KEYS)}
    probe_end = _probe(spark)

    # position skew: per-key ratio rev/fwd vs the key's position flip.
    # Under position-independence the head-half and tail-half mean ratios
    # match (up to the probe-bounded host drift between passes).
    n = len(KEYS)
    head = [rev[k] / fwd[k] for k in KEYS[: n // 2]]
    tail = [rev[k] / fwd[k] for k in KEYS[n // 2:]]
    out = {
        "protocol": __doc__.strip().split("\n\n")[1],
        "sf_dir": SF_DIR,
        "probe_par": {"start": probe_start, "mid": probe_mid, "end": probe_end},
        "forward": fwd,
        "reversed": rev,
        "ratio_rev_over_fwd": {k: round(rev[k] / fwd[k], 3) for k in KEYS},
        "head_half_mean_ratio": round(sum(head) / len(head), 3),
        "tail_half_mean_ratio": round(sum(tail) / len(tail), 3),
    }
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
