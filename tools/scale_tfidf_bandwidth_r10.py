"""TF-IDF decade-3 outlier: bandwidth-bound or plan-bound? (r9 ask #4)

r9 left exactly one super-linear decade-3 shape: ``tfidf_topk`` at 13.3x
for the 1000x decade (tools/scale1000_r9b.json), attributed — but not yet
evidenced — to single-node shuffle bandwidth (the 225M-row tf table
crosses multiple full exchanges that share one box's fixed disk
bandwidth). Two candidate plan changes were A/B'd and rejected on
measurement in r9; this tool produces the measurement that distinguishes
the two hypotheses WITHOUT touching the plan:

1. **Intermediate 300x point.** A plan-bound super-linearity (an O(n^2)
   or onset-quadratic term) is scale-invariant: it must already show at
   300x (t300/t100 >> 3 for 3x data). A bandwidth knee is not: below the
   knee the shape times linearly, and the excess concentrates in the
   last leg. decade ratios reported for both legs.

2. **Compression A/B at fixed plan + data.** ``spark.shuffle.compress``
   (+ spill compress) directly scales the BYTES the exchanges push
   through the disk, leaving the plan and the CPU-side work identical
   (modulo codec cost, which acts in the OPPOSITE direction: compression
   off REMOVES CPU work). If the shape is bandwidth-bound at 1000x,
   compress=off (more bytes) must slow it markedly there while the 100x
   control leg — whose shuffle volume sits in page cache — barely moves.
   If it is compute/plan-bound, compress=off can only speed it up.

Protocol: standard-family documents corpora at 100x/300x/1000x
(sc.materialize_docs, the same construction as scale1000_r9b), DEPLOY.md
executor sizing (driver heap 96g — set UNCONDITIONALLY, r9 advice — and
128 shuffle partitions) identically at every scale, min-of-2 after a
codegen warm-up, deterministic unpersist + GC between runs. The
compression legs run in a fresh session because shuffle compression is a
core (not SQL) conf, frozen at context start. Effective driver memory is
recorded into the JSON. Run on an idle host (~45 min first time,
dominated by the two 1000x legs). Output: tools/scale_tfidf_bandwidth_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Unconditional: setdefault would let an inherited smaller harness value
# silently win while the protocol string claims 96g (r9 advice).
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "96g"

import tools.scale_check as sc  # noqa: E402
from tools.scale1000_r9 import timed  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

TMP = os.environ.get("TMPDIR", "/tmp")
DIRS = {
    100: os.path.join(TMP, "ssk_scale100_r8"),
    300: os.path.join(TMP, "ssk_scale300_r10"),
    1000: os.path.join(TMP, "ssk_scale1000_r8"),
}


def _session(compress: bool):
    spark = build_session(
        app_name=f"ssk-tfidf-bw-r10-{'on' if compress else 'off'}",
        shuffle_partitions=128,
        extra={
            "spark.shuffle.compress": str(compress).lower(),
            "spark.shuffle.spill.compress": str(compress).lower(),
        },
    )
    sc._SPARK = spark
    return spark


def _materialize_all(spark) -> None:
    sc.materialize_docs(spark)  # 10x seed at the standing SCALE_DIR
    dir10 = sc.SCALE_DIR
    for factor, out in DIRS.items():
        sc.FACTOR, sc.SCALE_DIR = factor, out
        sc.materialize_docs(spark)
    sc.FACTOR, sc.SCALE_DIR = 10, dir10


def _docs(spark, factor):
    return spark.read.parquet(os.path.join(DIRS[factor], "documents"))


if __name__ == "__main__":
    out = {
        "protocol": (
            "tfidf_shape (scale_check.py) on standard-family documents at "
            "100x/300x/1000x of the sf0.1 corpus (~500k/1.5M/5M docs), "
            "min-of-2 after "
            "codegen warm-up, driver heap 96g + 128 shuffle partitions at "
            "every scale; then the SAME shape at 100x and 1000x with "
            "spark.shuffle.compress=false + spark.shuffle.spill.compress="
            "false in a fresh session (fixed plan + data, bytes-through-"
            "disk scaled up, CPU-side codec work removed)"
        ),
        "hypotheses": {
            "plan_bound": "t300/t100 >> 3 and compress-off >= as fast",
            "bandwidth_bound": (
                "t300/t100 ~ 3 (excess concentrated in the 1000x leg) and "
                "compress-off markedly slower at 1000x, ~flat at 100x"
            ),
        },
    }

    spark = _session(compress=True)
    out["effective_driver_memory"] = spark.conf.get("spark.driver.memory")
    _materialize_all(spark)

    compress_on = {}
    for factor in (100, 300, 1000):
        docs = _docs(spark, factor)
        sc.run_noop(lambda: sc.tfidf_shape(docs))  # warm codegen
        compress_on[f"t_{factor}x_sec"] = timed(lambda: sc.tfidf_shape(docs))
        print("compress=on", factor, compress_on, flush=True)
    compress_on["ratio_300_over_100"] = round(
        compress_on["t_300x_sec"] / compress_on["t_100x_sec"], 2
    )
    compress_on["ratio_1000_over_300"] = round(
        compress_on["t_1000x_sec"] / compress_on["t_300x_sec"], 2
    )
    compress_on["decade3_ratio"] = round(
        compress_on["t_1000x_sec"] / compress_on["t_100x_sec"], 2
    )
    out["compress_on"] = compress_on
    spark.stop()

    spark = _session(compress=False)
    compress_off = {}
    for factor in (100, 1000):
        docs = _docs(spark, factor)
        sc.run_noop(lambda: sc.tfidf_shape(docs))
        compress_off[f"t_{factor}x_sec"] = timed(lambda: sc.tfidf_shape(docs))
        print("compress=off", factor, compress_off, flush=True)
    compress_off["slowdown_100x"] = round(
        compress_off["t_100x_sec"] / compress_on["t_100x_sec"], 2
    )
    compress_off["slowdown_1000x"] = round(
        compress_off["t_1000x_sec"] / compress_on["t_1000x_sec"], 2
    )
    out["compress_off"] = compress_off
    spark.stop()

    Path("tools/scale_tfidf_bandwidth_r10.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))
