"""Core-scaling evidence at 10x scale for the heavy families (r14
verdict ask #8: demonstrate the r14/r15 wins where compute, not
per-job latency, dominates — the sf0.1 bench is floor-bound, 8-core
total ~= 32-core total).

Runs the selected tools/scale_check.py shapes on the 10x materialized
inputs at the CURRENT $SPARK_GRAFT_CPUS (min-of-3, noop sink,
perf-protocol hygiene) and writes one JSON line per shape. Run it twice
—
    SPARK_GRAFT_CPUS=32 python tools/scale_cores_r15.py > out32.json
    SPARK_GRAFT_CPUS=8  python tools/scale_cores_r15.py > out8.json
— and merge with --merge to get per-shape low/high-core ratios:

    python tools/scale_cores_r15.py --merge out8.json out32.json

A ratio >> 1 (8-core slower) on a shape says its cost is parallel
compute that extra cores genuinely absorb at scale; ~1 says the shape
is floor-bound even at 10x.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SHAPES = [
    "winnowing_fp",
    "snm_linear",
    "snm_multipass",
    "similarity_auto",
    "full_dedup_pipeline",
    "containment",
    "lpa_4rounds",
    "kcore_3peel",
    "pagerank_5iter",
    "link_prediction",
    "basket_affinity",
    "audio_fingerprint",
]


def merge(paths: list[str]) -> None:
    runs = []
    for p in paths:
        recs = {}
        for line in open(p):
            recs.update(json.loads(line))
        runs.append((recs.pop("_cpus"), recs))
    runs.sort(key=lambda r: r[0])  # low cores first
    (lo_c, lo), (hi_c, hi) = runs
    out = {"cpus_low": lo_c, "cpus_high": hi_c, "shapes": {}}
    for name in lo:
        if name not in hi:
            continue
        out["shapes"][name] = {
            f"t10x_c{lo_c}": lo[name]["t_10x_sec"],
            f"t10x_c{hi_c}": hi[name]["t_10x_sec"],
            "core_ratio_10x": round(
                lo[name]["t_10x_sec"] / hi[name]["t_10x_sec"], 2
            ),
            f"t1x_c{hi_c}": hi[name]["t_1x_sec"],
            "scale_ratio_10x_over_1x": hi[name]["time_ratio"],
        }
    print(json.dumps(out, indent=1))


def main() -> None:
    if sys.argv[1:2] == ["--merge"]:
        merge(sys.argv[2:])
        return
    import tools.scale_check as sc
    from sparkstreamingrealtimedatawithkafka_spark.session import build_session
    from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (
        load_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name=f"ssk-scale-cores-{cpus}")
    sc._SPARK = spark
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)

    li1 = load_table(spark, sc.SF_DIR, "lineitem")
    li10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "lineitem"))
    docs1 = load_table(spark, sc.SF_DIR, "documents").select("doc_id", "text")
    docs10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "documents"))

    shapes = {
        "winnowing_fp": (sc.winnow_shape, docs1, docs10),
        "snm_linear": (sc.snm_shape, docs1, docs10),
        "snm_multipass": (sc.snm_multipass_shape, docs1, docs10),
        "similarity_auto": (sc.sim_auto_shape, docs1, docs10),
        "full_dedup_pipeline": (sc.full_dedup_shape, docs1, docs10),
        "containment": (sc.containment_shape, docs1, docs10),
        "lpa_4rounds": (sc.lpa_shape, li1, li10),
        "kcore_3peel": (sc.kcore_shape, li1, li10),
        "pagerank_5iter": (sc.pagerank_shape, li1, li10),
        "link_prediction": (sc.linkpred_shape, li1, li10),
        "basket_affinity": (sc.basket_shape, li1, li10),
        "audio_fingerprint": (sc.audio_fp_shape, docs1, docs10),
    }
    print(json.dumps({"_cpus": cpus}), flush=True)
    sc.run_noop(lambda: sc.q1_shape(li1))  # warmup
    for name in SHAPES:
        fn, d1, d10 = shapes[name]
        t1 = min(sc.run_noop(lambda: fn(d1)) for _ in range(3))
        t10 = min(sc.run_noop(lambda: fn(d10)) for _ in range(3))
        rec = {
            name: {
                "t_1x_sec": round(t1, 3),
                "t_10x_sec": round(t10, 3),
                "time_ratio": round(t10 / t1, 2),
            }
        }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
