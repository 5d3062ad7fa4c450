"""r11 open: resolve the r10 matched-probe bench-record slip (VERDICT r10
finding #3 / next-round ask #2).

The r10 record ran +4.6 s over r9's with three keys (`dedup_minhash_lsh`,
`dedup_two_stage`, `events_json_extract`) regressed >0.2 s in BOTH of the
round's first two runs while zero plan source had changed — evidenced but
unfalsifiable host-drift attribution. The r11-open host is measurably
slower still (full-run probes 0.377-0.483 vs the 0.32 the r9/r10 records
were taken at), so "re-run and hope for probe 0.32" is not available.

This tool gathers the falsifiable version of the evidence instead: it
interleaves the CPU probe (the exact q1@sf0.01 min-of-3 from bench.py)
with single timed runs of the three flagged keys at sf0.1, many
iterations inside one session, then fits per-key time against probe time
with a zero-intercept least-squares line (plan cost scales with host
speed; a fixed overhead unrelated to host speed would show up as a
positive intercept / poor fit). The committed record reports, per key:

- the fitted slope (key_sec per probe_sec) and R^2,
- the PREDICTED key time at probe 0.327 (the r9 record's probe_mean),
- r9's recorded value for comparison.

If predicted(0.327) ~= r9's value, the r10 regression was host drift —
the same plan on the same host speed reproduces the r9 number. If
predicted(0.327) >> r9's value, there is a real fixed regression that
survives probe matching and needs plan archaeology.

Run from repo root: python tools/bench3key_probe_r11.py
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

KEYS = ["dedup_minhash_lsh", "dedup_two_stage", "events_json_extract"]
SF_DIR = "/root/testdata/sf0.1"
PROBE_DIR = "/root/testdata/sf0.01"
ITERS = 10
R9_PROBE = 0.327
R9_VALUES = {  # tools/bench_r9_local.json
    "dedup_minhash_lsh": 1.853,
    "dedup_two_stage": 1.826,
    "events_json_extract": 0.444,
}


def probe_once(spark) -> float:
    best = None
    for _ in range(3):
        spark._jvm.System.gc()
        t0 = time.time()
        REGISTRY["q1_pricing_summary"].fn(spark, PROBE_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return round(best, 3)


def main() -> None:
    spark = build_session("bench3key_probe_r11")
    # warmup (same shape as bench.py so codegen/JIT state matches)
    REGISTRY["q1_pricing_summary"].fn(spark, PROBE_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    for k in KEYS:
        REGISTRY[k].fn(spark, PROBE_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    samples: list[dict] = []
    for i in range(ITERS):
        p = probe_once(spark)
        row = {"iter": i, "probe_sec": p}
        for k in KEYS:
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            t0 = time.time()
            REGISTRY[k].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            row[k] = round(time.time() - t0, 3)
        samples.append(row)
        print(json.dumps(row), flush=True)

    fits = {}
    for k in KEYS:
        xs = [s["probe_sec"] for s in samples]
        ys = [s[k] for s in samples]
        # zero-intercept LS slope: sum(xy)/sum(x^2); R^2 vs that line
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = sxy / sxx
        ybar = sum(ys) / len(ys)
        ss_res = sum((y - slope * x) ** 2 for x, y in zip(xs, ys))
        ss_tot = sum((y - ybar) ** 2 for y in ys) or 1e-12
        # free-intercept fit for the intercept diagnostic
        n = len(xs)
        xbar = sum(xs) / n
        sxx_c = sum((x - xbar) ** 2 for x in xs) or 1e-12
        b1 = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sxx_c
        b0 = ybar - b1 * xbar
        fits[k] = {
            "slope_zero_intercept": round(slope, 3),
            "r2_vs_zero_intercept": round(1 - ss_res / ss_tot, 3),
            "free_fit_intercept": round(b0, 3),
            "free_fit_slope": round(b1, 3),
            "predicted_at_r9_probe": round(slope * R9_PROBE, 3),
            "r9_value": R9_VALUES[k],
            "min_observed": min(ys),
            "min_probe_observed": min(xs),
        }

    out = {
        "tool": "bench3key_probe_r11",
        "sf": 0.1,
        "iters": ITERS,
        "keys": KEYS,
        "r9_probe_mean": R9_PROBE,
        "samples": samples,
        "fits": fits,
    }
    rec = REPO / "tools" / "bench3key_probe_r11.json"
    rec.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: fits[k] for k in KEYS}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
