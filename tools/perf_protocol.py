"""Reproducible end-to-end perf protocol — the judge's measurement, as a
committed tool, so perf claims in SURVEY are made against the same
procedure that audits them.

Protocol (per query name given on the command line):
  1. FRESH SparkSession (this process — run the script once per claim;
     do not reuse a long-lived REPL session with prior heap debt);
  2. warmup: the standard bench warmup (q1 at the target sf boots
     codegen + the parquet reader; the sf0.001 UDF entry boots the
     Python worker pool) plus one throwaway run of the measured query
     itself at sf0.001 so first-compilation of ITS plan is excluded;
  3. explicit JVM GC before each timed run;
  4. min-of-3 END-TO-END runs: plan construction + full noop-sink
     execution timed together — never a sum of separately-profiled
     stages (stages overlap allocation/GC pressure that only shows up
     composed, which is how a 1.96s staged claim turned into a 3.62s
     end-to-end reality in round 5).

The output carries ``probe_sec`` — q1 at sf0.01, min-of-3, the fixed
CPU-bound host probe — so a measurement taken on a loaded host can be
normalized: times[name] * (PROBE_REF / probe_sec). PROBE_REF = 0.53 was
measured on this host class idle (load < 1); protocol sessions on the
same host have ranged 2.6-4.0s for the identical dedup_simhash plan
purely with background load, which is exactly the drift the probe
divides out.

Usage: python tools/perf_protocol.py QUERY [QUERY...] [--sf-dir DIR]
Prints one JSON line:
{"sf_dir": ..., "runs": 3, "probe_sec": ..., "times": {name: sec}}
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

WARM_SF = "/root/testdata/sf0.001"
PROBE_SF = "/root/testdata/sf0.01"
PROBE_REF = 0.53  # q1@sf0.01 min-of-3 on this host class, idle
# Parallel-plane reference: q1@sf0.1 (32-way scan+agg) as recorded in
# tools/bench_r9_local.json — the last healthy-host record before the
# r10/r11 whole-host throughput drift (tools/bench_drift_r11.json). The
# sf0.01 CPU probe is blind to multi-core/memory-bandwidth loss; this one
# is not.
PROBE_PAR_REF = 0.489


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _clear_orphan_persistent_rdds(spark) -> None:
    """Synchronously unpersist every persistent RDD between timed runs.
    System.gc() alone hands cleanup to the ASYNC ContextCleaner, which
    races the next run — orphan localCheckpoint blocks from run N of a
    shape then pollute run N+1 of the SAME shape (measured: a checkpointing
    entry degrading 13 s -> 40 s within one session purely from
    accumulation). Nothing under measurement is alive at the call sites,
    so nothing correct can be evicted."""
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(True)


def measure_probe(spark) -> float:
    """q1 at sf0.01, min-of-3 — the fixed CPU-bound host-speed probe."""
    best = None
    for _ in range(3):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        _noop(REGISTRY["q1_pricing_summary"].fn(spark, PROBE_SF))
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args
    if not names:
        print("usage: perf_protocol.py QUERY [QUERY...] [--sf-dir DIR]")
        return 2

    spark = build_session(
        app_name="perf-protocol", master="local[32]", shuffle_partitions=32
    )
    _noop(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    _noop(REGISTRY["pipeline_parity_udf"].fn(spark, WARM_SF))
    probe = measure_probe(spark)

    times: dict[str, float] = {}
    for name in names:
        _noop(REGISTRY[name].fn(spark, WARM_SF))  # compile ITS plan once
        best = None
        for _ in range(3):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            t0 = time.time()
            _noop(REGISTRY[name].fn(spark, sf_dir))
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        times[name] = round(best, 3)
    probe_end = measure_probe(spark)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs": 3,
                "probe_sec": probe,
                "probe_sec_end": probe_end,
                "probe_ref": PROBE_REF,
                "times": times,
                "normalized": {
                    k: round(v * PROBE_REF / probe, 3) for k, v in times.items()
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
