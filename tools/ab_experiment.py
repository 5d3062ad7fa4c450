"""Generic A/B timing harness for the r14 optimization round.

Times the given bench keys under the perf_protocol discipline (fresh
session, bench warmup, orphan-RDD clear + explicit GC before each run,
min-of-N end-to-end noop-sink runs) with optional extra session confs, so
a config or code variant can be compared against baseline in one process
shape.

Usage:
  python tools/ab_experiment.py [-n RUNS] [--conf k=v ...] KEY [KEY...]

Prints one JSON line: {"confs": {...}, "runs": N, "times": {key: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    confs: dict[str, str] = {}
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        else:
            keys.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="ssk-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra=confs,
    )
    # bench warmup
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = "/root/testdata/sf0.001"
    REGISTRY["pipeline_parity_udf"].fn(spark, warm).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in keys:
        best = None
        for _ in range(runs):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            e = time.time() - t0
            best = e if best is None else min(best, e)
        times[name] = round(best, 3)
    print(json.dumps({"confs": confs, "runs": runs, "times": times,
                      "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
