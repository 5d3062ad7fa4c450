"""Per-query profiler for the r14 optimization round.

For each bench key (or the subset on the command line), runs the query
with the bench's noop-sink methodology and reports:

- ``construct``: Python-side plan build time (REGISTRY[name].fn call);
- ``exec``: min-of-N noop-write wall time (the bench's timed region);
- per-stage breakdown from the local UI REST API: stage name, wall span,
  executor run time, shuffle read/write bytes, python eval time if any.

Usage:
    python tools/profile_r14.py [-n RUNS] [key ...]

Writes JSON to stdout (one object per key) so runs are diffable. The
session mirrors bench.py (local[$SPARK_GRAFT_CPUS], shuffle=cpus) except
the UI is enabled for the REST scrape — timings here guide optimization;
the bench remains the decision metric.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import BENCH_QUERIES  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    keys = args or list(BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="ssk-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    # warmup (bench preamble)
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = []
    for name in keys:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # plan construction + analysis cost (Python + Catalyst analysis)
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        construct = time.time() - t0
        t0 = time.time()
        df.schema  # force analysis
        analyze = time.time() - t0

        best = None
        last_window = None
        for _ in range(runs):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            jobs_before = {j["jobId"] for j in rest(app_url, "/jobs")}
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            if best is None or elapsed < best:
                best = elapsed
            last_window = jobs_before
        # Scraping the best run's window is fiddly; scrape the LAST run's
        # jobs instead (min-of-N jitter is in stage wall time, not
        # structure). r14 advice #4: diff against the FINAL run's
        # jobs_before snapshot — the old code diffed against the BEST
        # run's, so when the best run wasn't the last one the scrape
        # swept in every subsequent run's jobs (inflated n_jobs_last_run,
        # duplicated stages).
        jobs = [j for j in rest(app_url, "/jobs") if j["jobId"] not in last_window]
        n_jobs = len(jobs)
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in rest(app_url, f"/stages/{sid}"):
                    stages.append(
                        {
                            "id": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "tasks": att["numCompleteTasks"],
                            "executorRunTime_ms": att["executorRunTime"],
                            "executorCpuTime_ms": att.get("executorCpuTime", 0)
                            // 1_000_000,
                            "input_mb": round(att["inputBytes"] / 1e6, 1),
                            "sh_read_mb": round(att["shuffleReadBytes"] / 1e6, 2),
                            "sh_write_mb": round(att["shuffleWriteBytes"] / 1e6, 2),
                        }
                    )
            except Exception:
                pass
        rec = {
            "key": name,
            "construct_s": round(construct, 3),
            "analyze_s": round(analyze, 3),
            "exec_s": round(best, 3),
            "n_jobs_last_run": n_jobs,
            "stages": stages,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
