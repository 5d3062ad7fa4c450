"""Profiler for the streaming/Python-datasource tail (VERDICT r14 #4).

The three slowest LOCALGATE_r14 entries are streaming_incremental_dedup
(12.55 s), source_python_stream_datasource (8.47 s) and
sink_python_stream_writer (8.21 s) at sf0.01 on local[8]. This tool
reproduces the gate's workload shape (fn() + collect) per key and
breaks the wall time down:

- ``fn_sec``: entry-body time (for these entries the streaming query /
  sink round-trip runs INSIDE fn(), so this is where the cost lives);
- ``collect_sec``: the result materialization the gate pays;
- per-job list from the local UI REST API (description, duration,
  stage count) so the job-count floor (AQE stage-jobs ~0.25 s each) is
  separable from real compute.

Usage: python tools/profile_stream_r15.py [-n RUNS] [key ...]
Defaults: sf0.01, local[8] (gate parity), 2 runs, the four tail keys.
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

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

DEFAULT_KEYS = [
    "streaming_incremental_dedup",
    "source_python_stream_datasource",
    "sink_python_stream_writer",
    "source_python_datasource",
]


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path) as r:
        return json.loads(r.read())


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    keys = args or DEFAULT_KEYS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session(
        app_name="ssk-profile-stream",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    # warmup: one small query so JVM/codegen startup is not charged to key 1
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = []
    for name in keys:
        reps = []
        for rep in range(runs):
            jobs_before = {j["jobId"] for j in rest(app_url, "/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}:r{rep}")
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            fn_sec = time.time() - t0
            t0 = time.time()
            n = len(df.collect())
            collect_sec = time.time() - t0
            jobs = [
                {
                    "id": j["jobId"],
                    "desc": (j.get("description") or j["name"])[:110],
                    "sec": round(
                        (
                            time.mktime(
                                time.strptime(
                                    j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                                )
                            )
                            + float(j["completionTime"][20:23]) / 1000
                            - time.mktime(
                                time.strptime(
                                    j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                                )
                            )
                            - float(j["submissionTime"][20:23]) / 1000
                        ),
                        3,
                    )
                    if j.get("completionTime")
                    else None,
                    "stages": len(j.get("stageIds", [])),
                }
                for j in rest(app_url, "/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["id"])
            reps.append(
                {
                    "fn_sec": round(fn_sec, 3),
                    "collect_sec": round(collect_sec, 3),
                    "rows": n,
                    "n_jobs": len(jobs),
                    "jobs_sec_sum": round(
                        sum(j["sec"] or 0 for j in jobs), 3
                    ),
                    "jobs": jobs,
                }
            )
        rec = {"key": name, "sf_dir": sf_dir, "cpus": cpus, "reps": reps}
        out.append(rec)
        best = min(reps, key=lambda r: r["fn_sec"] + r["collect_sec"])
        print(
            f"## {name}: fn {[r['fn_sec'] for r in reps]} collect "
            f"{[r['collect_sec'] for r in reps]} jobs {[r['n_jobs'] for r in reps]} "
            f"jobs_sec_sum {[r['jobs_sec_sum'] for r in reps]}",
            file=sys.stderr,
        )
        for j in best["jobs"]:
            print(f"   job {j['id']:>4} {j['sec']!s:>7}s stages={j['stages']} {j['desc']}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
