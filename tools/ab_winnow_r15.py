"""Interleaved A/B for the r15 text_winnowing_fingerprints expression
rewrite (r14 verdict next-round item #2).

Variant A = current registry plan (slice+aggregate shingle fold,
array_min(slice) window min). Variant B = flat Rabin-Karp arithmetic
over element gets (no per-position array allocation, no interpreted fold
loop) for the shingle hash, and least() over 5 gets for the window min.
Same exact integer math — gh[i] = (((th[i]*P + th[i+1])%M*P + th[i+2])%M*P
+ th[i+3])%M because the fold seed 0 makes step 1 the identity on
th[i] < M.

Variants alternate inside ONE session (host phases hit both equally);
prints min and median per variant over N reps. Also asserts row-level
equality of both variants once (exceptAll both ways empty).

Usage: python tools/ab_winnow_r15.py [-n REPS] [--stage g|gw|w]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans.relational import t  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402

P = 1000003
M = 2147483647


def variant_b(spark: SparkSession, sf_dir: str, stage: str = "gw") -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    d = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 8)
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr,
        F.lit(0).cast("long"),
        lambda h, x: (h * F.lit(P) + x) % F.lit(M),
    )
    th = d.select(
        "doc_id",
        F.transform(
            "toks",
            lambda tok: fold(
                F.transform(F.split(tok, ""), lambda c: F.ascii(c).cast("long"))
            ),
        ).alias("th"),
    )
    if stage in ("g", "gw"):
        # flat fold: seed 0 -> first step is identity on th[i] (< M)
        def gh(i):
            e = lambda k: F.get("th", i - 1 + k)  # noqa: E731  (0-based)
            h = e(0)
            for k in (1, 2, 3):
                h = (h * F.lit(P) + e(k)) % F.lit(M)
            return h

        g = th.select(
            "doc_id",
            F.transform(F.sequence(F.lit(1), F.size("th") - 3), gh).alias("gh"),
        )
    else:
        g = th.select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("th") - 3),
                lambda i: fold(F.slice("th", i, F.lit(4))),
            ).alias("gh"),
        )
    if stage in ("w", "gw"):
        w = g.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("gh") - 4),
                    lambda j: F.least(*[F.get("gh", j - 1 + k) for k in range(5)]),
                )
            ).alias("fps"),
        )
    else:
        w = g.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("gh") - 4),
                    lambda j: F.array_min(F.slice("gh", j, F.lit(5))),
                )
            ).alias("fps"),
        )
    return (
        w.select("doc_id", F.explode_outer("fps").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 2)
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 10
    stage = "gw"
    i = 0
    while i < len(args):
        if args[i] == "-n":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--stage":
            stage = args[i + 1]
            i += 2
        else:
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="ab-winnow",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    def stage_cpu() -> tuple[set, float, float]:
        """(stage ids seen, total executorRunTime s, executorCpuTime s)."""
        with urllib.request.urlopen(app_url + "/stages") as r:
            stages = json.loads(r.read())
        ids = {(st["stageId"], st["attemptId"]) for st in stages}
        run = sum(st["executorRunTime"] for st in stages) / 1e3
        cpu = sum(st.get("executorCpuTime", 0) for st in stages) / 1e9
        return ids, run, cpu
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    mk = {
        "A": lambda: REGISTRY["text_winnowing_fingerprints"].fn(spark, sf_dir),
        "B": lambda: variant_b(spark, sf_dir, stage),
    }
    # one-time row equality check
    a_df, b_df = mk["A"](), mk["B"]()
    assert a_df.exceptAll(b_df).isEmpty() and b_df.exceptAll(a_df).isEmpty(), (
        "variant B is NOT row-identical to A"
    )
    print("row equality: OK", flush=True)

    times: dict[str, list[float]] = {"A": [], "B": []}
    cpus_s: dict[str, list[float]] = {"A": [], "B": []}
    runs_s: dict[str, list[float]] = {"A": [], "B": []}
    for r in range(reps):
        for v in ("A", "B") if r % 2 == 0 else ("B", "A"):
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            _, run0, cpu0 = stage_cpu()
            t0 = time.time()
            mk[v]().write.format("noop").mode("overwrite").save()
            times[v].append(time.time() - t0)
            _, run1, cpu1 = stage_cpu()
            runs_s[v].append(run1 - run0)
            cpus_s[v].append(cpu1 - cpu0)
        print(
            f"rep {r}: A={times['A'][-1]:.3f} B={times['B'][-1]:.3f} | "
            f"cpu A={cpus_s['A'][-1]:.2f} B={cpus_s['B'][-1]:.2f} | "
            f"run A={runs_s['A'][-1]:.2f} B={runs_s['B'][-1]:.2f}",
            flush=True,
        )
    out = {
        "stage": stage,
        "reps": reps,
        "A_min": round(min(times["A"]), 3),
        "B_min": round(min(times["B"]), 3),
        "A_med": round(statistics.median(times["A"]), 3),
        "B_med": round(statistics.median(times["B"]), 3),
        "A_cpu_min": round(min(cpus_s["A"]), 2),
        "B_cpu_min": round(min(cpus_s["B"]), 2),
        "A_cpu_med": round(statistics.median(cpus_s["A"]), 2),
        "B_cpu_med": round(statistics.median(cpus_s["B"]), 2),
        "A_run_med": round(statistics.median(runs_s["A"]), 2),
        "B_run_med": round(statistics.median(runs_s["B"]), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
