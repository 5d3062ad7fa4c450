"""Interleaved A/B for the r15 dedup_similarity_auto router restructure
(r14 verdict next-round item #3).

Variant A = r14 shape: shingle + prefix tables localCheckpointed BEFORE
the gate aggregate (the over-budget path pays both materializations).
Variant B = current code: gate aggregate over the lazy prefix frame,
checkpoints only on the ppjoin route.

Asserts the routing decision and row set are identical, reports per-run
job counts (UI REST) and min/median wall times.

Usage: python tools/ab_router_r15.py [-n REPS]
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

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans.relational import t  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (  # noqa: E402
    _SIM_AUTO_BUDGET,
    _SIM_AUTO_SKEW_PPM,
    _SNM_W,
    _ppjoin_pairs,
    _ppjoin_prefix_table,
    _ppjoin_shingle_table,
    _snm_multipass_pairs,
    _snm_pairs,
    _snm_ranked,
    similarity_auto_pairs,
)
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402


def variant_a(docs: DataFrame) -> DataFrame:
    """The r14 router shape (checkpoint-first gate), verbatim."""
    budget, skew_budget_ppm = _SIM_AUTO_BUDGET, _SIM_AUTO_SKEW_PPM
    s = _ppjoin_shingle_table(docs).localCheckpoint()
    pre = _ppjoin_prefix_table(s).localCheckpoint()
    est_row = (
        pre.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .first()
    )
    est = int(est_row["cand"] or 0)
    skew_ppm = -1
    if est <= budget:
        pairs = _ppjoin_pairs(s, pre).select(
            F.col("doc_a").alias("doc_lo"),
            F.col("doc_b").alias("doc_hi"),
            "inter_cnt",
            "union_cnt",
        )
        route = "ppjoin"
    else:
        ranked = _snm_ranked(docs).localCheckpoint()
        krow = (
            ranked.groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum("c").alias("n"),
                F.sum(
                    F.when(F.col("c") > _SNM_W, F.col("c")).otherwise(F.lit(0))
                ).alias("over"),
            )
            .first()
        )
        n = int(krow["n"] or 0)
        skew_ppm = (1_000_000 * int(krow["over"] or 0)) // max(n, 1)
        if skew_ppm <= skew_budget_ppm:
            pairs = _snm_pairs(docs, ranked=ranked)
            route = "snm"
        else:
            pairs = _snm_multipass_pairs(docs, ranked=ranked)
            route = "snm_multipass"
    return pairs.select(
        "doc_lo",
        "doc_hi",
        "inter_cnt",
        "union_cnt",
        F.lit(route).alias("route"),
        F.lit(est).cast("bigint").alias("cand_est"),
        F.lit(skew_ppm).cast("bigint").alias("skew_ppm"),
    )


def variant_c(docs: DataFrame) -> DataFrame:
    """Middle shape: checkpoint ONLY the shingle table (computed once,
    shared by the gate's double read), gate over the LAZY prefix frame;
    the prefix checkpoint is built only on the ppjoin route."""
    budget, skew_budget_ppm = _SIM_AUTO_BUDGET, _SIM_AUTO_SKEW_PPM
    s = _ppjoin_shingle_table(docs).localCheckpoint()
    est_row = (
        _ppjoin_prefix_table(s)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .first()
    )
    est = int(est_row["cand"] or 0)
    skew_ppm = -1
    if est <= budget:
        pre = _ppjoin_prefix_table(s).localCheckpoint()
        pairs = _ppjoin_pairs(s, pre).select(
            F.col("doc_a").alias("doc_lo"),
            F.col("doc_b").alias("doc_hi"),
            "inter_cnt",
            "union_cnt",
        )
        route = "ppjoin"
    else:
        ranked = _snm_ranked(docs).localCheckpoint()
        krow = (
            ranked.groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum("c").alias("n"),
                F.sum(
                    F.when(F.col("c") > _SNM_W, F.col("c")).otherwise(F.lit(0))
                ).alias("over"),
            )
            .first()
        )
        n = int(krow["n"] or 0)
        skew_ppm = (1_000_000 * int(krow["over"] or 0)) // max(n, 1)
        if skew_ppm <= skew_budget_ppm:
            pairs = _snm_pairs(docs, ranked=ranked)
            route = "snm"
        else:
            pairs = _snm_multipass_pairs(docs, ranked=ranked)
            route = "snm_multipass"
    return pairs.select(
        "doc_lo",
        "doc_hi",
        "inter_cnt",
        "union_cnt",
        F.lit(route).alias("route"),
        F.lit(est).cast("bigint").alias("cand_est"),
        F.lit(skew_ppm).cast("bigint").alias("skew_ppm"),
    )


def main() -> None:
    reps = 10
    args = sys.argv[1:]
    if args and args[0] == "-n":
        reps = int(args[1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="ab-router",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    app_url = f"{ui}/api/v1/applications/{app_id}"

    def n_jobs() -> int:
        with urllib.request.urlopen(app_url + "/jobs") as r:
            return len(json.loads(r.read()))

    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    docs = lambda: t(spark, sf_dir, "documents")  # noqa: E731
    mk = {
        "A": lambda: variant_a(docs()),
        "B": lambda: similarity_auto_pairs(docs()),
        "C": lambda: variant_c(docs()),
    }

    a_df = mk["A"]()
    for v in ("B", "C"):
        v_df = mk[v]()
        assert a_df.exceptAll(v_df).isEmpty() and v_df.exceptAll(a_df).isEmpty(), (
            f"router variant {v} differs in rows/route"
        )
    print("row + route equality: OK", flush=True)

    order0 = ("A", "B", "C")
    times: dict[str, list[float]] = {v: [] for v in order0}
    jobs: dict[str, list[int]] = {v: [] for v in order0}
    for r in range(reps):
        for v in order0 if r % 2 == 0 else order0[::-1]:
            _clear_orphan_persistent_rdds(spark)
            spark._jvm.System.gc()
            j0 = n_jobs()
            t0 = time.time()
            mk[v]().write.format("noop").mode("overwrite").save()
            times[v].append(time.time() - t0)
            jobs[v].append(n_jobs() - j0)
        print(
            "rep %d: " % r
            + " ".join(
                f"{v}={times[v][-1]:.3f}s/{jobs[v][-1]}j" for v in order0
            ),
            flush=True,
        )
    out = {"reps": reps}
    for v in order0:
        out[f"{v}_min"] = round(min(times[v]), 3)
        out[f"{v}_med"] = round(statistics.median(times[v]), 3)
        out[f"{v}_jobs"] = max(set(jobs[v]), key=jobs[v].count)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
