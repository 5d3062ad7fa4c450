"""Routing-depth evidence for the three-regime similarity router (r8).

Constructs the corpus the third regime exists for — BOILERPLATE-PREFIX
skew — and measures, rather than narrates, three claims:

1. RECALL: on a corpus where near-dup partners share a boilerplate
   first-4-token key with hundreds of other docs AND sit far apart in
   doc_id order, single-pass SNM's window provably scatters them (same
   sort key -> tie broken by doc_id -> partners ~N/2 ranks apart). The
   rotated-key second pass sorts by the distinctive TAILS, re-colliding
   exactly those pairs. Recall is measured against the PPJoin exact
   ground truth at 1x.
2. ROUTE: the router's two integer gates (candidate estimate, head-key
   mass) actually fire on this corpus — route == snm_multipass, with the
   measured stats recorded.
3. SCALE: the routed multipass path at 10x data (frozen-vocabulary
   near-dup family replication, the scale_check discipline) stays
   linear-ish — the ratio is the evidence DEPLOY.md cites.

Corpus: the sf0.1 documents table (5000 diverse docs) plus n_pairs
constructed near-dup pairs under one shared boilerplate prefix, partner
ids offset by half the id range so the single-pass window cannot reach
them. Output: tools/router_depth_r8.json.

Run: python tools/router_depth_r8.py   (idle host; ~minutes)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (  # noqa: E402
    _ppjoin_pairs,
    _ppjoin_prefix_table,
    _ppjoin_shingle_table,
    _snm_multipass_pairs,
    _snm_pairs,
    similarity_auto_pairs,
)
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BOILER = "terms of service agreement"
N_PAIRS = 750  # 1500 boilerplate docs over ~6500 total -> ~230k ppm skew
FACTOR = 10
OUT = Path(__file__).resolve().parent / "router_depth_r8.json"


def boilerplate_corpus(spark):
    """sf0.1 documents + N_PAIRS constructed near-dup pairs under one
    boilerplate prefix; partner ids offset by the id-range half so they
    are window-unreachable under the boilerplate sort key."""
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    max_id = base.agg(F.max("doc_id")).collect()[0][0]

    def half(id_offset: int, marker: str):
        i = F.col("id").cast("string")
        body = F.concat_ws(
            " ",
            F.concat(F.lit("body"), i),
            F.concat(F.lit("tail"), i),
            F.concat(F.lit("mark"), i),
            F.concat(F.lit("sig"), i),
            F.concat(F.lit("end"), i),
            F.lit(marker),
        )
        return spark.range(N_PAIRS).select(
            (F.lit(id_offset) + F.col("id")).alias("doc_id"),
            F.concat(F.lit(BOILER + " "), body).alias("text"),
        )

    lo = half(max_id + 1, "alpha")
    hi = half(max_id + 1 + 10 * N_PAIRS, "bravo")
    return base.unionByName(lo).unionByName(hi)


def pair_set(df) -> set:
    cols = df.columns
    a, b = ("doc_lo", "doc_hi") if "doc_lo" in cols else ("doc_a", "doc_b")
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def timed(fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        _clear_orphan_persistent_rdds(spark)
        spark._jvm.System.gc()
        t0 = time.time()
        fn()
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return round(best, 3)


if __name__ == "__main__":
    spark = build_session(app_name="ssk-router-depth")
    # Corpora live on parquet, NOT localCheckpoint: the timing protocol's
    # deterministic unpersist clears ALL persistent RDDs between runs
    # (including a still-needed checkpointed corpus — learned by hitting
    # checkpointRDDBlockIdNotFound here).
    work = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_router_depth_r8")
    boilerplate_corpus(spark).write.mode("overwrite").parquet(
        os.path.join(work, "docs1")
    )
    docs1 = spark.read.parquet(os.path.join(work, "docs1"))
    n1 = docs1.count()

    # ---- 1. recall vs PPJoin exact ground truth at 1x
    max_fixture_id = (
        load_table(spark, SF_DIR, "documents").agg(F.max("doc_id")).collect()[0][0]
    )
    s = _ppjoin_shingle_table(docs1).localCheckpoint()
    gt = pair_set(_ppjoin_pairs(s, _ppjoin_prefix_table(s)))
    boiler_gt = {
        (a, b) for a, b in gt if a > max_fixture_id and b > max_fixture_id
    }  # constructed pairs live above the fixture id range
    one = pair_set(_snm_pairs(docs1))
    mp = pair_set(_snm_multipass_pairs(docs1))
    recall = {
        "ground_truth_pairs": len(gt),
        "boilerplate_pairs_in_gt": len(boiler_gt),
        "snm_single_recall": round(len(one & gt) / len(gt), 4),
        "snm_multipass_recall": round(len(mp & gt) / len(gt), 4),
        "snm_single_boiler_recall": round(
            len(one & boiler_gt) / max(len(boiler_gt), 1), 4
        ),
        "snm_multipass_boiler_recall": round(
            len(mp & boiler_gt) / max(len(boiler_gt), 1), 4
        ),
        "multipass_superset_of_single": one <= mp,
    }

    # ---- 2. the router's gates fire (route + stats off one output row)
    routed = similarity_auto_pairs(docs1)
    row = routed.select("route", "cand_est", "skew_ppm").first()
    route = {
        "route": row["route"],
        "cand_est": row["cand_est"],
        "skew_ppm": row["skew_ppm"],
        "routed_pairs_equal_multipass": pair_set(routed) == mp,
    }

    # ---- 3. multipass at 10x (frozen-vocab near-dup family replication,
    # the scale_check discipline: every doc replicated with a 1-token
    # delta so true pair density grows with the corpus)
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    (
        docs1.select("*", rep)
        .select(
            (F.col("doc_id") * FACTOR + F.col("i")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("i").cast("string")
            ).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(work, "docs10"))
    )
    docs10 = spark.read.parquet(os.path.join(work, "docs10"))
    n10 = docs10.count()

    def run_mp(d):
        _snm_multipass_pairs(d).write.format("noop").mode("overwrite").save()

    t1 = timed(lambda: run_mp(docs1))
    t10 = timed(lambda: run_mp(docs10))
    scale = {
        "rows_1x": n1,
        "rows_10x": n10,
        "t_1x_sec": t1,
        "t_10x_sec": t10,
        "time_ratio": round(t10 / t1, 2),
    }

    out = {
        "protocol": (
            "boilerplate-prefix corpus: sf0.1 documents + 750 constructed "
            "near-dup pairs sharing one 4-token boilerplate key, partner "
            "ids offset ~N/2 so the single-pass SNM window cannot reach "
            "them; recall vs PPJoin exact ground truth; timings min-of-2 "
            "with deterministic unpersist + GC (perf_protocol)"
        ),
        "recall": recall,
        "route": route,
        "scale_multipass": scale,
    }
    OUT.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    spark.stop()
