"""Two-decade scale check (r8): 1x -> 10x -> 100x on six headline shapes.

The 10x sweep (scale_check_r7_full.json) shows every shape sub-linear,
but one decade cannot distinguish "amortizing fixed overhead" from a
shape that turns super-linear once real data volume dominates. This tool
adds the second decade: lineitem to 60M rows, events to 10M, documents
to 500k (same key-perturbation / near-dup-family disciplines as
tools/scale_check.py, whose materializers are reused with FACTOR=100),
then times each shape at all three scales (min-of-2, deterministic
unpersist + GC) and reports the per-decade ratios:

  d1 = t(10x)/t(1x),  d2 = t(100x)/t(10x)

d2 is the number that matters for the 100 TB story: d2 <= 10 means the
second decade is at-most-linear; d2 < d1 would mean overhead still
amortizing; d2 well above 10 is a cliff the 10x sweep missed.

Output: tools/scale100_r8.json. Run on an idle host (~10 min: the 100x
materialization writes ~1 GB of parquet once, then reuses it).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import tools.scale_check as sc  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)

SCALE100_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale100_r8")


def materialize_docs100_linear(spark, dir10: str) -> None:
    """100x documents with LINEAR pair growth — the realistic dedup second
    decade. The standard FACTOR=100 family materializer would create
    C(100,2)=4950 intra-family pairs per original doc (pair count grows
    ~110x while data grows 10x: output-dominated, measures the corpus, not
    the engine). Instead: 10 TOKEN-TAGGED replicas of the 10x near-dup-
    family corpus — tagging every token makes replicas mutually dissimilar
    (zero cross-replica shingle overlap), so corpus grows 10x AND true
    pair count grows exactly 10x."""
    from pyspark.sql import functions as F

    out = os.path.join(SCALE100_DIR, "documents_linear")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    docs10 = spark.read.parquet(os.path.join(dir10, "documents"))
    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j")
    tag = F.concat(F.lit("r"), F.col("j").cast("string"))
    (
        docs10.select("doc_id", "text", rep)
        .select(
            (F.col("doc_id") * 10 + F.col("j")).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "), lambda x: F.concat(tag, x)
                ),
                " ",
            ).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )


def timed(mk, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        e = sc.run_noop(mk)
        best = e if best is None else min(best, e)
    return round(best, 3)


if __name__ == "__main__":
    spark = build_session(app_name="ssk-scale100")
    sc._SPARK = spark

    # 10x tables: the standing materializations
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)
    dir10 = sc.SCALE_DIR

    # 100x tables: same materializers, overridden factor/dir
    sc.FACTOR, sc.SCALE_DIR = 100, SCALE100_DIR
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)
    sc.FACTOR, sc.SCALE_DIR = 10, dir10

    li1 = load_table(spark, sc.SF_DIR, "lineitem")
    o1 = load_table(spark, sc.SF_DIR, "orders")
    ev1 = load_table(spark, sc.SF_DIR, "events")
    docs1 = load_table(spark, sc.SF_DIR, "documents").select("doc_id", "text")
    li10 = spark.read.parquet(os.path.join(dir10, "lineitem"))
    o10 = spark.read.parquet(os.path.join(dir10, "orders"))
    ev10 = spark.read.parquet(os.path.join(dir10, "events"))
    docs10 = spark.read.parquet(os.path.join(dir10, "documents"))
    li100 = spark.read.parquet(os.path.join(SCALE100_DIR, "lineitem"))
    o100 = spark.read.parquet(os.path.join(SCALE100_DIR, "orders"))
    ev100 = spark.read.parquet(os.path.join(SCALE100_DIR, "events"))
    docs100 = spark.read.parquet(os.path.join(SCALE100_DIR, "documents"))
    materialize_docs100_linear(spark, dir10)
    docs100lin = spark.read.parquet(
        os.path.join(SCALE100_DIR, "documents_linear")
    )

    shapes = {
        "q1_agg": [
            lambda: sc.q1_shape(li1),
            lambda: sc.q1_shape(li10),
            lambda: sc.q1_shape(li100),
        ],
        "q3_join_agg": [
            lambda: sc.q3_shape(li1, o1),
            lambda: sc.q3_shape(li10, o10),
            lambda: sc.q3_shape(li100, o100),
        ],
        "asof_join": [
            lambda: sc.asof_shape(ev1),
            lambda: sc.asof_shape(ev10),
            lambda: sc.asof_shape(ev100),
        ],
        "rolling_wau": [
            lambda: sc.wau_shape(ev1),
            lambda: sc.wau_shape(ev10),
            lambda: sc.wau_shape(ev100),
        ],
        "bm25_search": [
            lambda: sc.bm25_shape(docs1),
            lambda: sc.bm25_shape(docs10),
            lambda: sc.bm25_shape(docs100),
        ],
        "tfidf_topk": [
            lambda: sc.tfidf_shape(docs1),
            lambda: sc.tfidf_shape(docs10),
            lambda: sc.tfidf_shape(docs100),
        ],
        # the standing sweep's WORST 10x shape (6.85x). Decade 1 here is
        # the family-FORMATION regime (pairs grow 45x while data grows
        # 10x); decade 2 uses the linear-pair corpus so it isolates the
        # engine from output growth.
        "minhash_lsh_dedup": [
            lambda: sc.dedup_shape(docs1),
            lambda: sc.dedup_shape(docs10),
            lambda: sc.dedup_shape(docs100lin),
        ],
        # the iterative representative: 5 PageRank rounds over the
        # co-purchase graph (edge count tracks basket count — linear in
        # lineitem), each round one join + one keyed aggregate
        "pagerank_5iter": [
            lambda: sc.pagerank_shape(li1),
            lambda: sc.pagerank_shape(li10),
            lambda: sc.pagerank_shape(li100),
        ],
        # the basket self-join (pair expansion quadratic in basket WIDTH,
        # which is scale-invariant here; volume grows with basket count)
        "basket_affinity": [
            lambda: sc.basket_shape(li1),
            lambda: sc.basket_shape(li10),
            lambda: sc.basket_shape(li100),
        ],
        # delta-vs-index incremental dedup: work must track the 10% delta
        # plus the linear banding pass, never archive x archive
        "incremental_dedup": [
            lambda: sc.incr_dedup_shape(docs1),
            lambda: sc.incr_dedup_shape(docs10),
            lambda: sc.incr_dedup_shape(docs100lin),
        ],
    }

    out = {
        "protocol": (
            "1x/10x/100x, min-of-2 per scale, deterministic unpersist + GC "
            "(scale_check.run_noop); 100x tables via the standard "
            "materializers at FACTOR=100 (lineitem 60M rows, events 10M, "
            "documents 500k as 100-way near-dup families)"
        ),
        "rows": {},
    }
    for name, (m1, m10, m100) in shapes.items():
        m1()  # warm this shape's codegen once at the cheap scale
        t1, t10, t100 = timed(m1), timed(m10), timed(m100)
        row = {
            "t_1x_sec": t1,
            "t_10x_sec": t10,
            "t_100x_sec": t100,
            "decade1_ratio": round(t10 / t1, 2),
            "decade2_ratio": round(t100 / t10, 2),
        }
        out["rows"][name] = row
        print(name, row, flush=True)

    Path("tools/scale100_r8.json").write_text(json.dumps(out, indent=1))
    print("wrote tools/scale100_r8.json")
    spark.stop()
