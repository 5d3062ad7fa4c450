"""Third decade for the DEDUP and GRAPH planes (r9): 100x -> 1000x.

The r8 verdict's one open scale question: the 100 TB claim for the
dedup plane rested on decade 2 (tools/scale100_r8.json), and decade 3
(tools/scale1000_r8.json) covered only the relational trio (q1 / q3 /
as-of). This tool closes both gaps with the same protocol:

- ``minhash_lsh_dedup`` at 5M documents: 100 TOKEN-TAGGED replicas of
  the 10x near-dup-family corpus (the linear-pair construction from
  tools/scale100_r8.py, one more decade out) — corpus grows 10x over
  the 100x linear corpus AND true pair count grows exactly 10x, so the
  ratio measures the engine (banding, band equi-join, verification),
  not output explosion.
- ``pagerank_5iter`` at 600M lineitem rows: the iterative-graph
  representative — bounded co-purchase pair expansion with RELATIVE
  edge support, then 5 equi-join + keyed-aggregate rounds with
  per-round checkpoints, on the same 1000x tables the relational trio
  used.

decade3_ratio = t(1000x)/t(100x); <= 10 means the third decade is
at-most-linear. min-of-2 per scale, deterministic unpersist + GC
(scale_check.run_noop). Reuses the standing /tmp materializations
(ssk_scale100_r8, ssk_scale1000_r8) when present, rebuilds them when
not. Output: tools/scale1000_r9.json. Run on an idle host (~1h first
time, dominated by the two 1000x timing runs per shape).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import tools.scale_check as sc  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

SCALE100_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale100_r8")
SCALE1000_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale1000_r8")


def materialize_docs_linear(spark, dir10: str, out: str, replicas: int) -> None:
    """N token-tagged replicas of the 10x near-dup-family corpus: tagging
    every token makes replicas mutually dissimilar (zero cross-replica
    shingle overlap), so corpus grows Nx AND true pair count grows exactly
    Nx — the construction from tools/scale100_r8.py, parameterized."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    docs10 = spark.read.parquet(os.path.join(dir10, "documents"))
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("j")
    tag = F.concat(F.lit("r"), F.col("j").cast("string"))
    (
        docs10.select("doc_id", "text", rep)
        .select(
            (F.col("doc_id") * replicas + F.col("j")).alias("doc_id"),
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
    spark = build_session(app_name="ssk-scale1000-r9")
    sc._SPARK = spark

    # 10x documents (the standing materialization) seed both linear corpora
    sc.materialize_docs(spark)
    dir10 = sc.SCALE_DIR

    # 100x tables (lineitem for pagerank; documents_linear for dedup)
    sc.FACTOR, sc.SCALE_DIR = 100, SCALE100_DIR
    sc.materialize(spark)
    # 1000x lineitem (the r8 third-decade tables)
    sc.FACTOR, sc.SCALE_DIR = 1000, SCALE1000_DIR
    sc.materialize(spark)
    sc.FACTOR, sc.SCALE_DIR = 10, dir10

    docs100lin_dir = os.path.join(SCALE100_DIR, "documents_linear")
    docs1000lin_dir = os.path.join(SCALE1000_DIR, "documents_linear")
    materialize_docs_linear(spark, dir10, docs100lin_dir, replicas=10)
    materialize_docs_linear(spark, dir10, docs1000lin_dir, replicas=100)

    li100 = spark.read.parquet(os.path.join(SCALE100_DIR, "lineitem"))
    li1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "lineitem"))
    docs100lin = spark.read.parquet(docs100lin_dir)
    docs1000lin = spark.read.parquet(docs1000lin_dir)

    shapes = {
        "minhash_lsh_dedup": (
            lambda: sc.dedup_shape(docs100lin),
            lambda: sc.dedup_shape(docs1000lin),
        ),
        "pagerank_5iter": (
            lambda: sc.pagerank_shape(li100),
            lambda: sc.pagerank_shape(li1000),
        ),
    }
    out = {
        "protocol": (
            "third decade, dedup + graph planes: 100x -> 1000x (documents "
            "500k -> 5M as token-tagged linear-pair replicas of the 10x "
            "near-dup corpus; lineitem 60M -> 600M rows for the co-purchase "
            "graph), min-of-2 per scale, deterministic unpersist + GC; "
            "decade3_ratio = t(1000x)/t(100x)"
        ),
        "rows": {},
    }
    # warm each shape's codegen once at the cheap scale before timing
    for name, (m100, m1000) in shapes.items():
        sc.run_noop(m100)
        t100 = timed(m100)
        t1000 = timed(m1000)
        out["rows"][name] = {
            "t_100x_sec": t100,
            "t_1000x_sec": t1000,
            "decade3_ratio": round(t1000 / t100, 2),
        }
        print(name, out["rows"][name], flush=True)
    Path("tools/scale1000_r9.json").write_text(json.dumps(out, indent=1))
    print("wrote tools/scale1000_r9.json")
    spark.stop()
