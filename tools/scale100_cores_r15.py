"""100x core-scaling for the CPU-heavy families (r14 verdict ask #8,
second stage). The 10x experiment (tools/scale_cores_r15.json) measured
core_ratio ~1.0 at 8 vs 32 cores and the stage scrape shows why: the
10x tables are 1-2 parquet files and the intermediate volumes are a few
hundred MB, so AQE's 64 MB advisory target sizes every post-spread
stage to ~6 partitions — at that byte scale 8 cores already saturate
the plan. That is AQE working as designed, not an operator property; to
show the operators themselves scale with cores, this tool replicates
documents/lineitem 100x into a MULTI-FILE layout (64 files — what any
real table looks like) and times the heavy shapes at the current
$SPARK_GRAFT_CPUS.

Usage (two sessions + merge, like scale_cores_r15.py):
    SPARK_GRAFT_CPUS=32 python tools/scale100_cores_r15.py > c32.json
    SPARK_GRAFT_CPUS=8  python tools/scale100_cores_r15.py > c8.json
    python tools/scale_cores_r15.py --merge c8.json c32.json
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

import tools.scale_check as sc  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)

FACTOR = 100
DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale100_r15")

SHAPES = ["winnowing_fp", "audio_fingerprint", "basket_affinity", "snm_linear"]


def materialize(spark) -> None:
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    if not os.path.exists(os.path.join(DIR, "documents", "_SUCCESS")):
        docs = load_table(spark, sc.SF_DIR, "documents")
        (
            docs.select("doc_id", "text", rep)
            .select(
                (F.col("doc_id") * FACTOR + F.col("i")).alias("doc_id"),
                F.concat(
                    F.col("text"),
                    F.lit(" uniq"),
                    (F.col("doc_id") * FACTOR + F.col("i")).cast("string"),
                ).alias("text"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(os.path.join(DIR, "documents"))
        )
    if not os.path.exists(os.path.join(DIR, "lineitem", "_SUCCESS")):
        li = load_table(spark, sc.SF_DIR, "lineitem")
        (
            li.select("l_orderkey", "l_partkey", rep)
            .withColumn("l_orderkey", F.col("l_orderkey") * FACTOR + F.col("i"))
            .drop("i")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(os.path.join(DIR, "lineitem"))
        )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name=f"ssk-scale100-{cpus}")
    sc._SPARK = spark
    materialize(spark)
    docs100 = spark.read.parquet(os.path.join(DIR, "documents"))
    li100 = spark.read.parquet(os.path.join(DIR, "lineitem"))
    shapes = {
        "winnowing_fp": (sc.winnow_shape, docs100),
        "audio_fingerprint": (sc.audio_fp_shape, docs100),
        "basket_affinity": (sc.basket_shape, li100),
        "snm_linear": (sc.snm_shape, docs100),
    }
    print(json.dumps({"_cpus": cpus}), flush=True)
    li1 = load_table(spark, sc.SF_DIR, "lineitem")
    sc.run_noop(lambda: sc.q1_shape(li1))  # warmup
    for name in SHAPES:
        fn, d = shapes[name]
        t100 = min(sc.run_noop(lambda: fn(d)) for _ in range(3))
        # t_1x_sec key kept for --merge compatibility; 1x is not re-timed
        # here (see scale_cores_r15.json), so ratio fields are vs 100x.
        rec = {
            name: {
                "t_1x_sec": None,
                "t_10x_sec": round(t100, 3),
                "time_ratio": None,
            }
        }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
