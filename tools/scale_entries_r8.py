"""Entry-level 10x scale rows for the r8 window rotation (r8).

The existing scale suite measures SHAPES (re-implemented plan bodies over
materialized 10x tables). This tool measures the newly in-window CATALOG
ENTRIES themselves, unmodified: it builds a synthetic sf-dir whose
table files are full-schema 10x materializations (lineitem/orders/
documents/events/embeddings replicated with perturbed keys so key
cardinality scales with the data; every other table symlinked from
sf0.1), then times `entry(spark, sf_dir)` end-to-end (noop sink,
min-of-2, deterministic unpersist) at 1x and 10x.

Entries covered: the r8 rotation members without an existing scale row —
graph_triangle_count (wedge join: the quadratic-risk shape),
graph_community_lpa (iterative), sql_recursive_cte (recursion must stay
dimension-sided), events_ts_znorm_search (should stay ~flat like its SSD
twin), events_seasonal_decompose, sim_incremental_topk.

Output: tools/scale_entries_r8.json. Run on an idle host.
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

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    TABLES,
    load_table,
)
from tools.perf_protocol import _clear_orphan_persistent_rdds  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
DIR10 = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_sfdir10_r8")
FACTOR = 10

ENTRIES = [
    "graph_triangle_count",
    "graph_community_lpa",
    "sql_recursive_cte",
    "events_ts_znorm_search",
    "events_seasonal_decompose",
    "sim_incremental_topk",
]


def materialize(spark) -> None:
    """Full-schema 10x tables inside a synthetic sf-dir: replicated rows
    get perturbed KEYS (cardinality scales with data, groups don't) and a
    1-token text delta (near-dup families, the frozen-vocab regime);
    non-replicated tables are symlinks to sf0.1."""
    if os.path.exists(os.path.join(DIR10, "_DONE")):
        return
    os.makedirs(DIR10, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")

    li = load_table(spark, SF_DIR, "lineitem")
    (
        li.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") * FACTOR + F.col("i"))
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(DIR10, "lineitem.parquet"))
    )
    orders = load_table(spark, SF_DIR, "orders")
    (
        orders.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") * FACTOR + F.col("i"))
        .withColumn("o_orderdate", F.expr("o_orderdate + make_interval(0,0,0,i)"))
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(DIR10, "orders.parquet"))
    )
    docs = load_table(spark, SF_DIR, "documents")
    (
        docs.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") * FACTOR + F.col("i"))
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" rep"), F.col("i").cast("string"))
        )
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(DIR10, "documents.parquet"))
    )
    # events: keep the RAW physical schema (event_id, ts, user_id,
    # event_type, value, props) — load_table re-derives ts_us/ts on read.
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.select("*", rep)
        .withColumn("event_id", F.col("event_id") * FACTOR + F.col("i"))
        .withColumn("user_id", F.col("user_id") * FACTOR + F.col("i"))
        .withColumn("ts", F.expr("ts + make_interval(0,0,0,0,0,i)"))
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(DIR10, "events.parquet"))
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") * FACTOR + F.col("i"))
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(DIR10, "embeddings.parquet"))
    )
    for tname in TABLES:
        dst = os.path.join(DIR10, f"{tname}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{tname}.parquet", dst)
    Path(DIR10, "_DONE").touch()


def timed(spark, fn, runs: int = 2) -> float:
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
    spark = build_session(app_name="ssk-scale-entries-r8")
    materialize(spark)
    out: dict = {
        "protocol": (
            "unmodified catalog entries run end-to-end (noop sink, "
            "min-of-2, deterministic unpersist + GC) against sf0.1 and a "
            "full-schema 10x synthetic sf-dir (perturbed keys, 1-token "
            "near-dup text deltas; non-replicated tables symlinked)"
        ),
        "factor": FACTOR,
        "rows": {},
    }
    for name in ENTRIES:
        fn = REGISTRY[name].fn

        def run(d, fn=fn):
            fn(spark, d).write.format("noop").mode("overwrite").save()

        run(SF_DIR)  # warm this entry's plan compilation once
        t1 = timed(spark, lambda: run(SF_DIR))
        t10 = timed(spark, lambda: run(DIR10))
        out["rows"][name] = {
            "t_1x_sec": t1,
            "t_10x_sec": t10,
            "time_ratio": round(t10 / t1, 2),
        }
        print(name, out["rows"][name], flush=True)
    Path("tools/scale_entries_r8.json").write_text(json.dumps(out, indent=1))
    print("wrote tools/scale_entries_r8.json")
    spark.stop()
