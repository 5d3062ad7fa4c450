"""Third decade, completed: the five remaining 100x-sweep shapes at 1000x.

tools/scale1000_r8.json covered the relational trio (q1 / q3 / as-of)
and tools/scale1000_r9.json added the dedup + graph planes. This tool
times the REST of the ten-shape 100x sweep (tools/scale100_r8.json) at
1000x, so every headline shape has three measured decades:

- ``rolling_wau``       — exact 7-day distinct users, events 10M -> 100M
- ``bm25_search``       — BM25 top-k, documents 500k -> 5M (standard
                          FACTOR-family corpus, like the 100x sweep)
- ``tfidf_topk``        — TF-IDF keywords, same corpora as bm25
- ``basket_affinity``   — basket self-join, lineitem 60M -> 600M rows
- ``incremental_dedup`` — 10% delta vs full LSH index, on the
                          LINEAR-pair corpora (500k -> 5M docs) like
                          the r9 minhash row

MEMORY SIZING (the first attempt's lesson, kept in the protocol): at
the default local harness config (32g driver heap, 32 shuffle
partitions) the basket shape's 1000x collect_set aggregation OOMs the
executor (java.lang.OutOfMemoryError in a task -> SparkUncaughtException
-> context shutdown), and tfidf measured 13.33x for 10x data — each of
32 concurrent tasks buffering 1/32nd of a 600M-row aggregation is an
EXECUTOR-SIZING violation, not an engine defect. This run applies the
DEPLOY.md knobs a real 1000x deployment would: driver heap 96g and
shuffle partitions sized to volume (128; AQE still coalesces small
stages), identically at BOTH scales so the decade ratio stays
like-for-like. The r9b partial record at the default config
(rolling_wau 5.15x, bm25 8.87x, tfidf 13.33x) is preserved in
``default_config_partial`` for the honest before/after.

decade3_ratio = t(1000x)/t(100x); <= 10 is at-most-linear. min-of-2,
deterministic unpersist + GC. Output: tools/scale1000_r9b.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Unconditional (r9 advice): setdefault let an inherited smaller value
# (e.g. the 32g harness default) silently win while the protocol string
# claimed 96g. The effective value is also recorded into the JSON below.
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "96g"

import tools.scale_check as sc  # noqa: E402
from tools.scale1000_r9 import materialize_docs_linear, timed  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

SCALE100_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale100_r8")
SCALE1000_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale1000_r8")

if __name__ == "__main__":
    spark = build_session(app_name="ssk-scale1000-r9b", shuffle_partitions=128)
    sc._SPARK = spark

    sc.materialize_docs(spark)
    dir10 = sc.SCALE_DIR
    sc.FACTOR, sc.SCALE_DIR = 100, SCALE100_DIR
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)
    sc.FACTOR, sc.SCALE_DIR = 1000, SCALE1000_DIR
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)
    sc.FACTOR, sc.SCALE_DIR = 10, dir10

    docs100lin_dir = os.path.join(SCALE100_DIR, "documents_linear")
    docs1000lin_dir = os.path.join(SCALE1000_DIR, "documents_linear")
    materialize_docs_linear(spark, dir10, docs100lin_dir, replicas=10)
    materialize_docs_linear(spark, dir10, docs1000lin_dir, replicas=100)

    li100 = spark.read.parquet(os.path.join(SCALE100_DIR, "lineitem"))
    li1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "lineitem"))
    ev100 = spark.read.parquet(os.path.join(SCALE100_DIR, "events"))
    ev1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "events"))
    docs100 = spark.read.parquet(os.path.join(SCALE100_DIR, "documents"))
    docs1000 = spark.read.parquet(os.path.join(SCALE1000_DIR, "documents"))
    docs100lin = spark.read.parquet(docs100lin_dir)
    docs1000lin = spark.read.parquet(docs1000lin_dir)

    shapes = {
        "rolling_wau": (
            lambda: sc.wau_shape(ev100),
            lambda: sc.wau_shape(ev1000),
        ),
        "bm25_search": (
            lambda: sc.bm25_shape(docs100),
            lambda: sc.bm25_shape(docs1000),
        ),
        "tfidf_topk": (
            lambda: sc.tfidf_shape(docs100),
            lambda: sc.tfidf_shape(docs1000),
        ),
        "basket_affinity": (
            lambda: sc.basket_shape(li100),
            lambda: sc.basket_shape(li1000),
        ),
        "incremental_dedup": (
            lambda: sc.incr_dedup_shape(docs100lin),
            lambda: sc.incr_dedup_shape(docs1000lin),
        ),
    }
    out = {
        "effective_driver_memory": spark.conf.get("spark.driver.memory"),
        "protocol": (
            "third decade, remaining five 100x-sweep shapes: 100x -> 1000x "
            "(events 10M -> 100M, documents 500k -> 5M standard families "
            "for bm25/tfidf and linear-pair replicas for incremental "
            "dedup, lineitem 60M -> 600M), min-of-2, deterministic "
            "unpersist + GC; EXECUTOR SIZED FOR THE VOLUME per DEPLOY.md "
            "(driver heap 96g, shuffle partitions 128) identically at "
            "both scales; decade3_ratio = t(1000x)/t(100x)"
        ),
        "default_config_partial": {
            "note": (
                "first attempt at the default harness config (32g heap, "
                "32 shuffle partitions): basket_affinity OOMed a task at "
                "1000x (java.lang.OutOfMemoryError -> context shutdown) "
                "and tfidf ran super-linear — 32-way concurrency over a "
                "600M-row aggregation needs the executor sizing above, "
                "which is the point of recording it"
            ),
            "rolling_wau": {"t_100x_sec": 11.594, "t_1000x_sec": 59.675, "decade3_ratio": 5.15},
            "bm25_search": {"t_100x_sec": 4.241, "t_1000x_sec": 37.603, "decade3_ratio": 8.87},
            "tfidf_topk": {"t_100x_sec": 22.735, "t_1000x_sec": 303.035, "decade3_ratio": 13.33},
            "basket_affinity": {"t_1000x_sec": None, "error": "OOM (heap) in collect_set task"},
        },
        "rows": {},
    }
    for name, (m100, m1000) in shapes.items():
        sc.run_noop(m100)  # warm this shape's codegen before timing
        t100 = timed(m100)
        t1000 = timed(m1000)
        out["rows"][name] = {
            "t_100x_sec": t100,
            "t_1000x_sec": t1000,
            "decade3_ratio": round(t1000 / t100, 2),
        }
        print(name, out["rows"][name], flush=True)
    Path("tools/scale1000_r9b.json").write_text(json.dumps(out, indent=1))
    print("wrote tools/scale1000_r9b.json")
    spark.stop()
