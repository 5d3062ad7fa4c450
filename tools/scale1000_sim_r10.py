"""Third decade for the SIMILARITY-SEARCH plane: 100x -> 1000x (r10).

The decade-3 table (tools/scale1000_r9.json / _r9b.json) covers
relational, dedup, graph, events, and text shapes; the ANN plane's scale
evidence stopped at decade 2. This closes it with the same protocol:

- ``sim_bruteforce_topk``: exact cosine top-10 for a FIXED 32-query set
  (replica-0 rows of original vec_ids 0..31, so query count is identical
  at every scale) against 200k / 2M corpus vectors (dim 64). The plan
  broadcasts the query side, so cost must track the corpus scan — the
  baseline every approximate variant is judged against.
- ``sim_ivf_topk``: the IVF scale path, identical parameters at both
  scales (16 centroids, probe 3, 2-pass Lloyd's — the driver holds only
  k x dim floats). Two linear corpus passes for centroids + a bucketed
  probe join; must also track the corpus linearly.

Corpora: sc.materialize_embeddings at FACTOR=100/1000 (per-replica
sign-flip of one dimension — value distribution preserved, Gram work
grows exactly Nx). decade3_ratio = t(1000x)/t(100x); <= 10 means the
third decade is at-most-linear. min-of-2 per scale after a codegen
warm-up, deterministic unpersist + GC, driver heap 96g + 128 shuffle
partitions at both scales (DEPLOY.md sizing, recorded into the JSON).
Run on an idle host. Output: tools/scale1000_sim_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["SPARK_GRAFT_DRIVER_MEM"] = "96g"

import tools.scale_check as sc  # noqa: E402
from tools.scale1000_r9 import timed  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402

TMP = os.environ.get("TMPDIR", "/tmp")
# 300x leg for the brute-force shape only (mirrors
# scale_tfidf_bandwidth_r10.py): the intermediate point splits the decade
# so a super-linear plan (rising leg ratio) is distinguishable from a
# bandwidth knee (flat-to-falling leg ratio). r11 advice: the committed
# record carried the 300x keys but this script did not produce them.
DIRS = {
    100: os.path.join(TMP, "ssk_scale100_r8"),
    300: os.path.join(TMP, "ssk_scale300_sim_r10"),
    1000: os.path.join(TMP, "ssk_scale1000_r8"),
}


def _queries(emb, factor):
    """Replica 0 of original vec_ids 0..31: exactly 32 query vectors at
    EVERY scale (vec_id = orig * factor + replica)."""
    from pyspark.sql import functions as F

    return emb.filter(
        (F.col("vec_id") % factor == 0) & (F.col("vec_id") / factor < 32)
    )


def bruteforce_shape(emb, factor):
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.operators.similarity import (
        brute_force_topk,
    )

    top = brute_force_topk(emb, _queries(emb, factor), k=10)
    return top.agg(F.count(F.lit(1)).alias("n"), F.sum("sim").alias("s"))


def ivf_shape(emb, factor):
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.operators.similarity import (
        ivf_topk,
    )

    top = ivf_topk(
        emb, _queries(emb, factor), k=10, n_centroids=16, n_probe=3
    )
    return top.agg(F.count(F.lit(1)).alias("n"), F.sum("sim").alias("s"))


if __name__ == "__main__":
    spark = build_session(app_name="ssk-scale1000-sim-r10", shuffle_partitions=128)
    sc._SPARK = spark

    for factor, out_dir in DIRS.items():
        sc.FACTOR, sc.SCALE_DIR = factor, out_dir
        sc.materialize_embeddings(spark)

    emb100 = spark.read.parquet(os.path.join(DIRS[100], "embeddings"))
    emb300 = spark.read.parquet(os.path.join(DIRS[300], "embeddings"))
    emb1000 = spark.read.parquet(os.path.join(DIRS[1000], "embeddings"))

    out = {
        "effective_driver_memory": spark.conf.get("spark.driver.memory"),
        "protocol": (
            "similarity plane, third decade: embeddings (dim 64) at 100x "
            "(200k vectors) and 1000x (2M) of the sf0.1 table via "
            "materialize_embeddings (per-replica sign-flip, Gram work "
            "grows exactly Nx); FIXED 32-query set (replica 0 of "
            "vec_ids 0..31) at both scales; identical operator params "
            "(k=10; IVF 16 centroids / probe 3 / 2-pass Lloyd's); "
            "min-of-2 after codegen warm-up, driver heap 96g + 128 "
            "shuffle partitions at both scales; decade3_ratio = "
            "t(1000x)/t(100x), <= 10 is at-most-linear"
        ),
        "rows": {},
    }
    shapes = {
        "sim_bruteforce_topk": (
            lambda: bruteforce_shape(emb100, 100),
            lambda: bruteforce_shape(emb1000, 1000),
        ),
        "sim_ivf_topk": (
            lambda: ivf_shape(emb100, 100),
            lambda: ivf_shape(emb1000, 1000),
        ),
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
        if name == "sim_bruteforce_topk":
            # intermediate 300x leg (brute force only — the exact baseline
            # whose linearity the approximate variants are judged against)
            t300 = timed(lambda: bruteforce_shape(emb300, 300))
            out["rows"][name]["t_300x_sec"] = t300
            out["rows"][name]["ratio_300_over_100"] = round(t300 / t100, 2)
            out["rows"][name]["ratio_1000_over_300"] = round(t1000 / t300, 2)
        print(name, out["rows"][name], flush=True)
    Path("tools/scale1000_sim_r10.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
