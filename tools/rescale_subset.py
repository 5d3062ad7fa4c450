"""Isolated re-measure of selected scale_check shapes (min-of-3, GC
between runs, idle host) — the [[bench-host-variance]] protocol applied
to scale ratios before believing a super-linear reading.

Usage: python tools/rescale_subset.py shape1 shape2 ...
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
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)


def main() -> None:
    names = sys.argv[1:]
    spark = build_session(app_name="ssk-rescale")
    sc._SPARK = spark
    sc.materialize(spark)
    sc.materialize_docs(spark)
    sc.materialize_events(spark)
    sc.materialize_parts(spark)
    sc.materialize_embeddings(spark)

    li1 = load_table(spark, sc.SF_DIR, "lineitem")
    o1 = load_table(spark, sc.SF_DIR, "orders")
    o10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "orders"))
    li10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "lineitem"))
    docs1 = load_table(spark, sc.SF_DIR, "documents").select("doc_id", "text")
    docs10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "documents"))
    ev1 = load_table(spark, sc.SF_DIR, "events")
    ev10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "events"))
    emb1 = load_table(spark, sc.SF_DIR, "embeddings")
    emb10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "embeddings"))
    part1 = load_table(spark, sc.SF_DIR, "part")
    part10 = spark.read.parquet(os.path.join(sc.SCALE_DIR, "part"))

    shapes = {
        "basket_affinity": (lambda: sc.basket_shape(li1), lambda: sc.basket_shape(li10)),
        "pagerank_5iter": (lambda: sc.pagerank_shape(li1), lambda: sc.pagerank_shape(li10)),
        "welch_t": (lambda: sc.welch_shape(li1), lambda: sc.welch_shape(li10)),
        "tree_ensemble_score": (
            lambda: sc.tree_score_shape(li1),
            lambda: sc.tree_score_shape(li10),
        ),
        "rolling_wau": (lambda: sc.wau_shape(ev1), lambda: sc.wau_shape(ev10)),
        "tfidf_topk": (lambda: sc.tfidf_shape(docs1), lambda: sc.tfidf_shape(docs10)),
        "feature_hashing": (
            lambda: sc.feat_hash_shape(docs1),
            lambda: sc.feat_hash_shape(docs10),
        ),
        "pca_gram": (lambda: sc.pca_gram_shape(emb1), lambda: sc.pca_gram_shape(emb10)),
        "countmin": (lambda: sc.countmin_shape(li1), lambda: sc.countmin_shape(li10)),
        "mad_2pass": (lambda: sc.mad_shape(ev1), lambda: sc.mad_shape(ev10)),
        "lpa_4rounds": (lambda: sc.lpa_shape(li1), lambda: sc.lpa_shape(li10)),
        "image_dhash": (lambda: sc.dhash_shape(docs1), lambda: sc.dhash_shape(docs10)),
        "poisson_bootstrap": (lambda: sc.bootstrap_shape(o1), lambda: sc.bootstrap_shape(o10)),
        "kcore_3peel": (lambda: sc.kcore_shape(li1), lambda: sc.kcore_shape(li10)),
        "cep_paths": (lambda: sc.cep_shape(ev1), lambda: sc.cep_shape(ev10)),
        "clamp_balance": (lambda: sc.clamp_shape(ev1), lambda: sc.clamp_shape(ev10)),
        "winnowing_fp": (lambda: sc.winnow_shape(docs1), lambda: sc.winnow_shape(docs10)),
        "ppjoin_exact": (lambda: sc.ppjoin_shape(docs1), lambda: sc.ppjoin_shape(docs10)),
        "snm_linear": (lambda: sc.snm_shape(docs1), lambda: sc.snm_shape(docs10)),
        "ts_subseq_search": (
            lambda: sc.tsss_shape(ev1),
            lambda: sc.tsss_shape(ev10),
        ),
        "ccstar_path": (
            lambda: sc.ccstar_path_shape(100_000),
            lambda: sc.ccstar_path_shape(1_000_000),
        ),
        "decontaminate": (
            lambda: sc.decon_shape(docs1),
            lambda: sc.decon_shape(docs10),
        ),
        "snm_multipass": (
            lambda: sc.snm_multipass_shape(docs1),
            lambda: sc.snm_multipass_shape(docs10),
        ),
        "skyline_2d": (lambda: sc.skyline_shape(part1), lambda: sc.skyline_shape(part10)),
        "full_dedup_pipeline": (
            lambda: sc.full_dedup_shape(docs1),
            lambda: sc.full_dedup_shape(docs10),
        ),
        "containment": (
            lambda: sc.containment_shape(docs1),
            lambda: sc.containment_shape(docs10),
        ),
        "audio_fingerprint": (
            lambda: sc.audio_fp_shape(docs1),
            lambda: sc.audio_fp_shape(docs10),
        ),
        "similarity_auto": (
            lambda: sc.sim_auto_shape(docs1),
            lambda: sc.sim_auto_shape(docs10),
        ),
        "link_prediction": (
            lambda: sc.linkpred_shape(li1),
            lambda: sc.linkpred_shape(li10),
        ),
    }
    # warmup
    sc.run_noop(lambda: sc.q1_shape(li1))
    out = {}
    for name in names:
        d1, d10 = shapes[name]
        t1 = min(sc.run_noop(d1) for _ in range(3))
        t10 = min(sc.run_noop(d10) for _ in range(3))
        out[name] = {
            "t_1x_sec": round(t1, 3),
            "t_10x_sec": round(t10, 3),
            "time_ratio": round(t10 / t1, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
