"""Structural guarantees of the near-dup dedup operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string").select(
        "id", F.split("text", " ").alias("toks")
    )


def test_identical_docs_always_pair_with_jaccard_one(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base),  # exact duplicate of 1 — identical shingle set
            (3, "one two three four five six seven eight"),  # disjoint
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_candidate_pairs(
            docs, "id", "toks", num_hashes=32, bands=8, jaccard_threshold=0.5
        ).collect()
    }
    # identical token sets ⇒ identical signatures ⇒ collide in EVERY band:
    # detection is guaranteed, not probabilistic
    assert pairs == {(1, 2): 1.0}


def test_simhash_identical_docs_same_signature(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "completely different words here"),
        ],
    )
    sigs = {r["id"]: r["sig"] for r in simhash_table(docs, "id", "toks").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_empty_token_docs_never_pair(spark):
    docs = spark.createDataFrame(
        [(1, []), (2, []), (3, ["x", "y"])], "id long, toks array<string>"
    )
    out = lsh_candidate_pairs(docs, "id", "toks", num_hashes=32, bands=8).collect()
    assert out == []


def test_max_bucket_cap_drops_monster_buckets_only(spark):
    """The opt-in runaway guard: a huge group of identical docs (one
    monster bucket per band) is dropped when over the cap, while normal
    near-dup pairs elsewhere in the corpus are untouched."""
    monster = [(i, "same same text here") for i in range(1, 41)]  # 40 identical
    normal = [(100, "quick brown fox jumps"), (101, "quick brown fox jumps")]
    docs = _docs(spark, monster + normal)

    capped = lsh_candidate_pairs(
        docs, "id", "toks", num_hashes=32, bands=8, jaccard_threshold=0.5,
        max_bucket=10,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}

    # default (no cap) stays exact: all 40*39/2 monster pairs present
    uncapped = lsh_candidate_pairs(
        docs, "id", "toks", num_hashes=32, bands=8, jaccard_threshold=0.5
    ).count()
    assert uncapped == 40 * 39 // 2 + 1

def test_max_bucket_cap_engages_with_observed_drops(spark):
    """Pathological corpus: 40 docs sharing one near-identical token set
    all land in the same LSH bucket in every band; with the cap on, those
    buckets are dropped (bounding the k²/2 expansion), the drop is
    *observed* (never silent), and well-behaved buckets still pair."""
    from pyspark.sql import Observation

    from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import bucket_pairs

    mega = [(i, 0, 7777) for i in range(40)]          # one 40-id bucket
    small = [(100, 1, 42), (101, 1, 42)]              # one healthy pair
    banded = spark.createDataFrame(
        mega + small, "id long, band int, bhash long"
    )
    obs = Observation("cap_test")
    pairs = bucket_pairs(
        banded, ["band", "bhash"], max_bucket=10, drop_observation=obs
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(100, 101)}
    assert obs.get["buckets_dropped"] == 1
    assert obs.get["ids_in_dropped_buckets"] == 40
    assert obs.get["max_bucket_size"] == 40


def test_max_bucket_cap_inert_on_healthy_corpus(spark):
    """With buckets under the cap, results are identical to the exact
    (uncapped) path and the observation reports zero drops."""
    from pyspark.sql import Observation

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [(1, base), (2, base), (3, "one two three four")])
    obs = Observation("inert_test")
    capped = lsh_candidate_pairs(
        docs, "id", "toks", num_hashes=32, bands=8,
        jaccard_threshold=0.5, max_bucket=512, drop_observation=obs,
    ).collect()
    exact = lsh_candidate_pairs(
        docs, "id", "toks", num_hashes=32, bands=8, jaccard_threshold=0.5
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, exact))
    assert obs.get["buckets_dropped"] == 0
    assert obs.get["ids_in_dropped_buckets"] == 0
