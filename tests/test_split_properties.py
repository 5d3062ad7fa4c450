"""Properties of the round-5 search/split additions.

- split_train_valid_test: the assignment must be disjoint AND exhaustive
  (every doc in exactly one split), reproducible run-over-run, and STABLE
  under corpus growth — adding documents never reassigns an existing one
  (the property fraction-sampling cannot give).
- search_bm25_topk: scores must be positive, ranks contiguous from 1, and
  the ranking must respect the score ordering; a document containing a
  query term more often than another identical-length document must not
  rank below it.
- text_inverted_postings: df <= total_tf, doc-id bounds consistent, and
  the posting md5 must replay from the raw token stream.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
from sparkstreamingrealtimedatawithkafka_spark.plans._util import t

from conftest import SF_DIR


def _split_of(doc_id: int) -> str:
    c = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    if c in "0123456789ab":
        return "train"
    if c in "cd":
        return "valid"
    return "test"


def test_split_disjoint_exhaustive_and_reproducible(spark):
    docs = t(spark, SF_DIR, "documents")
    total = docs.count()
    out = {r["split"]: r for r in REGISTRY["split_train_valid_test"].fn(spark, SF_DIR).collect()}
    assert set(out) <= {"train", "valid", "test"}
    assert sum(r["n_docs"] for r in out.values()) == total, "splits must partition the corpus"
    # reproducible: an independent python-side md5 replay agrees per doc
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expected = {}
    for i in ids:
        expected[_split_of(i)] = expected.get(_split_of(i), 0) + 1
    got = {k: r["n_docs"] for k, r in out.items()}
    assert got == expected


def test_split_stable_under_growth(spark):
    """Adding rows must not move existing ones: the assignment of the
    original ids is identical when computed over a doubled corpus."""
    docs = t(spark, SF_DIR, "documents").select("doc_id")
    grown = docs.union(docs.select((F.col("doc_id") + 1_000_000).alias("doc_id")))
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c.isin(*"0123456789ab"), "train")
        .when(c.isin("c", "d"), "valid")
        .otherwise("test")
    )
    base = {r["doc_id"]: r["s"] for r in docs.withColumn("s", split).collect()}
    after = {
        r["doc_id"]: r["s"]
        for r in grown.withColumn("s", split).collect()
        if r["doc_id"] in base
    }
    assert base == after


def test_bm25_ranking_sane(spark):
    rows = REGISTRY["search_bm25_topk"].fn(spark, SF_DIR).collect()
    assert rows, "BM25 returned no hits on the fixture"
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in by_rank]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_inverted_postings_consistent(spark):
    out = REGISTRY["text_inverted_postings"].fn(spark, SF_DIR).collect()
    assert out
    toks = (
        t(spark, SF_DIR, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    raw = toks.distinct().collect()
    truth: dict[str, list[int]] = {}
    for r in raw:
        truth.setdefault(r["tok"], []).append(r["doc_id"])
    for r in out:
        assert r["df"] <= r["total_tf"]
        ids = sorted(truth[r["tok"]])
        assert r["first_doc"] == ids[0] and r["last_doc"] == ids[-1]
        md5 = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()
        assert r["posting_md5"] == md5, f"posting list mismatch for {r['tok']!r}"
