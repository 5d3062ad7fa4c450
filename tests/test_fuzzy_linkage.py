"""Fuzzy record linkage (composed-key blocking) invariants.

The round-4 verdict flagged that first-token-only blocking has CONSTANT
block cardinality on vocab-drawn names, so in-block pair expansion grows
quadratically with data. Round 5 composed the key with a name-length
bucket (neighbor-bucket emission). These tests pin the two claims that
make that safe:

1. recall identity — the composed key loses NO pair of the first-token
   ground truth at dist <= 3 (lengths of a dist<=3 pair differ by <= 3 <
   len_bucket, so they share a (token, bucket) cell);
2. the ``max_bucket`` cap drops oversized blocks loudly (observe metrics),
   never silently.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
    fuzzy_pairs_blocked,
)

from conftest import SF_DIR


def _ground_truth(parts):
    p = parts.select(
        "p_partkey",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"), "blk"
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
    )
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
        .select("id_a", "id_b", "dist")
    )


def test_composed_blocking_reproduces_ground_truth(spark):
    parts = t(spark, SF_DIR, "part")
    got = {tuple(r) for r in fuzzy_pairs_blocked(parts).collect()}
    want = {tuple(r) for r in _ground_truth(parts).collect()}
    assert want, "fixture produced no fuzzy pairs — test is vacuous"
    assert got == want


def test_composed_blocking_refines_block_count(spark):
    """The composed key must refine the partition: strictly more composite
    cells than first-token blocks. (On THIS fixture name lengths
    concentrate in one bucket, so the refinement barely shrinks the max
    block — which is exactly why ``fuzzy_match_twostage`` exists: on a
    fixed name vocabulary no blocking key can beat collapsing identical
    names first. The composed key still pays off on corpora with a real
    length spread, and the cap machinery bounds the rest.)"""
    parts = t(spark, SF_DIR, "part")
    n_tok_blocks = (
        parts.select(F.split_part("p_name", F.lit(" "), F.lit(1)).alias("tok"))
        .distinct()
        .count()
    )
    n_cells = (
        parts.select(
            F.split_part("p_name", F.lit(" "), F.lit(1)).alias("tok"),
            (F.length("p_name") / 8).cast("int").alias("blk"),
        )
        .distinct()
        .count()
    )
    assert n_cells > n_tok_blocks


def test_twostage_match_cost_is_vocab_bound(spark):
    """The two-stage entry's match input is distinct names — its size must
    equal the name vocabulary, not the row count."""
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    parts = t(spark, SF_DIR, "part")
    vocab = parts.select("p_name").distinct().count()
    assert vocab < parts.count() / 2, "fixture lost its name duplication"
    out = REGISTRY["fuzzy_match_twostage"].fn(spark, SF_DIR)
    # every output row pairs two distinct names: bounded by vocab²/2,
    # independent of corpus size
    assert out.count() <= vocab * (vocab - 1) / 2
    # group sizes must add back up to the corpus row count
    g = parts.groupBy("p_name").count()
    assert g.agg(F.sum("count")).first()[0] == parts.count()


def test_max_bucket_cap_drops_loudly(spark):
    parts = t(spark, SF_DIR, "part")
    obs = Observation("fuzzy-drops")
    capped = fuzzy_pairs_blocked(parts, max_bucket=3, drop_observation=obs)
    n_capped = capped.count()
    n_full = fuzzy_pairs_blocked(parts).count()
    m = obs.get
    assert m["buckets_dropped"] > 0, "cap of 3 should drop blocks on this corpus"
    assert m["ids_in_dropped_buckets"] > 0
    assert m["max_bucket_size"] > 3
    assert n_capped <= n_full
