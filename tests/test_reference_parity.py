"""Reference failure-semantics parity (SURVEY.md §5.4).

The reference pipeline's silent-drop chain is load-bearing:
from_json PERMISSIVE (malformed → null struct,
/root/reference/app/spark_entity_counter.py:128) → concat_ws null-skip
(null fields vanish, :131) → explode drops empty arrays (:136) →
fail-soft UDF returns [] on any failure (:79-81).

One divergence from SURVEY.md §1.2 pinned here: the producer emits
``source`` as an object while the consumer schema types it StringType
(news_producer.py:127 vs spark_entity_counter.py:106). On this Spark
version from_json does NOT null the field — it passes the nested object
through as its raw JSON text; the whole row is nulled only for actually
malformed input. ARTICLE_SCHEMA_FIXED parses the object properly.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.functions.text import extract_entities_udf
from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
    ARTICLE_SCHEMA,
    ARTICLE_SCHEMA_FIXED,
    entity_counts,
    parse_articles,
)

ARTICLE = {
    "source": {"id": "x", "name": "Xinhua"},
    "title": "spark query",
    "description": "the window",
    "content": "join merge",
}


def _raw(spark, *values):
    return spark.createDataFrame([(v,) for v in values], "value binary")


def test_malformed_json_contributes_nothing(spark):
    raw = _raw(
        spark,
        json.dumps(ARTICLE).encode(),
        b"{definitely not json",
        None,
    )
    parsed = parse_articles(raw)
    texts = [r["text"] for r in parsed.collect()]
    # malformed/null rows survive as EMPTY text (concat_ws null-skip), not
    # as nulls and not as dropped rows
    assert sorted(texts) == ["", "", "spark query the window join merge"]

    counts = {r["entity"]: r["cnt"] for r in entity_counts(parsed).collect()}
    assert counts == {"spark": 1, "query": 1, "window": 1, "join": 1, "merge": 1}


def test_source_string_schema_passes_object_through_as_text(spark):
    raw = _raw(spark, json.dumps(ARTICLE).encode())
    legacy = (
        raw.selectExpr("CAST(value AS STRING) AS s")
        .select(F.from_json("s", ARTICLE_SCHEMA).alias("d"))
        .select("d.source")
        .first()["source"]
    )
    assert json.loads(legacy) == ARTICLE["source"]

    fixed = (
        raw.selectExpr("CAST(value AS STRING) AS s")
        .select(F.from_json("s", ARTICLE_SCHEMA_FIXED).alias("d"))
        .select("d.source.id", "d.source.name")
        .first()
    )
    assert (fixed["id"], fixed["name"]) == ("x", "Xinhua")


def test_udf_failsoft_on_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [("spark join",), ("",), (None,)], "text string"
    ).withColumn("entities", extract_entities_udf(F.col("text")))
    rows = {r["text"]: r["entities"] for r in df.collect()}
    assert rows["spark join"] == ["spark", "join"]
    assert rows[""] == []
    assert rows[None] == []
    # and after explode the empty arrays are gone — the reference's silent
    # drop of failed extractions (spark_entity_counter.py:136)
    n = df.select(F.explode("entities")).count()
    assert n == 2
