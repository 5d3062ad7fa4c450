"""The reference pipeline end-to-end over Kafka-SHAPED records, no broker:
binary key/value + topic/partition/offset/timestamp columns (the Kafka
source schema, spark_entity_counter.py:117-124) flow through
parse_articles → entity_counts as a real streaming query, and the result
must equal the identical batch plan over the same records — Structured
Streaming's prefix-consistency contract."""

from __future__ import annotations

import json

from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
    entity_counts,
    parse_articles,
    run_to_memory,
)

KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _article(title: str, description: str, content: str) -> bytes:
    return json.dumps(
        {
            "source": {"id": None, "name": "t"},
            "author": "a",
            "title": title,
            "description": description,
            "url": "http://x",
            "publishedAt": "2026-01-01T00:00:00Z",
            "content": content,
            "fetchedAt": "2026-01-01T00:00:01Z",
            "query": "q",
        }
    ).encode()


def test_stream_equals_batch_over_kafka_shaped_records(spark, tmp_path):
    rows = [
        (None, _article("spark query", "the window", "join merge"), "t1", 0, 0, None, 0),
        (None, _article("customer batch", "", "stream table"), "t1", 0, 1, None, 0),
        (None, b"{broken json", "t1", 1, 0, None, 0),
        (None, None, "t1", 1, 1, None, 0),
    ]
    records = spark.createDataFrame(rows, KAFKA_SHAPE)
    src = str(tmp_path / "kafka_records")
    records.write.parquet(src)

    batch = {
        (r["entity"], r["cnt"])
        for r in entity_counts(parse_articles(spark.read.parquet(src))).collect()
    }

    stream = spark.readStream.schema(KAFKA_SHAPE).parquet(src)
    result = run_to_memory(
        entity_counts(parse_articles(stream)), output_mode="complete"
    )
    streamed = {(r["entity"], r["cnt"]) for r in result.collect()}

    assert streamed == batch
    assert batch == {
        ("spark", 1), ("query", 1), ("window", 1), ("join", 1), ("merge", 1),
        ("customer", 1), ("batch", 1), ("stream", 1), ("table", 1),
    }
