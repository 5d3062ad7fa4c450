"""Source/sink connector queries: text-format round-trips and partitioned
parquet writes.

The reference's only I/O is Kafka in / Kafka out (spark_entity_counter.py:
117-124, 147-156 — config-gated twins live in streaming/pipeline.py) plus
the NewsAPI HTTP producer modeled as the bounded ``documents`` fixture.
A complete engine must also cover the batch format surface users actually
exchange data through: CSV and JSON line sources with explicit schemas,
and hive-style partitioned parquet output whose partition column prunes at
read time. Each entry writes to a fixed per-process /tmp path (overwrite
mode, so repeated runs reuse the space) and returns a DataFrame computed
from the read-back side, oracle-checked against the original parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
from sparkstreamingrealtimedatawithkafka_spark.plans.registry import register

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"


def _scratch(name: str) -> str:
    base = os.path.join(
        tempfile.gettempdir(), f"ssk_connectors_{os.getpid()}", name
    )
    os.makedirs(os.path.dirname(base), exist_ok=True)
    return base


_ROUNDTRIP_ORACLE = """
SELECT lang,
       COUNT(*) AS n_csv,
       COUNT(*) AS n_json,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
"""


@register("source_csv_json_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def source_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON-lines connector round-trip: write ``documents`` out in
    both text formats, read each back with an explicit schema (no
    inference — inference is a full extra scan and non-deterministic under
    sampling; production readers declare schemas), and prove both sides
    reproduce the per-language counts of the parquet original.

    CSV goes out quoted (free text contains arbitrary punctuation) with
    header; JSON as line-delimited objects. Reading uses the same
    DataFrameReader path a 100 TB ingest would — splittable line formats
    parallelize per HDFS block, and the explicit schema keeps the read
    single-pass."""
    docs = t(spark, sf_dir, "documents")
    csv_path = _scratch("docs_csv")
    json_path = _scratch("docs_json")
    docs.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(csv_path)
    docs.write.mode("overwrite").json(json_path)
    from_csv = (
        spark.read.schema(_DOC_SCHEMA).option("header", "true").csv(csv_path)
    )
    from_json = spark.read.schema(_DOC_SCHEMA).json(json_path)
    c = from_csv.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_csv"),
        F.sum("n_chars").alias("sum_chars"),
    )
    j = from_json.groupBy("lang").agg(F.count(F.lit(1)).alias("n_json"))
    return c.join(j, "lang").select("lang", "n_csv", "n_json", "sum_chars")


_PARTITIONED_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE lang = 'en'
GROUP BY source
"""


@register("sink_partitioned_parquet", oracle=_PARTITIONED_ORACLE)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned read: write
    ``documents`` partitioned by ``lang``, then read back only the ``en``
    partition and aggregate it.

    The read filter on the partition column prunes directories at planning
    time — at 100 TB this is THE difference between scanning one
    language's files and scanning the world (the pruning is asserted in
    tests/test_plan_shapes.py, not just hoped for). The write side is the
    standard layout for a training corpus: partition by coarse routing
    keys (language, source, date), never by high-cardinality ones — a
    partition column with millions of values creates millions of tiny
    files and kills the namenode/listing path instead."""
    docs = t(spark, sf_dir, "documents")
    out = _scratch("docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
