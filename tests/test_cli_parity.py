"""CLI parity layer tests (r6 verdict ask #4): ``python -m
sparkstreamingrealtimedatawithkafka_spark`` exposes the reference's argparse
surface (spark_entity_counter.py:91-98) and, with no broker answering the
probe, runs the full article pipeline end-to-end on the hermetic file
twin via ``availableNow`` — asserted equal to the batch pipeline's counts
(Structured Streaming prefix consistency)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_parser_mirrors_reference_surface():
    from sparkstreamingrealtimedatawithkafka_spark.__main__ import build_parser

    args = build_parser().parse_args([])
    # Reference defaults (spark_entity_counter.py:92-97 / env fallbacks).
    assert args.bootstrap_servers == "localhost:9092"
    assert args.input_topic == "topic1"
    assert args.output_topic == "topic2"
    assert args.trigger == "30 seconds"
    assert args.app_name == "spark_entity_counter"

    custom = build_parser().parse_args(
        [
            "--bootstrap-servers", "broker:9093",
            "--input-topic", "a",
            "--output-topic", "b",
            "--trigger", "5 seconds",
            "--app-name", "x",
        ]
    )
    assert (custom.bootstrap_servers, custom.input_topic, custom.output_topic) == (
        "broker:9093", "a", "b",
    )


def test_cli_hermetic_end_to_end(spark, tmp_path):
    """No broker in this sandbox -> the CLI must fall back to the hermetic
    twin, drive it with availableNow, and produce exactly the batch
    pipeline's entity counts (value JSON: {entity, count, timestamp})."""
    from sparkstreamingrealtimedatawithkafka_spark.__main__ import main
    from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX

    out_dir = str(tmp_path / "cli_out")
    rc = main(
        [
            "--input-path", f"{SF_DIR}/documents.parquet",
            "--output-dir", out_dir,
        ]
    )
    assert rc == 0

    got = {
        (m["entity"], m["count"])
        for m in (
            json.loads(r["value"]) for r in spark.read.parquet(out_dir).collect()
        )
    }
    expected = {
        (r["entity"], r["cnt"])
        for r in (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.explode(TX.extract_entities("text")).alias("entity"))
            .groupBy("entity")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    assert got == expected and got, "CLI twin must match the batch pipeline"
