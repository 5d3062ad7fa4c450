"""Loopback fake-broker test (r7 verdict ask #6): exercise the CLI's LIVE
Kafka branch as far as this sandbox allows.

A minimal TCP responder satisfies ``kafka_broker_addr``'s probe, so
``main()`` selects the live branch and runs the REAL builder chain —
``spark.readStream.format("kafka").option(...).load()`` — against the
real session. The sandbox has no Kafka connector JAR (FIXTURES.md §E), so
``load()`` raises at the JVM boundary; the test records every
format/option call the real path makes on the way there (class-level
wrappers, not stubs — the recorded values went through the actual CLI
argv plumbing) and asserts the CLI fails GRACEFULLY (rc=2, a diagnostic
naming the connector artifact, no stack trace). After this, the only
untested surface is the broker protocol itself.
"""

from __future__ import annotations

import socket
import threading


def _fake_broker():
    """Minimal TCP responder: accepts connections and holds them open —
    enough to satisfy the probe's connect(); speaks no Kafka protocol."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    conns = []

    def loop():
        while True:
            try:
                c, _ = srv.accept()
                conns.append(c)
            except OSError:
                return

    threading.Thread(target=loop, daemon=True).start()
    return srv, srv.getsockname()[1]


def test_cli_live_branch_constructs_reference_options_and_fails_gracefully(
    spark, monkeypatch, capsys
):
    from pyspark.sql.streaming import readwriter

    from sparkstreamingrealtimedatawithkafka_spark.__main__ import main

    srv, port = _fake_broker()
    addr = f"127.0.0.1:{port}"
    monkeypatch.setenv("KAFKA_BOOTSTRAP_SERVERS", addr)

    events: list[tuple] = []
    real_format = readwriter.DataStreamReader.format
    real_option = readwriter.DataStreamReader.option
    real_load = readwriter.DataStreamReader.load

    def rec_format(self, name):
        events.append(("format", name))
        return real_format(self, name)

    def rec_option(self, key, value):
        events.append(("option", key, value))
        return real_option(self, key, value)

    def rec_load(self, *a, **kw):
        events.append(("load",))
        return real_load(self, *a, **kw)

    monkeypatch.setattr(readwriter.DataStreamReader, "format", rec_format)
    monkeypatch.setattr(readwriter.DataStreamReader, "option", rec_option)
    monkeypatch.setattr(readwriter.DataStreamReader, "load", rec_load)

    try:
        rc = main(
            [
                "--bootstrap-servers", addr,
                "--input-topic", "news-in",
                "--output-topic", "ents-out",
            ]
        )
    finally:
        srv.close()

    # graceful failure: diagnostic + rc 2, never an unhandled traceback
    assert rc == 2
    err = capsys.readouterr().err
    assert "could not start" in err and "FIXTURES.md" in err
    assert "Traceback" not in err

    # the REAL reader chain ran with the reference's exact source options
    # (spark_entity_counter.py:117-124), fed from the CLI argv
    assert ("format", "kafka") in events
    opts = {e[1]: e[2] for e in events if e[0] == "option"}
    assert opts == {
        "kafka.bootstrap.servers": addr,
        "subscribe": "news-in",
        "startingOffsets": "latest",
    }
    assert ("load",) in events  # it reached the JVM boundary


def test_cli_writer_contract_reaches_start_boundary(spark, monkeypatch):
    """The reader raises before the live branch reaches kafka_sink, so pin
    the writer half separately on a REAL streaming DataFrame: the real
    builder chain up to ``start()`` (intercepted — no broker protocol
    exists to talk to), carrying the reference's exact sink options
    (spark_entity_counter.py:147-156)."""
    from pyspark.sql.streaming import readwriter

    from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
        kafka_sink,
    )

    events: list[tuple] = []
    real_format = readwriter.DataStreamWriter.format
    real_option = readwriter.DataStreamWriter.option
    real_mode = readwriter.DataStreamWriter.outputMode
    real_trigger = readwriter.DataStreamWriter.trigger

    def rec_format(self, name):
        events.append(("format", name))
        return real_format(self, name)

    def rec_option(self, key, value):
        events.append(("option", key, value))
        return real_option(self, key, value)

    def rec_mode(self, mode):
        events.append(("outputMode", mode))
        return real_mode(self, mode)

    def rec_trigger(self, **kw):
        events.append(("trigger", tuple(sorted(kw.items()))))
        return real_trigger(self, **kw)

    def rec_start(self, *a, **kw):
        events.append(("start",))
        return None  # interception point: everything before this was real

    monkeypatch.setattr(readwriter.DataStreamWriter, "format", rec_format)
    monkeypatch.setattr(readwriter.DataStreamWriter, "option", rec_option)
    monkeypatch.setattr(readwriter.DataStreamWriter, "outputMode", rec_mode)
    monkeypatch.setattr(readwriter.DataStreamWriter, "trigger", rec_trigger)
    monkeypatch.setattr(readwriter.DataStreamWriter, "start", rec_start)

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    out = stream.selectExpr("CAST(value AS STRING) AS value")
    kafka_sink(out, "broker:9092", "ents-out", "/tmp/ckpt_loopback")

    assert ("format", "kafka") in events
    opts = {e[1]: e[2] for e in events if e[0] == "option"}
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "ents-out",
        "checkpointLocation": "/tmp/ckpt_loopback",
    }
    assert ("outputMode", "complete") in events
    assert ("trigger", (("processingTime", "30 seconds"),)) in events
    assert ("start",) in events
