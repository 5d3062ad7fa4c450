"""Plan-contract tests for the Kafka source/sink builders.

No Kafka broker (or connector JAR) exists in this environment, so the
builders can't be *started* here — but their contract with the reference
(spark_entity_counter.py:117-124 source, :147-156 sink) is pure builder
state: format "kafka" plus a fixed option set. Recorder stubs stand in for
``spark.readStream`` / ``df.writeStream`` and capture exactly what the real
builders would hand to Spark, so the config surface is pinned without a
broker.
"""

from __future__ import annotations

from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
    kafka_sink,
    kafka_source,
)


class _RecorderBuilder:
    """Duck-types DataStreamReader/DataStreamWriter builder chains."""

    def __init__(self):
        self.format_name = None
        self.options = {}
        self.output_mode = None
        self.trigger_kwargs = None
        self.loaded = False
        self.started = False

    def format(self, name):
        self.format_name = name
        return self

    def option(self, key, value):
        self.options[key] = value
        return self

    def outputMode(self, mode):
        self.output_mode = mode
        return self

    def trigger(self, **kwargs):
        self.trigger_kwargs = kwargs
        return self

    def load(self):
        self.loaded = True
        return self

    def start(self):
        self.started = True
        return self


class _FakeSparkSession:
    def __init__(self, recorder):
        self._recorder = recorder

    @property
    def readStream(self):
        return self._recorder


class _FakeDataFrame:
    def __init__(self, recorder):
        self._recorder = recorder

    @property
    def writeStream(self):
        return self._recorder


def test_kafka_source_builds_reference_plan():
    rec = _RecorderBuilder()
    out = kafka_source(
        _FakeSparkSession(rec),
        bootstrap_servers="broker:9092",
        topic="news-articles",
        starting_offsets="latest",
    )
    assert out is rec and rec.loaded
    assert rec.format_name == "kafka"
    # the reference's exact source options (spark_entity_counter.py:117-124)
    assert rec.options == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "news-articles",
        "startingOffsets": "latest",
    }


def test_kafka_sink_builds_reference_plan():
    rec = _RecorderBuilder()
    out = kafka_sink(
        _FakeDataFrame(rec),
        bootstrap_servers="broker:9092",
        topic="entity-counts",
        checkpoint="/tmp/ckpt",
    )
    assert out is rec and rec.started
    assert rec.format_name == "kafka"
    # the reference's sink options + complete mode + 30 s processing-time
    # trigger (spark_entity_counter.py:147-156)
    assert rec.options == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "entity-counts",
        "checkpointLocation": "/tmp/ckpt",
    }
    assert rec.output_mode == "complete"
    assert rec.trigger_kwargs == {"processingTime": "30 seconds"}


def test_broker_probe_gates_registration():
    """The live-Kafka entries self-register ONLY when a broker answers
    (the TWS auto-gating pattern): in this sandbox the probe must return
    None quickly and the round-trip entry must be absent; with a local
    listener bound, the probe must find it."""
    import socket
    import threading

    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY
    from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (
        kafka_broker_addr,
    )

    assert kafka_broker_addr() is None
    assert "kafka_roundtrip_lang_counts" not in REGISTRY

    # bind an ephemeral listener and point the probe at it
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    t = threading.Thread(target=lambda: srv.accept(), daemon=True)
    t.start()
    import os

    old = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")
    os.environ["KAFKA_BOOTSTRAP_SERVERS"] = f"127.0.0.1:{port}"
    try:
        assert kafka_broker_addr() == f"127.0.0.1:{port}"
    finally:
        if old is None:
            os.environ.pop("KAFKA_BOOTSTRAP_SERVERS", None)
        else:
            os.environ["KAFKA_BOOTSTRAP_SERVERS"] = old
        srv.close()
