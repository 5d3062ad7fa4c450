"""Custom streaming SINK via the Python DataSource API (Spark 4) — the
write-side twin of sources/pysource.py, completing the custom-connector
matrix (batch read / stream read / stream write).

The reference's output is a Kafka producer (spark_entity_counter.py:147-156)
whose delivery guarantee is whatever the broker gives; this sink shows the
engine's contract for sinks Spark can't write natively (HTTP endpoints,
queues, bespoke file layouts): executor-side ``write(iterator)`` per
partition returning a commit message, then ONE driver-side ``commit(
messages, batchId)`` that atomically publishes the batch — a staged-file +
manifest protocol, so readers see only fully-committed batches and a
re-executed batch (failure replay) re-stages and re-publishes under the
same batchId instead of double-appending. That is exactly-once at the sink,
which the reference approximates producer-side with an LRU dedup
(news_producer.py:30-48).

Scale posture: the row path is executor-local (one staged file per
partition, no driver involvement); the driver handles only the O(#
partitions) commit messages per batch. A production variant would swap the
JSON-lines encoder for the target system's client and batch the writes;
the protocol shape is the point.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class StagedFile(WriterCommitMessage):
    path: str
    n_rows: int


class JsonLinesStreamWriter(DataSourceStreamWriter):
    def __init__(self, options) -> None:
        self.base = options.get("path")
        if not self.base:
            raise ValueError("ssk_jsonl_sink: 'path' option is required")

    def write(self, iterator) -> StagedFile:
        # executor-side: stage this partition's rows under a unique name;
        # nothing is visible to readers until the driver commits
        staging = os.path.join(self.base, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return StagedFile(path=path, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        # driver-side: publish atomically — move staged files into the data
        # dir and (over)write this batch's manifest LAST. A replayed batch
        # rewrites the same manifest, so readers never double-count.
        data_dir = os.path.join(self.base, "data")
        os.makedirs(data_dir, exist_ok=True)
        commits = os.path.join(self.base, "_commits")
        os.makedirs(commits, exist_ok=True)
        files = []
        for m in messages:
            if m is None or m.n_rows == 0:
                continue
            final = os.path.join(data_dir, os.path.basename(m.path))
            os.replace(m.path, final)
            files.append({"file": os.path.basename(final), "n_rows": m.n_rows})
        manifest = os.path.join(commits, f"{batchId}.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batchId": batchId, "files": files}, f)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLinesSinkDataSource(DataSource):
    """``df.writeStream.format("ssk_jsonl_sink").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "ssk_jsonl_sink"

    def schema(self) -> str:  # sinks never infer; declared for completeness
        return "id bigint"

    def streamWriter(self, schema, overwrite: bool) -> JsonLinesStreamWriter:
        return JsonLinesStreamWriter(self.options)


def committed_files(base: str) -> list:
    """Reader half of the protocol: the data files named by commit
    manifests, in batch order — staged or orphaned files are invisible."""
    commits = os.path.join(base, "_commits")
    if not os.path.isdir(commits):
        return []
    out = []
    for name in sorted(os.listdir(commits), key=lambda s: int(s.split(".")[0])):
        with open(os.path.join(commits, name)) as f:
            manifest = json.load(f)
        out.extend(os.path.join(base, "data", e["file"]) for e in manifest["files"])
    return out


def register_python_sinks(spark) -> None:
    """Idempotently register the engine's Python data sinks."""
    spark.dataSource.register(JsonLinesSinkDataSource)
