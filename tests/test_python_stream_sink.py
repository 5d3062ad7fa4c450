"""Python streaming sink (DataSourceStreamWriter) commit protocol.

The catalog entry (sink_python_stream_writer) proves the end-to-end
round-trip; here we pin the protocol invariants that give exactly-once:

- staged files are invisible until the driver commits the batch manifest;
- a replayed commit for the SAME batchId republishes instead of
  double-appending (manifest overwrite);
- abort removes staged files;
- multi-batch streams accumulate manifests in batch order.
"""

from __future__ import annotations

import json
import os

import pytest

from sparkstreamingrealtimedatawithkafka_spark.sources.pysink import (
    JsonLinesStreamWriter,
    StagedFile,
    committed_files,
)


class _Row:
    def __init__(self, **kw):
        self._d = kw

    def asDict(self):
        return self._d


def _write_partition(w, rows):
    return w.write(iter([_Row(**r) for r in rows]))


def test_staged_files_invisible_until_commit(tmp_path):
    base = str(tmp_path / "sink")
    w = JsonLinesStreamWriter({"path": base})
    m = _write_partition(w, [{"id": 1}, {"id": 2}])
    assert isinstance(m, StagedFile) and m.n_rows == 2
    assert committed_files(base) == [], "uncommitted data must be invisible"
    w.commit([m], batchId=0)
    files = committed_files(base)
    assert len(files) == 1
    lines = [json.loads(x) for x in open(files[0])]
    assert lines == [{"id": 1}, {"id": 2}]


def test_replayed_batch_does_not_double_count(tmp_path):
    base = str(tmp_path / "sink")
    w = JsonLinesStreamWriter({"path": base})
    w.commit([_write_partition(w, [{"id": 1}])], batchId=0)
    # failure replay: the engine re-runs batch 0 with fresh staged files
    w.commit([_write_partition(w, [{"id": 1}])], batchId=0)
    files = committed_files(base)
    assert len(files) == 1, "manifest overwrite must republish, not append"
    assert [json.loads(x) for x in open(files[0])] == [{"id": 1}]


def test_abort_removes_staged(tmp_path):
    base = str(tmp_path / "sink")
    w = JsonLinesStreamWriter({"path": base})
    m = _write_partition(w, [{"id": 9}])
    assert os.path.exists(m.path)
    w.abort([m], batchId=0)
    assert not os.path.exists(m.path)
    assert committed_files(base) == []


def test_multi_batch_order_and_empty_partitions(tmp_path):
    base = str(tmp_path / "sink")
    w = JsonLinesStreamWriter({"path": base})
    w.commit([_write_partition(w, [{"id": 0}]), _write_partition(w, [])], batchId=0)
    w.commit([_write_partition(w, [{"id": 1}])], batchId=1)
    files = committed_files(base)
    assert len(files) == 2  # empty partition staged nothing visible
    ids = [json.loads(open(f).readline())["id"] for f in files]
    assert ids == [0, 1], "batch order preserved"


def test_missing_path_option_fails_loudly():
    with pytest.raises(ValueError):
        JsonLinesStreamWriter({})
