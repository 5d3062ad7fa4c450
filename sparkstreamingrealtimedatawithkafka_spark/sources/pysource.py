"""Custom batch source via the Python DataSource API (Spark 4).

The reference's sources are Kafka (spark_entity_counter.py:117-124) and an
HTTP producer (news_producer.py) — i.e. "data arrives from a system Spark
has no built-in reader for". The engine's answer to that class of source is
the Python DataSource API: a pure-Python reader that still gets *planned
partitions* (one `read()` call per InputPartition, scheduled across
executors like any other scan) and *Arrow-batched* row production (the
reader yields pyarrow RecordBatches, not per-row tuples — the same
vectorized transfer path as pandas UDFs).

The concrete source here is deterministic-synthetic (id / bucket /
score_milli as pure integer arithmetic) so the DuckDB oracle can replay it
exactly from `range()`; a production HTTP/queue reader would keep the same
shape and swap the batch generator for client fetches, one shard per
partition.

Scale posture: `partitions()` is the parallelism contract — N partitions
fan out to N executor-side `read()` calls with no driver involvement in
the row path. State lives per-partition; nothing is collected.
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

# Knuth's multiplicative-hash constant: cheap deterministic pseudo-scores
# that DuckDB replays with plain BIGINT arithmetic (no float drift).
_MIX = 2654435761


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("ssk_synthetic").option("n", ...).load()`.

    Options: n (total rows, default 80_000), partitions (default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "ssk_synthetic"

    def schema(self) -> str:
        return "id bigint, bucket int, score_milli bigint"

    def reader(self, schema) -> "SyntheticReader":
        return SyntheticReader(self.options)


class SyntheticReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 80_000))
        self.num_parts = int(options.get("partitions", 8))
        # partitions=0 would yield an empty partition list — a source that
        # silently returns zero rows instead of erroring; negative values
        # produce nonsense ranges. Options are user input: validate loudly.
        if self.n < 0:
            raise ValueError(f"ssk_synthetic: n must be >= 0, got {self.n}")
        if self.num_parts < 1:
            raise ValueError(
                f"ssk_synthetic: partitions must be >= 1, got {self.num_parts}"
            )

        # Filter-pushdown bounds (Spark 4.1 pushFilters): the generated id
        # range narrows at PLANNING time, so pruned rows are never even
        # produced Python-side — the custom-source equivalent of parquet
        # row-group skipping.
        self.lo_bound = 0
        self.hi_bound = self.n

    def pushFilters(self, filters):
        """Accept range/equality predicates on ``id`` by narrowing the
        generated [lo, hi) span; everything else is yielded back for
        Spark to evaluate post-scan. Accepted filters are implemented
        EXACTLY (the span is the filter), so Spark is right to drop
        them. A production HTTP/queue source maps the same bounds onto
        its query parameters (time range, key prefix) — pushdown is how
        a custom source avoids full-feed fetches at 100 TB."""
        for f in filters:
            # attribute match alone isn't enough: IsNotNull carries no
            # .value, and semantics differ per filter class — dispatch on
            # (class, attribute, value-type) and yield back anything else.
            if getattr(f, "attribute", None) == ("id",) and hasattr(f, "value"):
                v = f.value
                if isinstance(f, GreaterThanOrEqual) and isinstance(v, int):
                    self.lo_bound = max(self.lo_bound, v)
                    continue
                if isinstance(f, GreaterThan) and isinstance(v, int):
                    self.lo_bound = max(self.lo_bound, v + 1)
                    continue
                if isinstance(f, LessThan) and isinstance(v, int):
                    self.hi_bound = min(self.hi_bound, v)
                    continue
                if isinstance(f, LessThanOrEqual) and isinstance(v, int):
                    self.hi_bound = min(self.hi_bound, v + 1)
                    continue
                if isinstance(f, EqualTo) and isinstance(v, int):
                    self.lo_bound = max(self.lo_bound, v)
                    self.hi_bound = min(self.hi_bound, v + 1)
                    continue
            yield f

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_parts)]

    def read(self, partition):
        # Contiguous id range per partition within the (possibly
        # filter-narrowed) span; executors run these in parallel. Arrow
        # batches keep the Python->JVM hop vectorized.
        i = partition.value
        span = max(self.hi_bound - self.lo_bound, 0)
        lo = self.lo_bound + span * i // self.num_parts
        hi = self.lo_bound + span * (i + 1) // self.num_parts
        step = 16_384
        for start in range(lo, hi, step):
            ids = list(range(start, min(start + step, hi)))
            yield pa.record_batch(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([x % 16 for x in ids], type=pa.int32()),
                    pa.array([(x * _MIX) % 1000 for x in ids], type=pa.int64()),
                ],
                names=["id", "bucket", "score_milli"],
            )


class SyntheticStreamDataSource(DataSource):
    """`spark.readStream.format("ssk_synthetic_stream")` — the STREAMING
    twin of ``ssk_synthetic`` through ``SimpleDataSourceStreamReader``: the
    engine drives offset-tracked incremental reads (`initialOffset` →
    `read(start) -> (rows, next)` per micro-batch, `readBetweenOffsets`
    for replay after restart), which is exactly the contract a custom
    HTTP/queue poller needs for exactly-once: offsets are committed to the
    checkpoint WAL, and a crashed batch is re-read BETWEEN the same
    offsets rather than re-fetched blindly (the reference's producer has
    at-most-once LRU dedup instead — news_producer.py:30-48 — because raw
    Kafka gives it no offset replay).

    Options: n (total rows), batch (rows per micro-batch). Emission stops
    advancing at n. Note Spark's AvailableNow falls back to a single batch
    for Python stream sources, so bounded runs see one batch of
    min(batch, n) rows; steady triggers page through batch-sized chunks
    (exercised in tests/test_python_stream_source.py).
    """

    @classmethod
    def name(cls) -> str:
        return "ssk_synthetic_stream"

    def schema(self) -> str:
        return "id bigint, bucket int, score_milli bigint"

    def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
        return SyntheticStreamReader(self.options)


def _rows_between(lo: int, hi: int):
    # a LIST, not a generator: the engine's prefetch cache copy.copy()s the
    # returned iterator when planning partitions, and generators are not
    # copyable (observed: PYTHON_STREAMING_DATA_SOURCE_RUNTIME_ERROR
    # "cannot pickle 'generator' object" under multi-batch paging)
    return [(i, i % 16, (i * _MIX) % 1000) for i in range(lo, hi)]


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 2000))
        self.batch = int(options.get("batch", 500))
        if self.n < 0:
            raise ValueError(f"ssk_synthetic_stream: n must be >= 0, got {self.n}")
        if self.batch < 1:
            raise ValueError(
                f"ssk_synthetic_stream: batch must be >= 1, got {self.batch}"
            )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch, self.n)
        return _rows_between(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed range — the recovery path
        return _rows_between(start["pos"], end["pos"])


def register_python_sources(spark) -> None:
    """Idempotently register the engine's Python data sources.

    Also enables Python-source filter pushdown (off by default in Spark
    4.1; a reader that implements ``pushFilters`` under the disabled
    conf fails loudly at planning rather than silently skipping
    pushdown — so the registration point is where the conf belongs)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticStreamDataSource)
