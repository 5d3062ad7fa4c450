"""Streaming keyed upsert (SCD-1 MERGE maintenance) via ``foreachBatch``.

The production pattern behind every streaming materialized dimension:
each micro-batch of change events MERGEs into a keyed target table so
the target always holds the latest record per key. Plain-parquet Spark
has no MERGE statement (that is a Delta/Iceberg layer over exactly this
dataflow), so the target is a VERSIONED parquet directory: batch ``k``
reads version ``k-1``, merges, and writes version ``k`` — the same
snapshot-isolation shape a table format provides, with replay
idempotence for free (re-running batch ``k`` rewrites ``v{k}`` from the
same ``v{k-1}``).

The merge itself is union + per-key max-struct re-aggregation, NOT a
full-outer join: latest-wins under a total order (ts, event_id) is an
ASSOCIATIVE and COMMUTATIVE fold, so the final state is invariant to how
the stream is sliced into micro-batches and to replay — the property the
entry's oracle (a plain argmax over the whole history) certifies. A
join-based MERGE (``merge_upsert_scd1``) computes the same rows but
would not commute across batches containing the same key twice.

Reference ancestry: this is the reference's running-state idea
(spark_entity_counter.py:139 — state merged across micro-batches) with
the state moved out of the state store into a versioned TABLE, the same
move ``streaming/incremental.py`` makes for corpus-scale dedup state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _version_dir(work_dir: str, batch_id: int) -> str:
    return f"{work_dir}/v{batch_id}"


def _exists(path: str) -> bool:
    p = path[len("file:"):] if path.startswith("file:") else path
    if "://" not in p:
        return os.path.isdir(p) and any(not e.startswith(".") for e in os.listdir(p))
    return True


def latest_per_key(df: DataFrame, key_col: str, ord_cols: list[str]) -> DataFrame:
    """Latest record per key under the (total) order of ``ord_cols``:
    one max-struct aggregate — mergeable partial state, no window, no
    join; the struct's field order IS the comparison order, so the last
    ``ord_cols`` entry must make the order total (a unique id) for the
    result to be deterministic."""
    others = [c for c in df.columns if c != key_col]
    ordered = ord_cols + [c for c in others if c not in ord_cols]
    return (
        df.groupBy(key_col)
        .agg(F.max(F.struct(*ordered)).alias("_s"))
        .select(key_col, "_s.*")
    )


def make_upsert_batch(
    spark: SparkSession, work_dir: str, key_col: str, ord_cols: list[str]
):
    """The per-micro-batch MERGE closure (exposed for direct testing of
    the replay/failure paths without driving a streaming query)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_per_key(batch_df, key_col, ord_cols)
        prior_dir = _version_dir(work_dir, batch_id - 1)
        if batch_id > 0:
            if not _exists(prior_dir):
                raise RuntimeError(
                    f"upsert target version {prior_dir} missing before batch "
                    f"{batch_id}; refusing to merge against an empty target"
                )
            prior = spark.read.parquet(prior_dir)
            merged = latest_per_key(
                prior.unionByName(latest), key_col, ord_cols
            )
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(_version_dir(work_dir, batch_id))

    return process


def upsert_query(
    spark: SparkSession,
    stream_df: DataFrame,
    work_dir: str,
    key_col: str,
    ord_cols: list[str],
):
    """Build the foreachBatch SCD-1 upsert query (caller starts it).

    Target layout: ``work_dir/v{k}`` is the full keyed state after batch
    ``k``. Batch cost is O(batch + |keys|) — the merge re-aggregates the
    prior snapshot union the batch's per-key latest; at 100 TB the
    snapshot side is the table-format MERGE target and only changed
    partitions rewrite, but the dataflow (batch-latest → keyed merge) is
    identical. A missing prior version under a non-zero batch id is a
    loud failure, never silently treated as an empty target (the
    round-5 advice posture: absorbing state-read errors as "first batch"
    corrupts the result instead of crashing the query).
    """

    process = make_upsert_batch(spark, work_dir, key_col, ord_cols)
    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
    )


def final_state(spark: SparkSession, work_dir: str) -> DataFrame:
    """Read the highest committed version of the upsert target."""
    versions = [
        int(e[1:])
        for e in os.listdir(work_dir)
        if e.startswith("v") and e[1:].isdigit()
    ]
    if not versions:
        raise RuntimeError(f"no upsert target versions under {work_dir}")
    return spark.read.parquet(_version_dir(work_dir, max(versions)))
