"""Sequence packing: concatenate a corpus in id order and cut it into
fixed-size token blocks — the GPT-style pretraining batch layout.

The defining primitive is a GLOBAL prefix sum of per-doc token counts,
the one window Spark cannot parallelize as written (empty partitionBy →
every row through one partition). ``pack_blocks`` implements the classic
two-level distributed scan instead:

1. within-CHUNK running sums, windowed by ``id div chunk`` — all chunks
   scan in parallel;
2. a chunk-totals prefix over #rows/chunk rows — the only global window,
   thousands of rows where the naive plan has billions;
3. a broadcast join stamps each chunk's offset back onto its rows.

Block membership is then a distributed ``sequence``+``explode`` span and
one groupBy on the block id. All arithmetic stays in BIGINT (``div``):
at 100 TB the token offsets exceed double's 2^53, so float-based floor()
would silently mis-assign blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def doc_offsets(
    df: DataFrame, id_col: str, n_col: str, chunk: int = 4096
) -> DataFrame:
    """(id, n, start): each doc's token offset in the id-ordered global
    concatenation, via the two-level distributed prefix sum. ``id_col``
    must be unique; ids need not be dense (``div chunk`` only needs
    order-compatible bucketing)."""
    d = df.select(
        F.col(id_col).alias("id"), F.col(n_col).cast("long").alias("n")
    ).withColumn("chunk", F.expr(f"id div {chunk}"))
    within = d.withColumn(
        "w", F.sum("n").over(W.partitionBy("chunk").orderBy("id")) - F.col("n")
    )
    offsets = (
        d.groupBy("chunk")
        .agg(F.sum("n").alias("ct"))
        .withColumn("off", F.sum("ct").over(W.orderBy("chunk")) - F.col("ct"))
        .select("chunk", "off")
    )
    return (
        within.join(F.broadcast(offsets), "chunk")
        .withColumn("start", F.col("off") + F.col("w"))
        .select("id", "n", "start")
    )


def pack_blocks(
    df: DataFrame, id_col: str, n_col: str, block: int = 512, chunk: int = 4096
) -> DataFrame:
    """(seq_id, n_docs, n_tokens) per fixed-size training block. Docs with
    n = 0 contribute nothing (they occupy no tokens). Every block except
    the last reports n_tokens == block by construction."""
    placed = doc_offsets(df, id_col, n_col, chunk).filter(F.col("n") > 0)
    spans = placed.select(
        "start",
        "n",
        F.explode(
            F.sequence(
                F.expr(f"start div {block}"), F.expr(f"(start + n - 1) div {block}")
            )
        ).alias("seq_id"),
    )
    occupancy = F.least(
        F.col("start") + F.col("n"), (F.col("seq_id") + 1) * block
    ) - F.greatest(F.col("start"), F.col("seq_id") * block)
    return spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(occupancy).cast("long").alias("n_tokens"),
    )
