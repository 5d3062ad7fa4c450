"""Scale-up experiment: do the headline plans scale linearly?

Materializes a 10x copy of sf0.1's lineitem/orders (6M / 1.5M rows) by
exploding each row 10 times with perturbed keys (orderkey' = orderkey*10+i,
so key cardinality scales with data — duplicating keys would instead grow
groups), then times the q1 aggregation shape and the q3 join+agg shape at
1x and 10x and prints the scaling ratios.

A plan that holds at 100 TB should show time ratio ~= data ratio (linear):
sub-linear means fixed overhead still dominates at this size; super-linear
means a shuffle/skew/memory cliff — investigate before believing the 100 TB
story. Run: python tools/scale_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
)
from sparkstreamingrealtimedatawithkafka_spark.plans._util import cents  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: E402
from sparkstreamingrealtimedatawithkafka_spark.sources.registry import (  # noqa: E402
    load_table,
)

SF_DIR = "/root/testdata/sf0.1"
# v2: 10x orders now also jitters o_orderdate (+i days) so keyed change
# streams (SCD-2) genuinely grow 10x instead of collapsing in the groupBy
SCALE_DIR = os.path.join(os.environ.get("TMPDIR", "/tmp"), "ssk_scale10_v2")
FACTOR = 10


def materialize(spark) -> None:
    if os.path.exists(os.path.join(SCALE_DIR, "orders", "_SUCCESS")):
        return
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    (
        li.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") * FACTOR + F.col("i"))
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "lineitem"))
    )
    (
        orders.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") * FACTOR + F.col("i"))
        .withColumn(
            "o_orderdate",
            F.expr("o_orderdate + make_interval(0, 0, 0, i)"),
        )
        .drop("i")
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "orders"))
    )


def materialize_parts(spark) -> None:
    """10x part with keys scaled and names UNCHANGED — the record-linkage
    regime: the name vocabulary stays fixed while every name's group grows
    10x, which is exactly where pair-level fuzzy matching explodes and the
    collapse-first two-stage shape must stay linear."""
    if os.path.exists(os.path.join(SCALE_DIR, "part", "_SUCCESS")):
        return
    part = load_table(spark, SF_DIR, "part")
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    (
        part.select("p_partkey", "p_name", rep)
        .select(
            (F.col("p_partkey") * FACTOR + F.col("i")).alias("p_partkey"),
            "p_name",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "part"))
    )


def q1_shape(li):
    price, disc = cents("l_extendedprice"), cents("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(price * (F.lit(100) - disc)) / F.lit(10000.0)).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q3_shape(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def materialize_docs(spark) -> None:
    """10x documents as 10-way NEAR-DUPLICATE families (each replica gets
    one extra unique token), the realistic scaling regime for near-dup
    dedup: corpus grows 10x AND true near-dup pairs grow 10x (45 intra-
    family pairs per original doc) — bucket count must grow with the
    corpus for the LSH plan to stay linear."""
    if os.path.exists(os.path.join(SCALE_DIR, "documents", "_SUCCESS")):
        return
    docs = load_table(spark, SF_DIR, "documents")
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    (
        docs.select("doc_id", "text", rep)
        .select(
            (F.col("doc_id") * FACTOR + F.col("i")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" uniq"),
                (F.col("doc_id") * FACTOR + F.col("i")).cast("string"),
            ).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "documents"))
    )


def dedup_shape(docs):
    sh = docs.select("doc_id", TX.word_shingles("text", 2).alias("sh"))
    pairs = lsh_candidate_pairs(
        sh, "doc_id", "sh", num_hashes=64, bands=16, jaccard_threshold=0.4
    )
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


def incr_dedup_shape(docs):
    """dedup_incremental_batch's core: only pairs touching the 10% delta
    batch are expanded (delta bands vs full index), so cost must track the
    linear banding pass plus delta-proportional pair work — the contrast
    row for dedup_shape's full-corpus pairing under the same dup density."""
    from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import (
        incremental_lsh_pairs,
    )

    sh = docs.select("doc_id", TX.word_shingles("text", 2).alias("sh"))
    pairs = incremental_lsh_pairs(
        sh, F.col("doc_id") % 10 == 0, "doc_id", "sh",
        num_hashes=64, bands=16, jaccard_threshold=0.4,
    )
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


def materialize_events(spark) -> None:
    """10x events with key cardinality scaled (user_id' = user_id*10+i) and
    timestamps jittered per replica (+i minutes) so per-user series grow in
    count but session/gap structure stays realistic — the regime where the
    event-time family's shuffles (asof union-window, gap-fill grid,
    session merge) must stay linear."""
    if os.path.exists(os.path.join(SCALE_DIR, "events", "_SUCCESS")):
        return
    ev = load_table(spark, SF_DIR, "events")
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    (
        ev.select("event_id", "ts_us", "user_id", "event_type", "value", rep)
        .select(
            (F.col("event_id") * FACTOR + F.col("i")).alias("event_id"),
            (F.col("ts_us") + F.col("i") * 60_000_000).alias("ts_us"),
            (F.col("user_id") * FACTOR + F.col("i")).alias("user_id"),
            "event_type",
            "value",
        )
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .write.mode("overwrite")
        .parquet(os.path.join(SCALE_DIR, "events"))
    )


def asof_shape(ev):
    from sparkstreamingrealtimedatawithkafka_spark.operators.asof import asof_join

    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    j = asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload_cols=["p_event_id", "value"],
        tiebreak="p_event_id",
    )
    return j.agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents("value_r")).alias("v")
    )


def gapfill_shape(ev):
    US_H = 3_600_000_000
    b = ev.groupBy(
        "event_type", (F.expr(f"ts_us div {US_H}") * US_H).alias("bucket_us")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("sc"))
    bounds = b.groupBy("event_type").agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi", F.lit(US_H))).alias("bucket_us")
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = grid.join(b, ["event_type", "bucket_us"], "left").select(
        "event_type",
        "bucket_us",
        F.last("sc", ignorenulls=True).over(w).alias("filled"),
    )
    return filled.agg(F.count(F.lit(1)).alias("n"), F.sum("filled").alias("s"))


def scd2_shape(cust, orders):
    """The merge_scd2_history core (plans/relational.py): keyed change
    stream -> cumulative-balance window -> interval-assignment window. The
    10x side has 10x change rows per key (jittered dates), so this times
    the keyed-window-over-growing-stream regime the r4 verdict asked for."""
    from pyspark.sql.window import Window as W

    chg = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("eff"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("delta_cents"))
    )
    cum = W.partitionBy("k").orderBy("eff").rowsBetween(W.unboundedPreceding, 0)
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.lit("1990-01-01").cast("timestamp_ntz").alias("valid_from"),
        cents("c_acctbal").alias("bal_cents"),
    )
    changed = chg.join(cust, chg.k == cust.c_custkey).select(
        "k",
        F.col("eff").alias("valid_from"),
        (cents("c_acctbal") + F.sum("delta_cents").over(cum)).alias("bal_cents"),
    )
    versions = base.unionByName(changed)
    nxt = W.partitionBy("k").orderBy("valid_from")
    hist = versions.select(
        "k",
        "valid_from",
        "bal_cents",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        F.lead("valid_from").over(nxt).isNull().alias("is_current"),
    )
    return hist.agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.col("is_current").cast("long")).alias("n_current"),
    )


def fuzzy_shape(parts):
    """The fuzzy_match_twostage core: collapse identical names (linear
    shuffle), edit-distance match distinct names (vocabulary-bound). On
    the fixed-vocab 10x regime the match stage does not grow at all, so
    the whole shape must scale ~linearly with the collapse."""
    g = parts.groupBy("p_name").agg(
        F.min("p_partkey").alias("rep_id"), F.count(F.lit(1)).alias("n")
    )
    a = g.select(
        F.col("rep_id").alias("id_a"),
        F.col("p_name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok"),
    )
    b = g.select(
        F.col("rep_id").alias("id_b"),
        F.col("p_name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok_b"),
    )
    pairs = (
        a.join(b, (F.col("tok") == F.col("tok_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("n_a") * F.col("n_b")).alias("implied_id_pairs"),
    )


def bm25_shape(docs):
    """search_bm25_topk's core: term-filtered tf/df + one-row stats
    broadcast + global top-k. The wide ops key on the 3 query terms, so
    cost must track the (linear) tokenize/length pass, never pair counts."""
    from pyspark.sql.window import Window as W

    TERMS = ("stream", "window", "merge")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtoks = toks.filter(F.col("tok").isin(*TERMS))
    df_t = (
        qtoks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    tf = qtoks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(df_t, "tok").join(dl, "doc_id").crossJoin(F.broadcast(stats))
        .groupBy("doc_id").agg(F.sum(idf * tf_part).alias("score"))
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
    return top.agg(F.count(F.lit(1)).alias("n"), F.sum("score").alias("s"))


def pack_shape(docs):
    """pack_training_sequences' core: two-level distributed prefix sum
    (within-chunk windows + tiny chunk-offset prefix + broadcast join)
    then span-explode into 512-token blocks. Cost must track the linear
    tokenize/window pass; the only global window sees #docs/4096 rows."""
    from pyspark.sql.window import Window as W

    L, CHUNK = 512, 4096
    d = docs.select(
        "doc_id", F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("long").alias("n")
    ).withColumn("chunk", F.expr(f"doc_id div {CHUNK}"))
    within = d.withColumn(
        "w", F.sum("n").over(W.partitionBy("chunk").orderBy("doc_id")) - F.col("n")
    )
    offsets = (
        d.groupBy("chunk")
        .agg(F.sum("n").alias("ct"))
        .withColumn("off", F.sum("ct").over(W.orderBy("chunk")) - F.col("ct"))
        .select("chunk", "off")
    )
    placed = (
        within.join(F.broadcast(offsets), "chunk")
        .withColumn("start", F.col("off") + F.col("w"))
        .filter(F.col("n") > 0)
    )
    spans = placed.select(
        "start",
        "n",
        F.explode(
            F.sequence(F.expr(f"start div {L}"), F.expr(f"(start + n - 1) div {L}"))
        ).alias("seq_id"),
    )
    occ = F.least(F.col("start") + F.col("n"), (F.col("seq_id") + 1) * L) - F.greatest(
        F.col("start"), F.col("seq_id") * L
    )
    per_seq = spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(occ).alias("n_tokens")
    )
    return per_seq.agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))


def wau_shape(ev):
    """events_rolling_wau's core: 7x window-membership explode then
    per-day distinct. The fan-out is a fixed constant, so cost must track
    data linearly; output is bounded by day count."""
    contrib = ev.select(
        "user_id",
        F.expr("ts_us div 86400000000").alias("d0"),
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("d"),
    )
    wau = contrib.groupBy((F.col("d0") + F.col("d")).alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return wau.agg(F.count(F.lit(1)).alias("n"), F.sum("wau").alias("s"))


def basket_shape(li):
    """basket_affinity_lift's core: distinct baskets, self-join on the
    basket key (quadratic only in basket width), support joins. Pair
    counts grow linearly with orders, so cost must too."""
    b = li.select("l_orderkey", "l_partkey").distinct()
    a, c = b.alias("a"), b.alias("c")
    pair_n = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("c.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return pair_n.agg(F.count(F.lit(1)).alias("n"), F.sum("n_ab").alias("s"))


def run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = build_session(app_name="ssk-scale-check")
    materialize(spark)
    materialize_docs(spark)
    materialize_events(spark)
    materialize_parts(spark)

    li1 = load_table(spark, SF_DIR, "lineitem")
    o1 = load_table(spark, SF_DIR, "orders")
    li10 = spark.read.parquet(os.path.join(SCALE_DIR, "lineitem"))
    o10 = spark.read.parquet(os.path.join(SCALE_DIR, "orders"))
    docs1 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs10 = spark.read.parquet(os.path.join(SCALE_DIR, "documents"))
    ev1 = load_table(spark, SF_DIR, "events")
    ev10 = spark.read.parquet(os.path.join(SCALE_DIR, "events"))
    cust1 = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_acctbal")
    part1 = load_table(spark, SF_DIR, "part").select("p_partkey", "p_name")
    part10 = spark.read.parquet(os.path.join(SCALE_DIR, "part"))

    # warm up the JVM/codegen/readers so 1x isn't charged the boot cost
    run_noop(q1_shape(li1))
    run_noop(q3_shape(li1, o1))

    out = {"factor": FACTOR, "rows_1x": li1.count(), "rows_10x": li10.count()}
    for name, d1, d10 in (
        ("q1_agg", q1_shape(li1), q1_shape(li10)),
        ("q3_join_agg", q3_shape(li1, o1), q3_shape(li10, o10)),
        ("minhash_lsh_dedup", dedup_shape(docs1), dedup_shape(docs10)),
        ("incremental_dedup", incr_dedup_shape(docs1), incr_dedup_shape(docs10)),
        ("asof_join", asof_shape(ev1), asof_shape(ev10)),
        ("gapfill_resample", gapfill_shape(ev1), gapfill_shape(ev10)),
        ("merge_scd2", scd2_shape(cust1, o1), scd2_shape(cust1, o10)),
        ("fuzzy_twostage", fuzzy_shape(part1), fuzzy_shape(part10)),
        ("bm25_search", bm25_shape(docs1), bm25_shape(docs10)),
        ("pack_sequences", pack_shape(docs1), pack_shape(docs10)),
        ("rolling_wau", wau_shape(ev1), wau_shape(ev10)),
        ("basket_affinity", basket_shape(li1), basket_shape(li10)),
    ):
        t1 = min(run_noop(d1), run_noop(d1))
        t10 = min(run_noop(d10), run_noop(d10))
        out[name] = {
            "t_1x_sec": round(t1, 3),
            "t_10x_sec": round(t10, 3),
            "time_ratio": round(t10 / t1, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
