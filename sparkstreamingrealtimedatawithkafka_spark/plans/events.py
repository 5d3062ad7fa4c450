"""Event-table queries: JSON scalar access, event-time windows (tumbling /
sliding / session), sessionization, first-per-key dedup.

These are the batch twins of the streaming semantics in
``streaming/pipeline.py`` (SURVEY.md §2.8 — the reference has *no* event-time
processing at all; its timestamps stay ISO strings, spark_entity_counter.py
never parses them — so this module is the engine's watermark-ready design).

Determinism: all window boundaries are computed/emitted as epoch
microseconds (longs) so results are independent of session timezone; the
DuckDB oracle uses ``epoch_ns(ts)//1000`` which matches the loader-derived
``ts_us`` (sources/registry.py:event_time_columns) exactly under either
physical ts type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sparkstreamingrealtimedatawithkafka_spark.operators.asof import asof_join
from sparkstreamingrealtimedatawithkafka_spark.operators.dedup import exact_dedup
from sparkstreamingrealtimedatawithkafka_spark.operators.skew import (
    spread_narrow_scan,
)
from sparkstreamingrealtimedatawithkafka_spark.plans._util import cents, sql_cents, t
from sparkstreamingrealtimedatawithkafka_spark.plans.registry import register

US_PER_DAY = 86_400_000_000
US_PER_12H = 43_200_000_000
US_PER_30MIN = 1_800_000_000


@register(
    "events_json_extract",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string scalar access (the batch analogue of the reference's
    Kafka-value parse, spark_entity_counter.py:127-128).

    The per-row JSON parse is the cost here and it sits in the
    aggregate's partial phase — on a narrow scan that means one core; the
    scan is spread by event_id (spread_narrow_scan — no-op at scale; the
    5-value group key itself would be a skewed spread) so parsing runs at
    cluster parallelism and only the 5-row partials cross the group
    exchange. Integer sums — partitioning cannot move the result."""
    ev = spread_narrow_scan(t(spark, sf_dir, "events"), "event_id")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_from_json_struct",
    oracle="""
SELECT event_type,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events
GROUP BY event_type
""",
)
def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema (PERMISSIVE, as the reference
    declares at spark_entity_counter.py:105-115,128) then struct access."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.max(F.col("p.k")).alias("max_k"),
        F.min(F.col("p.k")).alias("min_k"),
    )


_TUMBLING_ORACLE = f"""
SELECT (epoch_ns(ts)//1000)//{US_PER_DAY}*{US_PER_DAY} AS win_start_us,
       event_type,
       COUNT(*) AS n,
       SUM({sql_cents('value')})/100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_daily", oracle=_TUMBLING_ORACLE)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native tumbling window (1 day) aggregation; boundaries as epoch-us.

    Same ``window()`` expression works under ``readStream`` with a
    watermark — see streaming twins.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_SLIDING_ORACLE = f"""
SELECT ((epoch_ns(ts)//1000)//{US_PER_12H} - k.k)*{US_PER_12H} AS win_start_us,
       COUNT(*) AS n
FROM events
CROSS JOIN (VALUES (0), (1)) AS k(k)
GROUP BY 1
"""


@register("events_sliding_24h_12h", oracle=_SLIDING_ORACLE)
def events_sliding_24h_12h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (24 h window, 12 h slide): each event lands in two
    epoch-aligned windows; oracle replays that with a 2-row offset join."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("window.start")).alias("win_start_us"), "n")
    )


_SESSION_NATIVE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, epoch_ns(ts)//1000 AS us,
         CASE WHEN epoch_ns(ts)//1000
                   - lag(epoch_ns(ts)//1000)
                     OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000)
                   >= {US_PER_30MIN}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {US_PER_30MIN} AS session_end_us,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_seq
"""


@register("events_session_window", oracle=_SESSION_NATIVE_ORACLE)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30 min gap) per user — the engine's
    streaming-capable sessionization; oracle replays it as gaps-and-islands.
    ``session_window.end`` is last-event + gap by definition."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


_SESSION_STATS_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, epoch_ns(ts)//1000 AS us,
         CASE WHEN epoch_ns(ts)//1000
                   - lag(epoch_ns(ts)//1000)
                     OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000)
                   >= {US_PER_30MIN}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       COUNT(DISTINCT session_seq) AS n_sessions,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id
"""


@register("events_sessionization_stats", oracle=_SESSION_STATS_ORACLE)
def events_sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via lag + cumulative-sum islands (the classic
    gaps-and-islands rewrite of session windows)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts_us")
    order_w = W.partitionBy("user_id").orderBy("ts_us")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(order_w) >= US_PER_30MIN, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(order_w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return islands.groupBy("user_id").agg(
        F.countDistinct("session_seq").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts_us, event_id, value FROM (
    SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts)//1000
                              ORDER BY event_id DESC) AS rk
    FROM events WHERE event_type = 'purchase'
  ) WHERE rk = 1
)
SELECT c.event_id, c.user_id, c.ts_us,
       p.ts_us AS ts_us_r, p.event_id AS event_id_r, p.value AS value_r
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""


@register("events_asof_last_purchase", oracle=_ASOF_ORACLE)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator, operators/asof.py): each click gets the
    user's most recent purchase at or before it — the point-in-time
    enrichment Spark has no built-in for, planned as union + running-last
    (one shuffle on user_id, linear at scale). Oracle uses DuckDB's native
    ASOF LEFT JOIN."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    purchases = exact_dedup(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts_us", "event_id", "value"
        ),
        keys=["user_id", "ts_us"],
        order_by=[F.desc("event_id")],
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
    )


_ASOF_FWD_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts_us, event_id, value FROM (
    SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts)//1000
                              ORDER BY event_id) AS rk
    FROM events WHERE event_type = 'purchase'
  ) WHERE rk = 1
)
SELECT c.event_id, c.user_id, c.ts_us,
       CASE WHEN p.ts_us - c.ts_us <= {US_PER_DAY} THEN p.ts_us END AS ts_us_r,
       CASE WHEN p.ts_us - c.ts_us <= {US_PER_DAY} THEN p.event_id END AS event_id_r,
       CASE WHEN p.ts_us - c.ts_us <= {US_PER_DAY} THEN p.value END AS value_r
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
"""


@register("events_asof_next_purchase", oracle=_ASOF_FWD_ORACLE)
def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance window (the pandas merge_asof
    surface, operators/asof.py): each click gets the user's next purchase
    at or after it, but only if it lands within 24 hours — matches farther
    out are nulled, not dropped (attribution-window semantics). Same
    one-shuffle union + ordered-window plan as the backward entry, frame
    mirrored. Oracle: DuckDB native forward ASOF LEFT JOIN with a CASE
    tolerance mask."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_us")
    purchases = exact_dedup(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts_us", "event_id", "value"
        ),
        keys=["user_id", "ts_us"],
        order_by=[F.asc("event_id")],
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
        direction="forward",
        tolerance=US_PER_DAY,
    )


US_PER_HOUR = 3_600_000_000

_RANGE_FRAME_ORACLE = f"""
SELECT event_id, user_id,
  COUNT(*) OVER w AS n_trailing_1h,
  CAST(SUM({sql_cents('value')}) OVER w AS BIGINT) AS val_trailing_c
FROM (SELECT event_id, user_id, "value", epoch_ns(ts)//1000 AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {US_PER_HOUR} PRECEDING AND CURRENT ROW)
"""


@register("events_window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def events_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (trailing 1 hour by VALUE distance, not row
    count): per event, how many events / how much value the same user
    produced in the preceding hour — the sliding-lookback primitive that
    needs no self-join. Peers at an identical timestamp are all included,
    same as the oracle's RANGE semantics."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-US_PER_HOUR, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(cents("value")).over(w).alias("val_trailing_c"),
    )


@register(
    "events_dedup_first_per_key",
    oracle="""
SELECT user_id, event_type, event_id AS first_event_id, us AS first_ts_us
FROM (
  SELECT user_id, event_type, event_id, epoch_ns(ts)//1000 AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_ns(ts)//1000, event_id) AS rk
  FROM events
)
WHERE rk = 1
""",
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, event_type) — the deterministic batch
    form of streaming ``dropDuplicates`` (ancestor: the producer's LRUSet,
    news_producer.py:30-48)."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts_us").alias("first_ts_us"),
        )
    )


_FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(epoch_ns(ts)//1000) AS t_signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)//1000) AS t_view_us
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND epoch_ns(e.ts)//1000 > s.t_signup_us
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)//1000) AS t_purchase_us
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts)//1000 > v.t_view_us
  GROUP BY e.user_id
)
SELECT s.user_id, s.t_signup_us, v.t_view_us, p.t_purchase_us
FROM s LEFT JOIN v ON s.user_id = v.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


@register("events_funnel_conversion", oracle=_FUNNEL_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: per user, the first signup, the first view
    strictly AFTER that signup, and the first purchase strictly after that
    view — the sequence constraint is what makes this a funnel rather than
    three independent filters (a purchase before the view must NOT count).

    Three stage aggregations, each joined back to the event stream; every
    join and groupBy keys on user_id, so all stages reuse one partitioning
    — at scale this is one shuffle of the events table and then
    narrow-dependency stage chaining. Stage timestamps stay epoch-us longs
    end to end (no timezone in the comparison path)."""
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_signup_us"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts_us") > F.col("t_signup_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase_us"))
    )
    return (
        s.join(v, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_signup_us", "t_view_us", "t_purchase_us")
    )


_COHORT_ORACLE = f"""
WITH first AS (
  SELECT user_id, MIN((epoch_ns(ts)//1000)//{US_PER_DAY}) AS d0
  FROM events GROUP BY user_id
)
SELECT first.d0*{US_PER_DAY} AS cohort_day_us,
       (epoch_ns(e.ts)//1000)//{US_PER_DAY} - first.d0 AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users,
       COUNT(*) AS n_events
FROM events e JOIN first ON e.user_id = first.user_id
GROUP BY 1, 2
"""


@register("events_cohort_retention", oracle=_COHORT_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, activity
    counted per (cohort day, day offset) — the standard retention triangle.

    The first-seen aggregation and the final rollup both shuffle on
    user_id-derived keys; the cohort join is user_id-equi, so AQE reuses
    the aggregation's partitioning. Day arithmetic is integer division on
    epoch-us longs — no calendar/timezone functions anywhere near the
    grouping keys."""
    ev = t(spark, sf_dir, "events")
    day = F.lit(US_PER_DAY)
    first = ev.groupBy("user_id").agg(
        F.min(F.floor(F.col("ts_us") / day)).alias("d0")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            (F.col("d0") * day).alias("cohort_day_us"),
            (F.floor(F.col("ts_us") / day) - F.col("d0")).alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_VARIANT_ORACLE = """
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@register("events_variant_props", oracle=_VARIANT_ORACLE)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary-encoded variant, then typed
    ``variant_get`` path extraction under aggregation.

    This is the modern replacement for both of the engine's older JSON
    paths (``get_json_object`` re-parses the string per access;
    ``from_json`` needs the full schema up front): variant parses once,
    stores a compact binary encoding, and each path access is a cheap
    typed probe — the right default for schema-on-read event props at
    100 TB. The DuckDB oracle replays the same extraction with its JSON
    functions. Scan spread by event_id (spread_narrow_scan — no-op at
    scale) so the parse_json cost runs at cluster parallelism instead of
    in the single scan split's partial-aggregate phase; sums are BIGINT,
    so partitioning cannot move the result."""
    ev = spread_narrow_scan(t(spark, sf_dir, "events"), "event_id")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
        F.max(F.variant_get("v", "$.k", "bigint")).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


_VARIANT_MALFORMED_ORACLE = """
WITH c AS (
  SELECT event_type,
         -- TRY_CAST .. AS JSON is the total parse: NULL for malformed
         -- input. (A CASE WHEN json_valid(p) guard around
         -- json_extract_string(p, ..) is NOT safe in DuckDB — under
         -- vectorized evaluation at larger row counts the extract ran on
         -- guarded-out rows and threw Malformed JSON; observed at sf0.1.)
         TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'x' || props
                       WHEN event_id % 5 = 1 THEN '{"k": "s"}'
                       ELSE props END AS JSON) AS j
  FROM events
)
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN j IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unparseable,
  CAST(SUM(CASE WHEN j IS NOT NULL
                 AND TRY_CAST(json_extract_string(j, '$.k') AS BIGINT) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_type_mismatch,
  CAST(SUM(TRY_CAST(json_extract_string(j, '$.k') AS BIGINT))
       AS BIGINT) AS sum_k,
  CAST(SUM(CASE WHEN j IS NOT NULL
                 AND json_extract_string(j, '$.missing') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
FROM c
GROUP BY event_type
"""


@register("variant_malformed_probes", oracle=_VARIANT_MALFORMED_ORACLE)
def variant_malformed_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT error-path semantics: ``try_parse_json`` /
    ``try_variant_get`` over a deterministically corrupted props column —
    the PERMISSIVE null-row posture the reference relies on for malformed
    Kafka JSON (spark_entity_counter.py:128 via from_json's default mode,
    SURVEY §1.2), carried into the variant era.

    Three corruption classes by event_id: leading garbage (unparseable →
    try_parse_json yields NULL instead of failing the job — at 100 TB one
    poisoned record must never kill a scan), a string-typed ``k``
    (parseable, but the typed bigint probe nulls on the cast), and
    untouched rows. Null propagation is pinned per class: unparseable rows
    null every probe; type-mismatch rows null only the typed get; every
    parsed row nulls the absent ``$.missing`` path. The corruption uses
    LEADING garbage deliberately — Spark's parser tolerates trailing
    garbage after a complete JSON value where DuckDB's json_valid does
    not, so a trailing corruption would diverge between engines."""
    ev = t(spark, sf_dir, "events")
    p = (
        F.when(F.col("event_id") % 5 == 0, F.concat(F.lit("x"), F.col("props")))
        .when(F.col("event_id") % 5 == 1, F.lit('{"k": "s"}'))
        .otherwise(F.col("props"))
    )
    v = ev.select("event_type", F.try_parse_json(p).alias("v"))
    k_big = F.try_variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").isNull().cast("bigint")).alias("n_unparseable"),
        F.sum((F.col("v").isNotNull() & k_big.isNull()).cast("bigint")).alias(
            "n_type_mismatch"
        ),
        F.sum(k_big).alias("sum_k"),
        F.sum(
            (
                F.col("v").isNotNull()
                & F.try_variant_get("v", "$.missing", "bigint").isNull()
            ).cast("bigint")
        ).alias("n_missing_path"),
    )


US_PER_HOUR = 3_600_000_000

_GAPFILL_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         (epoch_ns(ts)//1000)//{US_PER_HOUR}*{US_PER_HOUR} AS bucket_us,
         COUNT(*) AS n_events,
         SUM({sql_cents('value')}) AS sum_cents
  FROM events GROUP BY 1,2
),
bounds AS (SELECT event_type, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM b GROUP BY 1),
grid AS (
  SELECT event_type, UNNEST(range(lo, hi + {US_PER_HOUR}, {US_PER_HOUR})) AS bucket_us
  FROM bounds
),
j AS (
  SELECT g.event_type, g.bucket_us, b.n_events, b.sum_cents
  FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.bucket_us = b.bucket_us
)
SELECT event_type, bucket_us,
       COALESCE(n_events, 0) AS n_events,
       last_value(sum_cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS filled_value
FROM j
"""


@register("events_gapfill_resample", oracle=_GAPFILL_ORACLE)
def events_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + resample (the hypertable ``time_bucket_gapfill``
    + ``locf`` pattern): hourly buckets per event_type, the COMPLETE hourly
    grid between each series' first and last bucket generated with
    ``sequence``+``explode``, missing buckets joined in as zero-count rows,
    and the last observed hourly value carried forward with
    ``last(ignorenulls)`` over an ordered window.

    Scale shape: the grid is generated distributed — one ``sequence`` array
    per series row, exploded executor-side (never a driver loop); the
    forward fill is one shuffle on the series key. Granularity is chosen so
    the per-series array stays bounded (hours over months ~ 10^3); for
    second-level grids over years, generate the grid from a range join
    against a bucket dimension instead of one giant array per row."""
    ev = t(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        (F.expr(f"ts_us div {US_PER_HOUR}") * US_PER_HOUR).alias("bucket_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("sum_cents"),
    )
    bounds = b.groupBy("event_type").agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(US_PER_HOUR))).alias("bucket_us"),
    )
    j = grid.join(b, ["event_type", "bucket_us"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "bucket_us",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.last("sum_cents", ignorenulls=True).over(w) / F.lit(100.0)).alias(
            "filled_value"
        ),
    )


_VARIANT_EXPLODE_ORACLE = """
WITH j AS (
  SELECT event_type AS et, "value" > 50 AS high, user_id % 10 AS u FROM events
),
kv AS (
  SELECT 'et' AS k, CAST(to_json(et) AS VARCHAR) AS v FROM j
  UNION ALL SELECT 'high', CAST(to_json(high) AS VARCHAR) FROM j
  UNION ALL SELECT 'u', CAST(to_json(u) AS VARCHAR) FROM j
)
SELECT k, COUNT(*) AS n,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_values
FROM kv
GROUP BY k
"""


@register("variant_explode_props", oracle=_VARIANT_EXPLODE_ORACLE)
def variant_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``variant_explode`` (Spark 4 table-valued generator): fan a variant
    OBJECT out into (key, value) rows — schema-on-read introspection for
    semi-structured props, the generator-plane sibling of the typed-path
    probes in events_variant_props.

    A mixed-type object (string / boolean / int) is synthesized per event
    so each key's value stream carries a different variant type; values
    normalize to their JSON text for the distinct count (the only
    cross-engine-stable encoding of a heterogeneous column). DuckDB
    replays with json_each. Lateral generators multiply rows 3x BEFORE
    the aggregation shuffle — fine here, but at 100 TB push any key
    filter INTO the generator's output before wide ops."""
    ev = t(spark, sf_dir, "events")
    obj = F.parse_json(
        F.to_json(
            F.struct(
                F.col("event_type").alias("et"),
                (F.col("value") > 50).alias("high"),
                (F.col("user_id") % 10).alias("u"),
            )
        )
    )
    # variant_explode is a table-valued generator: it lives in FROM with
    # LATERAL, not in a select list
    ev.select(obj.alias("v")).createOrReplaceTempView("events_vobj")
    return ev.sparkSession.sql(
        """
        SELECT e.key AS k,
               COUNT(*) AS n,
               COUNT(DISTINCT to_json(e.value)) AS n_distinct_values
        FROM events_vobj t, LATERAL variant_explode(t.v) e
        GROUP BY e.key
        """
    )


_US_HOUR = 3_600_000_000
_US_DAY = 24 * _US_HOUR

_INTERVAL_OVERLAP_ORACLE = f"""
WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
activity AS (
  SELECT user_id, (us // {_US_DAY}) * {_US_DAY} AS day_us,
         MIN(us) AS a_start, MAX(us) + 1 AS a_end
  FROM e GROUP BY 1, 2
),
incidents AS (
  SELECT (us // {_US_DAY}) * {_US_DAY} AS day_us,
         (us // {_US_HOUR}) * {_US_HOUR} AS b_start,
         (us // {_US_HOUR}) * {_US_HOUR} + {_US_HOUR} AS b_end
  FROM e WHERE event_type = 'error'
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= 2
)
SELECT a.user_id, a.day_us,
       COUNT(*) AS n_incidents,
       CAST(SUM(LEAST(a.a_end, i.b_end) - GREATEST(a.a_start, i.b_start))
            AS BIGINT) AS overlap_us
FROM activity a JOIN incidents i
  ON a.day_us = i.day_us AND a.a_start < i.b_end AND i.b_start < a.a_end
GROUP BY 1, 2
"""


@register("events_interval_overlap", oracle=_INTERVAL_OVERLAP_ORACLE)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (temporal algebra): per-user daily activity
    spans × error-incident windows (hours with >= 2 errors), keeping
    overlapping pairs and summing the overlap duration — 'how long was
    each user active during an incident'.

    Scale shape: a raw interval-overlap predicate is a theta join
    (nested-loop at any scale), so both interval sets carry a coarse
    time-bin equi key (the day) and the overlap condition rides as a
    residual on a hash join — the standard binning strategy for interval
    joins; intervals crossing a bin boundary would be emitted once per
    touched bin and deduped, which hour-in-day incidents never need.
    Durations are exact integer micros with half-open [start, end)
    intervals (a single-event span is one micro, never zero-length)."""
    ev = t(spark, sf_dir, "events")
    day = (F.col("ts_us") / _US_DAY).cast("bigint") * _US_DAY
    activity = ev.groupBy(
        "user_id", day.alias("day_us")
    ).agg(
        F.min("ts_us").alias("a_start"),
        (F.max("ts_us") + 1).alias("a_end"),
    )
    hour = (F.col("ts_us") / _US_HOUR).cast("bigint") * _US_HOUR
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(day.alias("day_us"), hour.alias("b_start"))
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= 2)
        .select("day_us", "b_start", (F.col("b_start") + _US_HOUR).alias("b_end"))
    )
    joined = activity.join(
        incidents,
        (activity.day_us == incidents.day_us)
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end")),
    )
    overlap = F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
    return joined.groupBy("user_id", activity.day_us.alias("day_us")).agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.sum(overlap).alias("overlap_us"),
    )


_DYN_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts)//1000 AS us,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN 1800000000 ELSE 600000000 END AS gap_us
  FROM events
),
o AS (
  SELECT *,
         MAX(us + gap_us) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM e
),
s AS (
  SELECT *,
         CAST(SUM(CASE WHEN prev_end IS NULL OR us >= prev_end
                       THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM o
)
SELECT user_id,
       CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id
"""


@register("events_session_dynamic_gap", oracle=_DYN_SESSION_ORACLE)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC, per-event gap
    (``session_window(ts, CASE ...)``): conversion events (purchase /
    signup) hold a session open 30 minutes, passive events only 10 — the
    real-world sessionization rule fixed-gap windows can't express.

    Same scale shape as the fixed-gap entry (one shuffle on the user key,
    in-partition interval merging); the oracle replays Spark's merge
    semantics exactly via the island technique — a session closes when
    the next event's start reaches the RUNNING MAX of extended ends
    (running max, not lag: a long-gap event can outlast several
    short-gap successors)."""
    ev = t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("purchase", "signup"), "30 minutes"
    ).otherwise("10 minutes")
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", gap).alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
    )


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts)//1000, event_id)
           AS next_type
  FROM events
),
n AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM n GROUP BY 1)
SELECT n.from_type, n.to_type, n.n,
       ROUND(n.n / tot.row_total, 4) AS p
FROM n JOIN tot USING (from_type)
"""


@register("events_transition_matrix", oracle=_TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov transition matrix: per user, order events by
    (event time, event_id tiebreak), pair each event with its successor
    via ``lead``, then count (from_type, to_type) transitions corpus-wide
    and normalize per from-state.

    The sequence pass is one keyed window (shards by user like every
    event-time op — no cross-user comparison anywhere); the count matrix
    is state-vocabulary-sized (|event_type|² rows), so the normalization
    join is trivially broadcast. The probability is one exact-integer
    division rounded at the very end, keeping the entry hash-exact."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    n = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = n.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return n.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("row_total"), 4).alias("p"),
    )


_PERCENTILE_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont("value", 0.5), 4) AS p50,
       ROUND(quantile_cont("value", 0.9), 4) AS p90,
       ROUND(quantile_cont("value", 0.99), 4) AS p99
FROM events
GROUP BY event_type
"""


@register("agg_exact_percentiles", oracle=_PERCENTILE_ORACLE)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (median / p90 / p99, linear
    interpolation) — the ground-truth complement to the mergeable
    ``agg_approx_sketches`` family: exact quantiles need the group's
    values together (one shuffle on the group key, per-group sort inside
    the aggregate buffer), which is affordable for bounded group counts
    and exactly what you run to VALIDATE the approx sketches' error
    bounds. At 100 TB with huge groups, approx_percentile is the default
    and this is the audit path. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the p*(n-1) linear-interpolation definition;
    the 4-dp round absorbs summation-order ulps."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


_HISTOGRAM_ORACLE = """
SELECT event_type,
       CAST(FLOOR("value" / 25.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       MIN("value") AS lo,
       MAX("value") AS hi
FROM events
GROUP BY 1, 2
"""


@register("events_value_histogram", oracle=_HISTOGRAM_ORACLE)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (bucket = value div 25):
    distribution profiling as a single map-side-combinable aggregation —
    the shape that replaces a driver-side ``collect`` + numpy histogram at
    scale. Bucket ids are exact integer floors; min/max are selections;
    nothing here can drift between engines."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


_COGROUP_ORACLE = f"""
WITH c AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events
           WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events
           WHERE event_type = 'purchase'),
cg AS (SELECT user_id, COUNT(*) AS n_clicks FROM c GROUP BY 1),
pg AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         SUM(CASE WHEN EXISTS (SELECT 1 FROM c
                               WHERE c.user_id = p.user_id
                                 AND c.us <= p.us
                                 AND c.us >= p.us - {US_PER_30MIN})
                  THEN 1 ELSE 0 END) AS n_attributed
  FROM p GROUP BY 1
)
SELECT COALESCE(cg.user_id, pg.user_id) AS user_id,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases,
       CAST(COALESCE(n_attributed, 0) AS BIGINT) AS n_attributed
FROM cg FULL OUTER JOIN pg ON cg.user_id = pg.user_id
"""


@register("cogroup_click_attribution", oracle=_COGROUP_ORACLE)
def cogroup_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-input grouped-map surface:
    clicks and purchases grouped on user_id arrive as SEPARATE pandas
    frames per key, and arbitrary Python merges them (here last-click
    attribution: a purchase is attributed when some click by the same user
    precedes it within 30 minutes — a vectorized searchsorted, not a
    pairwise product).

    This is the escape hatch for per-key merge logic no join expresses
    (state-machine reconciliation, custom interval matching); the engine's
    asof_join covers the expressible case with pure DataFrame ops, and
    this entry pins the surface for the rest. Cogroup is key-outer: users
    with only one side present get the other as an empty frame. One
    shuffle per side on the key; Arrow-batched both ways."""
    import pandas as pd

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us")

    def merge(key, clicks_pdf: pd.DataFrame, purch_pdf: pd.DataFrame):
        import numpy as np

        cu = np.sort(clicks_pdf["ts_us"].to_numpy())
        pu = purch_pdf["ts_us"].to_numpy()
        if len(cu) and len(pu):
            idx = np.searchsorted(cu, pu, side="right") - 1
            ok = idx >= 0
            att = int((ok & (pu - cu[idx.clip(0)] <= 1_800_000_000)).sum())
        else:
            att = 0
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(cu)],
                "n_purchases": [len(pu)],
                "n_attributed": [att],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id bigint, n_clicks bigint, n_purchases bigint, n_attributed bigint",
        )
    )


# CDC snapshot windows: state(cutoff) = each user's last event value among
# events in the 7 days up to the cutoff. Jan 15 / Jan 30 00:00 UTC cutoffs
# sit inside the fixture's Jan 1-30 span at every SF (seed-stable).
_CDC_WINDOW_US = 7 * 86_400_000_000
_CDC_T1_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z
_CDC_T2_US = 1_706_572_800_000_000  # 2024-01-30T00:00:00Z

_CDC_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, value, epoch_ns(ts)//1000 AS ts_us FROM events
), s1 AS (
  SELECT user_id, CAST(ROUND(value*100,0) AS BIGINT) AS v FROM (
    SELECT user_id, value,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM ev
    WHERE ts_us > {_CDC_T1_US - _CDC_WINDOW_US} AND ts_us <= {_CDC_T1_US}
  ) WHERE rn = 1
), s2 AS (
  SELECT user_id, CAST(ROUND(value*100,0) AS BIGINT) AS v FROM (
    SELECT user_id, value,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM ev
    WHERE ts_us > {_CDC_T2_US - _CDC_WINDOW_US} AND ts_us <= {_CDC_T2_US}
  ) WHERE rn = 1
)
SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
  CASE WHEN s1.user_id IS NULL THEN 'insert'
       WHEN s2.user_id IS NULL THEN 'delete'
       ELSE 'update' END AS op,
  s1.v AS old_cents, s2.v AS new_cents
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s2.user_id IS NULL OR s1.v <> s2.v
"""


@register("events_cdc_snapshot_diff", oracle=_CDC_ORACLE)
def events_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture delta extraction: diff two keyed snapshots of
    per-user state (last event value in the 7 days before each cutoff)
    into insert / update / delete rows — the feed a MERGE consumes
    (``merge_upsert_scd1`` is the apply side; this entry PRODUCES the
    change set from raw history).

    Single-scan shape: each event is tagged with the snapshot windows it
    falls in via an array-``explode`` (an event in both windows
    contributes to both states — one pass over 100 TB of history, not one
    per snapshot), then one ``max_by`` aggregation per (user, snapshot)
    — map-side combinable, no per-user sort — and a conditional pivot to
    (old, new) per user. The update-vs-unchanged comparison runs on exact
    integer cents; unchanged rows are dropped so output is the true
    delta, bounded by changed keys, not corpus size. max_by orders by
    struct(ts_us, event_id) so concurrent-timestamp ties resolve
    deterministically on both engines."""
    ev = t(spark, sf_dir, "events")
    in1 = (F.col("ts_us") > _CDC_T1_US - _CDC_WINDOW_US) & (
        F.col("ts_us") <= _CDC_T1_US
    )
    in2 = (F.col("ts_us") > _CDC_T2_US - _CDC_WINDOW_US) & (
        F.col("ts_us") <= _CDC_T2_US
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        cents("value").alias("v"),
        F.explode(
            F.concat(
                F.when(in1, F.array(F.lit(1))).otherwise(F.array().cast("array<int>")),
                F.when(in2, F.array(F.lit(2))).otherwise(F.array().cast("array<int>")),
            )
        ).alias("snap"),
    )
    state = tagged.groupBy("user_id", "snap").agg(
        F.max_by("v", F.struct(F.col("ts_us"), F.col("event_id"))).alias("v")
    )
    wide = state.groupBy("user_id").agg(
        F.max(F.when(F.col("snap") == 1, F.col("v"))).alias("old_cents"),
        F.max(F.when(F.col("snap") == 2, F.col("v"))).alias("new_cents"),
    )
    old, new = F.col("old_cents"), F.col("new_cents")
    return wide.select(
        "user_id",
        F.when(old.isNull(), F.lit("insert"))
        .when(new.isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        "old_cents",
        "new_cents",
    ).filter(old.isNull() | new.isNull() | (old != new))


_PATHS_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS ts_us FROM events
), r AS (
  SELECT user_id, ts_us//{US_PER_DAY} AS day, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, ts_us//{US_PER_DAY}
                       ORDER BY ts_us, event_id) AS rn
  FROM ev
), p AS (
  SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, day
)
SELECT path, COUNT(*) AS cnt FROM p GROUP BY path
ORDER BY cnt DESC, path LIMIT 10
"""


@register("events_session_paths", oracle=_PATHS_ORACLE)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining: the 10 most common session-opening paths
    (first 3 event types per user-day, in event-time order) — the
    behavioral-analytics complement of ``events_transition_matrix``
    (which sees only adjacent pairs; paths keep order across 3 steps).

    Shape: one row_number window partitioned by (user, day) — map-side
    prunable to rank<=3 by WindowGroupLimit — then an ORDERED path
    assembly (array_sort over (rn, type) structs → concat_ws; collect_list
    alone is partition-order-dependent and could never hash-check) and a
    count groupBy whose key space is bounded by |event_types|³, not
    corpus size. Deterministic ordered LIMIT (cnt desc, path asc)."""
    ev = t(spark, sf_dir, "events")
    day = F.expr(f"ts_us div {US_PER_DAY}")
    w = W.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    ranked = (
        ev.withColumn("day", day)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    paths = ranked.groupBy("user_id", "day").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(10)
    )


# Rolling z-score frame: the 10 events preceding the current one, per user.
_Z_K = 10

_ZSCORE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(ROUND(value*100,0) AS BIGINT) AS c,
         epoch_ns(ts)//1000 AS ts_us
  FROM events
), f AS (
  SELECT user_id, event_id, c,
    CAST(SUM(c)   OVER w AS BIGINT) AS s1,
    CAST(SUM(c*c) OVER w AS BIGINT) AS s2,
    COUNT(*) OVER w AS k
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN {_Z_K} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, c,
  ROUND((c*{_Z_K} - s1) / sqrt((s2*{_Z_K} - s1*s1) * {_Z_K}.0 / {_Z_K - 1}.0), 4) AS z
FROM f
WHERE k = {_Z_K}
  AND (c*{_Z_K} - s1)*(c*{_Z_K} - s1)*{_Z_K - 1} > 4 * {_Z_K} * (s2*{_Z_K} - s1*s1)
"""


@register("events_anomaly_zscore", oracle=_ZSCORE_ORACLE)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value deviates
    more than 2σ from the trailing 10-event window of the same user — the
    monitoring/outlier-scrub primitive.

    The whole detector is built from EXACT integers: the frame carries
    SUM(cents) and SUM(cents²) (order-independent int64 aggregates), and
    the |z| > 2 cut is an algebraically-cleared integer comparison
    ((ck−S1)²(k−1) > 4k(S2k−S1²)) so no float rounding can flip a
    marginal row between engines — ``stddev`` window aggregates use
    different accumulation algorithms per engine and can NEVER gate a
    hash-checked filter. The reported z is computed from those same
    integers with an expression-identical formula, so the doubles match
    bit-for-bit. One window per user (event-time ordered, rows frame);
    partial windows (first 10 events) are excluded by the frame count."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", cents("value").alias("c")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-_Z_K, -1)
    )
    k, km1 = _Z_K, _Z_K - 1
    f = ev.select(
        "user_id",
        "event_id",
        "c",
        F.sum("c").over(w).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    dev = F.col("c") * k - F.col("s1")
    var_num = F.col("s2") * k - F.col("s1") * F.col("s1")
    z = dev / F.sqrt(var_num * float(k) / float(km1))
    return (
        f.filter(F.col("k") == k)
        .filter(dev * dev * km1 > 4 * k * var_num)
        .select("user_id", "event_id", "c", F.round(z, 4).alias("z"))
    )


_WAU_ORACLE = f"""
WITH ev AS (
  SELECT user_id, (epoch_ns(ts)//1000)//{US_PER_DAY} AS day FROM events
), contrib AS (
  SELECT DISTINCT user_id, day + d AS window_end
  FROM ev, unnest(generate_series(0, 6)) AS t(d)
)
SELECT window_end AS day, COUNT(DISTINCT user_id) AS wau
FROM contrib GROUP BY window_end
"""


@register("events_rolling_wau", oracle=_WAU_ORACLE)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the product-analytics
    staple that needs DISTINCT over a sliding window, which no window
    frame can express: each event instead CONTRIBUTES to the seven
    windows ending on days d..d+6 (a 7x ``explode`` fan-out — the
    standard exact shape), then one distinct-count per window-end day.

    The fan-out multiplies rows BEFORE the distinct, so the shuffle
    carries (user, window_end) pairs pre-deduplicated map-side; day
    count bounds the output. At extreme scale the fan-out swaps for the
    mergeable HLL sketches (``agg_hll_sketch_mergeable``) with one
    sketch per day unioned over the window — this entry is the exact
    ground truth that approach is audited against. Edge windows (first/
    last 6 days) are partial by construction, identically in both
    engines."""
    ev = t(spark, sf_dir, "events")
    contrib = ev.select(
        "user_id",
        F.expr(f"ts_us div {US_PER_DAY}").alias("d0"),
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("d"),
    )
    return contrib.groupBy((F.col("d0") + F.col("d")).alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )


_CHI2_ORACLE = """
WITH x AS (
  SELECT event_type, CASE WHEN "value" >= 50.0 THEN 1 ELSE 0 END AS hi
  FROM events
), o AS (
  SELECT event_type, hi, COUNT(*) AS n FROM x GROUP BY event_type, hi
), margins AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_n FROM o GROUP BY event_type
), cols AS (
  SELECT hi, CAST(SUM(n) AS BIGINT) AS col_n FROM o GROUP BY hi
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS grand FROM o
)
SELECT o.event_type, o.hi, o.n,
  ROUND(CAST(row_n AS DOUBLE) * col_n / grand, 4) AS expected,
  ROUND(POW(o.n - CAST(row_n AS DOUBLE) * col_n / grand, 2)
        / (CAST(row_n AS DOUBLE) * col_n / grand), 4) AS chi2_term
FROM o JOIN margins USING (event_type) JOIN cols USING (hi) CROSS JOIN tot
"""


@register("events_chi2_independence", oracle=_CHI2_ORACLE)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence audit: the event_type × high/low-value
    contingency table with each cell's expectation and χ² contribution —
    the categorical-testing companion of ``ab_test_welch_t`` (summing
    chi2_term gives the statistic; cells are emitted so the analyst sees
    WHERE the dependence lives).

    One fact pass builds the observed table (integer counts); margins are
    two tiny re-aggregations of the CELL table (5×2 rows — never a second
    fact scan) joined back with the one-row grand total. All doubles
    derive from exact integers through expression-identical algebra."""
    ev = t(spark, sf_dir, "events")
    x = ev.select(
        "event_type", F.when(F.col("value") >= 50.0, 1).otherwise(0).alias("hi")
    )
    o = x.groupBy("event_type", "hi").agg(F.count(F.lit(1)).alias("n"))
    margins = o.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    cols = o.groupBy("hi").agg(F.sum("n").alias("col_n"))
    tot = o.agg(F.sum("n").alias("grand"))
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("grand")
    return (
        o.join(margins, "event_type")
        .join(F.broadcast(cols), "hi")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "hi",
            "n",
            F.round(expected, 4).alias("expected"),
            F.round(F.pow(F.col("n") - expected, 2) / expected, 4).alias("chi2_term"),
        )
    )


_EWMA_ORACLE = """
WITH x AS (
  SELECT user_id,
         list(CAST(CAST(ROUND("value"*100,0) AS BIGINT) AS DOUBLE)
              ORDER BY epoch_ns(ts)//1000, event_id) AS vs
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       list_reduce(vs, (acc, x) -> acc/2 + x/2) AS ewma_cents
FROM x
"""


@register("events_ewma_smoothing", oracle=_EWMA_ORACLE)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2) of each user's
    event values in time order — the recursive smoother behind monitoring
    baselines, which no window FRAME can express (every prefix value
    contributes with geometrically decaying weight).

    Hash-exactness discipline for a recursive float: both engines run the
    IDENTICAL left fold ``acc/2 + x/2`` over the IDENTICAL sequence —
    Spark as ``aggregate`` over an ``array_sort``-ordered per-user array
    (sorted on (ts, event_id) structs, because bare collect_list order is
    partition-dependent and could never hash-check), DuckDB as
    ``list_reduce`` over ``list(... ORDER BY ts, event_id)``. IEEE-754
    double ops are deterministic given the same operand order, so the
    results are bit-identical even where rounding occurs — the same
    sequential-fold argument as ``vector.dot``. Inputs are exact cents.

    Scale: one shuffle on user_id; per-user arrays are bounded by user
    activity (the same per-key-series posture as sessionization); the
    fold is O(events) inside the aggregation stage, no window, no second
    pass."""
    ev = t(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        F.struct(
            F.col("ts_us").alias("t"),
            F.col("event_id").alias("e"),
            F.expr('CAST(ROUND(value*100,0) AS BIGINT)').cast("double").alias("c"),
        ).alias("r"),
    )
    per = rows.groupBy("user_id").agg(
        F.transform(F.array_sort(F.collect_list("r")), lambda r: r["c"]).alias("vs")
    )
    ewma = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at("vs", 1),
        lambda acc, x: acc / 2 + x / 2,
    )
    return per.select(
        "user_id",
        F.size("vs").cast("long").alias("n_events"),
        ewma.alias("ewma_cents"),
    )


_GOLDEN_ORACLE = """
WITH base AS (
  SELECT user_id, event_type, "value", epoch_ns(ts)//1000 AS ts_us, event_id
  FROM events
), freq AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM base GROUP BY 1, 2
), modal AS (
  SELECT user_id, event_type AS modal_type FROM (
    SELECT user_id, event_type,
      ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY n DESC, event_type DESC) AS rk
    FROM freq
  ) WHERE rk = 1
), lastv AS (
  SELECT user_id, CAST(ROUND("value"*100,0) AS BIGINT) AS last_value_cents FROM (
    SELECT user_id, "value",
      ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY ts_us DESC, event_id DESC) AS rk
    FROM base
  ) WHERE rk = 1
), agg AS (
  SELECT b.user_id, COUNT(*) AS n_events,
         MIN(b.ts_us) AS first_us, MAX(b.ts_us) AS last_us,
         MAX(l.last_value_cents) AS last_value_cents
  FROM base b JOIN lastv l ON b.user_id = l.user_id
  GROUP BY b.user_id
)
SELECT a.user_id, n_events, first_us, last_us, last_value_cents, m.modal_type
FROM agg a JOIN modal m USING (user_id)
"""


@register("events_user_golden_record", oracle=_GOLDEN_ORACLE)
def events_user_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record assembly (survivorship rules) per user: event count,
    first/last seen, the LATEST value (most-recent-wins survivorship via
    ``max_by`` on the (ts, event_id) composite — the deterministic-
    tiebreak discipline from ``agg_argmax_minby``), and the MODAL event
    type (most-frequent-wins, ties to the lexicographically larger type
    via the (count, type) composite). The entity-resolution output stage:
    after dedup/linkage decides which rows are the same entity, this is
    how their fields merge into one profile.

    Scale: two aggregations — one over events keyed by user (map-side
    combinable max_by/min/max state), one vocabulary-bounded frequency
    table reduced by the same composite-max_by — joined on the user key.
    No windows, no sorts, no per-user arrays."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        F.expr('CAST(ROUND(value*100,0) AS BIGINT)').alias("cents"),
    )
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
        F.max_by("cents", F.struct("ts_us", "event_id")).alias("last_value_cents"),
    )
    freq = base.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    modal = freq.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("n", "event_type")).alias("modal_type")
    )
    return agg.join(modal, "user_id").select(
        "user_id", "n_events", "first_us", "last_us", "last_value_cents", "modal_type"
    )


_LIFECYCLE_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, (epoch_ns(ts)//1000) // 604800000000 AS week
  FROM events
), first_w AS (
  SELECT user_id, MIN(week) AS w0 FROM uw GROUP BY user_id
), classified AS (
  SELECT uw.user_id, uw.week,
    CASE WHEN uw.week = f.w0 THEN 'new'
         WHEN prev.user_id IS NOT NULL THEN 'retained'
         ELSE 'resurrected' END AS klass
  FROM uw JOIN first_w f USING (user_id)
  LEFT JOIN uw prev ON prev.user_id = uw.user_id AND prev.week = uw.week - 1
), churned AS (
  SELECT a.week + 1 AS week, 'churned' AS klass, COUNT(*) AS n
  FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week + 1
  WHERE b.user_id IS NULL AND a.week < (SELECT MAX(week) FROM uw)
  GROUP BY a.week + 1
)
SELECT week, klass, n FROM (
  SELECT week, klass, COUNT(*) AS n FROM classified GROUP BY week, klass
  UNION ALL
  SELECT week, klass, n FROM churned
)
"""


@register("events_growth_accounting", oracle=_LIFECYCLE_ORACLE)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: every (user, week) of activity classified as
    NEW (first-ever week), RETAINED (also active the prior week) or
    RESURRECTED (returning after a gap), plus per-week CHURNED counts
    (active in w-1, absent in w) — the DAU/WAU decomposition every
    growth team reports.

    Scale: distinct (user, week) is one shuffle; first-week is a MIN
    aggregate per user; prior-week membership is a SELF-EQUI-JOIN on
    (user, week-1) — never a window over a user's full history, so a
    years-long user costs rows, not sort width. Churn is the same
    anti-join shape grouped by week. All counts exact integers."""
    ev = t(spark, sf_dir, "events")
    wk = 604_800_000_000
    uw = ev.select(
        "user_id", F.expr(f"ts_us div {wk}").alias("week")
    ).distinct().localCheckpoint()
    first_w = uw.groupBy("user_id").agg(F.min("week").alias("w0"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"), F.lit(1).alias("had_prev"))
    classified = (
        uw.join(first_w, "user_id")
        .join(prev, ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("w0"), "new")
            .when(F.col("had_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("klass"),
        )
        .groupBy("week", "klass")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_week = uw.agg(F.max("week").alias("mx"))
    # churn via anti join: users active in w with no activity in w+1
    churned = (
        uw.alias("a")
        .join(
            uw.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.week") == F.col("a.week") + 1),
            "left_anti",
        )
        .crossJoin(F.broadcast(max_week))
        .filter(F.col("a.week") < F.col("mx"))
        .select((F.col("a.week") + 1).alias("week"), F.lit("churned").alias("klass"))
        .groupBy("week", "klass")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return classified.unionByName(churned)


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, (epoch_ns(ts)//1000) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT a.event_type, a.day, a.cents, p.cents AS pred_cents
  FROM daily a JOIN daily p
    ON p.event_type = a.event_type AND p.day = a.day - 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(cents - pred_cents)) AS BIGINT) AS abs_err_cents,
       CAST(SUM(ABS(cents - pred_cents)) // COUNT(*) AS BIGINT) AS mae_cents
FROM scored GROUP BY event_type
"""


@register("events_seasonal_naive_backtest", oracle=_SEASONAL_ORACLE)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting with the seasonal-naive baseline: predict
    each (event_type, day)'s revenue as the SAME WEEKDAY one week
    earlier, score by MAE — the benchmark every production forecast must
    beat before it ships, and the standard first rung of the M-competition
    ladder. The whole evaluation is exact integer cents (sum, abs-diff,
    integer-div MAE), so it hash-checks; a float MAPE never would.

    Scale: facts reduce to the (type, day) daily grid FIRST (one
    shuffle, map-side combinable), so the lag join runs on the
    series-sized grid, not events; the 7-day lag is a keyed EQUI-join on
    (type, day-7) — never a window over a series' full history, the same
    discipline as ``events_growth_accounting``. Scoring is one final
    vocabulary-sized aggregation."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("ts_us div 86400000000").alias("day"),
            F.expr("CAST(ROUND(value*100,0) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()
    )
    pred = daily.select(
        "event_type", (F.col("day") + 7).alias("day"), F.col("cents").alias("pred_cents")
    )
    scored = daily.join(pred, ["event_type", "day"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("pred_cents"))).alias("abs_err_cents"),
        F.expr("CAST(sum(abs(cents - pred_cents)) div count(1) AS BIGINT)").alias("mae_cents"),
    )


_ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT event_id AS pid, user_id, (epoch_ns(ts)//1000) AS pus,
         CAST(ROUND(value*100,0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, event_type AS channel, event_id AS tid,
         (epoch_ns(ts)//1000) AS tus
  FROM events WHERE event_type IN ('click', 'view')
), joined AS (
  SELECT p.pid, p.cents, t.channel, t.tus, t.tid
  FROM purchases p JOIN touches t
    ON t.user_id = p.user_id
   AND t.tus < p.pus AND t.tus >= p.pus - 604800000000
), ranked AS (
  SELECT pid, cents, channel,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tus, tid) AS rk,
         COUNT(*) OVER (PARTITION BY pid) AS k
  FROM joined
), credited AS (
  SELECT channel, cents,
    CASE WHEN k = 1 THEN 10000
         WHEN k = 2 THEN 5000
         WHEN rk = 1 OR rk = k THEN 4000
         ELSE 2000 // (k - 2) END AS bp
  FROM ranked
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(cents * bp) AS BIGINT) AS credited_cents_bp
FROM credited GROUP BY channel
"""


@register("events_attribution_position", oracle=_ATTRIBUTION_ORACLE)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every purchase
    distributes credit over the user's click/view touches in the prior
    7 days — 40% to the first touch, 40% to the last, 20% split across
    the middles (100% / 50-50 for 1- and 2-touch paths). Credit stays in
    exact integer cents x basis points (the middle split uses integer
    div with the deterministic drop-the-remainder rule both engines
    replay), so the channel totals hash-check — float credit shares
    never would.

    Scale: purchases and touches join on the USER key (keyed equi-join;
    the 7-day predicate evaluates inside it — per-user event lists are
    session-scale, the ``scd2_point_in_time_lookup`` argument); the
    first/last/middle classification is a rank + count window
    PARTITIONED BY purchase — conversion-path-sized partitions, never a
    user's full history. One final vocabulary-sized channel
    aggregation."""
    ev = t(spark, sf_dir, "events")
    wk = 604_800_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts_us").alias("pus"),
        F.expr("CAST(ROUND(value*100,0) AS BIGINT)").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("tid"),
        F.col("ts_us").alias("tus"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("tus") < F.col("pus")) & (F.col("tus") >= F.col("pus") - wk)
    )
    wp = W.partitionBy("pid")
    ranked = joined.select(
        "pid",
        "cents",
        "channel",
        F.row_number().over(wp.orderBy("tus", "tid")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("k"),
    )
    bp = (
        F.when(F.col("k") == 1, 10000)
        .when(F.col("k") == 2, 5000)
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("k")), 4000)
        .otherwise(F.expr("2000 div (k - 2)"))
    )
    return (
        ranked.withColumn("bp", bp)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.col("cents") * F.col("bp")).alias("credited_cents_bp"),
        )
    )


_ASOF_NEAREST_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts_us, event_id, value FROM (
    SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ns(ts)//1000
                              ORDER BY event_id) AS rk
    FROM events WHERE event_type = 'purchase'
  ) WHERE rk = 1
),
ranked AS (
  SELECT c.event_id, c.user_id, c.ts_us,
         p.ts_us AS ts_us_r, p.event_id AS event_id_r, p.value AS value_r,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(p.ts_us - c.ts_us),
                    CASE WHEN p.ts_us <= c.ts_us THEN 0 ELSE 1 END
         ) AS rn
  FROM clicks c LEFT JOIN purchases p ON c.user_id = p.user_id
)
SELECT event_id, user_id, ts_us, ts_us_r, event_id_r, value_r
FROM ranked WHERE rn = 1 OR rn IS NULL
"""


@register("events_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (the third pandas ``merge_asof`` direction,
    operators/asof.py): each click matches the user's closest purchase in
    EITHER time direction, equal distances resolving backward. Completes
    the as-of surface beside the backward (``events_asof_last_purchase``)
    and forward+tolerance (``events_asof_next_purchase``) entries.

    Scale: still ONE shuffle — nearest is NOT two as-of joins glued
    together; the single union + per-key ordered window pass evaluates
    the preceding and following frames simultaneously and a scalar CASE
    picks the closer candidate per row. The oracle replays the semantics
    as a per-click rank over all same-user purchases ordered by absolute
    distance with the backward preference — quadratic for DuckDB, linear
    for the engine, same rows."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = exact_dedup(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts_us", "event_id", "value"
        ),
        keys=["user_id", "ts_us"],
        order_by=[F.asc("event_id")],
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
        direction="nearest",
    )


@register("events_rolling_wau_hll")
def events_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users via MERGEABLE HLL SKETCHES — the
    documented extreme-scale escape hatch of ``events_rolling_wau``:
    ONE sketch per (day) aggregates all that day's users, and each
    window's estimate is the union of its seven daily sketches. Where
    the exact shape fans every EVENT out 7x before a distinct, this
    fans out only the per-day SKETCH ROWS (days x 7, kilobytes), so the
    fact-table cost is a single day-keyed aggregation no matter the
    window length.

    Rows-only by contract (DataSketches binaries have no DuckDB twin);
    tests/test_hll_wau.py pins the estimates within 5% of the exact
    entry per day — the audit relationship the exact entry's docstring
    promises. Same day domain as the exact entry (trailing partial
    windows included) so the two are row-for-row comparable."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr(f"ts_us div {US_PER_DAY}").alias("d0")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    contrib = daily.select(
        "d0", "sk", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k")
    )
    return (
        contrib.groupBy((F.col("d0") + F.col("k")).alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_approx"))
        .select("day", "wau_approx")
    )


_MAD_MEDIAN_CTE = """
cnt{i} AS (SELECT g, v, COUNT(*) AS c FROM {src} GROUP BY 1, 2),
cum{i} AS (
  SELECT g, v,
         SUM(c) OVER (PARTITION BY g ORDER BY v) AS cw,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM cnt{i}
),
med{i} AS (
  SELECT g, CAST(MIN(v) AS BIGINT) AS med, CAST(MIN(n) AS BIGINT) AS n
  FROM cum{i} WHERE cw >= (n + 1) // 2 GROUP BY g
)"""

_MAD_ORACLE = (
    "WITH c0 AS (SELECT event_type AS g, "
    + sql_cents('"value"')
    + " AS v FROM events),"
    + _MAD_MEDIAN_CTE.format(i=1, src="c0")
    + """,
d AS (
  SELECT c0.g, abs(c0.v - med1.med) AS v, med1.med AS med
  FROM c0 JOIN med1 ON med1.g = c0.g
),"""
    + _MAD_MEDIAN_CTE.format(i=2, src="d")
    + """
SELECT d.g AS event_type,
       MIN(d.med) AS median_cents,
       MIN(med2.med) AS mad_cents,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN d.v > 3 * med2.med THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN med2 ON med2.g = d.g
GROUP BY d.g
"""
)


@register("events_outlier_mad_2pass", oracle=_MAD_ORACLE)
def events_outlier_mad_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: per event
    type, the exact (lower) median, the exact MAD, and how many events
    sit beyond 3×MAD — the robust-statistics alternative to the z-score
    detector (``events_anomaly_zscore``), immune to the outliers it
    hunts (a mean/stddev cut moves WITH contamination; medians don't).

    Scale: each median is the two-pass histogram refinement
    (operators/orderstats.py — bucket scan + single-bucket refinement,
    bounded windows, BIGINT thresholds), so nothing ever sorts fact
    cardinality in one partition; the deviation pass joins the per-group
    median back as a BROADCAST (group-vocabulary rows). Everything is
    exact integer cents — the 3×MAD cut can't ulp-flip. The oracle
    affords direct cumulative scans; the engine never does.

    The deviation table is localCheckpointed: THREE consumers read it
    (the MAD's two histogram passes and the final outlier count), and
    as a derived self-reference each would otherwise replay the fact
    scan + median join ([[self-referencing-plan-recompute]]; min-of-3
    A/B at sf0.1: 2.25 s -> 1.62 s, outputs identical). It is a narrow
    (group, |v−med|, med) projection — the tokenize-once posture's
    spill-capable intermediate, not a corpus copy."""
    from sparkstreamingrealtimedatawithkafka_spark.operators.orderstats import (
        exact_median_2pass,
    )

    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), cents("value").alias("v")
    )
    m1 = exact_median_2pass(ev, "g", "v", width=1000)
    dev = (
        ev.join(
            F.broadcast(
                m1.select(F.col("g").alias("mg"), F.col("median").alias("med"))
            ),
            F.col("g") == F.col("mg"),
        )
        .select("g", F.abs(F.col("v") - F.col("med")).alias("dv"), "med")
        .localCheckpoint()
    )
    m2 = exact_median_2pass(
        dev.select("g", F.col("dv").alias("v")), "g", "v", width=1000
    ).select(F.col("g").alias("g2"), F.col("median").alias("mad"))
    return (
        dev.join(F.broadcast(m2), F.col("g") == F.col("g2"))
        .groupBy("g")
        .agg(
            F.min("med").alias("median_cents"),
            F.min("mad").alias("mad_cents"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("dv") > 3 * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
        .select(
            F.col("g").alias("event_type"),
            "median_cents",
            "mad_cents",
            "n_rows",
            "n_outliers",
        )
    )


_CLAMP_ORACLE = """
WITH x AS (
  SELECT user_id, epoch_ns(ts)//1000 AS us, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value*100,0) AS BIGINT)
              WHEN event_type = 'error'
              THEN -CAST(ROUND(value*100,0) AS BIGINT)
              ELSE 0 END AS delta
  FROM events
), s0 AS (
  SELECT user_id, us, event_id, delta,
         SUM(delta) OVER w AS run_sum
  FROM x
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  SELECT user_id, us, event_id, delta, run_sum,
         MIN(run_sum) OVER w AS run_min
  FROM s0
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), b AS (
  SELECT user_id, us, event_id, delta,
         run_sum - LEAST(CAST(0 AS BIGINT), run_min) AS bal,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rk
  FROM s
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(MAX(bal) AS BIGINT) AS max_balance_c,
       CAST(MAX(CASE WHEN rk = 1 THEN bal END) AS BIGINT) AS final_balance_c,
       CAST(SUM(CASE WHEN bal = 0 AND delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_floor_hits
FROM b GROUP BY user_id
"""


@register("events_clamped_running_balance", oracle=_CLAMP_ORACLE)
def events_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped-at-zero running balance — the credit/inventory recurrence
    ``b_t = max(0, b_{t-1} + x_t)`` that LOOKS inherently sequential (each
    row depends on the previous clamp) but has the closed form

        b_t = S_t - min(0, min_{k<=t} S_k)

    over plain prefix sums S: once the balance floors at zero the deficit
    is forgiven, and "total forgiven so far" is exactly the most negative
    prefix. So the recurrence becomes TWO stacked windows (running sum,
    then running min of it) — both partitioned by user and
    merge-computable, no sequential scan, no UDF. Purchases credit the
    account in cents, errors debit it; ``n_floor_hits`` counts debits
    absorbed by the floor.

    Scale: windows are per-user (keyed partitions, no global ordering);
    the identity is what turns a "must replay history in order" pattern
    into one exchange on the key — the same trick pack_blocks plays for
    global offsets. At 100 TB the only concern is a single user's history
    exceeding a partition, the standard mitigations (epoch checkpointing
    the balance, carrying S/min-S per epoch) compose because both
    statistics are associative."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(F.col("event_type") == "purchase", cents("value"))
        .when(F.col("event_type") == "error", -cents("value"))
        .otherwise(F.lit(0).cast("long"))
        .alias("delta"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = ev.withColumn("run_sum", F.sum("delta").over(w))
    b = s.withColumn("run_min", F.min("run_sum").over(w)).withColumn(
        "bal", F.col("run_sum") - F.least(F.lit(0).cast("long"), F.col("run_min"))
    )
    return b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("bal").alias("max_balance_c"),
        F.max_by("bal", F.struct("ts_us", "event_id")).alias("final_balance_c"),
        F.sum(
            F.when((F.col("bal") == 0) & (F.col("delta") < 0), 1).otherwise(0)
        ).alias("n_floor_hits"),
    )


_CEP_ORACLE = """
WITH seq AS (
  SELECT user_id,
         STRING_AGG(CASE event_type WHEN 'signup' THEN 's'
                                    WHEN 'click' THEN 'c'
                                    WHEN 'view' THEN 'v'
                                    WHEN 'purchase' THEN 'p'
                                    ELSE 'e' END, ''
                    ORDER BY epoch_ns(ts)//1000, event_id) AS path,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(LENGTH(REGEXP_REPLACE(path, 's[cv]*p', '#', 'g'))
            - LENGTH(REGEXP_REPLACE(path, 's[cv]*p', '', 'g')) AS BIGINT)
         AS n_conversions,
       CAST(CASE WHEN REGEXP_MATCHES(path, 'e{2}') THEN 1 ELSE 0 END AS BIGINT)
         AS has_error_burst
FROM seq
"""


@register("events_cep_pattern", oracle=_CEP_ORACLE)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the Flink CEP /
    MATCH_RECOGNIZE shape) expressed as a per-key ordered symbol string +
    regex: each user's event history becomes a compact path string (one
    char per event, time-ordered), and the pattern "signup, then any
    clicks/views, then purchase" is the regex ``s[cv]*p`` — counted
    non-overlapping (both engines scan leftmost-greedy, and the count is
    measured as the length drop from deleting matches vs replacing them
    with one sentinel char). ``e{2}`` flags users with back-to-back
    errors. The symbol encoding is the design point: pattern semantics
    live in ONE regex, not a join pyramid — compare
    ``events_funnel_conversion``, the 3-stage join formulation of the
    same question.

    Scale: one exchange on user_id; the path string is bounded by
    per-user history (chars, not structs). For unbounded histories the
    production form sessionizes first (events_session_window) so each
    matched string is session-sized; the regex pass itself is
    whole-stage-codegen string work, no UDF."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("s"))
        .when(F.col("event_type") == "click", F.lit("c"))
        .when(F.col("event_type") == "view", F.lit("v"))
        .when(F.col("event_type") == "purchase", F.lit("p"))
        .otherwise(F.lit("e"))
        .alias("code"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "code"))),
                lambda x: x["code"],
            ),
            "",
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return seq.select(
        "user_id",
        "n_events",
        (
            F.length(F.regexp_replace("path", r"s[cv]*p", "#"))
            - F.length(F.regexp_replace("path", r"s[cv]*p", ""))
        )
        .cast("long")
        .alias("n_conversions"),
        F.when(F.col("path").rlike("e{2}"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("has_error_burst"),
    )


_CUT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z, mid-fixture

_CUPED_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
           AS arm,
         CAST(COALESCE(SUM(CASE WHEN epoch_ns(ts)//1000 < {_CUT_US}
             THEN CAST(ROUND(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN epoch_ns(ts)//1000 >= {_CUT_US}
                            AND event_type = 'purchase'
             THEN CAST(ROUND(value*100,0) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events GROUP BY user_id
), m AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(x*y) AS HUGEINT) AS sxy
  FROM u GROUP BY arm
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS gn,
         CAST(SUM(sx) AS BIGINT) AS gsx, CAST(SUM(sy) AS BIGINT) AS gsy,
         CAST(SUM(sxx) AS HUGEINT) AS gsxx, CAST(SUM(sxy) AS HUGEINT) AS gsxy
  FROM m
), th AS (
  SELECT gn, gsx,
         (CAST(gsxy AS DOUBLE)*gn - CAST(gsx AS DOUBLE)*gsy)
         / (CAST(gsxx AS DOUBLE)*gn - CAST(gsx AS DOUBLE)*gsx) AS theta
  FROM g
)
SELECT arm, n AS n_users,
  ROUND(CAST(sy AS DOUBLE)/n/100.0, 4) AS mean_y_dollars,
  ROUND((CAST(sy AS DOUBLE)/n
         - theta*(CAST(sx AS DOUBLE)/n - CAST(gsx AS DOUBLE)/gn))/100.0, 4)
    AS cuped_mean_y_dollars,
  ROUND(theta, 6) AS theta
FROM m CROSS JOIN th
"""


@register("ab_cuped_adjustment", oracle=_CUPED_ORACLE)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13) — the
    experimentation-platform estimator that shrinks A/B confidence
    intervals using pre-experiment behavior: adjusted metric
    Y' = Y - theta*(X - mean(X)) with theta = cov(X,Y)/var(X), where X is
    each user's PRE-cutoff spend and Y their post-cutoff purchase spend
    (arms assigned by the engine-portable md5 split). The design point is
    that because the adjustment is LINEAR, per-arm adjusted means need no
    second pass over users: mean(Y')_arm = mean(Y)_arm -
    theta*(mean(X)_arm - mean(X)); everything reduces to per-arm exact
    integer moments (n, Sx, Sy, Sxx, Sxy) from ONE shuffle on user_id,
    a two-row arm table, and a one-row broadcast of global moments —
    theta and the means are then expression-identical double algebra on
    both engines (the ``ab_test_welch_t`` discipline).

    Scale: one user-keyed exchange over the facts regardless of arm
    count; the moment tables are O(arms) and broadcast. This is the
    production shape: CUPED at 100 TB is exactly "one pass to per-user
    (X, Y), one pass to moments"."""
    ev = t(spark, sf_dir, "events")
    c = cents("value")
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts_us") < _CUT_US, c)), F.lit(0)
        ).cast("long").alias("x"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("ts_us") >= _CUT_US)
                    & (F.col("event_type") == "purchase"),
                    c,
                )
            ),
            F.lit(0),
        ).cast("long").alias("y"),
    ).withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            "A",
        ).otherwise("B"),
    )
    # referenced by BOTH the theta derivation and the final select —
    # localCheckpoint the 2-row arm table so the fact scan runs once
    # ([[self-referencing-plan-recompute]])
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    ).localCheckpoint()
    g = m.agg(
        F.sum("n").alias("gn"),
        F.sum("sx").alias("gsx"),
        F.sum("sy").alias("gsy"),
        F.sum("sxx").alias("gsxx"),
        F.sum("sxy").alias("gsxy"),
    )
    th = g.select(
        "gn",
        "gsx",
        (
            (F.col("gsxy").cast("double") * F.col("gn") - F.col("gsx").cast("double") * F.col("gsy"))
            / (F.col("gsxx").cast("double") * F.col("gn") - F.col("gsx").cast("double") * F.col("gsx"))
        ).alias("theta"),
    )
    return m.crossJoin(F.broadcast(th)).select(
        "arm",
        F.col("n").alias("n_users"),
        F.round(F.col("sy").cast("double") / F.col("n") / 100.0, 4).alias(
            "mean_y_dollars"
        ),
        F.round(
            (
                F.col("sy").cast("double") / F.col("n")
                - F.col("theta")
                * (F.col("sx").cast("double") / F.col("n") - F.col("gsx").cast("double") / F.col("gn"))
            )
            / 100.0,
            4,
        ).alias("cuped_mean_y_dollars"),
        F.round("theta", 6).alias("theta"),
    )


_SURVIVAL_ORACLE = """
WITH life AS (
  SELECT user_id,
         CAST((MAX(epoch_ns(ts)//1000)//86400000000
               - MIN(epoch_ns(ts)//1000)//86400000000)//7 AS BIGINT) AS wk
  FROM events GROUP BY user_id
), died AS (
  SELECT wk, COUNT(*) AS n_died FROM life GROUP BY wk
)
SELECT wk AS week, n_died,
       CAST(SUM(n_died) OVER (ORDER BY wk DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_at_risk,
       CAST(n_died * 1000000 // SUM(n_died) OVER (ORDER BY wk DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS hazard_ppm
FROM died
"""


@register("events_survival_hazard", oracle=_SURVIVAL_ORACLE)
def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival analysis (the life-table / Kaplan-Meier
    input): per user, observed lifetime in whole weeks (first to last
    activity day); per week k, how many users "died" (lifetime == k), how
    many were still at risk (lifetime >= k, the suffix sum), and the
    exact-integer hazard d_k/n_k in ppm. The KM survival curve is the
    running product S_k = prod_{j<=k}(1 - h_j) — derivable downstream
    from this table's handful of rows; emitting exact hazards instead of
    the float product is what keeps the result hash-portable.

    Scale: one user-keyed exchange to lifetimes, one vocabulary-sized
    shuffle to the week table; the suffix-sum window runs over #weeks
    rows (bounded by calendar, not data — the quantile-bucket-table
    argument), so nothing here grows with volume except the first
    map-side-combinable pass."""
    ev = t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.expr(
            "(MAX(ts_us div 86400000000) - MIN(ts_us div 86400000000)) div 7"
        ).alias("wk")
    )
    died = life.groupBy("wk").agg(F.count(F.lit(1)).alias("n_died"))
    w = (
        W.orderBy(F.desc("wk"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return died.select(
        F.col("wk").alias("week"),
        "n_died",
        F.sum("n_died").over(w).alias("n_at_risk"),
        F.expr(
            "n_died * 1000000 div SUM(n_died) OVER (ORDER BY wk DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("hazard_ppm"),
    )


_MARKOV_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)//1000, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_ppm
FROM pairs
"""


@register("events_markov_transitions", oracle=_MARKOV_ORACLE)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences —
    the sequence-model statistic behind next-action prediction, anomaly
    scoring (improbable transitions), and the CEP entry's pattern design:
    per user, adjacent event pairs via LAG on the time-ordered history;
    per (prev, next) state pair, the count and the exact-integer row-
    normalized transition probability in ppm (``events_cep_pattern``
    consumes individual paths; this is their aggregate dynamics).

    Scale: the LAG window is user-partitioned (one keyed exchange over
    the facts, no global order); the pair table is |states|² — a
    vocabulary-bounded result whose normalizing window runs over at most
    |states| rows per partition. The classic trap here is normalizing
    with a second join back to per-prev totals — the window over the
    TINY pair table does it in-place."""
    ev = t(spark, sf_dir, "events")
    ws = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(ws).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.expr(
            "n * 1000000 div SUM(n) OVER (PARTITION BY prev_type)"
        ).alias("p_ppm"),
    )


_SEASONAL_ORACLE = """
WITH vol AS (
  SELECT event_type, (epoch_ns(ts)//1000) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT event_type, day, n,
         CAST(SUM(n) OVER w * 1000 // COUNT(n) OVER w AS BIGINT) AS trend_milli
  FROM vol
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT event_type, day % 7 AS dow,
       COUNT(*) AS n_days,
       CAST(SUM(n) * 1000 // COUNT(*) AS BIGINT) AS mean_vol_milli,
       CAST(SUM(n * 1000 - trend_milli) // COUNT(*) AS BIGINT)
         AS seasonal_milli
FROM tr GROUP BY event_type, day % 7
"""


@register("events_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (the moving-average half of STL):
    daily volume per event type -> trend = centered 7-day moving average
    -> weekly seasonal component = mean detrended deviation per
    day-of-week. All in exact milli-units (volumes x1000, integer floor
    division) so the decomposition is hash-portable; edge days average
    over their actual window population (COUNT over the same frame), the
    standard truncated-window convention.

    Scale: the fact-sized work is ONE map-side-combinable count to the
    (type, day) grid; the trend window and seasonal rollup both run over
    the calendar-bounded grid (types x days), partitioned by type — the
    same bounded-window argument as ``events_survival_hazard``. The
    forecast consumer of this table is ``events_seasonal_naive_backtest``."""
    ev = t(spark, sf_dir, "events")
    vol = ev.groupBy(
        "event_type", F.expr(f"ts_us div {US_PER_DAY}").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    tr = vol.select(
        "event_type",
        "day",
        "n",
        F.expr(
            "SUM(n) OVER (PARTITION BY event_type ORDER BY day"
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 1000"
            " div COUNT(n) OVER (PARTITION BY event_type ORDER BY day"
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
        ).alias("trend_milli"),
    )
    return tr.groupBy("event_type", (F.col("day") % 7).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("SUM(n) * 1000 div COUNT(*)").alias("mean_vol_milli"),
        F.expr("SUM(n * 1000 - trend_milli) div COUNT(*)").alias(
            "seasonal_milli"
        ),
    )


_CUSUM_ORACLE = """
WITH x AS (
  SELECT user_id, epoch_ns(ts)//1000 AS us, event_id,
         CAST(ROUND(value*100,0) AS BIGINT) - 6000 AS d
  FROM events
), p AS (
  SELECT user_id, us, event_id,
         SUM(d) OVER w AS ps
  FROM x
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), c AS (
  SELECT user_id, event_id,
         ps - LEAST(CAST(0 AS BIGINT), MIN(ps) OVER w) AS s
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(SUM(CASE WHEN s > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       CAST(MAX(s) AS BIGINT) AS max_cusum_c,
       MIN(CASE WHEN s > 20000 THEN event_id END) AS first_alarm_event
FROM c
GROUP BY user_id
HAVING SUM(CASE WHEN s > 20000 THEN 1 ELSE 0 END) > 0
"""


@register("events_cusum_changepoint", oracle=_CUSUM_ORACLE)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection (Page 1954): per user, the
    drift statistic ``S_t = max(0, S_{t-1} + (x_t - k))`` with reference
    value k = $60.00 and alarm threshold h = $200.00 — S accumulates
    upward deviations from the in-control mean and forgives downward ones,
    firing when a sustained shift pushes it past h. The sequential-looking
    recurrence is the SAME clamped-at-zero identity
    ``events_clamped_running_balance`` pins (S_t = P_t − min(0, min
    prefix)), so detection costs exactly two stacked user-partitioned
    windows over one exchange — what's new here is the DETECTION layer:
    per-user alarm counts, the peak statistic, and the first alarm event
    (the estimated change point's upper edge). All math in exact integer
    cents; only users with at least one alarm are emitted.

    Scale: identical to the clamped-balance shape — one shuffle on
    user_id, merge-computable windows, no global ordering anywhere; the
    group-by alarm summary is a partial aggregate. Streaming twin:
    the same statistic carries as (P_t, min-prefix) per key, both
    associative, so applyInPandasWithState or the EWMA-style stateful
    fold can maintain it online."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        "event_id",
        (cents("value") - F.lit(6000).cast("long")).alias("d"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = ev.withColumn("ps", F.sum("d").over(w))
    c = p.withColumn(
        "s",
        F.col("ps") - F.least(F.lit(0).cast("long"), F.min("ps").over(w)),
    )
    alarm = F.col("s") > F.lit(20000)
    return (
        c.groupBy("user_id")
        .agg(
            F.sum(F.when(alarm, 1).otherwise(0)).cast("long").alias("n_alarms"),
            F.max("s").alias("max_cusum_c"),
            F.min(F.when(alarm, F.col("event_id"))).alias("first_alarm_event"),
        )
        .filter(F.col("n_alarms") > 0)
    )


_HOLT_ORACLE = """
WITH RECURSIVE x AS (
  SELECT user_id,
         list(CAST(CAST(ROUND("value"*100,0) AS BIGINT) AS DOUBLE)
              ORDER BY epoch_ns(ts)//1000, event_id) AS vs
  FROM events GROUP BY user_id
),
it AS (
  SELECT user_id, vs, 1 AS i, vs[1] AS l, CAST(0.0 AS DOUBLE) AS b FROM x
  UNION ALL
  SELECT user_id, vs, i+1,
         vs[i+1]/2 + (l + b)/2,
         ((vs[i+1]/2 + (l + b)/2) - l)/2 + b/2
  FROM it WHERE i < len(vs)
)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       l AS level_c, b AS trend_c, l + b AS forecast_c
FROM it WHERE i = len(vs)
"""


@register("events_holt_linear_forecast", oracle=_HOLT_ORACLE)
def events_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per user
    (alpha = beta = 1/2): level ``l_t = x_t/2 + (l+b)/2`` and trend
    ``b_t = (l_t - l)/2 + b/2`` folded over the time-ordered value
    sequence, one-step-ahead forecast ``l + b`` — the trend-aware upgrade
    of ``events_ewma_smoothing`` (level-only) and the model-based
    complement to ``events_seasonal_naive_backtest``.

    Hash-exactness discipline for a recursive float, extended to VECTOR
    state: both engines run the IDENTICAL (l, b) recurrence with the
    TEXTUALLY IDENTICAL expression tree (the level expression is
    deliberately duplicated inside the trend expression on BOTH sides
    rather than let-bound, so the operand order is pinned) — Spark as
    ``aggregate`` over an ``array_sort``-ordered per-user struct array
    seeded with (l1 = x1, b1 = 0), DuckDB as a RECURSIVE CTE stepping the
    same per-user list. IEEE-754 doubles make that bit-identical. The CTE
    form is deliberate: DuckDB's ``list_reduce`` with a STRUCT
    accumulator was observed evaluating later struct fields against a
    partially-updated accumulator (the trend field saw the same
    application's new level from the second application onward, but not
    the first) — a cross-engine footgun this oracle avoids by never
    folding structs in DuckDB.

    Scale: same posture as the EWMA — one shuffle on user_id, per-user
    arrays bounded by user activity, the fold runs inside the aggregation
    stage. Streaming twin carries (l, b, n) per key — three scalars —
    the ``user_ewma``/``user_cusum`` stateful pattern."""
    ev = t(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        F.struct(
            F.col("ts_us").alias("t"),
            F.col("event_id").alias("e"),
            F.expr("CAST(ROUND(value*100,0) AS BIGINT)").cast("double").alias("c"),
        ).alias("r"),
    )
    per = rows.groupBy("user_id").agg(
        F.transform(F.array_sort(F.collect_list("r")), lambda r: r["c"]).alias("vs")
    )
    states = F.transform(
        "vs", lambda e: F.struct(e.alias("l"), F.lit(0.0).alias("b"))
    )
    per = per.select(
        "user_id", F.size("vs").cast("long").alias("n_events"), states.alias("st")
    )
    hw = F.aggregate(
        F.slice(F.col("st"), 2, F.greatest(F.size("st") - 1, F.lit(0))),
        F.element_at("st", 1),
        lambda acc, x: F.struct(
            (x["l"] / 2 + (acc["l"] + acc["b"]) / 2).alias("l"),
            (
                ((x["l"] / 2 + (acc["l"] + acc["b"]) / 2) - acc["l"]) / 2
                + acc["b"] / 2
            ).alias("b"),
        ),
    )
    return per.select(
        "user_id",
        "n_events",
        hw["l"].alias("level_c"),
        hw["b"].alias("trend_c"),
        (hw["l"] + hw["b"]).alias("forecast_c"),
    )


_TSSS_W = 7  # query length in days
_TSSS_K = 10


def _tsss_inputs(spark: SparkSession, sf_dir: str):
    """Shared construction for the subsequence-search twins: the dense
    (type x observed-day) daily-count grid, the query-type one-row frame,
    and the broadcastable w-point query vector. The reduced series is
    localCheckpointed — both the grid's left join and the query filter
    consume it."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_us div 86400000000").alias("day")
    )
    mn = ev.agg(F.min("day").alias("d0"))
    s = (
        ev.crossJoin(F.broadcast(mn))
        .select("event_type", (F.col("day") - F.col("d0")).alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    days = s.select("d").distinct()
    types = s.select("event_type").distinct()
    dense = (
        types.crossJoin(days)
        .join(s, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    qt = types.agg(F.min("event_type").alias("qtype"))
    q = (
        dense.crossJoin(F.broadcast(qt))
        .filter(
            (F.col("event_type") == F.col("qtype")) & (F.col("d") < _TSSS_W)
        )
        .select(F.col("d").alias("i"), F.col("c").alias("qc"))
    )
    return dense, qt, q

_TSSS_ORACLE = f"""
WITH e AS (
  SELECT event_type, (epoch_ns(ts)//1000) // 86400000000 AS day FROM events
), mn AS (SELECT MIN(day) AS d0 FROM e),
s AS (
  SELECT event_type, day - d0 AS d, COUNT(*) AS c
  FROM e, mn GROUP BY event_type, day - d0
),
days AS (SELECT DISTINCT d FROM s),
types AS (SELECT DISTINCT event_type FROM s),
dense AS (
  SELECT t.event_type, days.d, COALESCE(s.c, 0) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN s ON s.event_type = t.event_type AND s.d = days.d
),
qt AS (SELECT MIN(event_type) AS qtype FROM types),
q AS (
  SELECT d.d AS i, d.c AS qc
  FROM dense d, qt WHERE d.event_type = qt.qtype AND d.d < {_TSSS_W}
),
pairs AS (
  SELECT dense.event_type, dense.d - q.i AS o,
         (dense.c - q.qc) * (dense.c - q.qc) AS sq
  FROM dense CROSS JOIN q
  WHERE dense.d - q.i >= 0
),
w AS (
  SELECT event_type, o, CAST(SUM(sq) AS BIGINT) AS ssd, COUNT(*) AS npts
  FROM pairs GROUP BY event_type, o
)
SELECT event_type, CAST(o AS BIGINT) AS win_start, ssd
FROM w, qt
WHERE npts = {_TSSS_W} AND NOT (event_type = qt.qtype AND o = 0)
ORDER BY ssd, event_type, o
LIMIT {_TSSS_K}
"""


@register("events_ts_subsequence_search", oracle=_TSSS_ORACLE)
def events_ts_subsequence_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series SUBSEQUENCE similarity search (the UCR-suite / distributed
    streaming-similarity family — PAPERS.md: "Time Series Similarity Search
    for Streaming Data in Distributed Systems", EDBT 2019): take the first
    7-day window of the lexicographically-first event type's daily-count
    series as the query, slide it across EVERY type's series, and return
    the top-10 closest windows by EXACT INTEGER sum-of-squared-differences
    (counts are integers, so SSD is a bigint and the oracle hash-matches
    bit-for-bit — z-normalized distance is the float variant; for ranking
    on series with comparable scale, SSD is the same family).

    Scale shape: the heavy reduction is events -> per-(type, day) counts —
    one keyed aggregate over the raw corpus; everything after runs on the
    REDUCED series. The dense grid is (types x observed days) built by a
    broadcast cross join; the query vector (w rows) broadcasts; window
    scoring is one explode-free cross join against those w rows + one
    groupBy (type, offset): candidate volume = series_len x w, independent
    of the raw event count. Windows overlapping globally-absent days are
    excluded by the npts = w guard — identically on both engines, so the
    day grid never needs a generator. Top-k is ordered (ssd, type, offset)
    — fully tiebroken."""
    dense, qt, q = _tsss_inputs(spark, sf_dir)
    pairs = (
        dense.crossJoin(F.broadcast(q))
        .select(
            "event_type",
            (F.col("d") - F.col("i")).alias("o"),
            ((F.col("c") - F.col("qc")) * (F.col("c") - F.col("qc"))).alias(
                "sq"
            ),
        )
        .filter(F.col("o") >= 0)
    )
    w = pairs.groupBy("event_type", "o").agg(
        F.sum("sq").alias("ssd"), F.count(F.lit(1)).alias("npts")
    )
    return (
        w.crossJoin(F.broadcast(qt))
        .filter(
            (F.col("npts") == _TSSS_W)
            & ~((F.col("event_type") == F.col("qtype")) & (F.col("o") == 0))
        )
        .select(
            "event_type",
            F.col("o").cast("long").alias("win_start"),
            F.col("ssd").cast("long").alias("ssd"),
        )
        .orderBy("ssd", "event_type", "win_start")
        .limit(_TSSS_K)
    )


_TSZN_ORACLE = f"""
WITH e AS (
  SELECT event_type, (epoch_ns(ts)//1000) // 86400000000 AS day FROM events
), mn AS (SELECT MIN(day) AS d0 FROM e),
s AS (
  SELECT event_type, day - d0 AS d, COUNT(*) AS c
  FROM e, mn GROUP BY event_type, day - d0
),
days AS (SELECT DISTINCT d FROM s),
types AS (SELECT DISTINCT event_type FROM s),
dense AS (
  SELECT t.event_type, days.d, COALESCE(s.c, 0) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN s ON s.event_type = t.event_type AND s.d = days.d
),
qt AS (SELECT MIN(event_type) AS qtype FROM types),
q AS (
  SELECT d.d AS i, d.c AS qc
  FROM dense d, qt WHERE d.event_type = qt.qtype AND d.d < {_TSSS_W}
),
qs AS (
  SELECT CAST(SUM(qc) AS BIGINT) AS sq,
         CAST({_TSSS_W} * SUM(qc * qc) - SUM(qc) * SUM(qc) AS BIGINT) AS denq
  FROM q
),
pairs AS (
  SELECT dense.event_type, dense.d - q.i AS o, dense.c AS c, q.qc AS qc
  FROM dense CROSS JOIN q
  WHERE dense.d - q.i >= 0
),
win AS (
  SELECT event_type, o,
         CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS sx2,
         CAST(SUM(c * qc) AS BIGINT) AS sxq,
         COUNT(*) AS npts
  FROM pairs GROUP BY event_type, o
),
scored AS (
  SELECT event_type, CAST(o AS BIGINT) AS win_start,
         CAST({_TSSS_W} * sxq - sx * qs.sq AS BIGINT) AS corr_num,
         CAST({_TSSS_W} * sx2 - sx * sx AS BIGINT) AS corr_denx,
         ({_TSSS_W} * sxq - sx * qs.sq)
           / SQRT(CAST({_TSSS_W} * sx2 - sx * sx AS DOUBLE)
                  * CAST(qs.denq AS DOUBLE)) AS r,
         qs.denq AS denq,
         npts
  FROM win, qs
)
SELECT event_type, win_start, corr_num, corr_denx, r
FROM scored, qt
WHERE npts = {_TSSS_W} AND corr_denx > 0 AND denq > 0
      AND NOT (event_type = qt.qtype AND win_start = 0)
ORDER BY r DESC, event_type, win_start
LIMIT {_TSSS_K}
"""


@register("events_ts_znorm_search", oracle=_TSZN_ORACLE)
def events_ts_znorm_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-NORMALIZED subsequence similarity search — the scale/offset-
    invariant twin of ``events_ts_subsequence_search`` and what UCR-style
    matching actually ranks by: top-10 windows by Pearson correlation r
    with the query (znorm distance² = 2w(1−r), so ordering by r DESC is
    ordering by z-normalized distance ASC).

    Determinism discipline for a FLOAT score: every sufficient statistic
    is an exact integer (sx, sx², sxq over integer counts), the
    correlation numerator w·sxq − sx·sq and variance terms w·sx2 − sx²
    stay bigint, and r is ONE identical-expression double at the end
    (int/sqrt(double·double) — IEEE sqrt and division are correctly
    rounded, so identical integer inputs give identical bits on both
    engines; the integer num/denx ride along in the output so the hash
    would catch any drift in the stats themselves). Constant windows
    (denx = 0, r undefined) are excluded by an exact integer predicate,
    and so is a constant QUERY window (denq = 0 — r would be num/0,
    where Spark's IEEE Inf/NaN and DuckDB's division-by-zero semantics
    can diverge in ordering on degenerate fixtures); both guards are
    exact integer predicates applied identically on both engines. Same
    reduced-series scale shape as the SSD twin (shared
    ``_tsss_inputs``)."""
    dense, qt, q = _tsss_inputs(spark, sf_dir)
    qs = q.agg(
        F.sum("qc").cast("long").alias("sq"),
        (
            F.lit(_TSSS_W) * F.sum(F.col("qc") * F.col("qc"))
            - F.sum("qc") * F.sum("qc")
        )
        .cast("long")
        .alias("denq"),
    )
    pairs = (
        dense.crossJoin(F.broadcast(q))
        .select(
            "event_type",
            (F.col("d") - F.col("i")).alias("o"),
            "c",
            "qc",
        )
        .filter(F.col("o") >= 0)
    )
    win = pairs.groupBy("event_type", "o").agg(
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sx2"),
        F.sum(F.col("c") * F.col("qc")).cast("long").alias("sxq"),
        F.count(F.lit(1)).alias("npts"),
    )
    num = (F.lit(_TSSS_W) * F.col("sxq") - F.col("sx") * F.col("sq")).cast(
        "long"
    )
    denx = (F.lit(_TSSS_W) * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
        "long"
    )
    scored = (
        win.crossJoin(F.broadcast(qs))
        .select(
            "event_type",
            F.col("o").cast("long").alias("win_start"),
            num.alias("corr_num"),
            denx.alias("corr_denx"),
            (
                num
                / F.sqrt(
                    denx.cast("double") * F.col("denq").cast("double")
                )
            ).alias("r"),
            "denq",
            "npts",
        )
    )
    return (
        scored.crossJoin(F.broadcast(qt))
        .filter(
            (F.col("npts") == _TSSS_W)
            & (F.col("corr_denx") > 0)
            & (F.col("denq") > 0)
            & ~(
                (F.col("event_type") == F.col("qtype"))
                & (F.col("win_start") == 0)
            )
        )
        .select("event_type", "win_start", "corr_num", "corr_denx", "r")
        .orderBy(F.desc("r"), "event_type", "win_start")
        .limit(_TSSS_K)
    )
