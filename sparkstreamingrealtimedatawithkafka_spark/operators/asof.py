"""As-of (point-in-time) join — a custom operator Spark has no built-in for.

Semantics: for each left row, attach the single most recent right row with
``right_ts <= left_ts`` for the same key (backward as-of, left-outer: left
rows with no prior right row keep nulls).

Spark-first design — the *union + running-last* formulation, not a range
join: tag both inputs, union them, and take ``last(right_payload,
ignorenulls=True)`` over a per-key window ordered by time. Cost at scale is
ONE shuffle on the key (the window sort), linear in |L|+|R|; a naive
range-join formulation explodes to |L|×|R_key| pairs before picking the max,
and Spark would plan it as a broadcast-nested-loop or a cartesian per key.

The right payload rides in a single struct so the matched columns always
come from the SAME right row (per-column ``last`` calls could mix rows when
nulls differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, left-outer — the ``pandas.merge_asof`` surface.

    ``direction="backward"`` (default): most recent right row with
    ``right_ts <= left_ts``; ``"forward"``: earliest right row with
    ``right_ts >= left_ts``; ``"nearest"``: whichever of those two is
    closer in time, ties going backward. All three are the same union +
    per-key ordered window plan — one shuffle, linear in |L|+|R| —
    backward/forward mirror the frame (``last`` over preceding vs
    ``first`` over following) and nearest evaluates BOTH frames in the
    single window pass and picks per row.

    ``tiebreak``: right-side column ordering concurrent right rows (equal
    key + timestamp); deterministic pick — largest wins backward, smallest
    wins forward (both are "the value nearest the left row" under the sort
    that direction uses).

    ``tolerance``: maximum allowed ``|left_ts - matched_ts|`` in the
    timestamp's own units; matches farther away are nulled out, not
    dropped (left-outer contract preserved). Applied post-match, so it
    changes results, never the plan shape.

    Output: all left columns, then ``right_ts + suffix`` and each payload
    column ``+ suffix`` (nulls when no right row qualifies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    l_cols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in payload_cols],
    )

    # Sort-side trick: backward needs right rows BEFORE left rows at the
    # same timestamp so the match is inclusive (right_ts <= left_ts);
    # forward mirrors it (left rows first, match via the following frame).
    l_side = 0 if direction == "forward" else 1
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c).alias(c) for c in l_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1 - l_side).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tb"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c).alias(c) for c in l_cols]).alias("s")
            ).schema[0].dataType.simpleString()
        ).alias("__l"),
        payload.alias("__r"),
    )

    base = W.partitionBy(*on).orderBy("__ts", "__side", "__tb")
    union = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, 0)
        matched = union.withColumn(
            "__match", F.last("__r", ignorenulls=True).over(w)
        )
    elif direction == "forward":
        w = base.rowsBetween(0, W.unboundedFollowing)
        matched = union.withColumn(
            "__match", F.first("__r", ignorenulls=True).over(w)
        )
    else:
        # nearest = backward AND forward in the SAME window pass (still
        # one shuffle), then the closer match per row; ties at equal
        # distance go backward (deterministic, and an exact-timestamp
        # right row always wins with distance 0 via the preceding frame
        # because right rows sort before left rows at equal __ts).
        prev = F.last("__r", ignorenulls=True).over(
            base.rowsBetween(W.unboundedPreceding, 0)
        )
        nxt = F.first("__r", ignorenulls=True).over(
            base.rowsBetween(0, W.unboundedFollowing)
        )
        d_prev = F.col("__ts") - F.col(f"__prev.{right_ts}")
        d_next = F.col(f"__next.{right_ts}") - F.col("__ts")
        matched = (
            union.withColumn("__prev", prev)
            .withColumn("__next", nxt)
            .withColumn(
                "__match",
                F.when(F.col("__prev").isNull(), F.col("__next"))
                .when(F.col("__next").isNull(), F.col("__prev"))
                .when(d_prev <= d_next, F.col("__prev"))
                .otherwise(F.col("__next")),
            )
        )
    matched = matched.filter(F.col("__side") == l_side)
    if tolerance is not None:
        if direction == "nearest":
            delta = F.abs(F.col(f"__match.{right_ts}") - F.col("__ts"))
        else:
            delta = (
                F.col("__ts") - F.col(f"__match.{right_ts}")
                if direction == "backward"
                else F.col(f"__match.{right_ts}") - F.col("__ts")
            )
        matched = matched.withColumn(
            "__match", F.when(delta <= tolerance, F.col("__match"))
        )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in l_cols],
        F.col(f"__match.{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
