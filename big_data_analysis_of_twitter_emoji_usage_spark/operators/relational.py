"""Relational extension operators the reference lacks (SURVEY §2.7):
as-of join, range (interval) join, and sessionization.

The reference correlates dimensions with explode cross-products and has
zero joins; a complete analytics engine needs the time-series join
shapes too. Both operators here are one-shuffle designs:

- ``asof_join``: the classic "latest right row at or before the left
  timestamp" join. Implemented as union → window carry-forward, NOT as a
  range join: a range-condition join explodes to |left| × |right-in-range|
  intermediate rows, while the union form shuffles each row exactly once
  on the join key and resolves the as-of match with a running
  ``last(..., ignorenulls)`` inside the partition. This is the standard
  scalable shape for point-in-time joins on Spark.
- ``sessionize``: native ``F.session_window`` gap sessionization —
  Spark's built-in session operator (works on batch and, with a
  watermark, on streams with state cleanup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance: None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``key`` (DuckDB/pandas
    ``ASOF JOIN`` semantics; unmatched left rows keep nulls).

    ONE shuffle total: the union is hash-partitioned on the key once and
    the window resolves the match in-partition. Determinism under
    duplicate right timestamps comes from the window *order* — right
    rows sort by (ts, side=0, first-payload-column), so the running
    ``last`` picks the max first-payload value among ties, the same row
    ``max_by`` would pick (and the same the DuckDB oracle's ``arg_max``
    picks). An earlier revision pre-aggregated the right side to one row
    per (key, ts) first, which cost a second full shuffle of the right
    stream for no semantic gain (timestamps are near-unique, so the
    map-side partial agg shrank nothing). Right rows sort before left
    rows at equal timestamps (side 0 < 1), so exact-timestamp matches
    are taken (inclusive as-of).
    """
    left_cols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    lrow_type = left.select(
        F.struct(*[F.col(c) for c in left_cols]).alias("_lrow")
    ).schema["_lrow"].dataType
    tie_type = right.schema[right_payload[0]].dataType
    r1 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_payload[0]).cast(tie_type).alias("_tie"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        payload_struct.alias("_payload"),
    )
    l1 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lrow"),
        F.lit(None).cast(r1.schema["_payload"].dataType).alias("_payload"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r1.unionByName(l1).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left_cols],
        *[F.col("_match")[c].alias(c) for c in right_payload],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    window_seconds: int,
) -> DataFrame:
    """Interval (range) join: all pairs with equal ``key`` and
    ``right_ts`` in ``[left_ts - window_seconds, left_ts]`` (both ends
    inclusive). Returns every left column plus ``right_payload``.

    A naive non-equi join on (key, range) degenerates into a per-key
    cross product under skew (one hot key joins all its rows against
    all its rows). Instead the time axis is bucketed at the window
    width: each right row lands in exactly one bucket, each left row
    probes its two covering buckets (``explode`` of {b-1, b}), and the
    join becomes an equi-join on (key, bucket) with the exact range as
    a residual filter. Per-pair output is emitted exactly once because
    a right row's bucket is unique. This is the standard scalable range
    join shape (cf. Spark's range-join hints in Databricks runtime and
    Flink's interval join), built from open primitives.
    """
    width = int(window_seconds)
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / F.lit(width)).cast("long")
    r2 = right.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.unix_timestamp(F.col(right_ts)) / F.lit(width))
        .cast("long")
        .alias("_rb"),
        *[F.col(c) for c in right_payload],
    )
    l2 = left.withColumn("_lb", F.explode(F.array(lb - 1, lb)))
    cond = (
        (l2[key] == r2["_rk"])
        & (l2["_lb"] == r2["_rb"])
        & (r2["_rts"] <= l2[left_ts])
        & (r2["_rts"] >= l2[left_ts] - F.expr(f"INTERVAL {width} SECONDS"))
    )
    return l2.join(r2, cond, "inner").drop("_lb", "_rk", "_rb", "_rts")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization with Spark's native ``session_window``:
    one session row per (user, maximal event run with inter-event gaps
    < ``gap``), with the session's span and event count.

    ``session_window`` merges overlapping per-event windows in the
    aggregation — a single shuffle on the user key. On a stream, add
    ``withWatermark`` upstream and state is dropped once sessions close.
    Returns (user, session_start, session_end, n_events) where start/end
    are the min/max event times (not the padded window end).
    """
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("_w")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )
