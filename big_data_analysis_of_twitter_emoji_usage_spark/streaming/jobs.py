"""Streaming layer: the reference's batch/stream duality, Spark-first.

The reference runs the *same DataFrame chain* on a static read and on a
file-source stream, sinking complete-mode sorted aggregates to the
console forever (q2:96-120 and clones; SURVEY §2.8). The engine keeps
that duality as a first-class contract: every plan builder in
``plans.queries`` takes a DataFrame — batch or streaming — unchanged.

This module adds what the reference lacked for production streams:
bounded-run triggers (``availableNow``) so a stream can be driven to a
checkable final state, a memory sink for tests/oracles, and watermarked
event-time windows (the reference's "per-day" slicing was done by
pointing the batch reader at a directory; README.md:30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_query(
    df: DataFrame,
    output_mode: str = "complete",
    fmt: str = "console",
    query_name: str | None = None,
    available_now: bool = False,
    checkpoint: str | None = None,
):
    """Start a streaming query with the reference's sink shape
    (complete-mode, untruncated console — q2:115-120) or any variant."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .format(fmt)
        .option("truncate", "false")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a streaming plan over everything currently in its source and
    return the final result as a batch DataFrame (memory sink).

    This is the engine's batch/stream equivalence harness: for any
    builder B, ``run_stream_to_memory(spark, B(stream_src), n)`` must
    equal ``B(batch_src)`` — the reference's central design property.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    plan compiled at ``start()`` (a streaming aggregation's state
    partitioning is fixed at first run and checkpointed). Stateful
    micro-batches pay a per-partition state-store commit every trigger,
    so oversized state partitioning costs fixed latency per batch; size
    it to state volume, not to CPU count. The batch conf is restored
    after start.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    return spark.table(query_name)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window counts — the scalable replacement for
    the reference's unbounded complete-mode state (SURVEY §7.6).

    With a watermark, Spark drops per-window state once the watermark
    passes the window end; state is bounded by (windows in flight ×
    keys), not by the stream's lifetime. Works identically on batch
    DataFrames (the window function degrades to a group-by).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n",
        )
    )
