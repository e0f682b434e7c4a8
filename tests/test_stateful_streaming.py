"""Custom stateful streaming operator (applyInPandasWithState
sessionization): emitted sessions must equal batch sessionization minus
each user's trailing (still-open) session — the conservative-emission
contract documented on streaming.jobs.stateful_sessionize.
"""

import pytest
from pyspark.sql import Window, functions as F

from big_data_analysis_of_twitter_emoji_usage_spark.core import load_events, load_events_stream
from big_data_analysis_of_twitter_emoji_usage_spark.operators.relational import sessionize
from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import run_stream_to_memory, stateful_sessionize


def _assert_stateful_matches_batch_closed(spark, sf_dir, sink):
    """The conservative-emission contract, ONCE: the stream emits
    exactly the batch sessions minus each user's trailing open one."""
    batch = sessionize(load_events(spark, sf_dir), gap="30 minutes")
    w = Window.partitionBy("user_id")
    expected = (
        batch.withColumn("_last", F.max("session_start").over(w))
        .filter(F.col("session_start") != F.col("_last"))
        .drop("_last")
    )
    exp_rows = sorted(map(tuple, expected.collect()))

    got = run_stream_to_memory(
        spark,
        stateful_sessionize(load_events_stream(spark, sf_dir)),
        sink,
        output_mode="append",
    )
    got_rows = sorted(map(tuple, got.collect()))
    assert len(got_rows) > 0
    assert got_rows == exp_rows


def test_stateful_sessionize_matches_batch_closed_sessions(spark, sf_dir):
    _assert_stateful_matches_batch_closed(
        spark, sf_dir, "test_stateful_sessions"
    )


def test_stateful_sessionize_multibatch(spark, sf_dir):
    """State must carry across micro-batches: with the source split into
    several triggers the closed-session set is identical."""
    one = run_stream_to_memory(
        spark,
        stateful_sessionize(load_events_stream(spark, sf_dir)),
        "test_sessions_onebatch",
        output_mode="append",
    )
    multi = run_stream_to_memory(
        spark,
        stateful_sessionize(_throttled_events_stream(spark, sf_dir)),
        "test_sessions_multibatch",
        output_mode="append",
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, multi.collect()))


def _throttled_events_stream(spark, sf_dir):
    """load_events_stream with maxFilesPerTrigger=1 so the fixture's files
    arrive across several micro-batches — the r9 public knob (the
    scale-correct drive for large stateful replays; core.py)."""
    return load_events_stream(spark, sf_dir, max_files_per_trigger=1)


def test_sessionize_stream_default_is_native():
    """r8 contract: the package's default streaming sessionization is
    the JVM-native session_window plan; the applyInPandasWithState
    path is the explicit custom-state demonstrator (measured ~8x
    wall-clock per decade vs ~linear native — SCALE.md 'Streaming')."""
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming import sessionize_stream
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import (
        native_sessionize_stream,
    )

    assert sessionize_stream is native_sessionize_stream


def test_native_sessionize_matches_batch_strictly_closed(spark, sf_dir):
    """The JVM-native twin (session_window + watermark, append) must
    equal batch sessionization restricted to sessions strictly closed by
    the terminal watermark (max ts - delay), the same predicate the
    catalog query and its oracle apply."""
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import native_sessionize_stream

    batch = sessionize(load_events(spark, sf_dir), gap="30 minutes")
    wm = load_events(spark, sf_dir).agg(
        (F.max("ts") - F.expr("INTERVAL 10 minutes")).alias("_wm")
    )
    strictly_closed = F.col("session_end") + F.expr("INTERVAL 30 minutes") < F.col("_wm")
    expected = (
        batch.crossJoin(F.broadcast(wm)).filter(strictly_closed).drop("_wm")
    )

    got = run_stream_to_memory(
        spark,
        native_sessionize_stream(load_events_stream(spark, sf_dir)),
        "test_native_sessions",
        output_mode="append",
    ).crossJoin(F.broadcast(wm)).filter(strictly_closed).drop("_wm")

    got_rows = sorted(map(tuple, got.collect()))
    assert len(got_rows) > 0
    assert got_rows == sorted(map(tuple, expected.collect()))


def test_native_sessionize_multibatch(spark, sf_dir):
    """Session-window state must merge across micro-batches exactly like
    the one-batch run: with files arriving one per trigger, the emitted
    closed-session set (post-filtered to strictly-closed, the catalog
    predicate) is identical."""
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import native_sessionize_stream

    wm = load_events(spark, sf_dir).agg(
        (F.max("ts") - F.expr("INTERVAL 10 minutes")).alias("_wm")
    )
    strictly_closed = F.col("session_end") + F.expr("INTERVAL 30 minutes") < F.col("_wm")

    def run(src, name):
        return sorted(
            map(
                tuple,
                run_stream_to_memory(
                    spark, native_sessionize_stream(src), name, output_mode="append"
                )
                .crossJoin(F.broadcast(wm))
                .filter(strictly_closed)
                .drop("_wm")
                .collect(),
            )
        )

    one = run(load_events_stream(spark, sf_dir), "test_native_onebatch")
    multi = run(_throttled_events_stream(spark, sf_dir), "test_native_multibatch")
    assert len(one) > 0
    assert one == multi


def test_stateful_sessionize_chunk_split_groups(spark, sf_dir):
    """A key group larger than arrow.maxRecordsPerBatch arrives as
    SEVERAL pdfs in shuffle order; the fold must drain and sort the
    whole group before folding (review find: per-chunk sorting could
    close a session before an earlier-timestamped event in a later
    chunk arrived). Forcing 2-row Arrow chunks, the stream must still
    equal the batch sessionization's closed sessions."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        _assert_stateful_matches_batch_closed(
            spark, sf_dir, "test_stateful_sessions_chunked"
        )
    finally:
        spark.conf.set(key, prev)


def test_run_stream_to_parquet_zero_batches_returns_empty(spark, tmp_path):
    """A drain that produced no micro-batches (empty source dir) is a
    successful run with no data: return an empty DataFrame with the
    stream's schema, not a PATH_NOT_FOUND crash (review find)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import run_stream_to_parquet

    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    out = run_stream_to_parquet(
        spark, stream, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "text"]


def test_rocksdb_state_store_sessionize_matches_default(spark, sf_dir):
    """VERDICT r9 #5: the RocksDB state-store lever (surfaced by
    core.get_spark(state_store="rocksdb")) must be a pure
    provider swap — the same native sessionize drive under
    RocksDBStateStoreProvider emits the identical closed-session set,
    and the query's state-operator metrics prove RocksDB actually
    engaged (the provider class is honored per-query at stream start,
    which is why flipping the live session conf here exercises the
    same code path the factory knob sets at build time)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.streaming.jobs import (
        native_sessionize_stream,
        run_stream_to_memory,
    )

    baseline = sorted(
        map(
            tuple,
            run_stream_to_memory(
                spark,
                native_sessionize_stream(load_events_stream(spark, sf_dir)),
                "rocks_base",
                output_mode="append",
            ).collect(),
        )
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            native_sessionize_stream(load_events_stream(spark, sf_dir))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("rocks_got")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        metrics = q.lastProgress["stateOperators"][0].get("customMetrics", {})
        assert any("rocksdb" in k.lower() for k in metrics)
    finally:
        spark.conf.set(key, prev)
    got = sorted(map(tuple, spark.table("rocks_got").collect()))
    assert len(got) > 0
    assert got == baseline


def test_get_spark_rejects_unknown_state_store():
    """A typo'd provider must raise, not silently run in-heap."""
    from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark

    with pytest.raises(ValueError, match="state_store='rocksdbx'"):
        get_spark(state_store="rocksdbx")
