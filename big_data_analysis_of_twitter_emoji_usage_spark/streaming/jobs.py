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

import json

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

    TEST/ORACLE HARNESS ONLY: the memory sink accumulates every emitted
    row in the DRIVER heap for the life of the query. The r9 third
    streaming decade measured the boundary — sessionizing 100M events
    emits tens of millions of session rows and OOMs a 16 g driver even
    with bounded triggers (the state store was fine; the sink wasn't).
    Large drives belong on ``run_stream_to_parquet`` (executor-side
    landing, flat driver).
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


# r13 A/B toggle for in-drive background maintenance (all streaming
# store drives; see _MaintenanceScheduler): True = the maintenance
# cycle (and, for the IVF drive, the drift signal) overlaps later
# triggers from one serialized background thread; False = the
# synchronous r12 shape. Module-level so interleaved A/B sessions can
# flip it without a code edit.
_OVERLAP_IN_DRIVE_MAINTENANCE = True

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_SESSION_STATE_SCHEMA = "start long, end long, n long"

# ONE definition of the engine's sessionization parameters, consumed by
# both streaming variants, the batch catalog queries, their post-filter
# predicates, AND the generated DuckDB oracles (f-string interpolation
# in plans.catalog) — the three hard-coded copies the r7 advice flagged
# would silently break strictly-closed-session parity if edited
# independently.
SESSION_GAP_MINUTES = 30
SESSION_GAP = f"{SESSION_GAP_MINUTES} minutes"
SESSION_GAP_SECONDS = SESSION_GAP_MINUTES * 60
SESSION_DELAY_MINUTES = 10
SESSION_DELAY = f"{SESSION_DELAY_MINUTES} minutes"


def stateful_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Custom stateful streaming sessionization via
    ``applyInPandasWithState`` — the engine's DEMONSTRATOR of an
    operator class the built-in surface can't express (per-key mutable
    state with custom close/emit logic; SURVEY §2.8 lists the
    reference as having none). NOT the default sessionization: for
    plain gap sessions use ``sessionize_stream`` (the JVM-native
    ``session_window`` plan below) — the decade A/B measured this
    Arrow-per-key-group path at 342 s vs 118 s native at 10M events,
    ~8× wall-clock growth per 10× events (SCALE.md "Streaming").
    Reach for this shape only when the semantics genuinely need custom
    state (per-key timeouts, non-gap close rules, emit-on-update).

    State per user = the open session (start, end, count) as epoch
    micros. Each micro-batch folds its events in timestamp order into
    the open session; sessions whose gap closes *within the observed
    data* are emitted as final rows, the trailing open session stays in
    state (and is emitted only when a later batch closes it — standard
    conservative semantics: nothing is emitted that could still change).

    Scale: state is O(users) fixed-size tuples in the state store, one
    shuffle on the user key per batch; the pandas hook processes one
    key-group at a time so driver memory is never involved.
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fold(key, pdfs, state):
        (user,) = key
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = None, None, 0
        closed: list[tuple[int, int, int]] = []
        # Drain ALL Arrow chunks before sorting: a key group larger
        # than arrow.maxRecordsPerBatch arrives as several pdfs in
        # shuffle order, and sorting each chunk independently can
        # close a session mid-group before an earlier-timestamped
        # event in a later chunk arrives (wrongly-split sessions).
        # Memory is bounded by the group's events in THIS micro-batch
        # — and the JVM-native session_window path is the scale
        # default anyway (this operator is the custom-state demo).
        chunks = [pdf[ts_col] for pdf in pdfs]
        if chunks:
            for ts in pd.concat(chunks).sort_values():
                t = int(ts.value) // 1000  # pandas ns -> us
                if start is None:
                    start, end, n = t, t, 1
                elif t - end > gap_us:  # strict: session_window merges
                    # events exactly `gap` apart (window end inclusive)
                    closed.append((start, end, n))
                    start, end, n = t, t, 1
                else:
                    # min/max merge: an out-of-order event arriving in a
                    # later micro-batch (sorted only within its batch)
                    # must widen the open session, never shrink it.
                    start, end, n = min(start, t), max(end, t), n + 1
        state.update((start, end, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(F.col(user_col), F.col(ts_col))
        .groupBy(user_col)
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def native_sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = SESSION_GAP,
    delay: str = SESSION_DELAY,
) -> DataFrame:
    """JVM-native streaming sessionization: watermark + ``session_window``
    aggregation in append mode — the engine's DEFAULT streaming
    sessionization (aliased as ``sessionize_stream``; r8).

    Both compute identical gap sessions (``session_window`` merges events
    exactly ``gap`` apart, and so does the stateful fold). The difference
    is where the work happens: this plan keeps the per-session state rows
    in the JVM state store with watermark-driven eviction and never
    crosses into Python, while ``stateful_sessionize`` pays an Arrow
    round-trip per key-group per micro-batch. Measured same-session at
    10M events / 150k users (one availableNow batch, local[32], SCALE.md
    "Streaming"): native 118 s vs applyInPandasWithState 342 s. Keep the
    stateful variant for logic ``session_window`` can't express (custom
    close/emit rules, per-key timeouts); use this one when gap
    sessionization is the actual semantics.

    Append-mode emission: a session row is emitted once the watermark
    (max event time − ``delay``) passes the session's window end
    (last event + ``gap``). Callers that need a run-deterministic result
    from a finite source must post-filter to strictly-closed sessions —
    see ``plans.catalog.stream_sessionize_native`` — because boundary-
    equality emission is an engine implementation detail.

    ``session_end`` is reported as the LAST EVENT's timestamp
    (``window.end - gap``) to match batch ``operators.relational
    .sessionize`` and the reference-style oracle exactly.

    Replay/backfill caveat (measured, SCALE.md "Streaming"): the file
    stream source orders arrival by file MODIFICATION TIME, not name. A
    time-partitioned backfill written in parallel arrives time-shuffled
    and everything behind the advancing watermark is silently dropped
    as late (70% of sessions lost in the 10M-event A/B). Replays must
    arrive in event-time order — sequenced mtimes, or the ingest
    protocol's monotonic file numbering (``sources/ingest.py``) — or
    carry ``delay`` ≥ the disorder span. Incremental arrival is also
    the memory-correct shape: the advancing watermark evicts closed
    sessions per batch, bounding state by OPEN sessions (O(users)),
    where a single availableNow batch holds every session until the
    terminal flush.
    """
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("_w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("_w.start").alias("session_start"),
            (F.col("_w.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
            "n_events",
        )
    )


# The default streaming sessionization. Gap sessions are what
# session_window computes natively, in the JVM state store, with
# watermark-driven eviction — measured 2.9× the applyInPandasWithState
# demonstrator at 10M events and scaling ~linearly where the stateful
# path grew ~8× per decade (SCALE.md "Streaming").
sessionize_stream = native_sessionize_stream


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: left rows pair with right
    rows of the same key whose timestamp lies in (left_ts - within,
    left_ts]. The event-time bound + watermarks let Spark drop buffered
    state once no future match is possible — without them a
    stream-stream join buffers both streams forever.

    Run to completion (availableNow) the inner join equals the
    equivalent batch range join, which is how the oracle checks it.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(f"_r_{key}"))
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {within}"))
    )
    return l.join(
        r.withColumnRenamed(key, f"_r_{key}"), cond, "inner"
    ).drop(f"_r_{key}")


def stream_dedup(
    stream: DataFrame,
    subset: list[str],
    watermark_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each ``subset`` key
    wins. With a watermark column the per-key state is dropped once the
    watermark passes (bounded state); without one state grows with key
    cardinality (the reference's complete-mode tradeoff, documented)."""
    if watermark_col is not None:
        stream = stream.withWatermark(watermark_col, watermark)
        return stream.dropDuplicatesWithinWatermark(subset)
    return stream.dropDuplicates(subset)


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


def write_batch_idempotent(bdf: DataFrame, batch_id: int, out_dir: str) -> None:
    """Land one micro-batch at ``out_dir/batch_id=<id>`` with overwrite
    semantics. foreachBatch is at-least-once: a batch whose files landed
    before the checkpoint commit is replayed wholesale on restart — but
    a replay carries the SAME batch_id, so overwriting the per-batch
    directory replaces the partial/duplicate output instead of appending
    a second copy. That keys exactly-once on the batch id, the standard
    idempotent-file-sink recipe."""
    bdf.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")


def run_stream_transform_to_parquet(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
) -> DataFrame:
    """foreachBatch file sink — the production shape for streaming
    pipelines that land files instead of memory/console. Each
    micro-batch (optionally run through ``transform``, an arbitrary
    BATCH DataFrame→DataFrame function — this is foreachBatch's whole
    point: inside the hook the micro-batch is a plain batch frame, so
    plans streaming cannot express statelessly, e.g. per-batch
    aggregating joins, run unchanged) overwrites its own ``batch_id=N``
    subdirectory (``write_batch_idempotent``), so checkpoint-replayed
    batches are exactly-once at the file level, not just
    at-least-once. Drains with availableNow and returns a batch
    DataFrame over the files written (the batch_id partition column is
    an implementation detail and is dropped). A drain that produced
    ZERO micro-batches (empty source dir, or every file already
    committed in the checkpoint from a prior run) never creates
    ``out_dir`` — that is a successful run with no new data, so an
    empty DataFrame with the result schema (the transform applied to
    an empty batch of the stream's schema — schema derivation only,
    nothing executes) is returned instead of letting the read fail.
    Detected by catching PATH_NOT_FOUND from the read itself, NOT a
    driver-local isdir probe: out_dir may be
    file://.../hdfs://.../s3a://... where a local os.path check is
    always False and would silently discard data that WAS just
    landed."""
    from pyspark.errors import AnalysisException

    fn = transform if transform is not None else (lambda bdf: bdf)
    query = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: write_batch_idempotent(fn(bdf), bid, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    try:
        return spark.read.parquet(out_dir).drop("batch_id")
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            empty = spark.createDataFrame([], stream_df.schema)
            return spark.createDataFrame([], fn(empty).schema)
        raise


def run_stream_to_parquet(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """``run_stream_transform_to_parquet`` with no per-batch transform
    (kept as the stable name for plain landing jobs)."""
    return run_stream_transform_to_parquet(
        spark, stream_df, out_dir, checkpoint_dir
    )


def stream_decontaminate_join(
    spark: SparkSession,
    stream_df: DataFrame,
    bench_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Streaming benchmark decontamination in JOIN mode (r9): run
    ``safety.decontaminate(strategy='join')`` over each micro-batch
    inside ``foreachBatch`` — the in-engine path for benchmark suites
    too large for the stateless array probe (``decontaminate``'s
    streaming branch raises past ``array_bench_limit`` and points
    here).

    Why foreachBatch: the join strategy ends in a per-document
    aggregation over the document's exploded n-grams, which append-mode
    streaming cannot express statelessly — but every document's
    n-grams are entirely WITHIN one micro-batch (documents don't span
    files), so running the batch operator per micro-batch computes the
    exact batch semantics incrementally. Cost per batch is
    batch_ngrams × O(1) broadcast-hash probes — the scale path — where
    the array probe pays batch_rows × |bench|.

    The benchmark is materialized ONCE (persist + count) before the
    stream starts, so per-batch plans re-hash only the cached benchmark
    rows instead of re-scanning its source every trigger; it is
    unpersisted after the drain (results are already on disk).
    Idempotence: each batch lands in its own overwritten ``batch_id=N``
    dir (``write_batch_idempotent``), so checkpoint replays are
    exactly-once at the file level. Returns the drained result as a
    batch DataFrame — (doc_id, n_ngrams, n_contaminated_ngrams,
    contaminated), equal to ``decontaminate(batch_corpus, bench,
    strategy='join')`` over the same files.
    """
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.safety import decontaminate

    bench_static = bench_df.persist()
    bench_static.count()
    try:
        return run_stream_transform_to_parquet(
            spark,
            stream_df,
            out_dir,
            checkpoint_dir,
            transform=lambda bdf: decontaminate(
                bdf,
                bench_static,
                text_col=text_col,
                id_col=id_col,
                n=n,
                strategy="join",
            ),
        )
    finally:
        bench_static.unpersist()


_STORE_LAYOUT_FILE = "_layout.json"
# v2 (r11): payload rows carry the verify columns the probe needs
# (signbucket stores land _n; banded stores land id-bucketed _pbkt dirs)
_STORE_LAYOUT_VERSION = 2


def _marker_io(spark: SparkSession, store_dir: str):
    """(fs, marker Path, Path ctor) for the store's layout marker —
    through the Hadoop FileSystem, NOT driver-local os/open: a
    local-only check silently never engages on HDFS/object stores,
    turning the fail-fast layout gate into a no-op exactly where
    stores are big enough for a silent mis-probe to matter."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import _hadoop_fs

    fs, _ = _hadoop_fs(spark, store_dir)
    jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    return fs, jpath(f"{store_dir.rstrip('/')}/{_STORE_LAYOUT_FILE}"), jpath


def write_store_layout_marker(
    spark: SparkSession,
    store_dir: str,
    kind: str,
    store_buckets: int | None,
    max_batch_id: int | None = None,
) -> None:
    """Persist the accumulating dedup/index store's layout contract as
    ``<store_dir>/_layout.json`` (underscore-prefixed, so Spark's file
    index never reads it as data). The banded layout (``store_buckets``)
    is a STORE-LIFETIME choice: resuming a flat-written store with
    ``store_buckets`` set — or changing the bucket count — silently
    hides pre-switch history from the probe and emits wrong keeper
    sets, so the drives refuse to start on a mismatch instead of
    relying on a docstring (same fail-fast posture as ``get_spark``
    rejecting a typo'd ``state_store``). Call this yourself when
    seeding a store from batch-built ``build_minhash_store`` /
    ``build_signbucket_store`` output. Marker IO goes through the
    Hadoop FileSystem, so the gate engages on any store FS Spark can
    reach.

    ``max_batch_id`` (r12) records the highest streaming batch id ever
    landed in the store; the drives keep it current per trigger and
    REFUSE to resume a store whose marker records landed batches when
    the drive's checkpoint is fresh (no commits): a recreated
    checkpoint restarts batch ids at 0, and a later roll's dynamic
    overwrite would silently replace surviving history leaves with
    colliding ids (the r11 consolidation names merged leaves
    ``min(ids)-1``, so MERGED history never collides — only
    unconsolidated leaves and recent tails do). Batch-seeded stores
    leave it None (no landed batches → fresh checkpoints are fine)."""
    fs, marker, jpath = _marker_io(spark, store_dir)
    fs.mkdirs(marker.getParent())
    payload = {
        "layout_version": _STORE_LAYOUT_VERSION,
        "kind": kind,
        "store_buckets": store_buckets,
    }
    if max_batch_id is not None:
        payload["max_batch_id"] = max_batch_id
    # tmp-then-rename, NOT create(marker, True): since the r12
    # watermark this rewrite happens once per trigger, and an in-place
    # create truncates the live marker immediately — a crash mid-write
    # would leave _layout.json empty/corrupt and every later drive
    # unreadable. The tmp write is all-or-nothing at the marker path;
    # the delete→rename window leaves a COMPLETE tmp, which the reader
    # rolls forward (same repair-on-read family as compact_parquet_dir).
    _write_small_json_atomic(spark, fs, jpath, marker, payload)


def _write_small_json_atomic(spark, fs, jpath, target, payload: dict) -> None:
    """tmp-then-rename landing for tiny JSON control files (layout
    marker, drift signal): the tmp write is all-or-nothing at the
    target path, and the delete→rename window leaves a COMPLETE tmp
    the marker reader rolls forward."""
    tmp = jpath(str(target) + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(payload).encode()))
    finally:
        out.close()
    if fs.exists(target):
        fs.delete(target, False)
    fs.rename(tmp, target)


def _record_max_batch_id(spark: SparkSession, store_dir: str, bid: int) -> None:
    """Advance the marker's ``max_batch_id`` watermark after a batch
    lands (driver-side, one tiny atomic JSON rewrite per trigger —
    monotone, never lowered by a checkpoint replay of an earlier
    batch)."""
    got = _read_store_layout_marker(spark, store_dir)
    if got is None:
        raise ValueError(
            f"dedup store at {store_dir} lost its _layout.json marker "
            "mid-drive — write_store_layout_marker() it back with the "
            "drive's layout before resuming."
        )
    if int(got.get("max_batch_id", -1)) < bid:
        write_store_layout_marker(
            spark, store_dir, got["kind"], got["store_buckets"], bid
        )


def _checkpoint_is_fresh(spark: SparkSession, checkpoint_dir: str) -> bool:
    """True iff the Structured Streaming checkpoint has never started a
    batch (missing dir, or an empty/missing ``offsets/``) — through
    the Hadoop FS, same FS-agnostic posture as ``_marker_io``.

    ``offsets/``, deliberately NOT ``commits/``: a drive that crashed
    after its first batch's work landed (and after the marker's
    watermark advanced) but BEFORE the commit file has offsets/0 and
    an empty commits/ — resuming THAT checkpoint replays the same
    batch id idempotently and is exactly the safe path; gating on
    commits/ would brick the legitimate resume the gate's own error
    message recommends. Only a checkpoint with no offsets at all
    restarts batch ids at 0 against a store that already has them."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import _hadoop_fs

    fs, _ = _hadoop_fs(spark, checkpoint_dir)
    jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    offsets = jpath(f"{checkpoint_dir.rstrip('/')}/offsets")
    if not fs.exists(offsets):
        return True
    return not any(
        not s.getPath().getName().startswith(".")
        for s in fs.listStatus(offsets)
    )


def _read_store_layout_marker(
    spark: SparkSession, store_dir: str
) -> dict | None:
    """Read the store's layout marker, repairing the atomic-write
    protocol's crash windows: a COMPLETE ``.tmp`` left by a crash
    between delete and rename (or beside a marker a pre-r12 in-place
    writer corrupted) is rolled forward to the marker path. Returns
    None when neither file exists; raises with rebuild guidance when
    what exists cannot be decoded."""
    fs, marker, jpath = _marker_io(spark, store_dir)
    tmp = jpath(str(marker) + ".tmp")

    def _read(path) -> dict:
        st = fs.open(path)
        try:
            buf, b = [], st.read()
            while b != -1:  # ~80 bytes; byte-wise py4j read is fine
                buf.append(b)
                b = st.read()
        finally:
            st.close()
        return json.loads(bytes(buf).decode())

    marker_exists = fs.exists(marker)
    if marker_exists:
        try:
            return _read(marker)
        except ValueError:
            pass  # truncated/corrupt — try the tmp roll-forward below
    if fs.exists(tmp):
        try:
            got = _read(tmp)
        except ValueError:
            got = None
        if got is not None:
            if marker_exists:
                fs.delete(marker, False)
            fs.rename(tmp, marker)
            return got
        fs.delete(tmp, False)  # incomplete tmp: the marker is truth
    if marker_exists:
        raise ValueError(
            f"dedup store at {store_dir} has an undecodable "
            f"{_STORE_LAYOUT_FILE} and no complete recovery tmp — "
            "rebuild the store, or write_store_layout_marker() if you "
            "know its layout."
        )
    return None


def _enforce_store_layout(
    spark: SparkSession,
    store_dir: str,
    kind: str,
    store_buckets: int | None,
    checkpoint_dir: str | None = None,
) -> None:
    """Drive-start layout gate: first use writes the marker; every
    later drive (or resume) must present the SAME kind and bucket
    count, and a non-empty store without a marker is refused (it could
    be either layout — rebuild it, or ``write_store_layout_marker`` if
    you know which; pre-v2 stores also predate the stored verify
    columns, so a rebuild is the correct migration).

    With ``checkpoint_dir`` (r12), also refuses the fresh-checkpoint /
    landed-store combination: a recreated checkpoint restarts batch
    ids at 0, so its landings can silently dynamic-overwrite surviving
    history leaves with colliding ids. Markers written before r12 (no
    ``max_batch_id``) pass ungated — they predate the watermark, and
    their first post-r12 drive starts recording it."""
    fs, marker, jpath = _marker_io(spark, store_dir)
    expected = {
        "layout_version": _STORE_LAYOUT_VERSION,
        "kind": kind,
        "store_buckets": store_buckets,
    }
    got = _read_store_layout_marker(spark, store_dir)
    if got is not None:
        if {k: got.get(k) for k in expected} != expected:
            raise ValueError(
                f"dedup store layout mismatch at {store_dir}: the store "
                f"was written with {got}, this drive requests {expected}. "
                "The layout (bucketing and bucket count) is a "
                "store-lifetime contract — rebuild the store to change it."
            )
        if (
            checkpoint_dir is not None
            and int(got.get("max_batch_id", -1)) >= 0
            and _checkpoint_is_fresh(spark, checkpoint_dir)
        ):
            raise ValueError(
                f"dedup store at {store_dir} has landed streaming batches "
                f"(max_batch_id={got['max_batch_id']}) but this drive's "
                f"checkpoint {checkpoint_dir} has never started a batch: "
                "a fresh checkpoint restarts batch ids at 0 and would "
                "silently overwrite surviving history leaves with "
                "colliding ids. Resume with the original checkpoint, or "
                "rebuild the store alongside the new checkpoint."
            )
        return

    def _nonempty(path: str) -> bool:
        p = jpath(path)
        if not fs.exists(p):
            return False
        return any(
            # the marker family (_layout.json and its atomic-write tmp)
            # is metadata, not store content
            not s.getPath().getName().startswith(_STORE_LAYOUT_FILE)
            for s in fs.listStatus(p)
        )

    siblings = [
        store_dir.rstrip("/") + sfx
        for sfx in ("_recent", "_bands", "_bands_recent")
    ]
    if _nonempty(store_dir) or any(_nonempty(s) for s in siblings):
        raise ValueError(
            f"dedup store at {store_dir} has no _layout.json marker "
            "(pre-r11 store?): its layout cannot be verified against "
            f"this drive's (kind={kind!r}, store_buckets={store_buckets!r}). "
            "Rebuild the store, or write_store_layout_marker() if you "
            "know its layout matches (pre-v2 stores lack the stored "
            "verify columns and should be rebuilt)."
        )
    write_store_layout_marker(spark, store_dir, kind, store_buckets)


def _read_bucket_subtrees(
    spark: SparkSession, root: str, bucket_col: str, buckets: list
) -> DataFrame | None:
    """Direct-path read of ONLY the touched bucket partitions of a
    bucket-major store (``<root>/<bucket_col>=K/batch_id=N/...``):
    existence is checked per bucket through the Hadoop FS (≤
    ``len(buckets)`` RPCs, bounded by ``store_buckets``), then Spark's
    file index lists just the touched subtrees. This is the layout's
    whole point: partition PRUNING (filter/INSET on a batch-major
    layout) avoids reading untouched dirs but still pays a full
    InMemoryFileIndex discovery of every partition dir per
    ``spark.read`` — measured ~7 s per read at B=4096 on this host,
    more than the pruned scan itself (r11, SCALE.md), and a per-trigger
    O(B·batches) prefix listing on an object store. Bucket-major
    direct paths make probe cost proportional to the TOUCHED buckets
    only. Returns None when no touched bucket dir exists yet (e.g. a
    zero-row first batch). Thin alias over
    ``sources.readers.read_partition_subtrees`` (shared with the
    persisted IVF postings probe)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.readers import (
        read_partition_subtrees,
    )

    return read_partition_subtrees(spark, root, bucket_col, buckets)


def _read_committed_recent(
    spark: SparkSession, root: str, bid: int
) -> DataFrame | None:
    """Direct-path read of a two-tier store's COMMITTED recent batch
    dirs (``<root>/batch_id=K`` for K < ``bid``) — the r12 probe shape:
    the in-flight batch's rows come straight from the persisted
    in-memory frame instead of being read back from the files the
    trigger just wrote, which (a) removes the land→read-back ordering
    so the landings can overlap the probe (guide §2.6), and (b) makes
    the read immune to a concurrent landing's in-flight commit: only
    dirs whose batches are checkpoint-committed enter the file index
    (one listStatus, no per-dir existence RPCs). Returns None when no
    committed dir exists yet (first trigger, or a fully-rolled tail)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import (
        _hadoop_fs,
    )

    root = root.rstrip("/")
    fs, hroot = _hadoop_fs(spark, root)
    if not fs.exists(hroot):
        return None
    dirs = [
        f"{root}/{s.getPath().getName()}"
        for s in fs.listStatus(hroot)
        if s.isDirectory()
        and s.getPath().getName().startswith("batch_id=")
        and int(s.getPath().getName().split("=", 1)[1]) < bid
    ]
    if not dirs:
        return None
    return spark.read.option("basePath", root).parquet(*dirs)


def _two_tier(
    main: DataFrame | None, recent: DataFrame, bucket_col: str
) -> DataFrame:
    """Thin alias over ``sources.readers.union_partition_tiers``
    (shared with the two-tier streamed IVF postings probe)."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.readers import (
        union_partition_tiers,
    )

    return union_partition_tiers(main, recent, bucket_col)


def _run_two_tier_maintenance(
    spark: SparkSession,
    roots: list[tuple[str, str, bool]],
    bid: int,
    min_batch_dirs: int,
    defer_reap: bool = False,
) -> list[str]:
    """The r12 self-driving maintenance cycle, called from inside
    ``foreachBatch`` after batch ``bid``'s work lands: for each
    (root, bucket_col, wide) store root, roll the COMMITTED recent
    tail (strictly below the in-flight ``bid`` — those batches'
    checkpoint commits landed before this batch ran, so rolling them
    adds no new crash window; the in-flight batch stays in the tail,
    which also keeps the tail non-empty for the next probe's read),
    then threshold-gated consolidation: ``consolidate_bucket_history``
    early-returns unless some bucket accumulated ``min_batch_dirs``
    batch dirs, so the O(store) merge rewrite fires only every ~
    ``min_batch_dirs / roll_cadence`` cycles instead of every cycle —
    the single-level LSM amortization (a size-tiered policy is the
    next refinement; the threshold already bounds per-probe subtree
    listing at ``min_batch_dirs`` dirs per bucket). ``wide`` stores
    (shingle/vector payload arrays) roll and consolidate with
    ``shuffle=False`` — the wide-row exchange was measured spilling
    past local scratch at the 20M-doc decade (SCALE.md r11).

    ``defer_reap=True`` (r13): the cycle only ADDS files — the rolled
    recent dirs, the merged buckets' old dirs and the consolidation
    PENDING marker are NOT deleted; their paths are RETURNED for the
    caller to pass to ``_reap_deferred`` at a read-quiesced point.
    The interim double-presence is exactly the two ops' documented
    crash windows, which every probe tolerates by construction — this
    is what lets the whole cycle run on a background thread UNDER
    live probes (guide §2.6) without a delete ever racing a probe's
    pinned file index. Returns [] when not deferring."""
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import (
        _hadoop_fs,
        consolidate_bucket_history,
        roll_recent_into_store,
    )

    def _maintain_one(root: str, bucket_col: str, wide: bool) -> list[str]:
        reap = roll_recent_into_store(
            spark,
            root,
            bucket_col,
            before_batch_id=bid,
            shuffle=not wide,
            defer_reap=defer_reap,
        ).get("deferred_reap", [])
        fs, hroot = _hadoop_fs(spark, root)
        if fs.exists(hroot):
            reap += consolidate_bucket_history(
                spark,
                root,
                min_batch_dirs=min_batch_dirs,
                shuffle=not wide,
                defer_reap=defer_reap,
            ).get("deferred_reap", [])
        return reap

    if len(roots) == 1:
        return _maintain_one(*roots[0])
    # The roots (band store + payload store) are DISJOINT directory
    # trees whose roll/consolidate jobs share no state — submit them
    # from a small thread pool so the second root's jobs back-fill the
    # executor slots the first root's tail leaves idle (optimization
    # guide §2.6: actions are only sequential because driver code
    # calls them sequentially). Within a root the order stays
    # roll → consolidate (consolidate merges the dirs roll just
    # landed). Exceptions propagate via future.result().
    from concurrent.futures import ThreadPoolExecutor

    reap: list[str] = []
    with ThreadPoolExecutor(max_workers=len(roots)) as pool:
        futures = [pool.submit(_maintain_one, *r) for r in roots]
        for f in futures:
            reap += f.result()
    return reap


class _MaintenanceScheduler:
    """Serialized background in-drive maintenance (r13, guide §2.6):
    at most ONE cycle in flight, run on a single worker thread so
    later triggers' jobs back-fill the executor slots the cycle's
    tail leaves idle. ``cycle(bid)`` is the drive's maintenance
    callable and returns a deferred-deletion list (possibly empty);
    deletions are reaped at read-quiesced points only — the next
    foreachBatch entry (``on_trigger_entry``, before any probe plan
    is built), the next ``fire`` (which also serializes cycles), or
    ``drain``. A failed cycle surfaces at the next of those points,
    one trigger later than the r12 synchronous shape — within the
    ops' documented crash contract (an interrupted cycle was always
    legal and convergent: the next roll re-rolls everything
    committed, the consolidation PENDING marker recovers). With
    ``_OVERLAP_IN_DRIVE_MAINTENANCE`` False, ``fire`` runs the cycle
    synchronously and reaps inline (the r12 shape, the A/B toggle)."""

    def __init__(self, spark: SparkSession, cycle):
        from concurrent.futures import ThreadPoolExecutor

        self._spark = spark
        self._cycle = cycle
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = None

    def _join_and_reap(self) -> None:
        f, self._pending = self._pending, None
        _reap_deferred(self._spark, f.result())

    def on_trigger_entry(self) -> None:
        if self._pending is not None and self._pending.done():
            self._join_and_reap()

    def fire(self, bid: int) -> None:
        if self._pending is not None:
            self._join_and_reap()
        if _OVERLAP_IN_DRIVE_MAINTENANCE:
            self._pending = self._pool.submit(self._cycle, bid)
        else:
            _reap_deferred(self._spark, self._cycle(bid))

    def drain(self) -> None:
        try:
            if self._pending is not None:
                self._join_and_reap()
        finally:
            self._pool.shutdown(wait=True)


def _reap_deferred(spark: SparkSession, paths: list[str]) -> None:
    """Delete the paths a ``defer_reap`` maintenance cycle returned.
    Call ONLY from a point where no concurrent reader can hold them in
    a pinned file index: between triggers (foreachBatch entry, before
    any probe plan is built) or after the drive drains. Order is
    preserved — data dirs first, the consolidation PENDING marker
    last, keeping the marker ⇒ possible-duplication invariant."""
    if not paths:
        return
    from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import (
        _hadoop_fs,
    )

    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    fs, _ = _hadoop_fs(spark, paths[0])
    for p in paths:
        fs.delete(Path(p), True)


def stream_near_dedup_minhash(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.4,
    unit: str = "word",
    store_buckets: int | None = None,
    max_bucket: int | None = None,
    maintain_every: int | None = None,
    consolidate_min_batch_dirs: int = 8,
) -> DataFrame:
    """Incremental near-dup deduplication of a document stream against
    an accumulating MinHash signature store (r9) — the ingestion-time
    twin of ``dedup.near_dup_pairs``. New data arrives in micro-batches
    and each batch is deduplicated against EVERYTHING seen so far
    without ever recomputing the history: per batch, shingle arrays +
    MinHash signatures are computed once, landed in the store
    (``store_dir/batch_id=N`` — overwritten, so checkpoint replays are
    idempotent), and the batch's LSH bands are probed against the bands
    of the full store. A document is DROPPED iff some already-seen or
    smaller-id-same-batch document collides in an LSH band AND exact
    shingle Jaccard (``dedup.verify_pairs_jaccard``, same arrays) meets
    ``threshold``; survivors land in ``out_dir/batch_id=N``
    (``write_batch_idempotent``). Dropped documents' signatures STAY in
    the store — the drop rule is "has a smaller qualifying partner,
    whatever that partner's own fate", which (unlike greedy
    keep-first-transitively) is batch-boundary-free and therefore
    exactly equal to the batch rule: under event-order = id-order
    arrival (the staged-replay contract, as ``native_sessionize_stream``)
    the drained keeper set equals ``corpus MINUS {id_b of
    near_dup_pairs(corpus)}`` at the same parameters, which is the
    DuckDB oracle. Out-of-order arrival degrades gracefully: it is
    still "dedup against all prior arrivals + smaller in-batch ids",
    just no longer the batch-identical pair set.

    Scale shape — the part that matters at 100 TB of history: the
    history is NEVER shuffled and NEVER recomputed. Each trigger costs
    two columnar scans of the store (parquet, partitioned by batch_id):
    the band probe reads only the ``h*`` signature columns and joins
    against the BROADCAST bands of the current batch (micro-batches
    are small by construction — broadcast-hash, zero exchange on the
    history side), and the verify reads only the ``shingles`` column
    for the handful of candidate ids. Per-doc state is written exactly
    once, at arrival. The sum over triggers is O(total × history/batch)
    scan work with the flat layout — the intrinsic cost of exact dedup
    against full history when every trigger re-bands the whole store.
    ``store_buckets`` (r10, bucket-major since r11) is the banded
    layout that removes it: when set, each batch's band rows are ALSO
    landed pre-banded at ``<store_dir>_bands/_bkt=K/batch_id=N`` where
    ``_bkt = pmod(xxhash64(band, sig), store_buckets)``, landed via
    DYNAMIC partition overwrite (a checkpoint replay rewrites exactly
    its own (bucket, batch) leaves — exactly-once at the file level),
    and the probe reads ONLY the touched bucket subtrees by direct
    path (``_read_bucket_subtrees``; one bounded driver-side collect
    of ≤ store_buckets bucket ids + ≤ store_buckets FS existence
    checks per trigger). Untouched bucket directories are never read
    — and, since r11, never even LISTED: the r10 batch-major layout
    (``batch_id=N/_bkt=K`` + literal-IN partition pruning) skipped the
    untouched dirs' bytes but still paid a full file-index discovery
    of every partition dir per read, measured at ~7 s per read at
    B=4096 on this host — more than the pruned scan itself — and an
    O(B·batches) prefix listing on an object store (SCALE.md r11;
    literal IN rather than DPP because DPP's benefit heuristic was
    measured declining to plant at that bucket count). History is
    never re-banded (the flat probe re-derives band rows from the h*
    columns every trigger; the banded store pays that once at
    arrival). Probe cost ≈ coverage(m, store_buckets) × (listing +
    history-read) where a batch with ``m`` band rows touches ≤ m
    buckets — constant-in-history in the trickle regime (small
    frequent batches against deep history); a batch with m ≫
    store_buckets covers every bucket and degrades to the flat scan
    cost. Size ``store_buckets`` ≈ 5–10× the per-trigger band-row
    count.

    The banded layout also ID-BUCKETS THE PAYLOAD (r11): signature
    rows land under ``store_dir/_pbkt=K/batch_id=N`` with ``_pbkt =
    pmod(xxhash64(id), store_buckets)``, and the exact-Jaccard verify
    reads only the candidate ids' bucket subtrees (same direct-path
    idiom as the band probe) — without it every trigger scanned the
    full history's ``shingles`` column (the store's widest) for a
    handful of candidates, an O(history)-per-trigger term the banded
    band probe alone did not remove (VERDICT r10; measured 6×+ and
    growing at the 5M-doc decade, SCALE.md).

    The layout is a STORE-LIFETIME contract like the signature space:
    resuming a store written flat with ``store_buckets`` set (or
    changing the bucket count) would silently hide pre-switch history
    from the probe — so the drive persists the layout in
    ``<store_dir>/_layout.json`` on first use and REFUSES to start on
    a mismatch or on an unmarked pre-existing store
    (``_enforce_store_layout``); rebuild the store to change layout,
    exactly like re-bucketing.

    TWO-TIER LANDING (r11): a dynamic-overwrite landing straight into
    the bucket-major layout costs ~17 ms of commit per touched
    partition dir PER TRIGGER (measured ~9 s/trigger at B=4096 —
    dominating the otherwise-constant banded trigger), so each batch
    lands batch-major in ``<store_dir>_recent`` / ``<bands>_recent``
    (one cheap dir per trigger) and probes read history ∪ recent
    (``_two_tier``). Maintenance loop:
    ``sources.writers.roll_recent_into_store`` on BOTH roots (pays the
    per-dir commit once per cycle; its crash window only duplicates
    rows across tiers, which the DISTINCT candidate/drop sets and the
    pair-aggregating verify tolerate), then
    ``consolidate_bucket_history`` to merge each bucket's accumulated
    batch dirs (probe filters ``batch_id <= bid`` keep merged history
    visible). Roll cadence bounds the recent tail's listing cost —
    unrolled, the recent tier degrades toward the flat layout's
    per-trigger scan. SELF-DRIVING since r12: ``maintain_every=N``
    runs that loop in-drive from ``foreachBatch`` after every Nth
    landed batch (``_run_two_tier_maintenance`` — rolls only
    checkpoint-COMMITTED batches, so no new crash window; the O(store)
    consolidation rewrite is threshold-gated on
    ``consolidate_min_batch_dirs`` dirs in some bucket, the
    single-level LSM amortization), instead of requiring an external
    scheduler between drives. Two-tier only (requires
    ``store_buckets``).

    ``max_bucket`` (r12) is the hot-band backstop the batch operator
    has (``dedup.near_dup_pairs(max_bucket=...)``): (band, sig) groups
    whose occupancy exceeds it produce NO candidates — the bound that
    keeps a degenerate boilerplate/template band from fanning out
    every trigger's probe join without limit. The occupancy is
    CORPUS-GLOBAL AS OF EACH TRIGGER, not per-probe-batch: every row
    of a (band, sig) group hashes to the same ``_bkt``, so the probe's
    touched-subtree read already holds each probed group's full
    history∪recent∪current occupancy, and the guard applies the exact
    batch window-count rule to the corpus-so-far (one extra aggregation
    over the already-read subtrees, candidate-group-restricted). The
    one semantic caveat is inherent to ANY online guard: a group that
    crosses the cap mid-stream produced drops while it was small
    (each a correct application of the batch rule to that trigger's
    prefix corpus) and stops producing new ones after — on corpora
    where no group crosses the cap mid-stream (including every
    non-skewed corpus, where the guard never engages) the drained
    keeper set equals the batch operator's at the same ``max_bucket``.

    Returns the drained keeper rows (original stream columns) as a
    batch DataFrame over ``out_dir``.
    """
    from pyspark.errors import AnalysisException

    from big_data_analysis_of_twitter_emoji_usage_spark.operators.dedup import (
        build_minhash_store,
        signature_bands,
        verify_pairs_jaccard,
    )

    hcols = [f"h{i}" for i in range(num_hashes)]
    bands_dir = store_dir.rstrip("/") + "_bands"
    if maintain_every is not None and store_buckets is None:
        raise ValueError(
            "maintain_every requires the two-tier banded layout "
            "(store_buckets): the flat layout has no recent tail to "
            "roll or bucket history to consolidate."
        )
    _enforce_store_layout(
        spark, store_dir, "minhash", store_buckets, checkpoint_dir
    )

    def _dedup_batch(bdf: DataFrame, bid: int) -> None:
        # the per-batch state IS one build_minhash_store increment —
        # batch-built reference stores and this accumulating store are
        # interchangeable (dedup.near_dup_pairs_against_store probes
        # either)
        state = build_minhash_store(
            bdf, text_col, id_col, k, num_hashes, unit
        )
        if store_buckets is None:
            # flat layout: one compute of the shingle/signature kernel
            # per batch; the probe and verify below re-READ it columnar
            # instead of re-executing the subtree (SCALE.md execution
            # caveat). <= bid: replays must not see a later batch's
            # state (none can exist in normal operation — out_dir lands
            # after store — but the filter makes the replay read-set
            # explicit and exact).
            state.write.mode("overwrite").parquet(
                f"{store_dir}/batch_id={bid}"
            )
            store = spark.read.parquet(store_dir).filter(
                F.col("batch_id") <= F.lit(bid)
            )
            cur = store.filter(F.col("batch_id") == bid)
            bands_cur = signature_bands(
                cur.select(id_col, *hcols), id_col, num_hashes, band_size
            )
            # the seen side carries the corpus-global occupancy guard
            # (window count over the WHOLE store incl. this batch —
            # the exact batch-operator rule); emptying a hot group on
            # one side of the equi-join kills all its pairs
            bands_seen = signature_bands(
                store.select(id_col, *hcols),
                id_col,
                num_hashes,
                band_size,
                max_bucket,
            )
            cand = (
                bands_seen.alias("a")
                .join(
                    F.broadcast(bands_cur).alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
                .distinct()
            )
            pairs = verify_pairs_jaccard(
                cand, store.select(id_col, "shingles"), id_col, threshold
            )
            dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
            write_batch_idempotent(
                bdf.join(dropped, id_col, "left_anti"), bid, out_dir
            )
            return
        # Banded (two-tier bucket-major) layout: each batch lands
        # BATCH-MAJOR in the _recent tails (one per-batch overwrite
        # dir — write_batch_idempotent, so a checkpoint replay
        # rewrites its own dir and landings stay exactly-once at the
        # file level) and the maintenance roll moves committed tails
        # into <bucket>=K/batch_id=N history (landing there directly
        # would pay the dynamic-overwrite commit per touched dir per
        # trigger; SCALE.md r11). Probes read ONLY the touched bucket
        # subtrees of the history tier by direct path
        # (_read_bucket_subtrees) plus the small recent tail — the r10
        # batch-major layout pruned the SCAN with a literal IN on _bkt
        # but still paid a full partition discovery of all
        # ~store_buckets dirs per read (measured ~7 s at B=4096,
        # dominating the probe). The per-trigger driver work stays
        # bounded: one collect of the batch's ≤ store_buckets band
        # buckets, one of the candidates' ≤ store_buckets payload
        # buckets, and ≤ store_buckets FS existence checks per probe.
        state = state.persist()
        state_p = state.withColumn(
            "_pbkt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(store_buckets)),
        )
        bc = (
            signature_bands(
                state.select(id_col, *hcols), id_col, num_hashes, band_size
            )
            .withColumn(
                "_bkt", F.pmod(F.xxhash64("band", "sig"), F.lit(store_buckets))
            )
            .persist()
        )
        cand = None
        seen_cached = None
        # r12 trigger shape: the two landings write dirs nothing in
        # this trigger reads back — the probe takes the current batch's
        # rows from the PERSISTED state/bc frames and the recent tail
        # from the already-committed batch dirs (_read_committed_recent)
        # — so both writes run on background threads, overlapped with
        # the probe/verify jobs (guide §2.6), and are joined before the
        # batch returns (a landing failure must fail the batch so the
        # checkpoint never commits a half-landed trigger).
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)
        landings = [
            pool.submit(
                write_batch_idempotent,
                state_p,
                bid,
                store_dir.rstrip("/") + "_recent",
            ),
            pool.submit(write_batch_idempotent, bc, bid, bands_dir + "_recent"),
        ]
        try:
            bkts = [r[0] for r in bc.select("_bkt").distinct().collect()]
            if not bkts:
                # zero-row micro-batch: nothing landed, nothing to dedup
                write_batch_idempotent(bdf, bid, out_dir)
                return
            committed_bands = _read_committed_recent(
                spark, bands_dir + "_recent", bid
            )
            cur_bands = bc.withColumn("batch_id", F.lit(bid))
            recent_bands = (
                cur_bands
                if committed_bands is None
                else committed_bands.unionByName(cur_bands)
            )
            bands_seen = _two_tier(
                _read_bucket_subtrees(spark, bands_dir, "_bkt", bkts),
                recent_bands.filter(F.col("_bkt").isin(bkts)),
                "_bkt",
            ).filter(F.col("batch_id") <= F.lit(bid))
            probe = bc
            if max_bucket is not None:
                # corpus-global hot-band backstop (r12): every row of
                # a (band, sig) group hashes to the same _bkt, so the
                # touched-subtree read above already holds each probed
                # group's FULL history∪recent∪current occupancy — one
                # extra aggregation over those subtrees (restricted to
                # the batch's own groups by the broadcast semi-join)
                # computes the exact batch-operator window count, and
                # hot groups are emptied from the broadcast probe side
                # (killing all their pairs). ``hot`` is bounded by the
                # batch's distinct groups — broadcastable by the same
                # argument as bc itself. bands_seen is persisted so the
                # occupancy agg and the candidate join share ONE read
                # of the touched subtrees — the dominant per-trigger IO
                # at deep history, which the guard must not double.
                bands_seen = seen_cached = bands_seen.persist()
                hot = (
                    bands_seen.join(
                        F.broadcast(bc.select("band", "sig").distinct()),
                        ["band", "sig"],
                    )
                    .groupBy("band", "sig")
                    # countDistinct, not count: the store's documented
                    # crash windows (roll/consolidate interrupted,
                    # replayed final batch) legally duplicate rows
                    # across tiers, and a raw row count would inflate
                    # occupancy and spuriously engage the guard —
                    # store rows are unique per (id, band) by
                    # construction, so the distinct-id count IS the
                    # batch operator's occupancy under any duplication
                    .agg(F.countDistinct(F.col(id_col)).alias("_bc"))
                    .filter(F.col("_bc") > max_bucket)
                    .select("band", "sig")
                )
                probe = bc.join(
                    F.broadcast(hot), ["band", "sig"], "left_anti"
                )
            cand = (
                bands_seen.alias("a")
                .join(
                    F.broadcast(probe).alias("b"),
                    (F.col("a._bkt") == F.col("b._bkt"))
                    & (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
                .distinct()
                .persist()
            )
            # verify pruned to the candidates' payload buckets (r11):
            # the exact-Jaccard verify reads the store's WIDEST column
            # (shingles) for a handful of candidate ids — the pruned
            # direct-path read touches only their buckets instead of
            # scanning (or even listing) the whole history's payload.
            # cand is persisted so the bucket collect and the verify
            # join share one execution of the band-probe subtree.
            pbkts = [
                r[0]
                for r in cand.select(
                    F.explode(F.array("id_a", "id_b")).alias("_i")
                )
                .select(
                    F.pmod(F.xxhash64("_i"), F.lit(store_buckets)).alias(
                        "_pbkt"
                    )
                )
                .distinct()
                .collect()
            ]
            if not pbkts:
                keep = bdf
            else:
                committed_pay = _read_committed_recent(
                    spark, store_dir.rstrip("/") + "_recent", bid
                )
                cur_pay = state_p.withColumn("batch_id", F.lit(bid))
                recent_pay = (
                    cur_pay
                    if committed_pay is None
                    else committed_pay.unionByName(cur_pay)
                )
                payload = _two_tier(
                    _read_bucket_subtrees(spark, store_dir, "_pbkt", pbkts),
                    recent_pay.filter(F.col("_pbkt").isin(pbkts)),
                    "_pbkt",
                ).filter(F.col("batch_id") <= F.lit(bid)).select(
                    id_col, "shingles"
                )
                pairs = verify_pairs_jaccard(
                    cand, payload, id_col, threshold
                )
                dropped = pairs.select(
                    F.col("id_b").alias(id_col)
                ).distinct()
                keep = bdf.join(dropped, id_col, "left_anti")
            write_batch_idempotent(keep, bid, out_dir)
        finally:
            # join the landing threads FIRST: their writes read the
            # persisted frames, and a landing failure must propagate.
            # Drain EVERY future before re-raising (r13, ADVICE r12):
            # result() raising on the first landing must not skip the
            # second landing's join (its write would still be in
            # flight while the frames unpersist below) nor the pool
            # shutdown (leaked executor threads for the process life).
            _errs = []
            for _f in landings:
                try:
                    _f.result()
                except BaseException as _e:  # noqa: BLE001 — re-raised
                    _errs.append(_e)
            pool.shutdown()
            state.unpersist()
            bc.unpersist()
            if cand is not None:
                cand.unpersist()
            if seen_cached is not None:
                seen_cached.unpersist()
            if _errs:
                raise _errs[0]

    n_landed = [0]  # triggers since drive start (cadence, not state)
    # r13: the maintenance cycle runs on a background thread with
    # DEFERRED reaping — the cycle only ADDS files (the roll/
    # consolidate crash-window shape every probe tolerates), and the
    # deletes land between triggers, where no probe holds a pinned
    # file index (guide §2.6; _MaintenanceScheduler).
    sched = (
        _MaintenanceScheduler(
            spark,
            lambda bid: _run_two_tier_maintenance(
                spark,
                [(bands_dir, "_bkt", False), (store_dir, "_pbkt", True)],
                bid,
                consolidate_min_batch_dirs,
                defer_reap=True,
            ),
        )
        if maintain_every is not None
        else None
    )

    def _on_batch(bdf: DataFrame, bid: int) -> None:
        if sched is not None:
            sched.on_trigger_entry()
        _dedup_batch(bdf, bid)
        # marker watermark AFTER the batch's work lands — a crash in
        # between leaves the watermark one batch low, which only makes
        # the fresh-checkpoint gate conservative (never permissive)
        _record_max_batch_id(spark, store_dir, bid)
        if maintain_every is not None:
            n_landed[0] += 1
            if n_landed[0] % maintain_every == 0:
                sched.fire(bid)

    query = (
        stream_df.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if sched is not None:
            sched.drain()
    try:
        return spark.read.parquet(out_dir).drop("batch_id")
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], stream_df.schema)
        raise


def stream_near_dedup_embedding(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 2,
    threshold: float = 0.4,
    store_buckets: int | None = None,
    max_bucket: int | None = None,
    maintain_every: int | None = None,
    consolidate_min_batch_dirs: int = 8,
) -> DataFrame:
    """Incremental SEMANTIC near-dup deduplication of an embedding
    stream against an accumulating sign-LSH bucket store (r9) — the
    embedding-space twin of ``stream_near_dedup_minhash`` and the
    ingestion-time twin of ``similarity.embedding_near_dup_pairs``. Per
    micro-batch: vectors and their per-table coordinate-sign bucket
    codes are computed ONCE at arrival and landed in the store
    (``store_dir/batch_id=N``, overwritten — replay-idempotent), the
    batch's (table, bucket) rows probe the full store's via
    broadcast-hash (history never shuffled), and candidates are
    verified by exact cosine against the stored vectors. A vector is
    DROPPED iff some smaller-id already-seen or same-batch vector
    shares a bucket in any table at cosine ≥ ``threshold``; dropped
    vectors' codes STAY in the store (the "smaller qualifying partner,
    whatever its fate" rule — batch-boundary-free), so under ordered
    arrival the drained keeper set equals the batch operator's keeper
    rule exactly.

    ``bits``/``tables`` are REQUIRED static here (no auto-bits): the
    bucket space must be identical across the store's whole lifetime —
    a per-batch corpus-sized ``bits`` would re-key history and silently
    miss cross-batch pairs. Size them for the corpus the store will
    GROW INTO (the ``auto_sign_bits`` rule at expected n), and rebuild
    the store on re-bucketing, exactly like any persisted LSH index.
    ``max_bucket`` (r12) is the corpus-global hot-bucket backstop —
    (table, bucket) groups whose occupancy across everything seen so
    far exceeds it produce no candidates, the exact
    ``similarity.embedding_near_dup_pairs(max_bucket=...)`` window
    rule applied to the corpus-as-of-each-trigger (see the MinHash
    twin's docstring for why the touched-subtree read already holds
    the full occupancy and for the one inherent online caveat).
    ``maintain_every`` / ``consolidate_min_batch_dirs`` (r12) run the
    two-tier maintenance loop in-drive, every Nth landed batch —
    same contract as the MinHash twin.

    Scale shape: per-vector state is written once at arrival; each
    trigger costs two columnar store scans (bucket-code columns for
    the probe, vector column for the handful of candidates) joined
    against the BROADCAST batch — O(total × history/batch) total scan
    work with the flat layout. ``store_buckets`` (r10) is the same
    band-partitioned lever as the MinHash twin's, with the SAME
    two-tier bucket-major shape (see that docstring for the layout
    measurements): (table, bucket) rows — ``_bkt =
    pmod(xxhash64(_t, _b), store_buckets)`` — and ``_pbkt``-keyed
    payload rows land batch-major in ``<dir>_recent`` per trigger (one
    cheap dir; the straight bucket-major landing's per-dir commit was
    the dominant trigger cost), probes read the bucket-major history
    tier ∪ recent by direct path over the TOUCHED buckets only, and
    the cosine verify reads only the candidate ids' payload buckets
    plus the stored per-vector self-norm ``_n`` — no per-trigger
    whole-history scan, listing, or norm recompute. The win is real
    in the trickle regime (per-trigger band rows ≪ ``store_buckets``),
    and the layout is a store-lifetime contract like ``bits``,
    enforced by the ``<store_dir>/_layout.json`` marker (the drive
    refuses a mismatched or unmarked resume; never flip layout or
    bucket count mid-store). Maintenance loop, between drives:
    ``roll_recent_into_store`` on both roots, then
    ``consolidate_bucket_history`` (see the MinHash twin).

    Returns the drained keeper rows (original stream columns) over
    ``out_dir``.
    """
    from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (
        _dot_d,
        build_signbucket_store,
        cosine_with_norms,
    )
    from big_data_analysis_of_twitter_emoji_usage_spark.core import explode_nonempty

    # dim=None → interpreted-HOF dot everywhere in this drive: the
    # codegen-unrolled _dot_d only wins at pair volumes far above a
    # trigger's candidate count (interleaved A/B, OPTIMIZATION_r12),
    # and a per-drive width probe is one more job per trigger path.
    # The plumbing stays (_dot_d(..., None) ≡ _dot) so a large-batch
    # deployment can re-engage it with one probed constant.

    def _drive_dim(bdf: DataFrame) -> int | None:
        return None

    bcols = [f"b{t}" for t in range(tables)]

    def _bands(df: DataFrame) -> DataFrame:
        structs = F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("b"))
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col), explode_nonempty(structs).alias("_tb")
        ).select(id_col, F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))

    from pyspark.errors import AnalysisException

    bands_dir = store_dir.rstrip("/") + "_bands"
    if maintain_every is not None and store_buckets is None:
        raise ValueError(
            "maintain_every requires the two-tier banded layout "
            "(store_buckets): the flat layout has no recent tail to "
            "roll or bucket history to consolidate."
        )
    _enforce_store_layout(
        spark, store_dir, "signbucket", store_buckets, checkpoint_dir
    )

    def _dedup_batch(bdf: DataFrame, bid: int) -> None:
        # one build_signbucket_store increment — batch-built reference
        # stores and this accumulating store are interchangeable
        # (similarity.embedding_near_dup_against_store probes either)
        dim = _drive_dim(bdf)
        state = build_signbucket_store(bdf, id_col, vec_col, bits, tables, dim)
        if store_buckets is None:
            # flat layout (see the MinHash twin for the replay filter)
            state.write.mode("overwrite").parquet(
                f"{store_dir}/batch_id={bid}"
            )
            store = spark.read.parquet(store_dir).filter(
                F.col("batch_id") <= F.lit(bid)
            )
            cur = store.filter(F.col("batch_id") == bid)
            bands_cur = _bands(cur.select(id_col, *bcols))
            bands_all = _bands(store.select(id_col, *bcols))
            if max_bucket is not None:
                # corpus-global occupancy guard on the seen side —
                # the exact _banded_pairs_cosine_verify window rule
                # over the whole store incl. this batch; emptying a
                # hot group on one join side kills all its pairs
                from pyspark.sql import Window

                w = Window.partitionBy("_t", "_b")
                bands_all = (
                    bands_all.withColumn("_bc", F.count(F.lit(1)).over(w))
                    .filter(F.col("_bc") <= max_bucket)
                    .drop("_bc")
                )
            cand = (
                bands_all.alias("a")
                .join(
                    F.broadcast(bands_cur).alias("b"),
                    (F.col("a._t") == F.col("b._t"))
                    & (F.col("a._b") == F.col("b._b"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
                .distinct()
            )
            # stored self-norm (r11 store schema; build_signbucket_store
            # lands _n at arrival) — recomputing _dot(_v,_v) here was
            # one interpreted-HOF pass over the ENTIRE accumulated
            # store per trigger (VERDICT r10 #1). Fallback compute for
            # seeded stores predating the column.
            _nexpr = (
                F.col("_n")
                if "_n" in store.columns
                else _dot_d(F.col("_v"), F.col("_v"), dim)
            )
            vecs = store.select(F.col(id_col), F.col("_v"), _nexpr.alias("_n"))
            dropped = _cosine_dropped(cand, vecs, dim)
            write_batch_idempotent(
                bdf.join(dropped, id_col, "left_anti"), bid, out_dir
            )
            return
        # Banded (two-tier bucket-major) layout — same shape as the
        # MinHash twin: batch-major _recent landings per trigger,
        # rolled into <bucket>=K/batch_id=N history by maintenance,
        # probes by direct path over the touched bucket subtrees of
        # history plus the recent tail (see the MinHash twin's branch
        # comment for the measured whys).
        state = state.persist()
        state_p = state.withColumn(
            "_pbkt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(store_buckets)),
        )
        bc = (
            _bands(state.select(id_col, *bcols))
            .withColumn(
                "_bkt", F.pmod(F.xxhash64("_t", "_b"), F.lit(store_buckets))
            )
            .persist()
        )
        cand = None
        seen_cached = None
        # r12 trigger shape — see the MinHash twin: landings write dirs
        # nothing in this trigger reads back (current rows come from
        # the persisted frames, committed recent dirs are read by
        # direct path), so both writes overlap the probe on background
        # threads and are joined before the batch returns.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)
        landings = [
            pool.submit(
                write_batch_idempotent,
                state_p,
                bid,
                store_dir.rstrip("/") + "_recent",
            ),
            pool.submit(write_batch_idempotent, bc, bid, bands_dir + "_recent"),
        ]
        try:
            bkts = [r[0] for r in bc.select("_bkt").distinct().collect()]
            if not bkts:
                # zero-row micro-batch: nothing landed, nothing to dedup
                write_batch_idempotent(bdf, bid, out_dir)
                return
            committed_bands = _read_committed_recent(
                spark, bands_dir + "_recent", bid
            )
            cur_bands = bc.withColumn("batch_id", F.lit(bid))
            recent_bands = (
                cur_bands
                if committed_bands is None
                else committed_bands.unionByName(cur_bands)
            )
            bands_seen = _two_tier(
                _read_bucket_subtrees(spark, bands_dir, "_bkt", bkts),
                recent_bands.filter(F.col("_bkt").isin(bkts)),
                "_bkt",
            ).filter(F.col("batch_id") <= F.lit(bid))
            probe = bc
            if max_bucket is not None:
                # corpus-global hot-bucket backstop (r12) — see the
                # MinHash twin: the touched subtrees hold each probed
                # (table, bucket) group's FULL occupancy; persisted so
                # the occupancy agg and the candidate join share one
                # touched-subtree read
                bands_seen = seen_cached = bands_seen.persist()
                hot = (
                    bands_seen.join(
                        F.broadcast(bc.select("_t", "_b").distinct()),
                        ["_t", "_b"],
                    )
                    .groupBy("_t", "_b")
                    # countDistinct: dedup-robust across the crash
                    # windows' cross-tier duplication (see the
                    # MinHash twin)
                    .agg(F.countDistinct(F.col(id_col)).alias("_bc"))
                    .filter(F.col("_bc") > max_bucket)
                    .select("_t", "_b")
                )
                probe = bc.join(F.broadcast(hot), ["_t", "_b"], "left_anti")
            cand = (
                bands_seen.alias("a")
                .join(
                    F.broadcast(probe).alias("b"),
                    (F.col("a._bkt") == F.col("b._bkt"))
                    & (F.col("a._t") == F.col("b._t"))
                    & (F.col("a._b") == F.col("b._b"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
                .distinct()
                .persist()
            )
            # cosine verify over the candidates' payload buckets only,
            # reading the STORED self-norm _n (r11): no per-trigger
            # whole-history vector scan and no per-row norm recompute
            pbkts = [
                r[0]
                for r in cand.select(
                    F.explode(F.array("id_a", "id_b")).alias("_i")
                )
                .select(
                    F.pmod(F.xxhash64("_i"), F.lit(store_buckets)).alias(
                        "_pbkt"
                    )
                )
                .distinct()
                .collect()
            ]
            if not pbkts:
                payload = None
                keep = bdf
            else:
                committed_pay = _read_committed_recent(
                    spark, store_dir.rstrip("/") + "_recent", bid
                )
                cur_pay = state_p.withColumn("batch_id", F.lit(bid))
                recent_pay = (
                    cur_pay
                    if committed_pay is None
                    else committed_pay.unionByName(cur_pay)
                )
                payload = _two_tier(
                    _read_bucket_subtrees(spark, store_dir, "_pbkt", pbkts),
                    recent_pay.filter(F.col("_pbkt").isin(pbkts)),
                    "_pbkt",
                ).filter(F.col("batch_id") <= F.lit(bid))
                _nexpr = (
                    F.col("_n")
                    if "_n" in payload.columns
                    else _dot_d(F.col("_v"), F.col("_v"), dim)
                )
                vecs = payload.select(
                    F.col(id_col), F.col("_v"), _nexpr.alias("_n")
                )
                dropped = _cosine_dropped(cand, vecs, dim)
                keep = bdf.join(dropped, id_col, "left_anti")
            write_batch_idempotent(keep, bid, out_dir)
        finally:
            # join the landing threads FIRST: their writes read the
            # persisted frames, and a landing failure must propagate.
            # Drain EVERY future before re-raising (r13, ADVICE r12) —
            # see the MinHash twin for why.
            _errs = []
            for _f in landings:
                try:
                    _f.result()
                except BaseException as _e:  # noqa: BLE001 — re-raised
                    _errs.append(_e)
            pool.shutdown()
            state.unpersist()
            bc.unpersist()
            if cand is not None:
                cand.unpersist()
            if seen_cached is not None:
                seen_cached.unpersist()
            if _errs:
                raise _errs[0]

    def _cosine_dropped(
        cand: DataFrame, vecs: DataFrame, dim: int | None = None
    ) -> DataFrame:
        """ids of candidates whose exact cosine meets the threshold —
        per-side stored/derived norms, never per-pair recompute."""
        return (
            cand.join(
                vecs.select(
                    F.col(id_col).alias("id_a"),
                    F.col("_v").alias("_va"),
                    F.col("_n").alias("_na"),
                ),
                "id_a",
            )
            .join(
                vecs.select(
                    F.col(id_col).alias("id_b"),
                    F.col("_v").alias("_vb"),
                    F.col("_n").alias("_nb"),
                ),
                "id_b",
            )
            .filter(
                cosine_with_norms(
                    "_va", "_vb", F.col("_na"), F.col("_nb"), dim
                )
                >= threshold
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )

    n_landed = [0]  # triggers since drive start (cadence, not state)
    # r13 background maintenance with deferred reaping — see the
    # MinHash twin and _MaintenanceScheduler.
    sched = (
        _MaintenanceScheduler(
            spark,
            lambda bid: _run_two_tier_maintenance(
                spark,
                [(bands_dir, "_bkt", False), (store_dir, "_pbkt", True)],
                bid,
                consolidate_min_batch_dirs,
                defer_reap=True,
            ),
        )
        if maintain_every is not None
        else None
    )

    def _on_batch(bdf: DataFrame, bid: int) -> None:
        if sched is not None:
            sched.on_trigger_entry()
        _dedup_batch(bdf, bid)
        _record_max_batch_id(spark, store_dir, bid)
        if maintain_every is not None:
            n_landed[0] += 1
            if n_landed[0] % maintain_every == 0:
                sched.fire(bid)

    query = (
        stream_df.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        if sched is not None:
            sched.drain()
    try:
        return spark.read.parquet(out_dir).drop("batch_id")
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], stream_df.schema)
        raise


def stream_ivf_index_append(
    spark: SparkSession,
    stream_df: DataFrame,
    centroids_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    replication: int = 2,
    list_major: bool = False,
    maintain_every: int | None = None,
    consolidate_min_batch_dirs: int = 8,
    drift_signal: bool = True,
) -> DataFrame:
    """Maintain a persisted IVF index under streaming arrival (r9) —
    the ANN member of the continuous-curation contract: the centroid
    set is FIXED (read once from ``centroids_dir``, written by
    ``similarity.build_ivf_index`` over the seed corpus — the static
    quantizer, same contract as the dedup stores' static ``bits``),
    and each micro-batch assigns its vectors to those centroids via
    the SAME replicated flat assignment the batch builder uses
    (``similarity._flat_replicated_assign`` — shared code, cannot
    drift) and lands vector-carrying posting rows at
    ``postings_dir/batch_id=N`` idempotently. The accumulated postings
    are exactly ``build_ivf_index``'s posting relation for the total
    corpus against the seed centroids, so ``cosine_knn_ivf_probe``
    works unchanged over them at any point in the stream's life — a
    vector is searchable one trigger after it arrives, with no index
    rebuild ever. Re-centering (new centroids for a drifted corpus)
    is an explicit offline rebuild, exactly like re-bucketing a dedup
    store. ``list_major`` (r11) maintains the TWO-TIER
    ``write_ivf_index`` layout: each batch lands batch-major in
    ``<postings_dir>_recent`` (one cheap dir per trigger — landing
    straight into per-list dirs pays the dynamic-overwrite commit per
    touched list per trigger), ``cosine_knn_ivf_probe_dir`` probes
    history ∪ recent so vectors stay searchable one trigger after
    arrival, and the maintenance loop is
    ``roll_recent_into_store(postings_dir, "_list")`` +
    ``consolidate_bucket_history`` (one batch dir per list after each
    cycle) — run between drives, or IN-DRIVE every ``maintain_every``
    landed batches (r12; ``_run_two_tier_maintenance``, committed
    batches only, consolidation threshold-gated on
    ``consolidate_min_batch_dirs`` — same contract as the dedup
    twins; requires ``list_major``). Like the dedup stores, the
    landing layout is a store-lifetime contract enforced by a
    ``_layout.json`` marker, whose ``max_batch_id`` watermark also
    refuses a fresh-checkpoint resume of a store with landed batches
    (colliding batch ids would silently overwrite history leaves).
    Each in-drive maintenance fire also lands the RE-CENTERING DRIFT
    SIGNAL beside the index (``drift_signal=True``, r12):
    ``similarity.ivf_drift_summary`` over the accumulated postings —
    occupancy skew, mean assignment cosine, empty-list share, stamped
    with the batch id — written atomically to
    ``<postings_dir>/_drift.json`` (underscore-hidden from Spark's
    file index), so the metric an operator alerts on (thresholds in
    the summary's docstring, measured basis in SCALE.md r12) is
    maintained by the drive itself at maintenance cadence: one
    broadcast-join aggregate scan of the postings per cycle, the same
    O(store) class as the consolidation it rides along with.
    Returns the accumulated postings (batch_id dropped).
    """
    from pyspark.errors import AnalysisException

    from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (
        _as_double,
        _dot_d,
        _flat_replicated_assign,
    )

    if maintain_every is not None and not list_major:
        raise ValueError(
            "maintain_every requires list_major=True: the flat postings "
            "layout has no recent tail to roll or list history to "
            "consolidate."
        )
    _enforce_store_layout(
        spark,
        postings_dir,
        "ivf_postings_list_major" if list_major else "ivf_postings",
        None,
        checkpoint_dir,
    )
    c = spark.read.parquet(centroids_dir)
    # vector width for the codegen-unrolled dot (similarity._dot_d),
    # probed once per drive from the broadcast-sized centroid relation
    # (same width as the stream's vectors by the quantizer contract;
    # _dot_d guards per row regardless)
    dim = None  # HOF dot: per-trigger volumes sit below the unroll win
    # broadcast-sized by contract; counted once for the drift rollup
    n_lists = c.count() if (maintain_every is not None and drift_signal) else 0

    def _append(bdf: DataFrame, bid: int) -> None:
        e0 = bdf.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        )
        assign = _flat_replicated_assign(e0, c, replication, dim)
        # same posting shape as build_ivf_index incl. the stored
        # self-norm (_cn) — the streamed index stays probe-identical
        # AND schema-identical to the batch-built one
        postings = (
            bdf.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            )
            .withColumn("_cn", _dot_d(F.col("cv"), F.col("cv"), dim))
            .join(assign.withColumnRenamed("_id", "neighbor_id"), "neighbor_id")
        )
        if list_major:
            # two-tier list-major maintenance (r11): the batch lands
            # batch-major in <postings_dir>_recent (ONE cheap dir —
            # a dynamic-overwrite landing straight into _list=K dirs
            # pays ~17 ms of commit per touched list PER TRIGGER, the
            # same disease the dedup stores' two-tier landing cures);
            # cosine_knn_ivf_probe_dir unions the recent tail with the
            # list-major history, and roll_recent_into_store +
            # consolidate_bucket_history (between drives) move it into
            # _list=K/batch_id=N — the probed-lists-only layout that
            # bounds probe IO to the probed fraction of the corpus
            # (measured 10.2× byte reduction at 2M vectors /
            # sqrt-rule lists; SCALE.md r11)
            write_batch_idempotent(
                postings, bid, postings_dir.rstrip("/") + "_recent"
            )
        else:
            write_batch_idempotent(postings, bid, postings_dir)

    n_landed = [0]  # triggers since drive start (cadence, not state)

    def _maintain(bid: int) -> list:
        # no deferred reap here: this drive has no per-trigger probes
        # pinning store file indexes (landings only ADD new recent
        # dirs), so immediate deletes race nothing — and the drift
        # read below must see each posting exactly once
        _run_two_tier_maintenance(
            spark,
            [(postings_dir, "_list", False)],
            bid,
            consolidate_min_batch_dirs,
        )
        if drift_signal:
            from big_data_analysis_of_twitter_emoji_usage_spark.operators.similarity import (
                ivf_drift_summary,
                ivf_index_drift_stats,
            )

            s = ivf_drift_summary(
                ivf_index_drift_stats(
                    spark, centroids_dir, postings_dir, as_of_batch_id=bid
                ),
                n_lists,
            )
            s["as_of_batch_id"] = bid
            fs, _, jpath = _marker_io(spark, postings_dir)
            _write_small_json_atomic(
                spark,
                fs,
                jpath,
                jpath(f"{postings_dir.rstrip('/')}/_drift.json"),
                s,
            )
        return []  # nothing deferred (deletes ran inline above)

    # r13 (guide §2.6 / VERDICT r12 #1): the maintenance cycle + drift
    # signal run on ONE background thread so later triggers' landings
    # back-fill the executor slots its jobs leave idle. Safe because
    # the cycle touches only data a concurrent landing never reads or
    # writes: the roll reads EXACTLY the committed (< bid) batch dirs
    # by direct path and writes/deletes only those and the history
    # tier; a landing writes a NEW ≥-bid dir; the drift read pins its
    # file index to batches ≤ bid (as_of_batch_id). Cycles are
    # serialized and drained by _MaintenanceScheduler; a maintenance
    # error surfaces at the next fire or at drive end (the drive
    # still FAILS) with the batch itself committed — inside the
    # documented crash contract, since an interrupted cycle was always
    # legal and convergent (roll re-runs on everything committed; the
    # consolidation PENDING marker recovers).
    sched = (
        _MaintenanceScheduler(spark, _maintain)
        if maintain_every is not None
        else None
    )

    def _on_batch(bdf: DataFrame, bid: int) -> None:
        _append(bdf, bid)
        _record_max_batch_id(spark, postings_dir, bid)
        if maintain_every is not None:
            n_landed[0] += 1
            if n_landed[0] % maintain_every == 0:
                sched.fire(bid)

    query = (
        stream_df.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        # the drained read below must see a quiesced store: join the
        # in-flight cycle before building it (and surface its error)
        if sched is not None:
            sched.drain()
    try:
        if list_major:
            from big_data_analysis_of_twitter_emoji_usage_spark.sources.readers import (
                union_partition_tiers,
            )
            from big_data_analysis_of_twitter_emoji_usage_spark.sources.writers import _hadoop_fs

            fs, hroot = _hadoop_fs(spark, postings_dir)
            main = (
                spark.read.parquet(postings_dir)
                if fs.exists(hroot)
                and any(
                    s.isDirectory()
                    and s.getPath().getName().startswith("_list=")
                    for s in fs.listStatus(hroot)
                )
                else None
            )
            recent_dir = postings_dir.rstrip("/") + "_recent"
            rfs, hrecent = _hadoop_fs(spark, recent_dir)
            # a rolled tail is an EMPTY dir (roll deletes the batch
            # dirs): reading it would raise UNABLE_TO_INFER_SCHEMA and
            # the empty-source fallback below would silently discard
            # the _list=K history — guard it and return main alone
            recent = (
                spark.read.parquet(recent_dir)
                if rfs.exists(hrecent)
                and any(
                    s.isDirectory()
                    and s.getPath().getName().startswith("batch_id=")
                    for s in rfs.listStatus(hrecent)
                )
                else None
            )
            if recent is None:
                if main is None:
                    # neither tier has data yet: funnel into the
                    # empty-source fallback below (same contract)
                    raise AnalysisException(
                        f"PATH_NOT_FOUND: no postings under {postings_dir}"
                    )
                return main.withColumn(
                    "_list", F.col("_list").cast("long")
                ).drop("batch_id")
            return union_partition_tiers(main, recent, "_list").drop(
                "batch_id"
            )
        return spark.read.parquet(postings_dir).drop("batch_id")
    except AnalysisException as exc:
        if not (
            "PATH_NOT_FOUND" in str(exc)
            or "UNABLE_TO_INFER_SCHEMA" in str(exc)
        ):
            raise
        # First drive over an empty source: no trigger fired, so the
        # postings dir holds only the layout marker (schema
        # uninferable) — before r11's marker it did not exist at all
        # (PATH_NOT_FOUND). Same contract as the sibling drains —
        # derive the (neighbor_id, cv, _list) schema from an empty
        # batch (schema-only, nothing executes).
        empty = spark.createDataFrame([], stream_df.schema)
        e0 = empty.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        )
        assign = _flat_replicated_assign(e0, c, replication, dim)
        postings = (
            empty.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            )
            .withColumn("_cn", _dot_d(F.col("cv"), F.col("cv"), dim))
            .join(assign.withColumnRenamed("_id", "neighbor_id"), "neighbor_id")
        )
        return spark.createDataFrame([], postings.schema)
