"""Every observed parquet encoding of events.ts must flow through every
events entry point. Three encodings exist in the wild for this fixture:

- **nanos-long** — TIMESTAMP(NANOS), which the reader only accepts under
  ``spark.sql.legacy.parquet.nanosAsLong`` (surfaced as bigint, integer-div
  converted by ``core._normalize_ts``);
- **micros-UTC** — TIMESTAMP_MICROS with isAdjustedToUTC=true (plain
  ``timestamp`` passthrough);
- **micros-NTZ** — timestamp[us] with isAdjustedToUTC=false, the driver's
  current fixture encoding. Spark 4 surfaces this as TIMESTAMP_NTZ by
  default, and ``withWatermark`` rejects NTZ event time (this aborted the
  whole r4 bench). The engine pins
  ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (core._PINNED_CONFS)
  so the column reads as session-tz TIMESTAMP, and ``_normalize_ts`` also
  casts NTZ → TIMESTAMP defensively for pre-read DataFrames.

All values are UTC-naive with the session tz pinned UTC, so the three
encodings are value-identical; the tests assert exactly that.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_analysis_of_twitter_emoji_usage_spark.core import (
    _normalize_ts,
    load_events,
    load_events_stream,
)
from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import QUERIES


@pytest.fixture(scope="module")
def micros_sf_dir(spark, sf_dir, tmp_path_factory):
    """A scale-factor dir whose events table is TIMESTAMP_MICROS-encoded
    with isAdjustedToUTC=true (Spark's own writer output)."""
    out = tmp_path_factory.mktemp("micros_sf")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        load_events(spark, sf_dir).write.mode("overwrite").parquet(
            str(out / "events.parquet")
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return str(out)


@pytest.fixture(scope="module")
def nanos_sf_dir(sf_dir, tmp_path_factory):
    """A scale-factor dir whose events table stores TIMESTAMP(NANOS) —
    the encoding the fixtures used before the r4 regeneration. Written
    with pyarrow (parquet format v2.6 keeps nanos as nanos)."""
    out = tmp_path_factory.mktemp("nanos_sf")
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        idx, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
    )
    pq.write_table(tbl, str(out / "events.parquet"), version="2.6")
    return str(out)


def test_fixture_is_ntz_and_engine_reads_timestamp(spark, sf_dir):
    """The driver fixture is un-adjusted micros; with the engine's pinned
    confs it must surface as plain TIMESTAMP (never NTZ, never bigint)."""
    field = pq.read_schema(f"{sf_dir}/events.parquet").field("ts")
    assert field.type == pa.timestamp("us")  # tz=None → isAdjustedToUTC=false
    assert dict(load_events(spark, sf_dir).dtypes)["ts"] == "timestamp"


def test_normalize_ts_casts_ntz(spark, sf_dir):
    """A caller that read events with inferTimestampNTZ left at the Spark 4
    default gets TIMESTAMP_NTZ; _normalize_ts must repair it."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
        fixed = _normalize_ts(raw)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    assert dict(fixed.dtypes)["ts"] == "timestamp"


def test_nanos_copy_reads_as_long_raw(spark, nanos_sf_dir):
    raw = spark.read.parquet(f"{nanos_sf_dir}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "bigint"


def test_micros_copy_really_is_micros(spark, micros_sf_dir):
    df = spark.read.parquet(f"{micros_sf_dir}/events.parquet")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_batch_load_events_all_encodings(spark, sf_dir, micros_sf_dir, nanos_sf_dir):
    dfs = {
        "ntz": load_events(spark, sf_dir),
        "micros": load_events(spark, micros_sf_dir),
        "nanos": load_events(spark, nanos_sf_dir),
    }
    for name, df in dfs.items():
        assert dict(df.dtypes)["ts"] == "timestamp", name
    rows = {
        name: sorted(map(tuple, df.select("event_id", "ts").collect()))
        for name, df in dfs.items()
    }
    assert rows["ntz"] == rows["micros"] == rows["nanos"]


@pytest.mark.parametrize("dir_fixture", ["micros_sf_dir", "nanos_sf_dir"])
def test_stream_reader_all_encodings(spark, dir_fixture, request):
    stream = load_events_stream(spark, request.getfixturevalue(dir_fixture))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize(
    "name",
    [
        "stream_windowed_events",    # _event_stream + watermarked window
        "stream_dedup_events",       # dropDuplicates state
        "stream_sessionize_stateful_demo",  # applyInPandasWithState probe path
    ],
)
def test_streaming_events_queries_micros(spark, micros_sf_dir, name):
    assert QUERIES[name](spark, micros_sf_dir).count() > 0


def test_windowed_results_encoding_invariant(
    spark, sf_dir, micros_sf_dir, nanos_sf_dir
):
    """Same data, different physical encoding → bit-identical answer."""
    a = sorted(map(tuple, QUERIES["stream_windowed_events"](spark, sf_dir).collect()))
    b = sorted(
        map(tuple, QUERIES["stream_windowed_events"](spark, micros_sf_dir).collect())
    )
    c = sorted(
        map(tuple, QUERIES["stream_windowed_events"](spark, nanos_sf_dir).collect())
    )
    assert a == b == c
