"""Both legal parquet timestamp encodings must flow through every events
entry point. The driver's fixtures store TIMESTAMP(NANOS) today (read as
long nanos under nanosAsLong and converted), but micros-encoded files
arrive as real timestamps — r1 shipped a 13-query cluster that broke on
exactly this class. ``load_events`` gained the dtype guard in r2; these
tests pin its streaming twin ``load_events_stream`` (VERDICT r2 #3) by
round-tripping the fixture through a micros-encoded copy and running the
batch and streaming entry points on both.
"""

import pytest

from big_data_analysis_of_twitter_emoji_usage_spark.core import load_events, load_events_stream
from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import QUERIES


@pytest.fixture(scope="module")
def micros_sf_dir(spark, sf_dir, tmp_path_factory):
    """A scale-factor dir whose events table is TIMESTAMP_MICROS-encoded
    (the conversion already applied at write time, so `ts` reads back as
    a timestamp column, not long nanos)."""
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


def test_micros_copy_really_is_micros(spark, micros_sf_dir):
    df = spark.read.parquet(f"{micros_sf_dir}/events.parquet")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_batch_load_events_both_encodings(spark, sf_dir, micros_sf_dir):
    nanos = load_events(spark, sf_dir)
    micros = load_events(spark, micros_sf_dir)
    assert dict(nanos.dtypes)["ts"] == "timestamp"
    assert dict(micros.dtypes)["ts"] == "timestamp"
    assert nanos.count() == micros.count()


def test_stream_reader_micros_passthrough(spark, micros_sf_dir):
    stream = load_events_stream(spark, micros_sf_dir)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize(
    "name",
    [
        "stream_windowed_events",    # _event_stream + watermarked window
        "stream_dedup_events",       # dropDuplicates state
        "stream_sessionize_events",  # applyInPandasWithState probe path
    ],
)
def test_streaming_events_queries_micros(spark, micros_sf_dir, name):
    assert QUERIES[name](spark, micros_sf_dir).count() > 0


def test_windowed_results_encoding_invariant(spark, sf_dir, micros_sf_dir):
    """Same data, different physical encoding → bit-identical answer."""
    a = sorted(map(tuple, QUERIES["stream_windowed_events"](spark, sf_dir).collect()))
    b = sorted(
        map(tuple, QUERIES["stream_windowed_events"](spark, micros_sf_dir).collect())
    )
    assert a == b
