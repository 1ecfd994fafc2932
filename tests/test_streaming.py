"""Streaming window/dedup semantics: the streaming plan over a file
stream must agree with its batch twin over the same rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_ingestor_spark.streaming.windows import (
    dedup_within_watermark,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # the file stream source wants a directory; stage the table into one
    stream_dir = tmp_path_factory.mktemp("events_stream")
    os.symlink(
        f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet"
    )
    from parquet_ingestor_spark.catalog import normalize_ts

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    # ts arrives as int64 nanos or a µs timestamp depending on the
    # testdata generation; normalize_ts handles both
    return normalize_ts(batch), normalize_ts(stream)


def _drain_to_memory(spark, df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return spark.table(name)


def _as_rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, events_stream):
    batch, stream = events_stream
    want = _as_rows(tumbling_counts(batch), "window_start", "cnt")
    got_df = _drain_to_memory(
        spark, tumbling_counts(stream), "t_tumble", "complete"
    )
    assert _as_rows(got_df, "window_start", "cnt") == want


def test_sliding_stream_equals_batch(spark, events_stream):
    batch, stream = events_stream
    want = _as_rows(sliding_counts(batch), "window_start", "cnt")
    got_df = _drain_to_memory(
        spark, sliding_counts(stream), "t_slide", "complete"
    )
    assert _as_rows(got_df, "window_start", "cnt") == want


def test_session_stream_equals_batch(spark, events_stream):
    batch, stream = events_stream
    want = _as_rows(session_counts(batch), "user_id", "session_start", "cnt")
    got_df = _drain_to_memory(
        spark, session_counts(stream), "t_session", "complete"
    )
    assert _as_rows(got_df, "user_id", "session_start", "cnt") == want


def test_streaming_dedup_within_watermark(spark, events_stream):
    batch, stream = events_stream
    deduped = dedup_within_watermark(stream, ["user_id"])
    got = _drain_to_memory(spark, deduped, "t_dedup", "append")
    want = batch.select("user_id").distinct().count()
    assert got.select("user_id").distinct().count() == want
    # within one watermark horizon every duplicate is dropped
    assert got.count() == want
