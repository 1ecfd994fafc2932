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


def test_stream_hll_users_matches_batch_and_absorbs_replay(spark, tmp_path):
    """The streaming HLL fold converges to EXACTLY the one-shot batch
    sketch estimate (sketch insertion is per-value idempotent and
    union is the monoid op), and a full crash-replay changes nothing."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from parquet_ingestor_spark.catalog import table
    from parquet_ingestor_spark.operators.sketches import (
        hll_distinct_by,
        stream_hll_users,
    )

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id"
    )
    landing = str(tmp_path / "landing")
    for i in range(3):
        ev.filter(F.pmod("user_id", F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    state_dir = str(tmp_path / "state")
    q = stream_hll_users(stream, state_dir)
    q.awaitTermination(120)

    epochs = [
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(state_dir, "sketch"))
    ]
    assert len(epochs) >= 2
    last = max(epochs)
    streamed = {
        r.event_type: r.est
        for r in spark.read.parquet(
            os.path.join(state_dir, "sketch", f"epoch={last}")
        )
        .select(
            "event_type",
            F.hll_sketch_estimate(F.col("sk")).alias("est"),
        )
        .collect()
    }
    batch = {
        r.event_type: r.est
        for r in hll_distinct_by(ev, "event_type", "user_id").collect()
    }
    assert streamed == batch

    # crash-replay with a fresh checkpoint over the same landing data
    shutil.rmtree(os.path.join(state_dir, "_checkpoint"))
    stream2 = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q2 = stream_hll_users(stream2, state_dir)
    q2.awaitTermination(120)
    epochs2 = [
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(state_dir, "sketch"))
    ]
    replayed = {
        r.event_type: r.est
        for r in spark.read.parquet(
            os.path.join(state_dir, "sketch", f"epoch={max(epochs2)}")
        )
        .select(
            "event_type",
            F.hll_sketch_estimate(F.col("sk")).alias("est"),
        )
        .collect()
    }
    assert replayed == batch, "replay changed the sketch state"
