"""applyInPandasWithState custom stateful operator: the streaming
running totals must agree with the batch groupBy twin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "part-0.parquet")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path))
    return batch, stream


def test_stateful_tracker_matches_batch_twin(spark, events_stream_dir):
    from parquet_ingestor_spark.streaming.stateful import (
        user_activity_batch_twin,
        user_activity_tracker,
    )

    batch, stream = events_stream_dir
    q = (
        user_activity_tracker(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("append")
        .start()
    )
    # processing-time timeouts keep scheduling cleanup batches, so
    # processAllAvailable never idles — poll for the first summaries
    import time

    n_users = batch.select("user_id").distinct().count()
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.table("t_state").count() >= n_users:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    # first emission: one open summary per user; totals must equal
    # the batch aggregate exactly
    got = {
        r.user_id: (r.events_seen, round(r.total_value, 4), r.closed)
        for r in spark.table("t_state")
        .filter(~F.col("closed"))
        .collect()
    }
    want = {
        r.user_id: (r.events_seen, round(r.total_value, 4), False)
        for r in user_activity_batch_twin(batch).collect()
    }
    assert got == want


def test_transform_with_state_matches_batch_twin(spark, events_stream_dir):
    """Same invariant through the Spark 4 StatefulProcessor API
    (transformWithStateInPandas + RocksDB state store). The TWS Python
    runner needs protobuf, which this container lacks — skip there."""
    pytest.importorskip("google.protobuf.descriptor")
    from parquet_ingestor_spark.streaming.stateful import (
        user_activity_batch_twin,
        user_activity_tracker_tws,
    )

    batch, stream = events_stream_dir
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            user_activity_tracker_tws(stream)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = {
        r.user_id: (r.events_seen, round(r.total_value, 4))
        for r in spark.table("t_tws").collect()
    }
    want = {
        r.user_id: (r.events_seen, round(r.total_value, 4))
        for r in user_activity_batch_twin(batch).collect()
    }
    assert got == want
