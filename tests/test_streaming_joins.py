"""Stream-stream join semantics vs. the equivalent batch join."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_pair(spark, sf_dir, tmp_path):
    os.symlink(f"{sf_dir}/events.parquet", tmp_path / "p.parquet")
    from parquet_ingestor_spark.catalog import normalize_ts

    batch = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    stream = normalize_ts(
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        ).parquet(str(tmp_path))
    )
    return batch, stream


def test_stream_stream_attribution_matches_batch(spark, events_pair):
    from parquet_ingestor_spark.streaming.joins import (
        purchase_click_attribution,
    )

    batch, stream = events_pair
    sp = stream.filter(F.col("event_type") == "purchase")
    sc = stream.filter(F.col("event_type") == "click")
    q = (
        purchase_click_attribution(sp, sc)
        .writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    got = sorted(
        (r.purchase_id, r.click_id) for r in spark.table("t_attr").collect()
    )

    bp = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    bc = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = sorted(
        (r.purchase_id, r.click_id)
        for r in bp.join(
            bc,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_static_enrichment(spark, events_pair, sf_dir):
    from parquet_ingestor_spark.streaming.joins import enrich_stream_with_dim

    batch, stream = events_pair
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("click", 0.1)], "event_type string, weight double"
    )
    q = (
        enrich_stream_with_dim(stream, dim, "event_type")
        .writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    out = spark.table("t_enrich")
    assert out.count() == batch.count()  # left join preserves the stream
    assert (
        out.filter(F.col("event_type") == "purchase")
        .filter(F.col("weight") != 1.0)
        .count()
        == 0
    )
