"""The reference's core delivery contract, crash edition: a batch whose
sink write FAILS is never acked — on restart the same data replays and
lands exactly once (reference: TestIntegration_Ingestor_DoesNotAckIfSinkFails,
tests/integration_ingestor_test.go:306-354 → here: foreachBatch raises
before the sink write completes; the checkpoint must not commit the
offset, and the restarted query must re-deliver the batch)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from parquet_ingestor_spark.pipeline import parse_envelopes

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _landing(tmp_path, n=20):
    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "a.json", "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {"value": json.dumps({"id": i, "name": f"n{i}"}), "attributes": {}}
                )
                + "\n"
            )
    return str(landing)


def test_failed_sink_write_is_never_committed(spark, tmp_path):
    landing = _landing(tmp_path)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    poison = tmp_path / "poison"
    poison.touch()

    def process(batch_df, batch_id):
        good, _ = parse_envelopes(batch_df, SCHEMA)
        if poison.exists():
            # sink failure BEFORE any durable write — the reference's
            # "sink.Write returns error" path
            raise OSError("sink unavailable")
        good.write.mode("append").parquet(out)

    def run_query():
        return (
            spark.readStream.format("json")
            .schema(
                T.StructType(
                    [
                        T.StructField("value", T.StringType()),
                        T.StructField(
                            "attributes", T.MapType(T.StringType(), T.StringType())
                        ),
                    ]
                )
            )
            .load(landing)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", chk)
            .start()
        )

    q1 = run_query()
    with pytest.raises(Exception):
        q1.processAllAvailable()  # the poisoned batch fails the query
    q1.stop()
    assert not os.path.exists(out)  # nothing was written, nothing acked

    # "sink recovers"; restart from the same checkpoint
    poison.unlink()
    q2 = run_query()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    df = spark.read.parquet(out)
    assert df.count() == 20  # replayed exactly once, no loss
    assert df.select("id").distinct().count() == 20


def test_replayed_batch_overwrites_not_appends(spark, tmp_path):
    """The window the offset-commit test can't cover: the process dies
    AFTER the sink write but BEFORE the checkpoint commit. The replay
    re-runs the same batch_id; the idempotent batch commit must
    overwrite that batch's partitions, leaving zero duplicates in both
    the data and DLQ paths."""
    import pyspark.sql.functions as F

    from parquet_ingestor_spark.pipeline import write_batch

    good = spark.createDataFrame(
        [(i, f"n{i}", float(i), f"2024-03-0{1 + i % 3} 0{i % 9}:00:00") for i in range(30)],
        "id long, name string, value double, ts_str string",
    ).select("id", "name", "value", F.to_timestamp("ts_str").alias("ts"))
    bad = spark.createDataFrame(
        [("oops", "transform_error: malformed payload")], "value string, error string"
    )
    data_dir, dlq_dir = f"{tmp_path}/data", f"{tmp_path}/dlq"

    write_batch(good, bad, data_dir, dlq_dir, batch_id=7)
    write_batch(good, bad, data_dir, dlq_dir, batch_id=7)  # the replay
    assert spark.read.parquet(data_dir).count() == 30
    assert spark.read.json(dlq_dir).count() == 1

    # a *different* batch appends rather than clobbering prior batches
    write_batch(good.limit(5), bad.limit(0), data_dir, dlq_dir, batch_id=8)
    df = spark.read.parquet(data_dir)
    assert df.count() == 35
    assert df.filter("batch_id = 7").count() == 30
