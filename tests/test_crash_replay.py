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
