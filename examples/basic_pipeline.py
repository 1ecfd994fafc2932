#!/usr/bin/env python
"""Basic end-to-end pipeline example — the analog of the reference's
examples/basic: synthetic envelopes → transform → partitioned parquet
sink → read back and verify conservation.

Run: python examples/basic_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_ingestor_spark.pipeline import PipelineConfig, start_stream_ingest
from parquet_ingestor_spark.session import get_spark

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def main() -> None:
    spark = get_spark(app_name="example-basic", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="pqing_example_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)

    # 1. produce envelopes into the landing dir (your queue feed would
    #    append files here; every 10th payload is corrupt to show DLQ)
    with open(os.path.join(landing, "batch-0.json"), "w") as f:
        for i in range(100):
            payload = (
                "{oops"
                if i % 10 == 9
                else json.dumps(
                    {
                        "id": i,
                        "name": f"item-{i}",
                        "value": i * 1.337,
                        "ts": f"2024-06-01T{i % 24:02d}:00:00",
                    }
                )
            )
            f.write(json.dumps({"value": payload, "attributes": {"MessageId": str(i)}}) + "\n")

    # 2. run the pipeline (trigger = the reference's FlushInterval)
    out, chk = os.path.join(root, "out"), os.path.join(root, "chk")
    q = start_stream_ingest(
        spark,
        landing,
        out,
        chk,
        RECORD_SCHEMA,
        PipelineConfig(flush_interval="1 second", payload_log_every=1),
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    # 3. read the sink back: typed rows under year=/month=/day=/hour=
    data = spark.read.parquet(f"{out}/data")
    dlq = spark.read.json(f"{out}/_dlq")
    print(f"sink rows: {data.count()}  dlq rows: {dlq.count()}")
    data.groupBy("year", "month", "day", "hour").agg(
        F.count("*").alias("cnt")
    ).orderBy("hour").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
