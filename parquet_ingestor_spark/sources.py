"""Envelope sources — the reference's source plane (O1/O2) mapped to
Structured Streaming sources.

The reference reads from SQS via N poller goroutines into a bounded
channel (reference: source/source_sqs.go:204-247) and from an
in-memory channel in tests/examples. OSS Spark has no SQS connector,
so the engine's ingest contract is the *landing directory*: whatever
queue/agent produces envelopes appends JSON-lines files; the file
source's checkpointed offset log replaces per-message acks. Rate
control (the pollers × MaxMessages analog) is maxFilesPerTrigger.

Every source yields the same Envelope schema
(``value STRING, attributes MAP<STRING,STRING>`` — reference:
source/source.go:15-18), so the pipeline is source-agnostic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .pipeline import ENVELOPE_SCHEMA


def jsonl_dir_source(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int = 32,
) -> DataFrame:
    """The production stand-in for the SQS source: a checkpointed
    JSON-lines landing directory."""
    return (
        spark.readStream.format("json")
        .schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(landing_dir)
    )


def rate_envelope_source(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """The in-memory test source (reference: examples/basic/main.go:32-47):
    synthetic envelopes at a controlled rate, for soak/driver tests."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return raw.select(
        F.to_json(
            F.struct(
                F.col("value").alias("id"),
                F.concat(F.lit("item-"), F.col("value")).alias("name"),
                (F.col("value") * 1.337).alias("value"),
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss"
                ).alias("ts"),
            )
        ).alias("value"),
        F.create_map(
            F.lit("MessageId"), F.col("value").cast("string")
        ).alias("attributes"),
    )


def kafka_envelope_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int = 100_000,
) -> DataFrame:
    """Kafka → Envelope mapping (value bytes → string, headers+metadata
    → attributes). Requires the spark-sql-kafka package on the
    classpath; gated so environments without it fail with a clear
    message at call time, not import time."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
            .load()
        )
    except Exception as err:  # pragma: no cover - classpath-dependent
        raise RuntimeError(
            "Kafka source unavailable: add the spark-sql-kafka-0-10 "
            "package to the session (spark.jars.packages)"
        ) from err
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.map_from_arrays(
            F.array(F.lit("topic"), F.lit("partition"), F.lit("offset")),
            F.array(
                F.col("topic"),
                F.col("partition").cast("string"),
                F.col("offset").cast("string"),
            ),
        ).alias("attributes"),
    )
