"""Q1–Q8 — the reference's own dataflow semantics, as Spark DataFrame ops.

These queries exercise the operator surface the reference actually
implements (SURVEY.md §2.1): projection (O3/O4), filter/drop (O5),
dedup (O5), flatMap 1→N (O4), time-partitioned layout (O9), batching
conservation (O7), commit/ack-after-write (O15), attribute extraction
(O3). Adapted to the driver testdata's real ``events`` schema
(event_id, ts, user_id, event_type, value, props) and ``documents``.
"""

from __future__ import annotations

import os as _os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from . import register

#: q07 scratch sinks already registered for exit-time cleanup.
_Q07_SCRATCH_DIRS: set[str] = set()

# The event_type the pipeline treats as droppable, exercising the
# reference's "transformer returns empty slice => deliberate drop"
# semantics (reference: ingestor/ingestor.go:476-481).
DROP_EVENT_TYPE = "error"


@register(
    "q01_project_events",
    oracle="""
        SELECT event_id, event_type, user_id
        FROM events
        ORDER BY event_id
    """,
    doc="O4 transform: typed projection of the raw stream record.",
    tags=("dataflow", "projection"),
)
def q01_project_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    )


@register(
    "q02_filter_drop",
    oracle=f"""
        SELECT event_id
        FROM events
        WHERE event_type <> '{DROP_EVENT_TYPE}'
        ORDER BY event_id
    """,
    doc="O5 filter/drop: dropped rows never reach the batcher.",
    tags=("dataflow", "filter"),
)
def q02_filter_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") != DROP_EVENT_TYPE)
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "q03_dedup_users",
    oracle="""
        SELECT DISTINCT user_id
        FROM events
        ORDER BY user_id
    """,
    doc="O5 dedup hook: exact distinct (hash aggregate, map-side partial).",
    tags=("dataflow", "dedup"),
)
def q03_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select("user_id").distinct().orderBy("user_id")


@register(
    "q04_flatmap_tokens",
    oracle="""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        GROUP BY tok
        ORDER BY tok
    """,
    doc="O4 flatMap 1→N: one document row explodes to N token rows.",
    tags=("dataflow", "explode"),
)
def q04_flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode() is Spark's 1→N generator; the count that follows is a
    # partial-aggregated (map-side combined) hash aggregate, so the
    # shuffle carries one row per (partition, token), not per token
    # occurrence — the plan that survives 100 TB of documents.
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy("tok")
    )


@register(
    "q05_time_partition_counts",
    oracle="""
        SELECT CAST(year(ts) AS INTEGER) AS y,
               CAST(month(ts) AS INTEGER) AS m,
               CAST(day(ts) AS INTEGER) AS d,
               CAST(hour(ts) AS INTEGER) AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2, 3, 4
    """,
    doc="O9 partitioned key generation: the YYYY/MM/DD/HH sink layout.",
    tags=("dataflow", "partitioning"),
)
def q05_time_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("y", "m", "d", "h")
    )


@register(
    "q06_conservation",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(length(props)) AS BIGINT) AS payload_chars
        FROM events
    """,
    doc="O7 batching invariant: row/byte conservation through the pipeline.",
    tags=("dataflow", "invariant"),
)
def q06_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").agg(
        F.count("*").alias("cnt"),
        F.sum(F.length("props")).alias("payload_chars"),
    )


@register(
    "q07_roundtrip_conservation",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(length(props)) AS BIGINT) AS payload_chars
        FROM events
    """,
    doc=(
        "O15 commit semantics: events are ingested through the engine's "
        "partitioned parquet sink, read back from the sink output, and must "
        "conserve rows/bytes exactly once (reference: the ack-only-after-"
        "durable-write guarantee, ingestor/ingestor.go:56-60)."
    ),
    tags=("dataflow", "pipeline", "invariant"),
)
def q07_roundtrip_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the partitioned sink. The sink target is one
    deterministic scratch dir per (process, sf_dir), written in
    overwrite mode and removed at interpreter exit — repeated builder
    invocations reuse it instead of leaking a fresh mkdtemp each time.
    """
    import atexit
    import hashlib
    import shutil
    import tempfile

    from ..pipeline import ingest_batch

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = (
        f"{tempfile.gettempdir()}/pqing_q07_{_os.getpid()}_{tag}"
    )
    if out_dir not in _Q07_SCRATCH_DIRS:
        _Q07_SCRATCH_DIRS.add(out_dir)
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    ingest_batch(table(spark, sf_dir, "events"), out_dir)
    return spark.read.parquet(out_dir).agg(
        F.count("*").alias("cnt"),
        F.sum(F.length("props")).alias("payload_chars"),
    )


@register(
    "q08_attr_extract",
    oracle="""
        SELECT CAST(regexp_extract(props, '"k"\\s*:\\s*([0-9]+)', 1) AS INTEGER) AS k,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    doc="O3 attribute projection: pull a typed key out of the raw props blob.",
    tags=("dataflow", "extraction"),
)
def q08_attr_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regexp_extract + try_cast stay inside whole-stage codegen (JVM);
    # a Python UDF here would be the classic 100×-slower mistake.
    return (
        table(spark, sf_dir, "events")
        .select(
            F.regexp_extract(F.col("props"), r'"k"\s*:\s*([0-9]+)', 1)
            .try_cast("int")
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("k")
    )
