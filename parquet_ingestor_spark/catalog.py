"""Testdata catalog: the driver-generated TPC-H-ish star schema plus the
``events`` stream table and the training-data tables (``documents``,
``embeddings``).

All loads are plain ``spark.read.parquet`` — column pruning and filter
pushdown then happen inside the scan (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables that are always broadcast-join-sized relative to the facts —
# at TPC-H geometry region/nation are constant-size and supplier grows
# ~100× slower than lineitem.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """Correctness-critical runtime confs, set defensively so queries
    work on *any* session (the driver builds its own): nanos parquet
    reads and UTC time semantics (every time-bucketing query assumes
    the testdata's naive-UTC timestamps)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_ts(df: DataFrame) -> DataFrame:
    """Rebuild a µs timestamp from raw int64-nanos ``ts`` columns.

    Testdata generations have stored events.ts as TIMESTAMP(NANOS)
    (arrives as bigint nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as TIMESTAMP(MICROS)
    (arrives as a timestamp directly) — the guard on dtype makes both
    read identically, so the engine is agnostic to which generation it
    is pointed at. Queries format/bucket timestamps rather than
    emitting raw ns, so the µs truncation is not observable.
    """
    for col_name, dtype in df.dtypes:
        if col_name == "ts" and dtype == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif col_name == "ts" and dtype == "timestamp_ntz":
            # naive-UTC semantics under the UTC session: the cast is a
            # type-tag change, not a value change. LTZ is required by
            # event-time operators (withWatermark rejects NTZ).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    return normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
