"""Streaming windowed aggregations with watermark-based late-data
handling.

The reference has no event-time windows at all — its only time notion
is the wall-clock flush interval (reference: batcher/batcher.go:24-26).
These builders are the capability the north star adds: the same
``window()`` / ``session_window()`` expressions as the batch queries
q24–q26, applied to an unbounded DataFrame with a watermark.

Each builder is DataFrame-in → DataFrame-out so the identical call
works on ``spark.read`` (tests, backfill) and ``spark.readStream``
(production) — Spark's batch/stream duality is the API contract.

Scale notes: streaming state (open windows, dedup keys) lives in the
state store keyed by group; the watermark bounds state size — without
it an unbounded-key stream grows state forever. Session windows merge
per key, so a hot user_id concentrates state; the watermark is the
backstop there too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_watermark_if_streaming(
    df: DataFrame, ts_col: str, delay: str
) -> DataFrame:
    """Watermarks only apply to streaming plans; batch twins skip them."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """1-value-per-(window)-per-trigger count; late rows beyond the
    watermark are dropped (the reference would have silently batched
    them into the wrong flush — this is strictly stronger semantics)."""
    return (
        with_watermark_if_streaming(df, ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        with_watermark_if_streaming(df, ts_col, watermark)
        .groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def session_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (dynamic length, gap-keyed) per key."""
    return (
        with_watermark_if_streaming(df, ts_col, watermark)
        .groupBy(key_col, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            key_col, F.col("w.start").alias("session_start"), "cnt"
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    The reference documents dedup as a transformer-drop use case
    (reference: transformer/transformer.go:10-12) but keeps no state
    for it; dropDuplicatesWithinWatermark is the scalable stateful
    version — state is evicted once the watermark passes, so memory is
    bounded by the watermark horizon, not the stream length.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
