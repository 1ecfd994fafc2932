"""Stream-stream and stream-static joins — capabilities the reference
cannot express at all (it is a single-pipeline engine; SURVEY.md §2.2).

Stream-stream inner joins buffer both sides in the state store; the
watermark + time-range join condition is what lets Spark evict state —
without the range condition state grows forever. The event-time range
also defines the business semantics (a click attributes to a purchase
within the horizon window).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming attribution: join each purchase to the same user's
    clicks within [purchase - horizon, purchase]. Both sides
    watermarked → bounded state; the time-range predicate is mandatory
    for state eviction on stream-stream joins."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "click_id")


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: the static side re-resolves per micro-batch
    (picks up dim updates), broadcasts when small — no state at all.

    No literal broadcast hint: ``dim`` is caller-supplied and may grow
    (the q10-hint lesson — a hint overrides stats and OOMs where AQE
    would choose right). Stats-based planning broadcasts small dims
    anyway; callers with a known-bounded dim can pass
    ``F.broadcast(dim)`` themselves."""
    return stream.join(dim, on, "left")
