"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful operators at all (its only state is ack
bookkeeping — SURVEY.md §2.2); this is the north-star capability for
arbitrary per-key streaming state that the built-in windows can't
express: running per-user counters with inactivity timeout, emitting a
summary row when a user goes quiet.

Scale notes: state lives in the state store partitioned by the group
key — a shuffle on user_id per micro-batch, state size O(active keys).
The processing-time timeout evicts idle keys, which is what bounds
state at 100 TB (same role the watermark plays for windows). Pandas
batches arrive per key-group via Arrow.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

USER_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _track_user(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per user; on timeout emit the
    closed summary and drop the state."""
    (user_id,) = key
    if state.hasTimedOut:
        events_seen, total_value = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "events_seen": [events_seen],
                "total_value": [total_value],
                "closed": [True],
            }
        )
        return
    events_seen, total_value = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        events_seen += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((events_seen, total_value))
    state.setTimeoutDuration(30_000)  # 30 s inactivity closes the session
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "events_seen": [events_seen],
            "total_value": [total_value],
            "closed": [False],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """events(user_id, value, …) → running per-user activity summaries.

    Works only on streaming DataFrames (state requires the streaming
    engine); the batch twin is a plain groupBy aggregate.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=USER_ACTIVITY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def user_activity_batch_twin(events: DataFrame) -> DataFrame:
    """The batch-mode equivalent (no timeouts: one closed summary per
    user), for differential testing of the stateful operator."""
    import pyspark.sql.functions as F

    return events.groupBy("user_id").agg(
        F.count("*").alias("events_seen"),
        F.sum("value").alias("total_value"),
    )
