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


class UserActivityProcessor:
    """transformWithStateInPandas twin of the tracker above — the
    Spark 4 StatefulProcessor API (typed state handles, timers) that
    supersedes applyInPandasWithState. Requires the RocksDB state
    store provider AND protobuf in the Python env (the TWS runner
    imports google.protobuf; absent here, so the differential test
    skips in this container). State is a per-key ValueState of
    (events_seen, total_value), emitted in Update mode per batch.

    Implemented as a plain class and upcast at call time so importing
    this module never hard-depends on the new API surface.
    """

    def init(self, handle) -> None:
        self._acc = handle.getValueState("acc", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        events_seen, total_value = (
            tuple(self._acc.get()) if self._acc.exists() else (0, 0.0)
        )
        for pdf in rows:
            events_seen += len(pdf)
            total_value += float(pdf["value"].sum())
        self._acc.update((events_seen, total_value))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "events_seen": [events_seen],
                "total_value": [total_value],
            }
        )

    def close(self) -> None:
        pass


def user_activity_tracker_tws(events: DataFrame) -> DataFrame:
    """Running per-user totals via transformWithStateInPandas.

    The session must use the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``); the batch twin
    is user_activity_batch_twin minus the ``closed`` flag.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "UserActivityStatefulProcessor",
        (UserActivityProcessor, StatefulProcessor),
        {},
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("events_seen", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        cls(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
