"""[EXT] Custom stateful streaming operator: gap-based sessionization
via ``applyInPandasWithState``.

``operators.sessions.sessionize`` is the batch twin/oracle.  Here the
per-user state (open session start / last-seen / count) lives in the
state store, sessions are emitted when a later event of the same user
closes them, and open sessions flush when the event-time watermark
passes ``last_event + gap`` (``EventTimeTimeout``).

Event-time (not processing-time) timeouts matter operationally: with
``ProcessingTimeTimeout`` a drain-the-source run (``Trigger.
AvailableNow``) spins no-data micro-batches forever waiting for wall
clock to fire the timeouts — the query never terminates.  Keyed to the
watermark, the final no-data batch flushes everything the watermark
passed and the query stops.

Scale: state is partitioned by user_id across executors; each
micro-batch touches only users present in the batch plus watermark-
expired state.  Memory is O(open sessions), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _emit(user_id: Any, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start_us": [s[0] for s in sessions],
            "n_events": [s[2] for s in sessions],
            "duration_us": [s[1] - s[0] for s in sessions],
        }
    )


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _emit(user_id, [(start_us, last_us, n)])
        return

    ts = (
        pd.concat([b["us"] for b in batches])
        .sort_values()
        .reset_index(drop=True)
    )
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0

    closed: list[tuple[int, int, int]] = []
    for t in ts.astype("int64"):
        if start_us is None:
            start_us, last_us, n = int(t), int(t), 1
        elif int(t) - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = int(t), int(t), 1
        else:
            last_us, n = int(t), n + 1
    state.update((start_us, last_us, n))
    # Flush the open session once the watermark passes last_event+gap.
    # The timestamp must stay ahead of the current watermark or Spark
    # rejects it — clamp for groups whose events are already old
    # relative to the batch's max event time.
    timeout_ms = last_us // 1000 + gap_us // 1000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
    if closed:
        yield _emit(user_id, closed)


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming sessionization over a streaming events DF (must carry
    ``user_id`` and a ``ts`` timestamp column)."""
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    with_us = events.withWatermark("ts", watermark).select(
        "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        lambda key, pdf_iter, state: _sessionize_group(key, pdf_iter, state, gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
