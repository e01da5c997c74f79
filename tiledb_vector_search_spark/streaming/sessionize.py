"""Custom stateful streaming operator: gap-based sessionization.

The batch twin is the ``user_sessionization`` registry entry (lag-window
gap splitting).  Streaming cannot use a lag window — events for one user
arrive across micro-batches — so this is the canonical
``applyInPandasWithState`` shape from SURVEY §2.12: per-user session state
carried between batches, event-time timeout closing idle sessions once the
watermark passes ``last_event + gap``.

Scale posture: state is partitioned by user (one shuffle on ``user_id``
per micro-batch, Spark's state store keeps it local across batches); the
per-group kernel is a vectorized pandas pass over that user's batch
events.  Emitted rows are CLOSED sessions only (append mode), so the sink
sees each session exactly once.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# (session_start_us, last_event_us, n_events) — epoch MICROseconds: the
# event data is µs-resolution, and ms-truncated state would emit session
# bounds that differ from the batch twin by sub-ms amounts
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_frame(user: int, sessions: list[Tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization: emits one row per CLOSED session.

    A session closes either (a) mid-batch, when the next event of the same
    user is > ``gap_minutes`` later, or (b) by event-time timeout, when the
    watermark passes ``last_event + gap`` with no new events.  Open
    sessions stay in the state store.
    """
    if not events.isStreaming:
        raise ValueError("sessionize_stream needs a streaming DataFrame")
    gap_us = gap_minutes * 60_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _session_frame(user, [(start, last, n)])
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf["ts"])
            ts_us.extend(int(v) for v in col.astype("int64") // 1_000)
        ts_us.sort()
        if not ts_us:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 1
            ts_us = ts_us[1:]
        closed: list[Tuple[int, int, int]] = []
        for t in ts_us:
            if t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        # timeout API is ms-resolution: round UP so the timer never fires
        # before the µs-exact gap has elapsed
        state.setTimeoutTimestamp(-(-(last + gap_us) // 1_000))
        if closed:
            yield _session_frame(user, closed)

    return (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
