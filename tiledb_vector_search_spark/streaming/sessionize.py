"""Custom stateful streaming operator: gap-based sessionization.

The batch twin is the ``user_sessionization`` registry entry (lag-window
gap splitting).  Streaming cannot use a lag window — events for one user
arrive across micro-batches — so this is the canonical
``applyInPandasWithState`` shape from SURVEY §2.12: per-user session state
carried between batches, event-time timeout closing idle sessions once the
watermark passes ``last_event + gap``.

Correctness contract — WATERMARK-SAFE emission: a session is emitted
only once the watermark has passed ``session_end + gap``, never merely
because a later event of the same user happened to arrive in the same
micro-batch.  Eager mid-batch emission (the first cut here) made the
output order-dependent: a late-but-within-watermark event — exactly the
rows the watermark contract promises to honor — could arrive AFTER its
session had already been emitted in append mode, un-retractably, so the
emitted set diverged from the batch twin's.  Until the watermark passes,
gap-closed sessions stay in state as PENDING rows (bounded: the pending
window is at most the watermark delay, so state per user is a handful of
(start, last, n) triples, not raw events), and a late event can still
extend or bridge them — session summaries merge exactly (counts add),
no raw-event replay needed.

Scale posture: state is partitioned by user (one shuffle on ``user_id``
per micro-batch, Spark's state store keeps it local across batches); the
per-group kernel is a vectorized pandas pass over that user's batch
events.  Emitted rows are CLOSED sessions only (append mode), so the sink
sees each session exactly once.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# parallel arrays of (session_start_us, last_event_us, n_events) — epoch
# MICROseconds (the event data is µs-resolution, and ms-truncated state
# would emit session bounds that differ from the batch twin by sub-ms
# amounts), sorted by start; the tail entries are the sessions still
# inside the watermark horizon (pending or open)
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
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

    A session is emitted once the watermark passes ``last_event + gap``
    — whether the close was observed mid-batch (a later event of the
    same user arrived > ``gap_minutes`` after it) or by event-time
    timeout (no new events at all).  Sessions the watermark hasn't
    cleared stay in the state store, where a late-but-within-watermark
    event can still extend them or bridge two of them into one.
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
        wm_us = state.getCurrentWatermarkMs() * 1_000
        sessions: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [list(t) for t in zip(starts, lasts, ns)]
        ts_us: list[int] = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                col = pd.to_datetime(pdf["ts"])
                ts_us.extend(int(v) for v in col.astype("int64") // 1_000)
            ts_us.sort()
        for t in ts_us:
            # sessions are disjoint and sorted by start with > gap
            # between them, so t can join at most its two neighbors
            # (joining both = the late event BRIDGES them into one)
            idx = bisect_right([s[0] for s in sessions], t)
            left = idx - 1 if idx > 0 and t <= sessions[idx - 1][1] + gap_us else None
            right = (
                idx
                if idx < len(sessions) and sessions[idx][0] - gap_us <= t
                else None
            )
            if left is None and right is None:
                sessions.insert(idx, [t, t, 1])
            elif left is not None and right is not None:
                merged = [
                    sessions[left][0],
                    max(sessions[right][1], t),
                    sessions[left][2] + sessions[right][2] + 1,
                ]
                sessions[left:right + 1] = [merged]
            else:
                i = left if left is not None else right
                sessions[i][0] = min(sessions[i][0], t)
                sessions[i][1] = max(sessions[i][1], t)
                sessions[i][2] += 1
        closed = [s for s in sessions if s[1] + gap_us <= wm_us]
        remaining = [s for s in sessions if s[1] + gap_us > wm_us]
        if remaining:
            state.update(
                (
                    [s[0] for s in remaining],
                    [s[1] for s in remaining],
                    [s[2] for s in remaining],
                )
            )
            # earliest pending close; timeout API is ms-resolution, so
            # round UP — the timer never fires before the µs-exact gap
            # has elapsed, and remaining > watermark keeps it legal
            next_fire = min(s[1] + gap_us for s in remaining)
            state.setTimeoutTimestamp(-(-next_fire // 1_000))
        else:
            state.remove()
        if closed:
            yield _session_frame(
                user, [(s, l, n) for s, l, n in sorted(closed)]
            )

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
