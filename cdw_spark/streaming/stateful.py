"""Custom stateful streaming operator: arbitrary-state sessionization via
``applyInPandasWithState`` (SURVEY.md §7.2 M5 — the pattern the built-in
``session_window`` can't generalize: per-key state machines with custom
merge/emit logic and event-time timeouts).

This sessionizer intentionally reproduces ``F.session_window`` append-mode
semantics exactly (session_end = last_ts + gap; an event at prev+gap opens
a new session; a session is emitted only once the watermark passes its
close — never earlier, so late events inside the allowed delay could still
have extended it). Differential-tested against the built-in session_window
stream in tests/test_streaming.py. Swap the merge logic for e.g. funnel
detection or CDC upserts and the scaffold stays the same.

Scale: state lives in the state store partitioned by key — one shuffle on
user_id per micro-batch, Arrow-batched Python execution (pandas, not
row-at-a-time), state size O(active keys + pending unflushed sessions),
bounded by event-time timeouts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# Parallel arrays of sessions (microsecond timestamps): index 0..n-2 are
# closed-but-unflushed sessions (waiting for the watermark), index n-1 is
# the open session.
STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("totals", ArrayType(DoubleType())),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _emit(user_id: int, closed: list[list]) -> pd.DataFrame:
    """ONE DataFrame for every session closed this call — per-session
    1-row frames cost ~1 ms each in pandas construction, which dominated
    the whole operator at fixture scale (measured: the batched form cut
    the streaming replay several seconds at sf0.1)."""
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": pd.to_datetime([s[0] for s in closed], unit="us"),
            "session_end": pd.to_datetime([s[1] + GAP_US for s in closed], unit="us"),
            "n_events": [s[2] for s in closed],
            "total_value": [s[3] for s in closed],
        }
    )


def _flush(user_id: int, sessions: list[list], state: GroupState):
    """Emit every session the watermark has closed; keep the rest in state.

    The rule is uniform even for the open tail session: if its close
    (last_ts + gap) is <= watermark it can never be extended again — any
    non-late event would be >= watermark >= last_ts + gap and so start a
    new session, and later-than-that events are dropped as late."""
    wm_us = state.getCurrentWatermarkMs() * 1000
    keep: list[list] = []
    closed: list[list] = []
    for sess in sessions:
        if sess[1] + GAP_US <= wm_us:
            closed.append(sess)
        else:
            keep.append(sess)
    if closed:
        yield _emit(user_id, closed)
    if keep:
        state.update(
            (
                [s[0] for s in keep],
                [s[1] for s in keep],
                [s[2] for s in keep],
                [s[3] for s in keep],
            )
        )
        # Wake when the earliest retained close crosses the watermark.
        # (ms-granular API: round up so we never fire early.)
        next_close = min(s[1] + GAP_US for s in keep)
        state.setTimeoutTimestamp(-(-next_close // 1000))
    elif state.exists:
        state.remove()


def _sessionize_group(key, pdf_iter, state: GroupState):
    (user_id,) = key

    if state.exists:
        starts, lasts, ns, totals = state.get
        sessions = [list(t) for t in zip(starts, lasts, ns, totals)]
    else:
        sessions = []

    rows = [pdf[["ts", "value"]] for pdf in pdf_iter if len(pdf)]
    if state.hasTimedOut or not rows:
        # Timeout tick (no data): flush what the watermark closed.
        yield from _flush(user_id, sessions, state)
        return

    batch = pd.concat(rows).sort_values("ts")
    ts_us = (batch["ts"].astype("int64") // 1_000).to_numpy()
    vals = batch["value"].to_numpy()
    for t, v in zip(ts_us, vals):
        t = int(t)
        if not sessions or t >= sessions[-1][1] + GAP_US:
            sessions.append([t, t, 0, 0.0])
        cur = sessions[-1]
        cur[1] = max(cur[1], t)
        cur[2] += 1
        cur[3] += float(v)
    yield from _flush(user_id, sessions, state)


def sessionize(events: DataFrame) -> DataFrame:
    """Append-mode stateful sessionization keyed by user_id.

    Input must carry a watermark on ``ts`` (event-time timeouts are driven
    by it). Output schema matches ``session_agg`` minus the decimal cast
    (state arithmetic is double-precision).
    """
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
