"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

The reference's only long-lived stream state is bookkeeping (schema
adapters C5, GTID sets C4, shard offsets C9 — SURVEY §2.7); those
collapse into checkpoints/watermarks here. This module is the
template for state that CANNOT collapse: per-key accumulators with
event-time timeouts (session windows, transaction assembly, dedupe
with custom eviction). Pattern: Arrow-batched per-group pandas
handler + engine-managed state store + watermark-driven timeout —
state lives in the checkpoint, scales with keys not events, and is
evicted by the timeout (no unbounded TTL map).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# state: [start_us, end_us, n]
STATE_SCHEMA = "start long, end long, n long"

US = 1_000_000


def _micros(ts: pd.Series) -> pd.Series:
    return ts.astype("int64") // 1000  # pandas ns -> us


def make_sessionizer(gap_s: int):
    """Returns the per-group handler closing sessions after `gap_s`
    of event-time silence."""

    gap_us = gap_s * US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                closed.append((user_id, start, end, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts = sorted(_micros(rows["ts"]))
            if state.exists:
                start, end, n = state.get
            else:
                start, end, n = None, None, 0
            for t in ts:
                if start is None:
                    start, end, n = t, t, 1
                elif t - end > gap_us:
                    closed.append((user_id, start, end, n))
                    start, end, n = t, t, 1
                else:
                    end, n = max(end, t), n + 1
            state.update((start, end, n))
            # Event-time timeout: fire when the watermark passes the
            # session end + gap (timestamp is in millis).
            state.setTimeoutTimestamp((end + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Append-mode session stream: one output row per CLOSED session
    (closed by a later event beyond the gap, or by the watermark
    passing end+gap). One shuffle on the key; state size = live keys."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            make_sessionizer(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
