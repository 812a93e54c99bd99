"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

Built-in session windows (``F.session_window``) cover the aggregation case;
this operator exists for the semantics the built-in can't express — carrying
an OPEN session's partial aggregate across micro-batches and emitting a
session row only once it is closed by a gap (or by timeout). That shape —
per-key mutable state, arbitrary close conditions — is the
``applyInPandasWithState`` contract (the Arrow-batched form of
flatMapGroupsWithState).

State per user: (session_start_epoch, last_ts_epoch, n_events, sum_value).
An incoming batch's events are sorted by event time inside the kernel; an
event further than ``gap`` from the last one closes the current session
(emit) and opens a new one. On ProcessingTimeTimeout the open session is
flushed. State is O(1) per active user — bounded, unlike buffering events.

Scale: state store is hash-partitioned by user_id across executors; skew =
one hyperactive user still only costs O(1) state and O(its events) per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start double, last double, n long, sv double"


def _sessionize_kernel(gap_seconds: float, idle_flush: bool = True):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                rows.append((user_id, start, last, n, sv))
                state.remove()
        else:
            events = pd.concat(list(pdfs), ignore_index=True)
            events = events.sort_values("ts")
            # integer microseconds: exact in float64 up to year ~2255, and
            # round-trips losslessly through Arrow's timestamp[us]
            ts = events["ts"].astype("int64").to_numpy() // 1000
            vals = events["value"].to_numpy()

            if state.exists:
                start, last, n, sv = state.get
            else:
                start = last = float(ts[0])  # microseconds
                n, sv = 0, 0.0
                # first event counted in the loop below

            gap_us = gap_seconds * 1e6
            for t, v in zip(ts, vals):
                if n > 0 and t - last > gap_us:
                    rows.append((user_id, start, last, n, sv))
                    start, n, sv = float(t), 0, 0.0
                last = float(t)
                n += 1
                sv += float(v)
            state.update((float(start), float(last), int(n), float(sv)))
            if idle_flush:
                state.setTimeoutDuration(int(gap_seconds * 1000))

        if rows:
            out = pd.DataFrame(
                rows, columns=["user_id", "start", "end", "n_events", "sum_value"]
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"].astype("int64"),
                    "session_start": pd.to_datetime(out["start"].astype("int64"), unit="us"),
                    "session_end": pd.to_datetime(out["end"].astype("int64"), unit="us"),
                    "n_events": out["n_events"].astype("int64"),
                    "sum_value": out["sum_value"].astype("float64"),
                }
            )

    return fn


def sessionize_stream(events, gap: str = "30 minutes", idle_flush: bool = True):
    """events stream (ts, user_id, value, ...) -> CLOSED session rows.

    ``idle_flush=True`` (continuous deployments): an open session whose user
    goes quiet for the gap is flushed by a processing-time timeout — note
    this keeps an availableNow drain alive until the timeouts fire.
    ``idle_flush=False`` (bounded backfills/tests): open sessions simply stay
    in state and the drain terminates after the last data batch.
    """
    gap_seconds = _parse_gap_seconds(gap)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_flush
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_kernel(gap_seconds, idle_flush),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def _parse_gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return float(qty) * mult
