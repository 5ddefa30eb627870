"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState``.

This is the operator class Spark lacks as a built-in (gap-based sessions with
per-key state and event-time timeout) and the designated extension point for the
engine's "custom stateful operators" (SURVEY.md §2.9 forward-looking note). State per
key is O(1) (one open session tuple), Arrow moves rows in batches, and the watermark
bounds state lifetime — the 100 TB-era properties: no per-row Python round trips, no
unbounded state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

#: open-session state: (start_ms, end_ms, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _ms(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def _row(user_id: int, start_ms: int, end_ms: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(end_ms, unit="ms")],
            "n_events": [n],
            "sum_value": [float(sv)],
        }
    )


def make_session_fn(gap_seconds: int):
    """Build the per-key state function. Within a batch, events are sorted by event
    time and split on gaps > ``gap_seconds``; every closed session is emitted
    immediately, the trailing open session persists in state and is emitted when the
    event-time timeout (watermark passing end + gap) fires."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, sv = state.get
            state.remove()
            yield _row(user_id, start_ms, end_ms, n, sv)
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_ms = rows["ts"].map(_ms).to_numpy()
        vals = rows["value"].to_numpy()

        if state.exists:
            cur_start, cur_end, cur_n, cur_sv = state.get
        else:
            cur_start = cur_end = -1
            cur_n, cur_sv = 0, 0.0

        for t, v in zip(ts_ms, vals):
            if cur_start < 0:
                cur_start, cur_end, cur_n, cur_sv = t, t, 1, float(v)
            elif t - cur_end > gap_ms:
                yield _row(user_id, cur_start, cur_end, cur_n, cur_sv)
                cur_start, cur_end, cur_n, cur_sv = t, t, 1, float(v)
            else:
                cur_end, cur_n, cur_sv = max(cur_end, t), cur_n + 1, cur_sv + float(v)

        state.update((int(cur_start), int(cur_end), int(cur_n), float(cur_sv)))
        state.setTimeoutTimestamp(int(cur_end) + gap_ms)

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization of a streaming events frame: one output row per
    closed session (user_id, session bounds, event count, value sum)."""
    from ortholog_pipeline_spark.streaming.state_conf import ensure_state_store_conf

    if events.isStreaming:
        ensure_state_store_conf(events.sparkSession)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
