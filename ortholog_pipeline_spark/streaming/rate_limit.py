"""Custom stateful streaming operator: per-key sliding-window rate limiting
(token-bucket family) via ``applyInPandasWithState``.

Semantics match the batch reference query `w_rate_limit_flags` exactly: an
event is flagged when its key has ≥ ``limit`` events within the trailing
``window_seconds`` (inclusive of itself), on whole-second event time. The
batch twin is a partitioned RANGE-frame window; streaming cannot use a frame
over unbounded history, so state per key is the deque of in-horizon event
seconds — bounded at ``limit`` entries by construction (older entries can
never affect a future decision once ``limit`` newer ones exist... they CAN
until they age out, so the prune keeps everything inside the horizon: ≤
window_seconds entries worst-case, tiny either way).

Scale properties: Arrow-batched (no per-row Python), per-key state is O(min(
events-in-horizon, window_seconds)), and the event-time timeout retires idle
keys so state does not grow with the key universe's history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLAG_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("sec", T.LongType()),
        T.StructField("flagged", T.IntegerType()),
    ]
)

#: per-key state: event seconds still inside the trailing horizon
STATE_SCHEMA = T.StructType([T.StructField("secs", T.ArrayType(T.LongType()))])


def make_rate_limit_fn(window_seconds: int = 60, limit: int = 3):
    """Per-key state function: maintain the in-horizon second list, flag each
    event whose trailing window reaches ``limit``. Events within one batch are
    processed in event-time order (the batch twin's window order)."""

    def fn(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("sec")
        secs = [int(s) for s in rows["sec"].to_numpy()]
        held: list[int] = list(state.get[0]) if state.exists else []

        out_sec: list[int] = []
        out_flag: list[int] = []
        for s in secs:
            held.append(s)
            # the event's own decision counts its trailing window only — for a
            # late (cross-batch) arrival this is still its correct
            # batch-semantics flag as long as its window is inside retained
            # state; flags already emitted for earlier events are not
            # retracted (append-mode property; the watermark bounds lateness)
            n_window = sum(1 for h in held if s - window_seconds < h <= s)
            out_sec.append(s)
            out_flag.append(1 if n_window >= limit else 0)
            # prune against the NEWEST event seen, not s: a late arrival must
            # not evict state that future in-order events need
            newest = max(held)
            held = [h for h in held if h > newest - window_seconds]

        state.update(([int(h) for h in held],))
        # retire the key once the horizon has fully passed its newest event
        state.setTimeoutTimestamp((max(held) + window_seconds + 1) * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_sec),
                "sec": out_sec,
                "flagged": out_flag,
            }
        )

    return fn


def rate_limit_flags(
    events: DataFrame,
    window_seconds: int = 60,
    limit: int = 3,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-event rate-limit flags for a stream with (user_id, ts).

    Wire to any sink; semantics are the batch `w_rate_limit_flags` reference
    (tests assert per-event parity on the same input)."""
    keyed = events.withWatermark("ts", watermark).select(
        "user_id", F.col("ts").cast("long").alias("sec"), F.col("ts")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_rate_limit_fn(window_seconds, limit),
        outputStructType=FLAG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
