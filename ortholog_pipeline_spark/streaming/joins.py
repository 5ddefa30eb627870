"""Watermarked stream-stream joins.

A stream-stream join must buffer both sides; unbounded buffers are the classic
streaming OOM. The interval-bounded equi-join below is the shape Spark can run
with FINITE state: both sides watermarked, and the event-time interval lives
INSIDE the join condition (not a post-filter) — that is what lets Spark derive
a state watermark and evict a buffered row once no future partner can match
it. State is O(events per lookback window per key), independent of stream age.

The identical function body runs in batch (watermarks are no-ops there), which
is how the test pins stream/batch result equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ortholog_pipeline_spark.streaming.state_conf import ensure_state_store_conf


def interval_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join left rows to right rows of the same key whose timestamp falls in
    (left.ts − lookback, left.ts] — e.g. each purchase to the clicks that led
    to it within the attribution window. Inner join; every column comes back
    prefixed (key included, so downstream code never sees an ambiguous name)."""
    lk, rk = f"{left_prefix}{key}", f"{right_prefix}{key}"
    l = left.select(*[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    r = right.select(*[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    lts, rts = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    if l.isStreaming or r.isStreaming:
        ensure_state_store_conf(left.sparkSession)
    if l.isStreaming:
        l = l.withWatermark(lts, watermark)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) > F.col(lts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rts) <= F.col(lts))
    )
    return l.join(r, on=cond, how="inner")
