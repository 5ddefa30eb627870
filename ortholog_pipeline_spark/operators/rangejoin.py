"""Range (interval) join: match point rows to interval rows with
start <= t < end, optionally per key — without the cartesian blowup Spark
produces for a naive inequality join (BroadcastNestedLoop / CartesianProduct).

Encoding: chunk time into fixed buckets. Each interval explodes into the
buckets it covers; each point maps to exactly ONE bucket. An equi-join on
(keys…, bucket) bounds candidates to same-bucket pairs, and the exact
predicate refines. Because a point owns a single bucket, no dedup step is
needed — each (point, interval) pair meets at most once.

Scale properties:
  * shuffle is an equi-join on (keys, bucket) — hash-partitionable, AQE-skew
    eligible, never nested-loop;
  * candidate factor = avg interval length / bucket size + 1; pick the bucket
    near the median interval length so explosion stays O(1) per interval;
  * degenerate few-intervals case: pass ``broadcast=True`` to skip chunking
    and broadcast the intervals — one map-side filter, zero shuffle.

Reference parity: none (the reference joins only on equality keys); engine
extension alongside asof.py for temporal workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    broadcast: bool = False,
) -> DataFrame:
    """Inner-join points to the intervals containing them (start <= ts < end).
    Returns point columns + interval columns (minus the join keys)."""
    keys = by or []
    if broadcast:
        cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        for k in keys:
            cond &= points[k] == intervals[k]
        ival = F.broadcast(intervals.drop(*keys) if keys else intervals)
        # joining on the raw predicate: Catalyst plans BroadcastNestedLoop,
        # which is exactly right when intervals fit in one broadcast block
        return points.join(F.broadcast(intervals), on=keys, how="inner").filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        ) if keys else points.crossJoin(ival).filter(cond)

    # epoch seconds WITH fractional micros (unix_timestamp truncates, which
    # would misplace sub-second boundaries); double is exact here: 1.7e9 s ×
    # 1e6 µs ≈ 1.7e15 < 2^53. TIMESTAMP_NTZ forbids a direct numeric cast, so
    # route it through the session-zoned type first (identity under TZ=UTC and
    # self-consistent regardless: points and intervals shift together).
    types = {**dict(intervals.dtypes), **dict(points.dtypes)}

    def _sec(c: str) -> F.Column:
        col = F.col(c)
        if types.get(c, "").startswith("timestamp"):
            col = col.cast("timestamp")
        return col.cast("double")

    b = F.lit(float(bucket_seconds))
    p = points.withColumn("_bkt", F.floor(_sec(ts_col) / b))
    start_b = F.floor(_sec(start_col) / b)
    # end is exclusive: the last covered bucket holds (end − 1µs); guard with
    # greatest() because Spark's sequence(hi, lo) counts DOWN, not empty
    end_b = F.greatest(F.floor((_sec(end_col) - 1e-6) / b), start_b)
    i = intervals.withColumn("_bkt", F.explode(F.sequence(start_b, end_b)))
    return (
        p.join(i, [*keys, "_bkt"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bkt")
    )
