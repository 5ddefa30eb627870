"""Deequ-style declarative data-quality suite: completeness, uniqueness, range,
accepted-values, and referential-integrity checks compiled into a tall report
frame (check, metric, passed).

Scale design: every single-table check on the same table compiles into ONE
conditional-aggregation pass (`sum(when(...))` columns in a single agg — one scan,
map-side partials, a 1-row shuffle), then the wide row is exploded into the tall
report (plan-side unpivot, no driver collect). Referential integrity is a
left-anti join reduced to a count aggregate — at 100 TB that is the unavoidable
shuffle, and AQE broadcasts it when the parent key side is small. The full
report is a union of 1-row frames: driver-side plan glue, zero data movement.
"""

from __future__ import annotations

import itertools
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = tuple[str, F.Column, F.Column]  # (name, metric expr, passed expr)


def compile_checks(
    *,
    completeness: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Sequence[tuple[str, float, float]] = (),
    accepted: Sequence[tuple[str, Sequence[str]]] = (),
) -> list[Check]:
    """Compile declarative checks over ONE table into aggregate-expression triples
    that all evaluate in a single scan.

    completeness: non-null fraction, passes at exactly 1.0
    unique:       duplicate count (count - count_distinct, exact), passes at 0
    ranges:       count of col outside [lo, hi], passes at 0
    accepted:     count of col outside the value list, passes at 0
    """
    n = F.count(F.lit(1)).cast("double")
    out: list[Check] = []
    for c in completeness:
        frac = F.round(F.count(c) / n, 6)
        out.append((f"completeness:{c}", frac, frac == 1.0))
    for c in unique:
        dup = (F.count(c) - F.count_distinct(F.col(c))).cast("double")
        out.append((f"unique:{c}", dup, dup == 0.0))
    for c, lo, hi in ranges:
        v = F.sum(
            F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
        ).cast("double")
        out.append((f"range:{c}", v, v == 0.0))
    for c, vals in accepted:
        v = F.sum(F.when(~F.col(c).isin(list(vals)), 1).otherwise(0)).cast(
            "double"
        )
        out.append((f"accepted:{c}", v, v == 0.0))
    return out


def single_pass_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One scan -> one wide agg row -> exploded tall (check, metric, passed)."""
    aggs = []
    for i, (_, metric, passed) in enumerate(checks):
        aggs.append(metric.alias(f"_m{i}"))
        aggs.append(passed.alias(f"_p{i}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"_m{i}").alias("metric"),
                F.col(f"_p{i}").alias("passed"),
            )
            for i, (name, _, _) in enumerate(checks)
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


def referential_report(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphan-row count as a 1-row report frame: child keys with no matching
    parent (left-anti join folded straight into a count aggregate)."""
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .join(parent.select(F.col(parent_key).alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
    )
    return orphans.select(
        F.lit(f"referential:{child_key}->{parent_key}").alias("check"),
        "metric",
        (F.col("metric") == 0.0).alias("passed"),
    )


def validation_suite(reports: Sequence[DataFrame]) -> DataFrame:
    """Union the per-table reports into one tall frame, ordered for stable output."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("check")


def observed(df: DataFrame, name: str, *metrics: F.Column):
    """Attach zero-cost in-flight metrics to a DataFrame via Spark's
    Observation API: the named aggregates are computed ON the rows already
    flowing through the plan during the NEXT action — no second scan, no
    separate metrics job, which is the difference at 100 TB between "free
    telemetry" and "the pipeline runs twice". Returns ``(df, observation)``;
    read ``observation.get`` after an action on ``df``.

    Use for flow health counters (rows ingested, nulls seen, guard
    tripwires) alongside the declarative suite above — the suite VALIDATES a
    published snapshot with its own scan; observed() instruments a scan the
    job was doing anyway.

    The registered name is ``name`` plus a per-call nonce: Observations match
    listener events BY NAME within the SparkSession, so two flows running
    concurrently in one session (threaded bench probes, parallel plans) with
    a fixed name would cross-match each other's observedMetrics."""
    from pyspark.sql import Observation

    obs = Observation(f"{name}_{next(_OBS_SEQ)}")
    return df.observe(obs, *metrics), obs


_OBS_SEQ = itertools.count()
