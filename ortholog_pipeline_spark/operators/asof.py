"""As-of (point-in-time) join: for every probe row, the most recent build-side
row at-or-before its timestamp, per key — the lookup every feature/training
pipeline needs against slowly-changing state (price as of trade time, profile
as of event time).

Spark has no ASOF JOIN operator; the naive encodings die at scale (range
crossJoin explodes; per-key collect_list hits memory). This is the scalable
composition: tag both sides, UNION, and run ONE partitioned window with
``last(_, ignorenulls=True)`` ordered by (ts, side) so each probe row picks up
the latest preceding build payload. Cost: a single shuffle on the key, window
state is O(1) per row (running last, not a buffer). Skewed keys behave like any
window: AQE handles moderate skew; pathological keys can be salted upstream.

Inclusive semantics: a build row at exactly the probe timestamp matches
(side-order build < probe at equal ts) — the same rule as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which the registry oracle uses verbatim.

Reference parity: no counterpart (the reference is pure batch-key ETL,
SURVEY.md §2.3 lists only equi/semi/anti joins); engine extension for
event-state lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_cols: list[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every probe row, plus ``<col><suffix>`` columns holding
    the build side's values as of the probe's ``on`` timestamp (NULL when no
    build row precedes it, or the match is older than ``tolerance``).

    ``tolerance`` is an interval Column (e.g. ``F.expr("INTERVAL 1 DAY")``).
    """
    keys = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in build.columns if c not in {*keys, on}]

    matched = [f"{c}{suffix}" for c in value_cols]
    ts_m = f"{on}{suffix}"

    p = probe.select(
        *probe.columns,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(m)
          for c, m in zip(value_cols, matched)],
        F.lit(None).cast(build.schema[on].dataType).alias(ts_m),
    )
    b = build.select(
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in {*keys, on}],
        *keys,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(m) for c, m in zip(value_cols, matched)],
        F.col(on).alias(ts_m),
    ).select(p.columns)  # align column order for the union

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = b.unionByName(p).select(
        *[c for c in probe.columns],
        F.col("_side"),
        *[F.last(m, ignorenulls=True).over(w).alias(m) for m in matched],
        F.last(ts_m, ignorenulls=True).over(w).alias(ts_m),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        in_tol = F.col(ts_m) >= (F.col(on) - tolerance)
        out = out.select(
            *probe.columns,
            *[F.when(in_tol, F.col(m)).alias(m) for m in matched],
            F.when(in_tol, F.col(ts_m)).alias(ts_m),
        )
    return out
