"""Incremental aggregate maintenance — materialized-view refresh without
re-reading history.

The classic algebraic-aggregate decomposition: COUNT/SUM (and anything
derivable from them — AVG, rates, ratios) split into per-partition PARTIALS
that merge by addition, so a day's aggregate state is a tiny keyed frame and
each new batch costs O(batch), not O(history). This is the same property
Spark's own partial aggregation exploits inside one job, lifted to the
BETWEEN-jobs level: persist the partial frame in the StateStore, merge each
delta, derive final metrics at read time.

Holistic aggregates (exact median, exact distinct) do NOT decompose this way —
use the mergeable sketches (operators/sketches.py: HLL registers, CM counters,
KMV rows) as their incremental stand-ins; their state frames merge through
this same union-and-reaggregate shape (max/sum/re-rank respectively).

Reference contrast: the pipeline's run-metric counter pools
(PipelineLogger-style A4/A6 counters) recompute per run; this operator is the
engine-native accumulate-across-runs form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_partials(df: DataFrame, keys: list[str], measures: dict[str, F.Column]) -> DataFrame:
    """One batch's partial-aggregate frame: ``keys`` + a summed column per
    measure + ``n_rows``. Every output column merges by addition."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(expr).alias(name) for name, expr in measures.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """next_state = state ⊕ delta: union + re-sum per key. Commutative and
    associative — deltas may arrive in any order, merge trees of any shape
    produce the identical frame (exact-integer measures recommended: cents,
    micro-units — then equality is bit-for-bit in any engine)."""
    merged = state.unionByName(delta)
    sums = [
        F.sum(c).alias(c) for c in merged.columns if c not in keys
    ]
    return merged.groupBy(*keys).agg(*sums)
