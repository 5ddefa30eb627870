"""Mergeable cardinality sketches with engine-portable determinism.

``approx_count_distinct`` is the right call inside one engine, but its HLL++
register layout is implementation-private: no other system can reproduce the
estimate, so a migration (or this repo's DuckDB oracle gate) can only check
"roughly equal". This module implements classic HyperLogLog (Flajolet et al.
2007) from first principles on top of the same md5-derived 60-bit hash the
dedup family uses, with two deliberate twists that make every bit reproducible
anywhere:

* rho (leading-zero rank) comes from integer bit-length — ``55 - length(bin(w))``
  for the m=64 layout — never from ``log2`` floats;
* the harmonic sum is accumulated as a BIGINT (``sum of 2^(width - M_j)``),
  which is order-independent, instead of the order-dependent float sum
  ``sum of 2^-M_j``; the single float division happens once at the end on
  identical inputs, so Spark and DuckDB produce the identical double.

Scale shape: per-row map-side hash → groupBy(keys, bucket) max (partial agg
combines before the shuffle) → groupBy(keys) integer sum over ≤m rows. The
(keys, bucket) intermediate IS the sketch: store it, union it across days, and
re-max to merge — the classic mergeability property, here with a portable
layout. Registers per key: m (default 256 → stderr 1.04/sqrt(256) ≈ 6.5%).

Small-range note: the standard linear-counting correction (E ≤ 2.5m) needs
ln(), whose last-ulp behavior differs across libm builds; it is intentionally
omitted and documented — use exact countDistinct when you expect < ~3m
distincts, which is never the regime a sketch is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ortholog_pipeline_spark.operators.dedup import hex_hash64

#: Hash width in bits (15 hex chars of md5 → 60-bit non-negative bigint).
HASH_BITS = 60


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], m: int = 256
) -> DataFrame:
    """The sketch itself: per (group, bucket) max leading-zero rank.

    Mergeable: union register frames from different partitions/days and
    re-aggregate with max to sketch the union of the key sets.
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    b = m.bit_length() - 1  # bucket bits
    width = HASH_BITS - b  # bits left for the rho window
    df = df.withColumn("_h", hex_hash64(F.col(key_col).cast("string")))
    w_expr = F.expr(f"_h div {m}")
    rho = F.when(w_expr == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w_expr))
    )
    return (
        df.withColumn("bucket", F.pmod(F.col("_h"), F.lit(m)))
        .withColumn("rho", rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], m: int = 256) -> DataFrame:
    """Collapse registers to one estimate row per group.

    Empty buckets contribute 2^width each (rho-weight of M_j = 0), added
    arithmetically from the observed bucket count so the register frame never
    needs dense padding."""
    b = m.bit_length() - 1
    width = HASH_BITS - b
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    scale = float(1 << width)
    est = (
        alpha
        * F.lit(float(m * m))
        * F.lit(scale)
        / F.col("sum_int").cast("double")
    )
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {width} - mj)")).alias(
                "sum_present"
            ),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .withColumn(
            "sum_int",
            F.col("sum_present")
            + (F.lit(m) - F.col("n_buckets")).cast("long")
            * F.lit(1 << width).cast("long"),
        )
        .select(*group_cols, F.round(est, 4).alias("hll_estimate"))
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], m: int = 256
) -> DataFrame:
    """Approximate distinct ``key_col`` per group: registers → estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols, m), group_cols, m)
