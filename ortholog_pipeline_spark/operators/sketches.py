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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation (Cormode & Muthukrishnan
# 2005). Like the HLL above, built on the md5 hash so every counter is
# bit-reproducible in any engine: the DuckDB oracle checks estimates EXACTLY.
# ---------------------------------------------------------------------------


def _cm_bits(width: int, depth: int) -> int:
    """Bits per slot chunk; validates that ``depth`` disjoint chunks fit in the
    60-bit md5-derived hash."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    bits = width.bit_length() - 1
    if depth * bits > HASH_BITS:
        raise ValueError(
            f"depth {depth} x log2(width) {bits} exceeds the {HASH_BITS}-bit hash"
        )
    return bits


def _cm_hash(key: Column) -> Column:
    """The ONE hash per key all depth rows chunk from."""
    return hex_hash64(F.concat(F.lit("cm|"), key.cast("string")))


def _cm_slots(key: Column, width: int, depth: int) -> Column:
    """All ``depth`` slots for a key from ONE md5: disjoint log2(width)-bit
    chunks of the 60-bit hash (each chunk of a uniform hash is uniform). Used
    for probe frames; the sketch builder inlines the same chunking above an
    explode barrier so the md5 evaluates once per row, not once per chunk."""
    bits = _cm_bits(width, depth)
    h = _cm_hash(key)
    return F.array(
        *[F.pmod(F.shiftright(h, bits * i), F.lit(width)) for i in range(depth)]
    )


def cm_sketch(
    df: DataFrame, key_col: str, width: int = 8192, depth: int = 4
) -> DataFrame:
    """Build the sketch: one (depth, slot, cnt) row per touched counter.

    Scale shape: each input row fans out ``depth`` times, but partial
    aggregation collapses each map partition to ≤ depth·width counter rows
    before the shuffle — the shuffle payload is the SKETCH SIZE, not the data
    size. Mergeable: union sketch frames (across days / partitions) and
    re-aggregate with sum to sketch the combined stream.

    Physical care: the md5 is computed in a projection BELOW the explode (the
    generator fans out a literal depth array, and the per-depth slot is a
    cheap shift/mask ABOVE it). Referencing the hash inside the exploded
    array's elements instead would let CollapseProject re-inline the md5 once
    per element — the same measured O(depth×) blowup dedup.py documents for
    per-element lambdas. The single-column key projection also repartitions a
    too-few-splits input (one local parquet file = one effective row-group
    split) so the hash map stage parallelizes; at real scale file splits
    already provide this and the branch never fires."""
    bits = _cm_bits(width, depth)
    keyed = df.select(F.col(key_col).alias("_k"))
    target = df.sparkSession.sparkContext.defaultParallelism
    if keyed.rdd.getNumPartitions() < target:
        keyed = keyed.repartition(target)
    return (
        keyed.select(_cm_hash(F.col("_k")).alias("_h"))
        .select(
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth"),
            "_h",
        )
        .select(
            "depth",
            F.expr(f"pmod(shiftright(_h, depth * {bits}), {width})").alias("slot"),
        )
        .groupBy("depth", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 8192, depth: int = 4
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: estimate = min over the
    depth counters the key hashes to (each is count + nonnegative collision
    noise, so min is the tightest upper bound; CM never underestimates).

    The probe frame (|keys| · depth rows) is broadcast into the ≤ depth·width
    sketch — no shuffle of the sketch."""
    probes = keys.select(
        key_col,
        F.posexplode(_cm_slots(F.col(key_col), width, depth)).alias(
            "depth", "slot"
        ),
    )
    return (
        sketch.join(F.broadcast(probes), ["depth", "slot"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) sketch — distinct counting that ALSO
# supports set intersection (Beyer et al. 2007), which HLL alone cannot.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 128
) -> DataFrame:
    """Per group, the k smallest distinct md5 hashes of ``key_col`` with their
    rank — the sketch rows. ``rn = k``'s hash value h_k yields the distinct
    estimate (k-1)·2^60/h_k; keeping all k rows (not just h_k) is what makes
    the sketch mergeable and intersectable.

    Scale shape: distinct() is one shuffle with map-side combine; the rank
    filter compiles to WindowGroupLimit in Spark 3.5+, so each group keeps only
    its k smallest rows through the sort — no full per-group materialization.
    """
    keyed = (
        df.select(
            *group_cols, hex_hash64(F.col(key_col).cast("string")).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return keyed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def kmv_distinct_estimate(sketch: DataFrame, group_cols: list[str], k: int = 128) -> DataFrame:
    """(k-1)·2^60 / h_k per group (groups with < k distinct keys report their
    exact distinct count — all hashes observed)."""
    return sketch.groupBy(*group_cols).agg(
        F.max("h").alias("h_max"), F.count(F.lit(1)).alias("n_sk")
    ).select(
        *group_cols,
        F.when(
            F.col("n_sk") < k, F.col("n_sk").cast("double")
        )
        .otherwise(
            F.lit(float((k - 1) * (1 << HASH_BITS))) / F.col("h_max").cast("double")
        )
        .alias("kmv_estimate"),
    )
