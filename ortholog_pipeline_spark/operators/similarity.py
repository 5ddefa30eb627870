"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB engine needs:
  * brute_force_topk — exact cosine top-k. The query side is broadcast, the corpus
    side streams; cost is |corpus| × |queries| dot products in codegen. Correct
    baseline and fine whenever |queries| is small.
  * lsh_topk — random-hyperplane LSH bucketing as the scale path: corpus rows hash to
    sign-pattern buckets map-side, queries probe only their own bucket, so the join
    is bucket-equi instead of a cross product. Hyperplanes are derived from md5 bits,
    not RNG state, so the plan is deterministic and resumable.

All dot products run in double after an explicit cast (summing float32 in different
orders is how cross-engine mismatches happen), summed in element order via
F.aggregate so Spark and the DuckDB oracle produce bit-identical values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query by cosine (query side broadcast).

    Output: (query_id, vec_id, sim, rank). `sim` is rounded BEFORE ranking, with the
    corpus id as tiebreak, so ranking is stable across engines.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("_qv"),
        )
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
            # two-stage top-k: local rank within (query, input partition) first —
            # a single-stage window on query_id alone would funnel the ENTIRE
            # scored corpus for each query through one partition
            F.spark_partition_id().alias("_part"),
        )
    )
    w_local = Window.partitionBy("query_id", "_part").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    survivors = (
        scored.withColumn("_lrank", F.row_number().over(w_local))
        .filter(F.col("_lrank") <= k)  # ≤ k × n_partitions rows reach the merge
        .drop("_lrank", "_part")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_signs(num_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components from md5 bit-parity of "j:i" — computed ONCE on the
    driver (they are row-constants; an expression form would re-hash planes×dim md5s
    per row) and embedded as literals."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(num_planes)
    ]


def hyperplane_bucket(
    vec: Column, num_planes: int = 8, dim: int = 64, first_plane: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id: bucket bit j = sign of <plane_{first+j}, v>.
    Deterministic (md5-derived planes, no RNG state) and pure multiply-add at run
    time — the sign matrix is a literal. ``first_plane`` selects a disjoint slice of
    the global plane sequence, giving independent hash tables."""
    signs = plane_signs(first_plane + num_planes, dim)[first_plane:]
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        plane = F.array(*[F.lit(s) for s in signs[j]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return bucket


def table_buckets_udf(num_planes: int, num_tables: int, dim: int):
    """Arrow-batched bucket computation for ALL tables in one pass: V @ Sᵀ (BLAS)
    then sign-bit packing — one matmul per batch instead of planes×tables
    interpreted 64-element folds per row, and a tiny expression tree (the literal
    Catalyst encoding at T=4, r=6 is ~1.5k flops/row of nested HOF aggregates,
    whose generated code alone takes seconds to compile). Same md5-derived planes,
    same bucket ids; only the float summation ORDER differs (pairwise vs left
    fold), which can flip a sign only when |dot| ≲ 1e-13 — oracle parity is
    asserted empirically in tests."""
    signs = np.array(plane_signs(num_planes * num_tables, dim))  # (P, dim)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ signs.T > 0).astype(np.int64)  # (n, P)
        per_table = [
            bits[:, t * num_planes : (t + 1) * num_planes] @ weights
            for t in range(num_tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 4,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table, multiprobe hyperplane LSH.

    A single r-plane table recalls a cos-θ neighbour with probability
    (1−θ/π)^r — ~5% at r=6 for θ≈70°, useless alone. Two standard amplifiers,
    both implemented here:
      * ``num_tables`` independent tables (disjoint slices of the md5 plane
        sequence) OR their candidate sets: p → 1−(1−p)^T;
      * multiprobe (``multiprobe_bits``∈{0,1,2}): each query also probes the
        buckets at Hamming distance ≤ bits — r flips at distance 1 (adding the
        r·p^(r−1)(1−p) near-miss mass per table), plus C(r,2) at distance 2.
    At r=6, T=4, 1-bit probing and θ≈70° that compounds to ~0.7 recall; 2-bit
    probing (22 probes/table instead of 7) lifts it to 0.97 (both measured at
    sf0.01 on the synthetic embeddings — pinned by the recall tests at
    floors 0.6 / 0.8).

    Multiprobe is the RIGHT recall knob at 100 TB: extra probes multiply only
    the tiny broadcast query side (bit flips on an already-computed bucket id),
    while the corpus side — the expensive part: T rows/vector of storage and
    equi-join input — is unchanged. Raising num_tables instead would grow the
    corpus-side index linearly for the same recall gain.

    Scale shape: corpus buckets are map-side literals exploded to T rows/vector;
    queries (small side) are broadcast, so candidate generation is an equi-join on
    (table, bucket) with NO shuffle of the corpus; candidates dedup on (query,
    vec) before scoring, then two-stage top-k. Cost scales with bucket collision
    counts, not |corpus|×|queries|."""
    assert multiprobe_bits in (0, 1, 2), "only 0/1/2-bit multiprobe implemented"
    bucket_fn = table_buckets_udf(num_planes, num_tables, dim)

    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv"))
    c_tab = c.withColumn("_tbl", bucket_fn(F.col("_cv"))).select(
        id_col, "_cv", F.posexplode("_tbl").alias("t", "bucket")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    q_tab = q.withColumn("_tbl", bucket_fn(F.col("_qv"))).select(
        "query_id", "_qv", F.posexplode("_tbl").alias("t", "bucket")
    )
    if multiprobe_bits:
        # the exact bucket plus its Hamming-≤bits neighbours — bit flips on
        # the already-computed id, not recomputed hashes
        masks = [1 << j for j in range(num_planes)]
        if multiprobe_bits == 2:
            masks += [
                (1 << i) | (1 << j)
                for i in range(num_planes)
                for j in range(i + 1, num_planes)
            ]
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks],
        )
        q_probes = q_tab.select(
            "query_id", "_qv", "t", F.explode(probes).alias("bucket")
        )
    else:
        q_probes = q_tab

    cands = (
        c_tab.join(F.broadcast(q_probes), ["t", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        # a pair can collide in several tables/probes — score it once
        .dropDuplicates(["query_id", id_col])
    )
    scored = cands.select(
        "query_id",
        id_col,
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign_udf(seed_mat: np.ndarray, n_probe: int):
    """Arrow-batched IVF cell assignment: cosine of every vector against the K
    coarse centroids in one matmul, cell scores ROUNDED to 6dp before ranking
    (ties then break on ascending cell id), so an external SQL oracle computing
    the same rounded cosines picks identical cells regardless of float summation
    order. Returns the ``n_probe`` nearest cell ids, nearest first."""
    seeds = seed_mat / np.linalg.norm(seed_mat, axis=1, keepdims=True)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        scores = np.round(mat @ seeds.T, 6)  # (n, K)
        # stable argsort of -scores = desc score, asc cell id on ties
        order = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 32,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index — the second ANN scale
    path next to ``lsh_topk``, trading a small driver-side "fit" for better
    recall/scan: measured recall@10 = 0.80 probing 4 of 32 cells (12% of the
    corpus) on the synthetic embeddings, vs 0.705 for multiprobe LSH.

    Coarse quantizer: the ``n_cells`` lowest-id corpus vectors serve as
    deterministic centroids (a production system would Lloyd-refine them; seeds
    keep the plan reproducible and oracle-checkable — the centroid LIST, not the
    assignment math, is the swappable part). The seed fetch is a driver collect
    of ``n_cells`` rows — the same bounded-collect pattern as the surrogate-key
    bucket counts. Everything per-row is one Arrow-batched matmul; the candidate
    join is cell-equi (corpus shuffles at most once on cell id; queries
    broadcast), cost ∝ scanned fraction, not |corpus|×|queries|."""
    seed_rows = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
        .orderBy(F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    seed_mat = np.array([r._v for r in seed_rows], dtype=np.float64)

    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv"))
    c_cell = c.withColumn(
        "cell", ivf_assign_udf(seed_mat, 1)(F.col("_cv"))[0]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    q_cells = q.withColumn(
        "cell", F.explode(ivf_assign_udf(seed_mat, n_probe)(F.col("_qv")))
    )
    scored = (
        c_cell.join(F.broadcast(q_cells), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bands: int = 4,
    planes_per_band: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED hyperplane LSH + exact
    verify — the embedding analogue of minhash_lsh_dedup.

    A single bucket of r planes has collision probability (1−θ/π)^r, which decays
    too fast for moderate thresholds; banding ORs over ``bands`` independent
    buckets: p = 1−(1−(1−θ/π)^r)^B (e.g. cos≈0.45, r=3, B=4 → ~0.7 recall vs
    ~0.27 single-band). Candidates are deduped across bands before the exact
    cosine verify, so verification cost is bounded by distinct colliding pairs."""
    total_planes = bands * planes_per_band
    c = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v")).withColumn(
        "_sig", hyperplane_bucket(F.col("_v"), total_planes, dim)
    )
    # band key b = bits [b*r, (b+1)*r) of the sign pattern
    mask = (1 << planes_per_band) - 1
    banded = c.select(
        id_col,
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("_sig"), b * planes_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select(id_col, "_v", F.col("_bk.band").alias("band"), F.col("_bk.band_key").alias("band_key"))

    a = banded.select(
        F.col(id_col).alias("id_1"), F.col("_v").alias("_v1"), "band", "band_key"
    )
    b = banded.select(F.col(id_col).alias("id_2"), "band", "band_key")
    cands = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates()
    )
    v1 = df.select(
        F.col(id_col).alias("id_1"), as_double(F.col(vec_col)).alias("_v1")
    )
    v2 = df.select(
        F.col(id_col).alias("id_2"), as_double(F.col(vec_col)).alias("_v2")
    )
    return (
        cands.join(v1, "id_1")
        .join(v2, "id_2")
        .select(
            "id_1",
            "id_2",
            F.round(cosine(F.col("_v1"), F.col("_v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/bandwidth stage of a
    large-scale embedding pipeline (4x smaller than float32; at 100 TB the
    embedding column dominates scan cost, and int8 + a per-row scale is the
    standard compression before ANN indexing).

    scale = max|x| / 127 (1.0 for the all-zero vector), q_i = round(x_i/scale)
    half-away-from-zero — pure codegen array expressions, map-side only, no
    shuffle, and bit-reproducible in DuckDB (list_transform + round): the oracle
    checks the full quantized array, not a summary.
    """
    v = as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    # zip_with against array_repeat(scale, n), NOT `x / scale` inside a transform
    # lambda: a non-trivial expression referenced in a per-element lambda is
    # re-inlined by CollapseProject and re-evaluated per ELEMENT (the measured
    # O(n^2) pitfall in dedup.hashed_shingles31); zip_with operands evaluate
    # once per row.
    q = F.zip_with(
        v,
        F.array_repeat(scale, F.size(v)),
        lambda x, s: F.round(x / s, 0).cast("int"),
    )
    # scale is NOT rounded: amax is bit-identical cross-engine (a max, no
    # summation) and the /127 division is correctly-rounded IEEE — rounding
    # would instead destroy tiny scales (subnormal-magnitude vectors -> 0.0)
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("q"),
    )
