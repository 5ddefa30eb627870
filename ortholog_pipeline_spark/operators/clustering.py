"""Distributed Lloyd's k-means over an embedding column — the clustering stage of
semantic dedup / corpus curation (cluster-then-sample, SemDeDup-style).

Scale design: each iteration is ONE map-side assignment pass (centroids are a
k x dim literal array baked into a codegen expression — no join, no UDF) plus ONE
aggregation shuffle keyed by (cluster, position) to recompute means. Centroid
state (k x dim doubles) legitimately lives on the driver between iterations — it
is the model, not the data. At 100 TB the per-iteration cost is a full scan +
a k*dim-cell aggregate, which is the textbook distributed k-means shape.

Determinism: init picks the vectors of the k smallest ids (no RNG); ties in the
assignment argmin break toward the lower cluster id via struct ordering; recomputed
centroid means are rounded to 6 decimals so results do not depend on float
summation order (partial-aggregation order varies with partitioning — rounding
pins run-to-run AND cross-engine equality; drift ~1e-15 vs grid 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec: F.Column, centroid: list[float]) -> F.Column:
    """Squared L2 distance to a literal centroid as a sequential fold (aggregate
    folds left-to-right in both Spark and DuckDB — bit-identical summation)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "_vd"
) -> DataFrame:
    """Map-side nearest-centroid assignment: argmin over k literal distances via
    array_min of (dist2, cluster) structs — struct ordering compares dist2 first,
    then cluster id, so ties are deterministic."""
    pairs = F.array(
        *[
            F.struct(
                _dist2(F.col(vec_col), c).alias("d2"), F.lit(j).alias("cluster")
            )
            for j, c in enumerate(centroids)
        ]
    )
    best = F.array_min(pairs)
    return df.withColumn("cluster", best["cluster"]).withColumn("dist2", best["d2"])


def recompute_centroids(
    assigned: DataFrame, k: int, vec_col: str = "_vd"
) -> list[list[float]]:
    """Element-wise mean per cluster: posexplode -> (cluster, pos) avg -> k x dim
    rows to the driver. Means rounded to 6 decimals (see module docstring).
    Empty clusters keep no row and are dropped from the returned list position by
    re-reading the previous value — callers pass the prior centroids to fill."""
    rows = (
        assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
    out: list[list[float]] = []
    for j in range(k):
        if j in by_cluster:
            d = by_cluster[j]
            out.append([d[i] for i in range(len(d))])
        else:
            out.append([])  # caller substitutes the previous centroid
    return out


def kmeans_fit_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` Lloyd iterations from the deterministic first-k-ids init and
    return (id, cluster, dist2) of the FINAL assignment."""
    vd = df.withColumn("_vd", F.col(vec_col).cast("array<double>"))
    init_rows = (
        vd.select(id_col, "_vd").orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    centroids = [list(r["_vd"]) for r in init_rows]
    assigned = assign_clusters(vd, centroids)
    for _ in range(iters - 1):
        new_c = recompute_centroids(assigned, k)
        centroids = [
            nc if nc else old for nc, old in zip(new_c, centroids, strict=True)
        ]
        assigned = assign_clusters(vd, centroids)
    return assigned.select(
        id_col, "cluster", F.round("dist2", 4).alias("dist2")
    )
