"""Connected components over a pair list — the step that turns near-duplicate
PAIRS into duplicate CLUSTERS (one keeper per cluster), completing the dedup
pipeline: minhash/LSH emits edges, this collapses them into groups.

Algorithm: alternating Large-Star / Small-Star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014). Both steps are a groupBy-min
plus a join — NO collect_list, so a high-degree node (a viral near-dup cluster)
never materializes its whole neighborhood in one task; skew lands in the
aggregate's map-side partial min. Converges in O(log n) rounds; each round is
two shuffles on the node id. Round-to-round lineage is truncated with
localCheckpoint so the plan stays O(1) deep regardless of iteration count.

At 100 TB: the edge list from LSH is far smaller than the corpus (only
colliding pairs), rounds shrink it monotonically toward one edge per non-root
node, and the driver sees only a 2-long aggregate row per round (count +
checksum) for the convergence test — nothing proportional to data size ever
reaches the driver.

Reference parity note: the reference has no graph operator (its grouping is
single-key groupBy, OrthologRelationLoader.java:380-394); this extends the
engine for training-data dedup where transitive closure is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ortholog_pipeline_spark.operators import iterate as IT


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical distinct pair list: (a, b) with a > b, self-loops dropped.

    Every step below preserves this orientation invariant, which is what lets
    the per-round star steps skip re-deduplicating: a strictly-oriented
    distinct pair list stays distinct under the union of its two directions
    ((a,b) and (b,a) can never both be present), so only the step OUTPUTS need
    a dedup — two shuffles per round instead of four."""
    return (
        edges.select(
            F.greatest("id_1", "id_2").alias("a"),
            F.least("id_1", "id_2").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _large_star(pairs: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u) = min(Γ(u) ∪ {u}).

    Input: canonical distinct pairs (a > b). The symmetric view is then
    distinct BY CONSTRUCTION (strict orientation ⇒ no pair appears in both
    directions), so no dedup shuffle is paid before the min-aggregate.
    Output: distinct pairs with a > b (b = m ≤ u < v = a)."""
    sym = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    # sort-merge, deliberately: a SHUFFLE_HASH hint here was measured at NO
    # win on the 60M-edge 100x probe (79.4 s vs 75.0 s) — these frames are
    # narrow (long, long) rows whose sort is cheap, unlike the wide
    # string-carrying FastSS variant frame where the same hint was 4x
    # (operators/dedup.py editdist1_join) — and SMJ keeps spill robustness
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """Connect each smaller neighbor (and the center) of a star to its minimum.

    Input: canonical distinct pairs (a > b) — already oriented toward the
    larger endpoint, so the orient-and-dedup pass of the textbook formulation
    is a no-op here and is skipped. Output: distinct pairs with a > b
    (b = m = min of the star ≤ every lo = a, equality filtered)."""
    mins = pairs.groupBy("a").agg(F.min("b").alias("m"))
    nbrs = pairs.join(mins, "a").select(F.col("b").alias("a"), F.col("m").alias("b"))
    centers = mins.select("a", F.col("m").alias("b"))
    return (
        nbrs.unionByName(centers)
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Cheap change detector: row count + order-independent checksum."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("chk"),
    ).collect()[0]
    return row.n, row.chk


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Resolve an undirected edge list (id_1, id_2) into (node, component) where
    component is the minimum node id reachable from the node. Nodes that appear
    only as isolated vertices must be unioned in by the caller (an edge list
    cannot see them)."""
    # LAZY checkpoints: the per-round signature aggregate is the action that
    # materializes the round's checkpoint, so each round schedules ONE job
    # (agg over the star output) instead of two (checkpoint job + agg job) —
    # on shallow near-dup graphs the loop is scheduler-bound, not data-bound,
    # and halving the actions halves the floor
    cur = IT.round_checkpoint(_canon(edges))
    prev_sig = None
    for _ in range(max_iter):
        cur = IT.round_checkpoint(_small_star(_large_star(cur)))
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: stars only — every edge points (member → root)
    members = cur.select(
        F.greatest("a", "b").alias("node"), F.least("a", "b").alias("component")
    )
    roots = members.select(
        F.col("component").alias("node"), F.col("component")
    ).dropDuplicates()
    return members.unionByName(roots).dropDuplicates()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster summary for a near-dup pair list: every document (singletons
    included) labeled with its cluster id (min doc id in the cluster), plus the
    cluster size — the frame a corpus-prep job joins on to keep one doc per
    cluster."""
    comp = connected_components(pairs)
    all_docs = docs.select(F.col(id_col).alias("node"))
    labeled = all_docs.join(comp, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("component", F.col("node")).alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )
