"""Iterative graph algorithms in exact integer arithmetic.

PageRank's float formulation is a portability trap: each node's new rank is a
SUM of per-edge float contributions, and float addition is order-dependent —
two runs with different partitioning (or two engines) legitimately disagree in
the last ulps, which poisons both rerun determinism and any exact oracle. This
module runs the iteration in scaled fixed-point BIGINT instead: rank values
are integers (scale 1e6 = "micro-rank"), per-edge contributions are integer
divisions, and integer sums are order-independent — every engine that can sum
bigints reproduces the trajectory bit-for-bit. The cost is a deterministic
floor at each division, bounded by outdeg ulps per node per iteration — noise
far below the damping factor's own modeling slack.

Companion to `operators/components.connected_components` (the other iterative
graph op, same alternating-join shape). Cites the reference's lack of any graph
surface: this is an engine extension for the LLM-data tier (domain graphs,
link-based quality signals).

Scale shape per iteration: edges ⋈ ranks (shuffle on src — ranks is
node-sized, NOT broadcastable at scale) → groupBy(dst) partial-agg sum →
left join back to the node list. Three shuffles per iteration, all on graph
keys; skewed hub nodes behave like any skewed agg (salt or AQE). Iterations
are a fixed small count — each materializes one node-sized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale: 1 rank unit = 1e-6.
SCALE = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PageRank over a distinct (src, dst) edge frame, exact-integer variant.

    r_0(v) = SCALE;  r_{k+1}(v) = base + (damping_num * SUM over in-edges of
    (r_k(u) div outdeg(u))) div damping_den,  base = SCALE*(den-num) div den.

    Dangling nodes (no out-edges) simply leak their mass — the standard
    simplification; the trajectory is still a well-defined exact sequence.
    Returns (node, rank_scaled) for every node of the graph.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = SCALE * (damping_den - damping_num) // damping_den
    ranks = nodes.withColumn("rank_scaled", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        incoming = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(inc, CAST(0 AS BIGINT))) div {damping_den}")
            )
            .cast("long")
            .alias("rank_scaled"),
        )
    return ranks
