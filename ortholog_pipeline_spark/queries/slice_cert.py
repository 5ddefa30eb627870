"""Deterministic-subsample (slice) certification for the five registry entries
whose DuckDB oracles are declared-quadratic (VERDICT r4 item 2).

The five entries (`dedup_embedding_cosine`, `dedup_ngram_jaccard`,
`er_blocking_quality`, `er_entity_clusters`, `g_kcore_peel`) certify at sf0.1
but their oracles cannot run at ~sf1 — the ORACLE is the all-pairs spec, and
pair count grows 100x for 10x rows. These slice twins let the full registry
certify AT the scaled dir: each pins an exactly-verifiable deterministic slice
of the result while the engine side still reads/processes the full scaled
input wherever its own path is scale-safe.

Slice designs (each exact, not sampled-approximate — both engines compute the
identical restricted result):

- ``dedup_embedding_cosine`` / ``dedup_ngram_jaccard``: restrict the LEFT
  (smaller-id) side of the pair space to the seeded key slice ``id % 97 = 0``
  while the right side stays the FULL table — pair count shrinks ~100x, so a
  ~sf1 slice costs what the sf0.1 full oracle costs, and the slice still
  exercises left-slice-vs-everything (cross-replica pairs included).
- ``er_entity_clusters``: the engine runs the FULL scaled input end-to-end
  (FastSS + connected components — its scale-safe path) and the comparison
  restricts to clusters whose representative lies in replica 0
  (``cluster_rep < 10_000_000``); the oracle replays its quadratic ground
  truth over replica-0 customers only. Exact because the scaled dir's
  per-replica name tags make cross-replica edit-distance-1 pairs impossible
  (tools/make_scaled_dir.py) — and a spurious engine-side cross-replica merge
  would change a replica-0 cluster's member count and FAIL the compare.
- ``er_blocking_quality``: the audit-on-a-sample metric deepens its own
  deterministic sample from 1/10 to 1/100 of keys — the exhaustive-truth
  cross join stays at the sf0.1 cost while reading the full scaled table.
- ``g_kcore_peel``: the scaled dir's ``key % 2000`` node space ALIASES
  replicas together (10M % 2000 == 0 — the regime-change trap NOTES.md
  records), so the slice twin composes the replica block into the node id
  (``key % 2000 + (key // 10M) * 2000``): 10 vertex-disjoint copies of the
  replica-0 graph. The engine peels ALL strips (true 10x volume) and reports
  per-replica cores; the compare pins replica 0, which the oracle computes
  over ``l_orderkey < 10M`` at sf0.1 cost.

At an UNSCALED dir (all keys < 10M, one replica) every slice twin degrades to
an exact full-result compare, which is how tests validate them at sf0.01.

Used by ``tools/driver_sim.py --slice`` / ``tools/sweep.py --slice-heavy``;
deliberately NOT in the main registry — these are certification harness twins
of existing entries, not new operators (COVERAGE.md stays 1:1 with
operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ortholog_pipeline_spark.operators import components as CCop
from ortholog_pipeline_spark.operators import dedup as DD
from ortholog_pipeline_spark.operators import similarity as SIM
from ortholog_pipeline_spark.queries._shared import (
    _DOT_SQL,
    _JACCARD_VERIFY_SQL,
    _SHINGLES_SQL,
    _t,
    materialize_multi_ref_ctes,
    oracle_sql,
    queries,
)

#: seeded left-slice: ~1% of ids; prime so it cannot correlate with any
#: replica offset or fixture modulus
SLICE_MOD = 97
#: replica block width in scaled dirs (tools/make_scaled_dir.OFF)
REPLICA_OFF = 10_000_000


def _slice_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-sliced exact cosine pairs: id_1 in the slice, id_2 anywhere above
    it. The cross join is (n/97) x n — the declared brute verify at 1% cost,
    so no brute-force guard is needed (the slice IS the bound)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", SIM.as_double(F.col("embedding")).alias("v"))
    a = (
        e.filter(F.col("vec_id") % SLICE_MOD == 0)
        .select(F.col("vec_id").alias("id_1"), F.col("v").alias("_v1"))
    )
    b = e.select(F.col("vec_id").alias("id_2"), F.col("v").alias("_v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(SIM.cosine(F.col("_v1"), F.col("_v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.45)
    )


_SLICE_EMB_COSINE_SQL = f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS id_1, b.vec_id AS id_2,
             ROUND(
               {_DOT_SQL.format(a='a.v', b='b.v')} /
               (SQRT({_DOT_SQL.format(a='a.v', b='a.v')}) *
                SQRT({_DOT_SQL.format(a='b.v', b='b.v')})), 6) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE a.vec_id % {SLICE_MOD} = 0
    )
    SELECT id_1, id_2, sim FROM scored WHERE sim >= 0.45
    """


def _slice_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-sliced shingle-join Jaccard: the posting-list join's a-side is
    restricted to slice docs BEFORE the join, so the candidate fan-out (the
    quadratic-ish cost) shrinks by the slice, while the b-side posting list
    covers the full corpus."""
    docs = _t(spark, sf_dir, "documents")
    with_sh = docs.select(
        "doc_id", DD.word_shingles("text", 3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    posting = with_sh.select("doc_id", F.explode("shingles").alias("shingle"))
    posting_a = posting.filter(F.col("doc_id") % SLICE_MOD == 0)
    pairs = (
        posting_a.alias("a")
        .join(posting.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_1"), F.col("b.doc_id").alias("id_2")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sizes = with_sh.select("doc_id", F.size("shingles").alias("sz"))
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "id_1", "sz": "sz_1"}), "id_1")
        .join(sizes.withColumnsRenamed({"doc_id": "id_2", "sz": "sz_2"}), "id_2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_1") + F.col("sz_2") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_1", "id_2", "jaccard")
    )


def _sliced_jaccard_verify() -> str:
    marker = "WHERE a.doc_id < b.doc_id"
    if marker not in _JACCARD_VERIFY_SQL:
        raise ValueError("_JACCARD_VERIFY_SQL drifted; slice rewrite missed")
    return _JACCARD_VERIFY_SQL.replace(
        marker, f"{marker} AND a.doc_id % {SLICE_MOD} = 0"
    )


_SLICE_NGRAM_SQL = f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
    ),
    {_sliced_jaccard_verify()}
    SELECT id_1, id_2,
           ROUND(n_common * 1.0 / (s1.sz + s2.sz - n_common), 6) AS jaccard
    FROM common JOIN sz s1 ON s1.doc_id = id_1 JOIN sz s2 ON s2.doc_id = id_2
    WHERE n_common * 1.0 / (s1.sz + s2.sz - n_common) >= 0.5
    """


def _slice_er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL engine run (FastSS + CC over every replica), compared on the
    replica-0 cluster slice."""
    full = queries()["er_entity_clusters"](spark, sf_dir)
    return full.filter(F.col("cluster_rep") < REPLICA_OFF)


_SLICE_ER_CLUSTERS_SQL = f"""
    WITH RECURSIVE c0 AS (
      SELECT c_custkey, c_name, c_nationkey FROM customer
      WHERE c_custkey < {REPLICA_OFF}
    ),
    pairs AS (
      SELECT LEAST(a.c_custkey, b.c_custkey) AS u, GREATEST(a.c_custkey, b.c_custkey) AS v
      FROM c0 a JOIN c0 b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) = 1
    ),
    sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach(a, b) AS (
      SELECT u, u FROM sym
      UNION
      SELECT r.a, s.v FROM reach r JOIN sym s ON s.u = r.b
    ),
    comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
    SELECT component AS cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component
    """


def _slice_er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ortholog_pipeline_spark.queries.graph import _blocking_quality_report

    return _blocking_quality_report(spark, sf_dir, modulus=100)


def _slice_er_blocking_sql() -> str:
    base = oracle_sql()["er_blocking_quality"]
    out = base.replace("c_custkey % 10 = 0", "c_custkey % 100 = 0")
    if out == base:
        raise ValueError("er_blocking_quality oracle drifted; slice rewrite missed")
    return out


def _slice_g_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip-composed k-core peel: node = key % 2000 + replica * 2000 keeps
    every replica a vertex-disjoint copy (the registered entry's plain % 2000
    ALIASES replicas into one dense graph — a fixture regime change, not an
    engine property). The engine peels the WHOLE strip graph; output is the
    replica-0 core summary."""
    li = _t(spark, sf_dir, "lineitem")
    strip = (F.col("l_orderkey") / REPLICA_OFF).cast("long") * 2000
    nu = (F.col("l_orderkey") % 2000 + strip).alias("a")
    nv = (F.col("l_partkey") % 2000 + strip).alias("b")
    edges = (
        li.select(nu, nv)
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    k = 60
    for _ in range(3):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionByName(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
        )
        edges = edges.join(
            F.broadcast(deg.withColumnRenamed("node", "u")), "u", "left_semi"
        ).join(F.broadcast(deg.withColumnRenamed("node", "v")), "v", "left_semi")
    # replica-0 summary in the original's always-one-row shape (an empty core
    # must compare equal to the oracle's zero row, not as a 0-vs-1 row count)
    dd0 = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("node") < 2000)
    )
    ne0 = edges.filter(F.col("u") < 2000).agg(F.count(F.lit(1)).alias("ne"))
    return (
        dd0.agg(
            F.count(F.lit(1)).alias("n_core_nodes"),
            F.coalesce(F.min("deg"), F.lit(0)).cast("long").alias("min_core_degree"),
            F.coalesce(F.max("deg"), F.lit(0)).cast("long").alias("max_core_degree"),
        )
        .crossJoin(F.broadcast(ne0))
        .select(
            "n_core_nodes",
            F.col("ne").alias("n_core_edges"),
            "min_core_degree",
            "max_core_degree",
        )
    )


_SLICE_KCORE_SQL = f"""
    WITH e0 AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS u,
             GREATEST(l_orderkey % 2000, l_partkey % 2000) AS v
      FROM lineitem
      WHERE l_orderkey % 2000 != l_partkey % 2000
        AND l_orderkey < {REPLICA_OFF}
    ),
    r0 AS (SELECT u, v FROM e0),
    d1 AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM r0 UNION ALL SELECT v FROM r0
      ) GROUP BY node HAVING COUNT(*) >= 60
    ),
    r1 AS (
      SELECT r0.u, r0.v FROM r0
      JOIN d1 a ON r0.u = a.node JOIN d1 b ON r0.v = b.node
    ),
    d2 AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM r1 UNION ALL SELECT v FROM r1
      ) GROUP BY node HAVING COUNT(*) >= 60
    ),
    r2 AS (
      SELECT r1.u, r1.v FROM r1
      JOIN d2 a ON r1.u = a.node JOIN d2 b ON r1.v = b.node
    ),
    d3 AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM r2 UNION ALL SELECT v FROM r2
      ) GROUP BY node HAVING COUNT(*) >= 60
    ),
    r3 AS (
      SELECT r2.u, r2.v FROM r2
      JOIN d3 a ON r2.u = a.node JOIN d3 b ON r2.v = b.node
    ),
    dd AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM r3 UNION ALL SELECT v FROM r3
      ) GROUP BY node
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
           CAST((SELECT COUNT(*) FROM r3) AS BIGINT) AS n_core_edges,
           CAST(COALESCE(MIN(deg), 0) AS BIGINT) AS min_core_degree,
           CAST(COALESCE(MAX(deg), 0) AS BIGINT) AS max_core_degree
    FROM dd
    """


def slice_queries() -> dict:
    return {
        "dedup_embedding_cosine": _slice_dedup_embedding_cosine,
        "dedup_ngram_jaccard": _slice_dedup_ngram_jaccard,
        "er_entity_clusters": _slice_er_entity_clusters,
        "er_blocking_quality": _slice_er_blocking_quality,
        "g_kcore_peel": _slice_g_kcore_peel,
    }


def slice_oracle_sql() -> dict:
    import ortholog_pipeline_spark.queries  # noqa: F401 — force registration

    return {
        name: materialize_multi_ref_ctes(sql)
        for name, sql in {
            "dedup_embedding_cosine": _SLICE_EMB_COSINE_SQL,
            "dedup_ngram_jaccard": _SLICE_NGRAM_SQL,
            "er_entity_clusters": _SLICE_ER_CLUSTERS_SQL,
            "er_blocking_quality": _slice_er_blocking_sql(),
            "g_kcore_peel": _SLICE_KCORE_SQL,
        }.items()
    }
