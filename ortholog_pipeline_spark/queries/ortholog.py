"""SURVEY.md numbered operator-id queries (the reference parity tier) (split from queries.py — registration side-effect module)."""
from ortholog_pipeline_spark.queries._shared import (  # noqa: F401
    DD,
    DataFrame,
    F,
    G,
    IA,
    LAY,
    SparkSession,
    TXT,
    Window,
    _MINHASH_AB_SQL,
    _QUALITY_SQL,
    _TOKS_SQL,
    _lang_hits_sql,
    _t,
    bestfit,
    grouping,
    register,
    sync,
)

@register(
    "a4_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                         AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "j1_resolution_verdict",
    """
    WITH per_cust AS (
      SELECT c_custkey,
             CAST(COUNT(o_orderkey) AS BIGINT) AS n
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus = 'P'
      GROUP BY c_custkey
    )
    SELECT CASE WHEN n = 1 THEN 'matched'
                WHEN n > 1 THEN 'multiple'
                ELSE 'unmatched' END AS verdict,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM per_cust GROUP BY 1
    """,
)
def j1_resolution_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J1 verdict shape: candidate counts per external key → verdict column →
    exact counter pool (the reference's matched/multipleMatch counters)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("n"))
    )
    verdict = (
        F.when(F.col("n") == 1, "matched")
        .when(F.col("n") > 1, "multiple")
        .otherwise("unmatched")
    )
    return per.groupBy(verdict.alias("verdict")).agg(
        F.count("*").alias("n_keys")
    )


@register(
    "w1_best_fit_pick",
    """
    WITH ev AS (
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pref,
             MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS ev_max
      FROM lineitem
    ), cand AS (
      SELECT *, SUM(CASE WHEN l_quantity = ev_max THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_at_max
      FROM ev
    )
    SELECT l_orderkey, l_partkey, l_linenumber FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_orderkey
        ORDER BY CASE WHEN n_at_max = 1 THEN l_quantity ELSE 0 END DESC,
                 pref DESC, l_linenumber ASC, l_partkey ASC
      ) AS rn FROM cand
    ) WHERE rn = 1
    """,
)
def w1_best_fit_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 semantics via the engine's pick_best: the max-evidence candidate wins only
    when it is a STRICT max; otherwise the preference flag then a deterministic
    tiebreak decide over ALL candidates (OrthologRelationLoader.java:537-578)."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data — two
    # lines can share a linenumber — so the tiebreak needs l_partkey to be
    # total (an incomplete ordering made the pick partitioning-dependent,
    # caught by the sf0.1 parity sweep)
    out = bestfit.pick_best(
        li,
        ["l_orderkey"],
        evidence=F.col("l_quantity"),
        prefer=F.when(F.col("l_returnflag") == "R", 1).otherwise(0),
        order_cols=[F.col("l_linenumber").asc(), F.col("l_partkey").asc()],
    )
    return out.select("l_orderkey", "l_partkey", "l_linenumber")


@register(
    "w2_duplicate_cleanup",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_linestatus,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey, l_partkey
               ORDER BY CASE l_returnflag WHEN 'R' THEN 3 WHEN 'A' THEN 2
                                          ELSE 1 END DESC,
                        l_linenumber ASC, l_linestatus ASC
             ) AS rn
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT)                          AS n_kept,
           CAST(COUNT(*) FILTER (WHERE rn > 1 AND l_linestatus = 'O') AS BIGINT)   AS n_deleted,
           CAST(COUNT(*) FILTER (WHERE rn > 1 AND l_linestatus <> 'O') AS BIGINT)  AS n_fenced
    FROM ranked GROUP BY l_returnflag
    """,
)
def w2_duplicate_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (OrthologRelationDao.java:798-819): priority-ordered ROW_NUMBER per natural
    key; rows ranked >1 are deleted only when owned by the pipeline (here: the
    l_linestatus='O' stand-in for created_by=70 — the ownership fence)."""
    li = _t(spark, sf_dir, "lineitem")
    prio = (
        F.when(F.col("l_returnflag") == "R", 3)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(1)
    )
    # l_linenumber is not unique within (order, part) in the synthetic data;
    # two tied rows can differ in l_linestatus, which the deleted/fenced split
    # reads — the extra l_linestatus key makes the pick total where it matters
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        prio.desc(), F.col("l_linenumber").asc(), F.col("l_linestatus").asc()
    )
    ranked = li.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.count(
            F.when((F.col("rn") > 1) & (F.col("l_linestatus") == "O"), 1)
        ).alias("n_deleted"),
        F.count(
            F.when((F.col("rn") > 1) & (F.col("l_linestatus") != "O"), 1)
        ).alias("n_fenced"),
    )


@register(
    "w5_prefer_mutual_best",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_returnflag,
             CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F'
                  THEN 1 ELSE 0 END AS best,
             MAX(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F'
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey) AS any_best
      FROM lineitem
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM flagged WHERE any_best = 0 OR best = 1
    GROUP BY l_returnflag
    """,
)
def w5_prefer_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 (OrthoTool.java:150-164) via the engine operator: when any partner in the
    partition is mutual-best, drop the rest."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.when(F.col("l_returnflag") == "R", "Y").otherwise("N").alias(
            "is_best_score"
        ),
        F.when(F.col("l_linestatus") == "F", "Y").otherwise("N").alias(
            "is_best_rev_score"
        ),
    )
    out = bestfit.prefer_mutual_best(li, ["l_orderkey"])
    return out.groupBy("l_returnflag").agg(F.count("*").alias("n_rows"))


@register(
    "j10_cdc_sync",
    """
    WITH incoming AS (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
    ), existing AS (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT CASE WHEN i.o_orderkey IS NULL THEN 'delete'
                WHEN e.o_orderkey IS NULL THEN 'insert'
                WHEN LOWER(i.o_orderpriority) = LOWER(e.o_orderpriority)
                  THEN 'match'
                ELSE 'update' END AS sync_verdict,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM incoming i FULL OUTER JOIN existing e USING (o_orderkey)
    GROUP BY 1
    """,
)
def j10_cdc_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 via the engine's sync_full_outer: incoming vs existing snapshots →
    match/update/insert/delete verdict counts (the reference's syncer QC,
    OrthologRelationLoader.java:151-204)."""
    o = _t(spark, sf_dir, "orders")
    incoming = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", "o_orderpriority"
    )
    existing = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    verdicts = sync.sync_full_outer(
        incoming, existing, ["o_orderkey"], ["o_orderpriority"]
    )
    return verdicts.groupBy("sync_verdict").agg(F.count("*").alias("n"))


@register(
    "u4_complement_closure",
    """
    WITH edges AS (
      SELECT DISTINCT CAST(l_partkey % 97 AS INT) AS src_rgd_id,
                      CAST(l_suppkey % 89 AS INT) AS dest_rgd_id
      FROM lineitem
    ), closed AS (
      SELECT src_rgd_id, dest_rgd_id FROM edges
      UNION
      SELECT dest_rgd_id, src_rgd_id FROM edges
    )
    SELECT src_rgd_id, CAST(COUNT(*) AS BIGINT) AS n_partners
    FROM closed GROUP BY src_rgd_id
    """,
)
def u4_complement_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 via the engine's complement_closure: every directed edge gains its reverse
    twin, deduped (OrthologGroup.java:66-91)."""
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_partkey") % 97).cast("int").alias("src_rgd_id"),
            (F.col("l_suppkey") % 89).cast("int").alias("dest_rgd_id"),
        )
        .dropDuplicates()
        .withColumn("src_species_type_key", F.lit(1))
        .withColumn("dest_species_type_key", F.lit(3))
        .withColumn("data_source", F.lit("HGNC"))
        .withColumn("data_set_name", F.lit("e"))
    )
    closed = grouping.complement_closure(edges)
    return closed.groupBy("src_rgd_id").agg(F.count("*").alias("n_partners"))


@register(
    "j8_missing_reverse",
    """
    WITH edges AS (
      SELECT DISTINCT CAST(l_partkey % 53 AS INT) AS src_rgd_id,
                      CAST(l_suppkey % 53 AS INT) AS dest_rgd_id
      FROM lineitem
    )
    SELECT e.src_rgd_id, e.dest_rgd_id
    FROM edges e LEFT JOIN edges r
      ON e.src_rgd_id = r.dest_rgd_id AND e.dest_rgd_id = r.src_rgd_id
    WHERE r.src_rgd_id IS NULL
    """,
)
def j8_missing_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 via the engine's missing_reverse: edges lacking their reverse twin
    (OrthologRelationDao.java:230-299)."""
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") % 53).cast("int").alias("src_rgd_id"),
        (F.col("l_suppkey") % 53).cast("int").alias("dest_rgd_id"),
    ).dropDuplicates()
    return sync.missing_reverse(edges)


@register(
    "j5_drop_covered_by_strong",
    """
    WITH weak AS (
      SELECT DISTINCT l_partkey AS master_rgd_id, l_suppkey AS detail_rgd_id
      FROM lineitem WHERE l_quantity < 10
    ), strong AS (
      SELECT DISTINCT l_partkey AS src_rgd_id, l_suppkey AS dest_rgd_id
      FROM lineitem WHERE l_quantity > 40
    )
    SELECT master_rgd_id, detail_rgd_id FROM weak w
    WHERE NOT EXISTS (
      SELECT 1 FROM strong s
      WHERE s.src_rgd_id = w.master_rgd_id AND s.dest_rgd_id = w.detail_rgd_id
    )
    """,
)
def j5_drop_covered_by_strong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 via the engine operator: weak candidates whose pair already has a strong
    ortholog are dropped (OrthologRelationLoader.java:138-149)."""
    li = _t(spark, sf_dir, "lineitem")
    weak = (
        li.filter(F.col("l_quantity") < 10)
        .select(
            F.col("l_partkey").alias("master_rgd_id"),
            F.col("l_suppkey").alias("detail_rgd_id"),
        )
        .dropDuplicates()
    )
    strong = (
        li.filter(F.col("l_quantity") > 40)
        .select(
            F.col("l_partkey").alias("src_rgd_id"),
            F.col("l_suppkey").alias("dest_rgd_id"),
        )
        .dropDuplicates()
    )
    return sync.drop_covered_by_strong(weak, strong)


@register(
    "j12_no_orthologs_report",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_genes,
           STRING_AGG(c_name, ', ' ORDER BY c_name) AS gene_list
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j12_no_orthologs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — genes-without-orthologs report shape: anti-join + per-type packed sorted
    name list (OrthologRelationLoadingManager.java:189-228)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    orphans = c.join(o, "c_custkey", "left_anti")
    return orphans.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_genes"),
        F.array_join(F.array_sort(F.collect_list("c_name")), ", ").alias(
            "gene_list"
        ),
    )


@register(
    "j11_cross_linked_report",
    """
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), hot_parts AS (
      SELECT l_partkey AS entity_key FROM pairs
      GROUP BY l_partkey HAVING COUNT(*) > 40
    ), hot_supps AS (
      SELECT l_suppkey AS entity_key FROM pairs
      GROUP BY l_suppkey HAVING COUNT(*) > 900
    )
    SELECT 'part' AS entity_type, p.p_name AS entity_name
    FROM hot_parts h JOIN part p ON p.p_partkey = h.entity_key
    UNION ALL
    SELECT 'supplier' AS entity_type, s.s_name AS entity_name
    FROM hot_supps h JOIN supplier s ON s.s_suppkey = h.entity_key
    """,
)
def j11_cross_linked_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 shape (OrthologRelationDao.java:672-689): two group-by-having-count
    passes + union + dimension join."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").dropDuplicates()
    hot_parts = (
        pairs.groupBy("l_partkey").count().filter(F.col("count") > 40)
    )
    hot_supps = (
        pairs.groupBy("l_suppkey").count().filter(F.col("count") > 900)
    )
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    a = hot_parts.join(
        F.broadcast(part), hot_parts["l_partkey"] == part["p_partkey"]
    ).select(F.lit("part").alias("entity_type"), F.col("p_name").alias("entity_name"))
    b = hot_supps.join(
        F.broadcast(supp), hot_supps["l_suppkey"] == supp["s_suppkey"]
    ).select(
        F.lit("supplier").alias("entity_type"), F.col("s_name").alias("entity_name")
    )
    return a.unionByName(b)


@register(
    "c2_evidence_sets",
    """
    SELECT p_brand,
           STRING_AGG(DISTINCT p_type, ', ' ORDER BY p_type) AS evidence_set,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS evidence_count
    FROM part GROUP BY p_brand
    """,
)
def c2_evidence_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/U5/O5 — build the canonical packed set (dedup + sort + ', '-join) per group
    (OrthologRelationParser.java:126-136 semantics on table data)."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.array_join(F.array_sort(F.collect_set("p_type")), ", ").alias(
            "evidence_set"
        ),
        F.count_distinct("p_type").alias("evidence_count"),
    )


@register(
    "a5_stale_watermark",
    """
    WITH bounds AS (SELECT MAX(ts) AS max_ts FROM events),
    last_seen AS (
      SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT)                                         AS n_users,
           CAST(COUNT(*) FILTER (
             WHERE last_ts < (SELECT max_ts FROM bounds) - INTERVAL 30 DAY
           ) AS BIGINT)                                                     AS n_stale
    FROM last_seen
    """,
)
def a5_stale_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 freshness aggregate + the staleness watermark of §2.9: users whose last
    event predates (global max − 30 days) are stale-delete candidates."""
    ev = _t(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    joined = last_seen.crossJoin(F.broadcast(max_ts))
    stale = F.col("last_ts") < F.col("max_ts") - F.expr("INTERVAL 30 DAYS")
    return joined.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(stale, 1)).alias("n_stale"),
    )


@register(
    "c_json_props",
    """
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def c_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@register(
    "pipeline_corpus_prep",
    f"""
    WITH ann0 AS (
      SELECT doc_id, text,
             {{h_en}} AS h_en, {{h_es}} AS h_es, {{h_fr}} AS h_fr,
             {{h_de}} AS h_de, {{h_zh}} AS h_zh,
             {_QUALITY_SQL} AS q,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    pred AS (
      SELECT *, CASE
          WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en >= h_zh
               AND h_en > 0 THEN 'en'
          WHEN h_es >= h_fr AND h_es >= h_de AND h_es >= h_zh AND h_es > 0 THEN 'es'
          WHEN h_fr >= h_de AND h_fr >= h_zh AND h_fr > 0 THEN 'fr'
          WHEN h_de >= h_zh AND h_de > 0 THEN 'de'
          WHEN h_zh > 0 THEN 'zh'
          ELSE 'und' END AS predicted
      FROM ann0
    ),
    s1 AS (SELECT * FROM pred WHERE predicted = 'en'),
    s2 AS (SELECT * FROM s1 WHERE q >= 0.35),
    s3 AS (
      SELECT doc_id, text FROM s2
      QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
    ),
    th AS (
      SELECT doc_id,
             list_transform({_TOKS_SQL}, t ->
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % {DD.MINHASH_M31}
             ) AS th
      FROM s3
    ),
    h AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(th) - 2, 0)),
               i -> (th[i] * {DD.SHINGLE_A} + th[i+1] * {DD.SHINGLE_B} + th[i+2])
                    % {DD.MINHASH_M31}
             )) AS h31
      FROM th WHERE len(th) >= 3
    ),
    sig AS (
      SELECT doc_id, h31,
             list_transform({_MINHASH_AB_SQL}, p ->
               list_min(list_transform(h31, x -> (p[1] * x + p[2]) % {DD.MINHASH_P}))
             ) AS sig
      FROM h
    ),
    banded AS (
      SELECT doc_id, b,
             md5(array_to_string(
               list_transform(sig[b*4+1 : b*4+4], v -> v::VARCHAR), ',')) AS band_key
      FROM sig, generate_series(0, 3) g(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
      FROM banded a JOIN banded b USING (b, band_key)
      WHERE a.doc_id < b.doc_id
    ),
    post AS (SELECT doc_id, unnest(h31) AS hsh FROM h),
    common AS (
      SELECT c.id_1, c.id_2, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c JOIN post a ON a.doc_id = c.id_1
                  JOIN post b ON b.doc_id = c.id_2 AND b.hsh = a.hsh
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(h31) AS sz FROM h),
    losers AS (
      SELECT DISTINCT c.id_2 FROM cand c JOIN common USING (id_1, id_2)
                  JOIN sz s1x ON s1x.doc_id = c.id_1
                  JOIN sz s2x ON s2x.doc_id = c.id_2
      WHERE n_common * 1.0 / (s1x.sz + s2x.sz - n_common) >= 0.5
    ),
    kept AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT id_2 FROM losers))
    SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL SELECT '1_lang', CAST(COUNT(*) AS BIGINT) FROM s1
    UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL SELECT '3_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s3
    UNION ALL SELECT '4_near_dedup', CAST(COUNT(*) AS BIGINT) FROM kept
    """.format(
        h_en=_lang_hits_sql("en"),
        h_es=_lang_hits_sql("es"),
        h_fr=_lang_hits_sql("fr"),
        h_de=_lang_hits_sql("de"),
        h_zh=_lang_hits_sql("zh"),
    ),
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-prep flow survivor counts: language gate → quality floor
    → exact dedup → minhash near-dup removal (plans/corpus_prep.py). The oracle
    replays the identical chain in SQL, including the greedy keep-lowest rule."""
    from ortholog_pipeline_spark.plans.corpus_prep import run_corpus_prep

    docs = _t(spark, sf_dir, "documents")
    return run_corpus_prep(docs, min_quality=0.35).summary


@register(
    "j7_conflict_verdict",
    """
    WITH incoming AS (
      SELECT l_orderkey, l_partkey, l_quantity FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_quantity DESC, l_partkey ASC) AS rn
        FROM lineitem WHERE l_linestatus = 'O'
      ) WHERE rn = 1
    ), existing AS (
      SELECT l_orderkey, l_partkey, l_quantity FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_quantity DESC, l_partkey ASC) AS rn
        FROM lineitem WHERE l_linestatus = 'F'
      ) WHERE rn = 1
    )
    SELECT CASE WHEN e.l_orderkey IS NULL THEN 'INSERT'
                WHEN i.l_orderkey IS NULL THEN 'STALE'
                WHEN i.l_partkey = e.l_partkey THEN 'MATCH'
                WHEN i.l_quantity > e.l_quantity THEN 'DELETE_EXISTING'
                ELSE 'DOWNGRADE' END AS verdict,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM incoming i FULL OUTER JOIN existing e USING (l_orderkey)
    GROUP BY 1
    """,
)
def j7_conflict_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (OrthologRelationDao.java:107-159): incoming pick vs best existing row per
    key, one full-outer join + a comparator when/otherwise chain producing
    INSERT/MATCH/DELETE_EXISTING/DOWNGRADE/STALE verdicts."""
    li = _t(spark, sf_dir, "lineitem")

    def top1(status: str) -> DataFrame:
        w = Window.partitionBy("l_orderkey").orderBy(
            F.col("l_quantity").desc(), F.col("l_partkey").asc()
        )
        return (
            li.filter(F.col("l_linestatus") == status)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_orderkey", "l_partkey", "l_quantity")
        )

    inc = top1("O").withColumnsRenamed(
        {"l_partkey": "i_part", "l_quantity": "i_qty"}
    )
    exi = top1("F").withColumnsRenamed(
        {"l_partkey": "e_part", "l_quantity": "e_qty"}
    )
    j = inc.join(exi, "l_orderkey", "full_outer")
    verdict = (
        F.when(F.col("e_part").isNull(), "INSERT")
        .when(F.col("i_part").isNull(), "STALE")
        .when(F.col("i_part") == F.col("e_part"), "MATCH")
        .when(F.col("i_qty") > F.col("e_qty"), "DELETE_EXISTING")
        .otherwise("DOWNGRADE")
    )
    return j.groupBy(verdict.alias("verdict")).agg(F.count("*").alias("n"))


@register(
    "w3_w4_keep_best_existing",
    """
    WITH ranked AS (
      SELECT l_returnflag,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey, l_partkey
               ORDER BY CASE l_returnflag WHEN 'R' THEN 4 WHEN 'A' THEN 3
                                          ELSE 1 END DESC,
                        l_quantity DESC,
                        CAST(l_shipdate AS VARCHAR) DESC,
                        l_linenumber ASC
             ) AS rn
      FROM lineitem
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM ranked WHERE rn = 1 GROUP BY l_returnflag
    """,
)
def w3_w4_keep_best_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 comparator ordering (priority -> evidence -> DESCENDING case-insensitive
    final key, OrthologRelationDao.java:164-188) + W4 keep-one (rank 1 survives)."""
    li = _t(spark, sf_dir, "lineitem")
    prio = (
        F.when(F.col("l_returnflag") == "R", 4)
        .when(F.col("l_returnflag") == "A", 3)
        .otherwise(1)
    )
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        prio.desc(),
        F.col("l_quantity").desc(),
        F.col("l_shipdate").cast("string").desc(),
        F.col("l_linenumber").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "a2_merge_dup_relations",
    """
    WITH rel AS (
      SELECT CAST(l_partkey % 97 AS INT) AS src_rgd_id,
             CAST(l_suppkey % 89 AS INT) AS dest_rgd_id,
             CASE WHEN l_returnflag = 'R' THEN 'HGNC' ELSE 'NCBI' END AS data_source,
             'T' || CAST(l_linenumber % 4 AS VARCHAR) AS token
      FROM lineitem
    ), merged AS (
      SELECT src_rgd_id, dest_rgd_id,
             list_sort(list_distinct(list(DISTINCT data_source))) AS sources,
             list_sort(list_distinct(list(token) FILTER (WHERE data_source = 'HGNC')))
               AS hgnc_ev,
             list_sort(list_distinct(list(token))) AS all_ev
      FROM rel GROUP BY 1, 2
    )
    SELECT src_rgd_id, dest_rgd_id,
           CASE WHEN len(sources) = 1 THEN sources[1] ELSE 'HGNC' END AS data_source,
           CASE WHEN len(sources) = 2
                THEN array_to_string(list_sort(list_distinct(
                       list_append(hgnc_ev, 'NCBI'))), ', ')
                ELSE array_to_string(all_ev, ', ') END AS data_set_name
    FROM merged
    """,
)
def a2_merge_dup_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 via the engine's merge_duplicate_relations (OrthologGroup.java:20-60):
    same-source rows union evidence; an {HGNC, NCBI} pair keeps HGNC + appends the
    literal 'NCBI' token."""
    from ortholog_pipeline_spark.operators import grouping as G

    li = _t(spark, sf_dir, "lineitem")
    rel = li.select(
        (F.col("l_partkey") % 97).cast("int").alias("src_rgd_id"),
        (F.col("l_suppkey") % 89).cast("int").alias("dest_rgd_id"),
        F.lit(1).alias("src_species_type_key"),
        F.lit(3).alias("dest_species_type_key"),
        F.when(F.col("l_returnflag") == "R", "HGNC")
        .otherwise("NCBI")
        .alias("data_source"),
        F.concat(F.lit("T"), (F.col("l_linenumber") % 4).cast("string")).alias("data_set_name"),
    )
    return G.merge_duplicate_relations(rel).select(
        "src_rgd_id", "dest_rgd_id", "data_source", "data_set_name"
    )


@register(
    "a7_distinct_entity_count",
    """
    SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS n_distinct FROM (
      SELECT l_partkey AS x FROM lineitem
      UNION ALL
      SELECT l_suppkey AS x FROM lineitem
    )
    """,
)
def a7_distinct_entity_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (AgrTsvLoader.java:91, 131-136): distinct count over BOTH sides of every
    pair — explode(array(c1, c2)) then distinct."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.explode(F.array(F.col("l_partkey"), F.col("l_suppkey"))).alias("x")
        )
        .agg(F.count_distinct("x").alias("n_distinct"))
    )


@register(
    "a8_duplicate_detection",
    """
    SELECT CAST(n_rows AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM (
      SELECT l_orderkey, l_partkey, COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1, 2
    ) GROUP BY 1
    """,
)
def a8_duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (OrthologRelationDao.java:798-819 precondition): per-natural-key row counts
    histogram — keys with n>1 are the duplicate-cleanup inputs."""
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey", "l_partkey").agg(
        F.count("*").alias("n_rows")
    )
    return per_key.groupBy("n_rows").agg(F.count("*").alias("n_keys"))


@register(
    "c5_greek_transliteration",
    """
    SELECT CASE CAST(p_partkey % 5 AS INT)
             WHEN 0 THEN p_name || '-alpha'
             WHEN 1 THEN p_name || '-beta'
             WHEN 2 THEN p_name || '-lambda'
             WHEN 3 THEN p_name || '-DELTA'
             ELSE p_name || '-theta' END AS symbol,
           CAST(p_partkey AS BIGINT) AS p_partkey
    FROM part
    """,
)
def c5_greek_transliteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (AgrTsvLoader.java:437-486) via the engine's regexp-chain transliteration.
    Codepoint 951 (eta) maps to 'lambda' — the reference's apparent upstream bug,
    mirrored for byte-compatibility (index 2 here exercises it)."""
    from ortholog_pipeline_spark.functions.strings import transliterate_greek

    p = _t(spark, sf_dir, "part")
    greek = F.element_at(
        F.array(F.lit("α"), F.lit("β"), F.lit("η"), F.lit("Δ"), F.lit("θ")),
        (F.col("p_partkey") % 5 + 1).cast("int"),
    )
    raw = F.concat(F.col("p_name"), F.lit("-"), greek)
    return p.select(
        transliterate_greek(raw).alias("symbol"),
        F.col("p_partkey").cast("long").alias("p_partkey"),
    )


@register(
    "j4_semi_join_exists",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j4_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J6 (areGenesOrthologous / areGenesAssociated scalar probes,
    OrthologRelationDao.java:210-228) as ONE dataset-wide left-semi join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(o, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )


@register(
    "j13_all_pairs_within_group",
    """
    WITH members AS (
      SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
    )
    SELECT a.l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_directed_pairs
    FROM members a JOIN members b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_orderkey
    """,
)
def j13_all_pairs_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 (HomologeneLoader.java:306-343): per-group all-pairs self-join with an
    index inequality; count of i<j pairs per group (both directions = 2x)."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.select("l_orderkey", "l_linenumber")
    a = m.withColumnsRenamed({"l_linenumber": "ln_a"})
    b = m.withColumnsRenamed({"l_linenumber": "ln_b"})
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("ln_a") < F.col("ln_b"))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_directed_pairs"))
    )


@register(
    "j14_report_join_prefer_best",
    """
    WITH flagged AS (
      SELECT n.n_name, r.r_name, s.s_name, s.s_acctbal,
             CASE WHEN s.s_acctbal > 5000 THEN 1 ELSE 0 END AS best,
             MAX(CASE WHEN s.s_acctbal > 5000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY n.n_nationkey) AS any_best
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT n_name, r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM flagged WHERE any_best = 0 OR best = 1
    GROUP BY n_name, r_name
    """,
)
def j14_report_join_prefer_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 (OrthoTool.java:126-166): 3-table equi-join + the W5 prefer-best window
    filter, dimension sides broadcast."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    best = F.when(F.col("s_acctbal") > 5000, 1).otherwise(0)
    w = Window.partitionBy("n_nationkey")
    return (
        j.withColumn("best", best)
        .withColumn("any_best", F.max("best").over(w))
        .filter((F.col("any_best") == 0) | (F.col("best") == 1))
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


@register(
    "o5_pipe_token_sort",
    """
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(
             regexp_split_to_array(p_type, ' '))), '|') AS sorted_tokens
    FROM part
    """,
)
def o5_pipe_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/C7 (sortAlgorithmsStr, AgrTsvLoader.java:225-229): dedup + ASCII-sort a
    token set into the canonical '|'-packed form."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col("p_type"), " "))), "|"
        ).alias("sorted_tokens"),
    )


@register(
    "c9_c13_recodes",
    """
    WITH agg AS (
      SELECT l_returnflag,
             CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_new,
             CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_old
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           printf('%+d', n_new - n_old) AS delta,
           CASE WHEN n_new > n_old THEN 'Y' ELSE 'N' END AS grew
    FROM agg
    """,
)
def c9_c13_recodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 signed-diff formatting (Manager.java:145-148) + C13 boolean recode to
    'Y'/'N' (Dao.java:827-828)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_new"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_old"),
    )
    return agg.select(
        "l_returnflag",
        F.format_string("%+d", F.col("n_new") - F.col("n_old")).alias("delta"),
        F.when(F.col("n_new") > F.col("n_old"), "Y").otherwise("N").alias("grew"),
    )


@register(
    "f_filter_projection_pushdown",
    """
    SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
    GROUP BY 1
    """,
)
def f_filter_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: predicate + projection narrow enough that the parquet scan reads 2
    columns with pushed filters (verified by the explain-plan audit test)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
        )
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("ship_month")
        )
        .agg(F.count("*").alias("n_items"))
    )


@register(
    "c_scalar_functions",
    r"""
    SELECT c_custkey,
           len(regexp_split_to_array(c_name, '0')) AS evidence_count,
           TRY_CAST(regexp_extract(c_name, '^Customer#0*(\d+)$', 1) AS INT)
             AS curie_suffix,
           trim(regexp_replace(trim('"' || c_mktsegment || '"'), '^"(.*)"$', '\1'))
             AS stripped,
           CASE WHEN LOWER(c_mktsegment) = 'building' THEN 'Y' ELSE 'N' END
             AS ci_match
    FROM customer
    """,
)
def c_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 evidence count (commas+1), C6 curie numeric suffix, C8 quote strip, C4
    case-insensitive equality — the engine's Catalyst-only scalar helpers."""
    from ortholog_pipeline_spark.functions.strings import strip_quotes

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.size(F.split(F.col("c_name"), "0")).alias("evidence_count"),
        F.regexp_extract(F.col("c_name"), r"^Customer#0*(\d+)$", 1)
        .try_cast("int")
        .alias("curie_suffix"),
        strip_quotes(
            F.concat(F.lit('"'), F.col("c_mktsegment"), F.lit('"'))
        ).alias("stripped"),
        F.when(F.lower(F.col("c_mktsegment")) == "building", "Y")
        .otherwise("N")
        .alias("ci_match"),
    )


@register(
    "s_scd2_history",
    """
    WITH changes AS (
      SELECT user_id, ts, event_type,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (
      SELECT user_id, ts AS valid_from, event_type
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                IS NULL AS BOOLEAN) AS is_current
    FROM starts
    """,
)
def s_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from an event changelog: collapse runs
    of the same state, then derive [valid_from, valid_to) intervals with lead —
    the standard two-window build (both windows share the user_id shuffle). The
    reference's last-modified stamping (S10) is the degenerate one-row case."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id", "ts", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    starts = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", F.col("ts").alias("valid_from"), "event_type")
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    lead = F.lead("valid_from").over(w2)
    return starts.select(
        "user_id", "event_type", "valid_from",
        lead.alias("valid_to"),
        lead.isNull().alias("is_current"),
    )


@register(
    "c_gap_fill_forward",
    """
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(MAX(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS v_millis
      FROM events
      WHERE event_type = 'purchase' AND user_id % 5 = 0
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    )
    SELECT g.user_id, g.day,
           LAST_VALUE(d.v_millis IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def c_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap filling with forward fill: densify each user's purchase
    series to a continuous day grid (sequence + explode — generated
    distributed, never collected) and carry the last observed value across
    gaps with last(ignorenulls) over an unbounded-preceding row frame. The
    grid explode and the fill window both partition by user_id, so the plan
    is one shuffle; per-user state in the window is a single value."""
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 5 == 0))
        .select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 1000).cast("long").alias("v_millis"),
        )
        .groupBy("user_id", "day")
        .agg(F.max("v_millis").alias("v_millis"))
    )
    span = d.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(d, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("v_millis", ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "doc_shard_packing",
    """
    WITH t AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(FLOOR(doc_id / 1000.0) AS BIGINT) AS b
      FROM documents
    ),
    bt AS (
      SELECT b, CAST(SUM(n_chars) AS BIGINT) AS bsum FROM t GROUP BY b
    ),
    bo AS (
      SELECT b,
             CAST(SUM(bsum) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bsum
               AS BIGINT) AS boffset
      FROM bt
    ),
    c AS (
      SELECT t.doc_id, t.n_chars,
             bo.boffset + SUM(t.n_chars) OVER (PARTITION BY t.b ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t.n_chars
               AS cum_before
      FROM t JOIN bo ON t.b = bo.b
    )
    SELECT doc_id,
           CAST(FLOOR(CAST(cum_before AS DOUBLE) / 100000.0) AS BIGINT) AS shard_id,
           n_chars
    FROM c
    """,
)
def doc_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-size training shards by running char budget
    (sequence-packing's shard step): shard_id = floor(prefix_sum(n_chars) /
    100k) in doc_id order. The prefix sum is the two-level distributed shape,
    not a global window: per-bucket (floor(doc_id/1000)) windows run in
    parallel, and only the tiny bucket-totals frame takes a single-partition
    cumulative pass before being broadcast back — the same plan
    `ranking.global_prefix_sum` uses, expressed in pure Catalyst. Budget
    arithmetic is integer; the one double division is exact below 2^53."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("doc_id") / 1000.0).cast("long").alias("b"),
    )
    bt = t.groupBy("b").agg(F.sum("n_chars").alias("bsum"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bo = bt.select(
        "b", (F.sum("bsum").over(wb) - F.col("bsum")).cast("long").alias("boffset")
    )
    wd = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.join(F.broadcast(bo), "b").select(
        "doc_id",
        "n_chars",
        (
            F.col("boffset") + F.sum("n_chars").over(wd) - F.col("n_chars")
        ).alias("cum_before"),
    )
    return c.select(
        "doc_id",
        F.floor(F.col("cum_before").cast("double") / 100000.0)
        .cast("long")
        .alias("shard_id"),
        "n_chars",
    )


@register(
    "doc_context_chunks",
    rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS start
      FROM t WHERE len(toks) >= 1
    )
    SELECT doc_id,
           CAST((start - 1) / 48 AS BIGINT) AS chunk_id,
           CAST(least(64, len(toks) - start + 1) AS INTEGER) AS n_chunk_tokens,
           md5(array_to_string(toks[start : start + 63], ' ')) AS chunk_hash
    FROM s
    """,
)
def doc_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunker: 64-token windows at stride 48 (16-token
    overlap), emitted as (doc_id, chunk_id, length, md5-of-chunk). Pure array
    expressions + one explode — map-side, no shuffle; the md5 pins exact chunk
    content across engines. This is the fan-out stage ahead of embedding /
    training-sample generation."""
    from ortholog_pipeline_spark.functions import text as TXT

    docs = _t(spark, sf_dir, "documents")
    toks = TXT.tokens("text")
    d = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(TXT.chunk_starts("text", stride=48)).alias("start"),
    )
    return d.select(
        "doc_id",
        ((F.col("start") - 1) / 48).cast("long").alias("chunk_id"),
        F.least(
            F.lit(64), F.size("toks") - F.col("start") + 1
        ).alias("n_chunk_tokens"),
        F.md5(F.array_join(F.slice("toks", F.col("start"), 64), " ")).alias(
            "chunk_hash"
        ),
    )


@register(
    "o_zorder_layout",
    f"""
    WITH z AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 4096 AS xd,
             CAST(FLOOR(epoch(l_shipdate) / 86400) AS BIGINT) % 4096 AS yd
      FROM lineitem
    ),
    k AS (
      SELECT l_orderkey, l_linenumber, xd, yd,
             {LAY.zorder_key2_sql('xd', 'yd', bits=12)} AS zkey
      FROM z
    )
    SELECT zkey >> 16 AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(xd) AS BIGINT) AS min_part, CAST(MAX(xd) AS BIGINT) AS max_part,
           CAST(MIN(yd) AS BIGINT) AS min_day, CAST(MAX(yd) AS BIGINT) AS max_day
    FROM k GROUP BY zbucket
    """,
)
def o_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: interleave (part-key bucket,
    ship-day) into a 24-bit Morton key and report per-zbucket min/max of BOTH
    dimensions — each bucket (a would-be file under OPTIMIZE ZORDER) stays
    tight in part AND date simultaneously, which is what makes per-file
    min/max stats prune scans on either predicate. The interleave is pure
    shift/mask codegen arithmetic; the audit is one aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    z = li.select(
        (F.col("l_partkey") % 4096).alias("xd"),
        (
            F.floor(
                F.col("l_shipdate").cast("timestamp").cast("double") / 86400.0
            ).cast("long")
            % 4096
        ).alias("yd"),
    )
    k = z.withColumn("zkey", LAY.zorder_key2(F.col("xd"), F.col("yd"), bits=12))
    return (
        k.groupBy(F.shiftright("zkey", 16).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("xd").alias("min_part"),
            F.max("xd").alias("max_part"),
            F.min("yd").alias("min_day"),
            F.max("yd").alias("max_day"),
        )
    )


@register(
    "s_incremental_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def s_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the Spark side computes the aggregate
    INCREMENTALLY — partial frames for the "historical" slice (shipped before
    1997) and the "new batch" (the rest), merged by union-and-re-sum — while
    the oracle aggregates the whole table directly. Hash equality of the two
    PATHS is the refresh-correctness property itself. Measures are exact
    integers (quantity units, price cents) so partial merging is bit-exact in
    any merge order; AVG derives at read time from the merged sums."""
    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "sum_qty": F.col("l_quantity").cast("long"),
        "sum_price_cents": F.round(F.col("l_extendedprice") * 100).cast("long"),
    }
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    state = IA.agg_partials(li.filter(F.col("l_shipdate") < cutoff), keys, measures)
    delta = IA.agg_partials(li.filter(F.col("l_shipdate") >= cutoff), keys, measures)
    merged = IA.merge_agg_state(state, delta, keys)
    return merged.select(
        *keys,
        "n_rows",
        "sum_qty",
        "sum_price_cents",
        F.round(F.col("sum_qty").cast("double") / F.col("n_rows"), 6).alias(
            "avg_qty"
        ),
    )


@register(
    "s_incremental_join",
    """
    SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def s_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance: the Spark side maintains the
    orders⋈customer aggregate INCREMENTALLY — the pre-1996 slice is the
    materialized state, the rest is the insert delta, and the refresh is
    Δorders⋈customer merged into the state by union-and-re-sum (the ΔA⋈B term
    of the standard delta rule; the dimension is static here so A⋈ΔB drops
    out). The oracle joins and aggregates the WHOLE table directly; hash
    equality of the two paths is the view-maintenance correctness property —
    the same two-path contract s_incremental_agg pins for aggregates, now
    with a join under it. Measures are exact integers so partial merges are
    order-free; the dimension broadcasts in both passes."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cutoff = F.lit("1996-01-01").cast("timestamp_ntz")

    def agg_slice(o):
        j = o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        return j.groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )

    state = agg_slice(orders.filter(F.col("o_orderdate") < cutoff))
    delta = agg_slice(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("segment", "status")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )


@register(
    "o_partition_skew_report",
    """
    WITH parts AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS bytes_est
      FROM documents GROUP BY lang, source
    ),
    tot AS (
      SELECT AVG(n_rows) AS avg_rows, AVG(bytes_est) AS avg_bytes,
             COUNT(*) AS n_parts
      FROM parts
    )
    SELECT lang, source, n_rows, bytes_est,
           ROUND(n_rows / avg_rows, 4) AS row_skew,
           ROUND(bytes_est / avg_bytes, 4) AS byte_skew,
           CAST(n_parts AS BIGINT) AS n_partitions
    FROM parts, tot
    WHERE n_rows / avg_rows > 1.2 OR bytes_est / avg_bytes > 1.2
    """,
)
def o_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew report for a prospective partitionBy(lang, source)
    layout: per-cell row and byte estimates against the fleet average,
    flagging cells > 1.2x — the check run BEFORE a big partitioned write,
    because a hot partition becomes a straggler task and a giant file
    (the writer's maxRecordsPerFile caps the file, not the task). One
    aggregate + a broadcast 1-row average; the same query over a parquet
    table's files view is how the report runs post-write."""
    docs = _t(spark, sf_dir, "documents")
    parts = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("bytes_est"),
    )
    tot = parts.agg(
        F.avg("n_rows").alias("avg_rows"),
        F.avg("bytes_est").alias("avg_bytes"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        parts.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n_rows") / F.col("avg_rows") > 1.2)
            | (F.col("bytes_est") / F.col("avg_bytes") > 1.2)
        )
        .select(
            "lang",
            "source",
            "n_rows",
            "bytes_est",
            F.round(F.col("n_rows") / F.col("avg_rows"), 4).alias("row_skew"),
            F.round(F.col("bytes_est") / F.col("avg_bytes"), 4).alias("byte_skew"),
            F.col("n_parts").cast("long").alias("n_partitions"),
        )
    )
