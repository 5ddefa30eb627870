"""End-to-end FLOW queries: the three reference entry points (§3.1 --species,
§3.2 --agrOrthologs, §3.3 --fixXRefDataSet) plus the corpus-prep pipeline, each
run as the REAL plan (``plans/*``) against a synthetic world derived
deterministically from the driver's TPC-H tables, with a DuckDB oracle that
replays the full relational spec end-to-end.

Why: the operator-grain registry queries prove every operator; these prove the
COMPOSITION — reconcile ordering (OrthologRelationLoader.java:52-80 →
Dao.java:230-350), guard interaction, and snapshot algebra — which is where
order-of-reconciliation bugs hide (VERDICT r2 "Next round" item 1).

World derivation (both engines, same formulas — the planted-defect pattern the
operator queries already use):
  * human genes   = customer keys  (rgd_id 1000000+c), symbol 'H'||c%500;
  * rat genes     = part keys      (rgd_id 2000000+p), symbol 'R'||p, with
    every 11th symbol lowercased-human ('h'||p%500) to exercise the W1/W3
    symbol-match tie-breaks;
  * resolution-dim defects: c%31 unmatched, c%41 splice-excluded, c%53 multiple,
    p%23 withdrawn+replaced(p-22), p%29 withdrawn-unreplaced, p%37 allele;
  * relation stream = orders (src EGH<o_custkey>, dest EGR<1+(o_orderkey*7)%199>,
    source HGNC/NCBI by o_orderkey%3, evidence vocab by o_orderkey%5);
  * seeded snapshots (orthologs A-E, agr F-G, associations H-K rows) derive
    from parts p<=300 and plant every verdict path: manual / manual-blocked,
    Alliance / alliance-blocked, MATCH / DELETE_EXISTING / DOWNGRADE / STALE,
    surplus rank>1, REQUIREMENT-2 last-row protection, ownership fences,
    J10 match/update/insert/delete and the J9 reverse-detach.

Canonical output excludes surrogate keys and timestamps (SURVEY.md §7), so
minted genetogene/assoc keys never enter the hash.
"""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ortholog_pipeline_spark.queries import _t, register
from ortholog_pipeline_spark.sources.state import StateStore

HB, RB = 1000000, 2000000  # human / rat rgd-id bases
TS0 = datetime(2020, 1, 1, 0, 0, 0)  # seed-snapshot stamp
RUN_TS = datetime(2024, 1, 2, 3, 4, 5)  # deterministic run timestamp (C11)

# ---------------------------------------------------------------------------
# shared SQL fragments (must mirror functions/strings.py exactly)
# ---------------------------------------------------------------------------

def _prio(c: str) -> str:
    """source_priority (strings.py:68): RGD=4 > Alliance/AGR=3 > HGNC=2 > NCBI=1."""
    return (
        f"CASE {c} WHEN 'RGD' THEN 4 WHEN 'Alliance' THEN 3 WHEN 'AGR' THEN 3 "
        f"WHEN 'HGNC' THEN 2 WHEN 'NCBI' THEN 1 ELSE 0 END"
    )


def _ev(c: str) -> str:
    """evidence_count (strings.py:36): commas+1, 0 for null/empty."""
    return (
        f"CASE WHEN {c} IS NULL OR len({c}) = 0 THEN 0 "
        f"ELSE len(string_split({c}, ',')) END"
    )


_HH = "1 + (p * 13) % 150"  # the seed rows' human partner for part p

# The synthetic world, as DuckDB CTEs (the Spark twin is _species_world below).
_WORLD_SQL = f"""
    hum AS (SELECT CAST(c_custkey AS INTEGER) AS c FROM customer),
    rat AS (SELECT CAST(p_partkey AS INTEGER) AS p FROM part),
    genes AS (
      SELECT {HB} + c AS rgd_id,
             'H' || CAST(c % 500 AS VARCHAR) AS gene_symbol,
             CASE WHEN c % 41 = 0 THEN 'splice' ELSE 'protein-coding' END AS gene_type_lc,
             1 AS species_type_key
      FROM hum
      UNION ALL
      SELECT {RB} + p,
             CASE WHEN p % 11 = 0 THEN 'h' || CAST(p % 500 AS VARCHAR)
                  ELSE 'R' || CAST(p AS VARCHAR) END,
             CASE WHEN p % 37 = 0 THEN 'allele' ELSE 'protein-coding' END,
             3
      FROM rat
    ),
    rgdids AS (
      SELECT {HB} + c AS rgd_id, 'ACTIVE' AS object_status,
             CAST(NULL AS INTEGER) AS replaced_by_rgd_id
      FROM hum
      UNION ALL
      SELECT {RB} + p,
             CASE WHEN p % 23 = 0 OR p % 29 = 0 THEN 'WITHDRAWN' ELSE 'ACTIVE' END,
             CASE WHEN p % 23 = 0 THEN {RB} + p - 22 ELSE NULL END
      FROM rat
    ),
    xr AS (
      SELECT 'EGH' || CAST(c AS VARCHAR) AS acc_id, {HB} + c AS rgd_id
      FROM hum WHERE c % 31 != 0
      UNION ALL
      SELECT 'EGH' || CAST(c AS VARCHAR), {HB} + c - 1 FROM hum WHERE c % 53 = 0
      UNION ALL
      SELECT 'EGR' || CAST(p AS VARCHAR), {RB} + p FROM rat
    ),
    seed_orth AS (
      SELECT CAST(p AS BIGINT) AS genetogene_key,
             {HB} + {_HH} AS src_rgd_id, {RB} + p AS dest_rgd_id,
             1 AS src_species_type_key, 3 AS dest_species_type_key,
             CASE WHEN p % 10 = 0 THEN 'RGD' WHEN p % 10 = 1 THEN 'Alliance'
                  WHEN p % 10 IN (2,3,4,5) THEN 'HGNC' ELSE 'NCBI' END AS xref_data_src,
             CASE p % 4 WHEN 0 THEN 'Ensembl' WHEN 1 THEN 'Ensembl, OrthoDB'
                  WHEN 2 THEN 'OrthoDB' ELSE 'Ensembl, OrthoDB, Panther' END AS xref_data_set,
             CASE WHEN p % 7 = 0 THEN 99 ELSE 70 END AS created_by
      FROM rat WHERE p <= 300
      UNION ALL
      SELECT 300000 + p, {HB} + {_HH}, {RB} + p + 1, 1, 3, 'NCBI', 'Ensembl', 70
      FROM rat WHERE p <= 300 AND p % 9 = 0
      UNION ALL
      SELECT 100000 + p, {HB} + {_HH}, {RB} + p + 2, 1, 3, 'RGD', NULL, 99
      FROM rat WHERE p <= 300 AND p % 100 = 0
      UNION ALL
      SELECT 400000 + p, {RB} + p, {HB} + {_HH}, 3, 1,
             CASE WHEN p % 12 = 0 THEN 'HGNC' ELSE 'NCBI' END, 'OrthoDB',
             CASE WHEN p % 18 = 0 THEN 99 ELSE 70 END
      FROM rat WHERE p <= 300 AND p % 6 = 0
      UNION ALL
      SELECT 600000 + p, {HB} + {_HH}, {RB} + p, 1, 3, 'NCBI', 'Ensembl', 70
      FROM rat WHERE p <= 300 AND p % 90 = 0
    ),
    seed_agr AS (
      SELECT {HB} + {_HH} AS gene_rgd_id_1, {RB} + p AS gene_rgd_id_2,
             'Y' AS is_best_score,
             CASE WHEN p % 16 = 0 THEN 'Y' ELSE 'N' END AS is_best_rev_score,
             CASE WHEN p % 24 = 0 THEN 'Ensembl Compara|InParanoid'
                  ELSE 'OrthoFinder' END AS methods_matched
      FROM rat WHERE p <= 200 AND p % 8 = 0
      UNION ALL
      SELECT {HB} + {_HH}, {RB} + p + 3, 'Y', 'Y', 'PANTHER'
      FROM rat WHERE p <= 200 AND p % 40 = 0
    ),
    seed_assoc AS (
      SELECT CAST(p AS BIGINT) AS assoc_key, 'weak_ortholog' AS assoc_type,
             CASE WHEN p % 10 = 0 AND p % 25 != 0 THEN 'Ensembl'
                  ELSE 'ensembl, orthodb' END AS assoc_subtype,
             {HB} + {_HH} AS master_rgd_id, {RB} + p AS detail_rgd_id,
             'ORTHOLOGS' AS src_pipeline
      FROM rat WHERE p <= 300 AND p % 5 = 0
      UNION ALL
      SELECT 500000 + p, 'weak_ortholog', 'OrthoDB', {RB} + p, {HB} + {_HH}, 'ORTHOLOGS'
      FROM rat WHERE p <= 300 AND p % 15 = 0
      UNION ALL
      SELECT 700000 + p, 'weak_ortholog', 'Panther', {HB} + {_HH}, {RB} + p + 5, 'ORTHOLOGS'
      FROM rat WHERE p <= 300 AND p % 21 = 0
      UNION ALL
      SELECT 800000 + p, 'homolog_note', 'note', {HB} + {_HH}, {RB} + p, 'ORTHOLOGS'
      FROM rat WHERE p <= 300 AND p % 55 = 0
    ),
    rel AS (
      SELECT 'EGH' || CAST(o_custkey AS VARCHAR) AS src_other_id,
             'EGR' || CAST(1 + (o_orderkey * 7) % 199 AS VARCHAR) AS dest_other_id,
             CASE WHEN o_orderkey % 3 = 0 THEN 'NCBI' ELSE 'HGNC' END AS data_source,
             CASE o_orderkey % 5 WHEN 0 THEN 'Ensembl' WHEN 1 THEN 'OrthoDB'
                  WHEN 2 THEN 'Ensembl, OrthoDB' WHEN 3 THEN 'Panther'
                  ELSE 'Ensembl, Panther, TreeFam' END AS data_set_name
      FROM orders
      UNION ALL
      -- curated side-feed guaranteeing J10 match/update collisions with the
      -- seeded weak associations (same pairs as the p%25 H-seed rows)
      SELECT 'EGH' || CAST({_HH} AS VARCHAR), 'EGR' || CAST(p AS VARCHAR),
             'HGNC', 'Ensembl, OrthoDB'
      FROM rat WHERE p <= 199 AND p % 25 = 0
    )
"""

_SPECIES_FLOW_SQL = f"""
    WITH
    {_WORLD_SQL},
    -- J1 resolution dimension (operators/resolve.py:31)
    res_cand AS (
      SELECT x.acc_id, x.rgd_id, r.object_status,
             CASE WHEN ar.rgd_id IS NOT NULL THEN r.replaced_by_rgd_id END AS repl
      FROM xr x
      JOIN genes g ON g.rgd_id = x.rgd_id AND g.gene_type_lc NOT IN ('allele','splice')
      JOIN rgdids r ON r.rgd_id = x.rgd_id
      LEFT JOIN (SELECT rgd_id FROM rgdids WHERE object_status = 'ACTIVE') ar
             ON ar.rgd_id = r.replaced_by_rgd_id
    ),
    res_dim AS (
      SELECT acc_id,
             CASE WHEN n_active = 1 THEN active_rgd
                  WHEN n_active = 0 AND n_repl = 1 THEN repl_rgd END AS rgd_id
      FROM (
        SELECT acc_id,
               COUNT(CASE WHEN object_status = 'ACTIVE' THEN 1 END) AS n_active,
               MIN(CASE WHEN object_status = 'ACTIVE' THEN rgd_id END) AS active_rgd,
               COUNT(DISTINCT CASE WHEN object_status != 'ACTIVE' THEN repl END) AS n_repl,
               MIN(CASE WHEN object_status != 'ACTIVE' THEN repl END) AS repl_rgd
        FROM res_cand GROUP BY acc_id)
    ),
    resolved AS (
      SELECT sd.rgd_id AS src_rgd_id, dd.rgd_id AS dest_rgd_id,
             r.data_source, r.data_set_name
      FROM rel r
      LEFT JOIN res_dim sd ON sd.acc_id = r.src_other_id
      LEFT JOIN res_dim dd ON dd.acc_id = r.dest_other_id
      WHERE sd.rgd_id IS NOT NULL AND dd.rgd_id IS NOT NULL
    ),
    -- A2 dedup-merge (operators/grouping.py:27)
    merged AS (
      SELECT src_rgd_id, dest_rgd_id,
             CASE WHEN n_src = 1 THEN src_one ELSE 'HGNC' END AS data_source,
             CASE WHEN n_src = 2
                  THEN array_to_string(list_sort(list_distinct(
                         list_append(hgnc_ev, 'NCBI'))), ', ')
                  ELSE array_to_string(list_sort(all_ev), ', ') END AS data_set_name
      FROM (
        SELECT src_rgd_id, dest_rgd_id,
               COUNT(DISTINCT data_source) AS n_src,
               MIN(data_source) AS src_one,
               list_distinct(flatten(list(
                 CASE WHEN data_source = 'HGNC' THEN string_split(data_set_name, ', ')
                      ELSE []::VARCHAR[] END))) AS hgnc_ev,
               list_distinct(flatten(list(string_split(data_set_name, ', ')))) AS all_ev
        FROM resolved GROUP BY 1, 2)
    ),
    -- U4 complement closure (grouping.py:108)
    closed AS (
      SELECT src_rgd_id, dest_rgd_id, 1 AS src_sp, 3 AS dest_sp,
             data_source, data_set_name
      FROM merged
      UNION ALL
      SELECT dest_rgd_id, src_rgd_id, 3, 1, data_source, data_set_name FROM merged
    ),
    scope AS (
      SELECT * FROM seed_orth
      WHERE dest_species_type_key = 3 OR src_species_type_key = 3
    ),
    -- tier 1: manual (J3/F5, plans/species_load.py:64)
    t_manual AS (
      SELECT src_rgd_id, dest_species_type_key, 1 AS tier,
             CASE WHEN COUNT(*) = 1 THEN MIN(dest_rgd_id) END AS dest_rgd_id,
             COUNT(*) > 1 AS blocked,
             'RGD' AS xref_data_src, CAST(NULL AS VARCHAR) AS xref_data_set
      FROM scope WHERE xref_data_src = 'RGD'
      GROUP BY 1, 2
    ),
    -- tier 2: Alliance mutual-best (J2/U2/F8, species_load.py:82)
    t_alliance AS (
      SELECT u.src_rgd_id, g.species_type_key AS dest_species_type_key, 2 AS tier,
             CASE WHEN COUNT(*) = 1 THEN MIN(u.partner) END AS dest_rgd_id,
             COUNT(*) > 1 AS blocked,
             'Alliance' AS xref_data_src,
             CASE WHEN COUNT(*) = 1 THEN MIN(u.methods_matched) END AS xref_data_set
      FROM (
        SELECT gene_rgd_id_1 AS src_rgd_id, gene_rgd_id_2 AS partner, methods_matched
        FROM seed_agr WHERE is_best_score = 'Y' AND is_best_rev_score = 'Y'
        UNION ALL
        SELECT gene_rgd_id_2, gene_rgd_id_1, methods_matched
        FROM seed_agr WHERE is_best_score = 'Y' AND is_best_rev_score = 'Y'
      ) u JOIN genes g ON g.rgd_id = u.partner
      GROUP BY 1, 2
    ),
    -- tiers 3/4: per-source W1 best-fit (operators/bestfit.py:22 strict-max shape)
    wsyms AS (
      SELECT c.*, gs.gene_symbol AS src_sym, gd.gene_symbol AS dest_sym,
             {_ev('c.data_set_name')} AS ev
      FROM closed c
      LEFT JOIN genes gs ON gs.rgd_id = c.src_rgd_id
      LEFT JOIN genes gd ON gd.rgd_id = c.dest_rgd_id
    ),
    t_file AS (
      SELECT src_rgd_id, dest_sp AS dest_species_type_key,
             CASE data_source WHEN 'HGNC' THEN 3 ELSE 4 END AS tier,
             dest_rgd_id, FALSE AS blocked,
             data_source AS xref_data_src, data_set_name AS xref_data_set
      FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                 PARTITION BY src_rgd_id, dest_sp, data_source
                 ORDER BY CASE WHEN n_at_max = 1 THEN ev ELSE 0 END DESC,
                          pref DESC, lower(dest_sym) ASC NULLS LAST,
                          dest_rgd_id ASC) AS rn
        FROM (
          SELECT *,
                 SUM(CASE WHEN ev = ev_max THEN 1 ELSE 0 END) OVER (
                   PARTITION BY src_rgd_id, dest_sp, data_source) AS n_at_max,
                 CASE WHEN lower(dest_sym) = lower(src_sym) THEN 1 ELSE 0 END AS pref
          FROM (
            SELECT *, MAX(ev) OVER (
              PARTITION BY src_rgd_id, dest_sp, data_source) AS ev_max
            FROM wsyms)))
      WHERE rn = 1
    ),
    tiers AS (
      SELECT * FROM t_manual UNION ALL SELECT * FROM t_alliance
      UNION ALL SELECT * FROM t_file
    ),
    picks AS (
      SELECT src_rgd_id, dest_species_type_key, dest_rgd_id,
             xref_data_src, xref_data_set
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY src_rgd_id, dest_species_type_key
              ORDER BY tier ASC) AS crn
            FROM tiers)
      WHERE crn = 1 AND NOT blocked
    ),
    -- W3/W4 comparator rank over existing rows (species_load.py:227)
    ex_ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY src_rgd_id, dest_species_type_key
               ORDER BY {_prio('xref_data_src')} DESC,
                        {_ev('xref_data_set')} DESC,
                        CASE WHEN ex_dest_sym IS NOT DISTINCT FROM ex_src_sym
                             THEN 1 ELSE 0 END DESC,
                        ex_dest_sym DESC NULLS LAST,
                        genetogene_key ASC) AS rn
      FROM (
        SELECT s.*, lower(gs.gene_symbol) AS ex_src_sym,
               lower(gd.gene_symbol) AS ex_dest_sym
        FROM scope s
        LEFT JOIN genes gs ON gs.rgd_id = s.src_rgd_id
        LEFT JOIN genes gd ON gd.rgd_id = s.dest_rgd_id)
    ),
    -- J7 conflict verdicts (species_load.py:239-273)
    conf AS (
      SELECT coalesce(p.src_rgd_id, e.src_rgd_id) AS src_rgd_id,
             coalesce(p.dest_species_type_key, e.dest_species_type_key)
               AS dest_species_type_key,
             p.dest_rgd_id AS pick_dest, p.xref_data_src, p.xref_data_set,
             e.genetogene_key AS ex_key,
             CASE WHEN e.dest_rgd_id IS NULL THEN 'INSERT'
                  WHEN p.dest_rgd_id IS NULL THEN 'STALE'
                  WHEN p.dest_rgd_id = e.dest_rgd_id THEN 'MATCH'
                  WHEN {_prio('p.xref_data_src')} * 1000 + {_ev('p.xref_data_set')}
                       > {_prio('e.xref_data_src')} * 1000 + {_ev('e.xref_data_set')}
                       THEN 'DELETE_EXISTING'
                  WHEN {_prio('p.xref_data_src')} * 1000 + {_ev('p.xref_data_set')}
                       < {_prio('e.xref_data_src')} * 1000 + {_ev('e.xref_data_set')}
                       THEN 'DOWNGRADE'
                  WHEN e.ex_dest_sym IS NOT DISTINCT FROM lower(gsp.gene_symbol)
                       THEN 'DOWNGRADE'
                  WHEN lower(gpd.gene_symbol) IS NOT DISTINCT FROM lower(gsp.gene_symbol)
                       THEN 'DELETE_EXISTING'
                  WHEN coalesce(lower(gpd.gene_symbol), '')
                       > coalesce(e.ex_dest_sym, '') THEN 'DELETE_EXISTING'
                  ELSE 'DOWNGRADE' END AS verdict
      FROM picks p
      FULL OUTER JOIN (SELECT * FROM ex_ranked WHERE rn = 1) e
        ON p.src_rgd_id = e.src_rgd_id
       AND p.dest_species_type_key = e.dest_species_type_key
      LEFT JOIN genes gpd ON gpd.rgd_id = p.dest_rgd_id
      LEFT JOIN genes gsp ON gsp.rgd_id = p.src_rgd_id
    ),
    ins AS (
      SELECT c.src_rgd_id, c.pick_dest AS dest_rgd_id, c.dest_species_type_key,
             c.xref_data_src, c.xref_data_set,
             g.species_type_key AS src_species_type_key
      FROM conf c JOIN genes g ON g.rgd_id = c.src_rgd_id
      WHERE c.verdict IN ('INSERT', 'DELETE_EXISTING')
    ),
    pick_keys AS (SELECT DISTINCT src_rgd_id, dest_species_type_key FROM picks),
    nopick AS (
      SELECT e.* FROM ex_ranked e
      ANTI JOIN pick_keys pk USING (src_rgd_id, dest_species_type_key)
    ),
    prot AS (
      SELECT src_rgd_id, dest_species_type_key, COUNT(*) AS n_prot
      FROM nopick
      WHERE NOT (created_by = 70 AND xref_data_src != 'RGD')
      GROUP BY 1, 2
    ),
    deletes0 AS (
      SELECT d.genetogene_key FROM (
        SELECT ex_key AS genetogene_key FROM conf WHERE verdict = 'DELETE_EXISTING'
        UNION ALL
        SELECT e.genetogene_key FROM ex_ranked e
        SEMI JOIN pick_keys pk USING (src_rgd_id, dest_species_type_key)
        WHERE e.rn > 1
        UNION ALL
        SELECT genetogene_key FROM (
          SELECT n.genetogene_key, coalesce(pr.n_prot, 0) AS n_prot,
                 ROW_NUMBER() OVER (
                   PARTITION BY n.src_rgd_id, n.dest_species_type_key
                   ORDER BY n.rn ASC) AS crn
          FROM nopick n
          LEFT JOIN prot pr USING (src_rgd_id, dest_species_type_key)
          WHERE n.created_by = 70 AND n.xref_data_src != 'RGD')
        WHERE n_prot > 0 OR crn > 1
      ) d
      ANTI JOIN (SELECT genetogene_key FROM scope WHERE xref_data_src = 'RGD') m
        USING (genetogene_key)
    ),
    -- W2 duplicate cleanup over the provisional snapshot (bestfit.py:118)
    prov AS (
      SELECT s.genetogene_key, s.src_rgd_id, s.dest_rgd_id,
             s.src_species_type_key, s.dest_species_type_key,
             s.xref_data_src, s.xref_data_set, s.created_by
      FROM seed_orth s ANTI JOIN deletes0 d USING (genetogene_key)
      UNION ALL
      SELECT 9000000000 + dest_rgd_id, src_rgd_id, dest_rgd_id,
             src_species_type_key, dest_species_type_key,
             xref_data_src, xref_data_set, 70
      FROM ins
    ),
    final_orth AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY src_rgd_id, dest_rgd_id
                 ORDER BY {_prio('xref_data_src')} DESC, genetogene_key ASC) AS rn2
        FROM prov)
      WHERE NOT (rn2 > 1 AND created_by = 70)
    ),
    -- weak associations (J5 + J10 + J9, species_load.py:439-504)
    weak_cand AS (
      SELECT master_rgd_id, detail_rgd_id, MIN(assoc_subtype) AS assoc_subtype
      FROM (
        SELECT src_rgd_id AS master_rgd_id, dest_rgd_id AS detail_rgd_id,
               data_set_name AS assoc_subtype
        FROM closed
        UNION ALL
        SELECT src_rgd_id, pick_dest, xref_data_set
        FROM conf WHERE verdict = 'DOWNGRADE')
      GROUP BY 1, 2
    ),
    weak AS (
      SELECT w.* FROM weak_cand w
      ANTI JOIN (SELECT DISTINCT src_rgd_id, dest_rgd_id FROM final_orth) s
        ON w.master_rgd_id = s.src_rgd_id AND w.detail_rgd_id = s.dest_rgd_id
    ),
    exw AS (
      SELECT * FROM seed_assoc
      WHERE assoc_type = 'weak_ortholog' AND src_pipeline = 'ORTHOLOGS'
    ),
    sync0 AS (
      SELECT coalesce(i.master_rgd_id, e.master_rgd_id) AS master_rgd_id,
             coalesce(i.detail_rgd_id, e.detail_rgd_id) AS detail_rgd_id,
             i.assoc_subtype AS inc_sub,
             CASE WHEN i.master_rgd_id IS NULL THEN 'delete'
                  WHEN e.master_rgd_id IS NULL THEN 'insert'
                  WHEN lower(i.assoc_subtype) IS NOT DISTINCT FROM lower(e.assoc_subtype)
                       THEN 'match'
                  ELSE 'update' END AS v
      FROM weak i FULL OUTER JOIN exw e
        ON i.master_rgd_id = e.master_rgd_id AND i.detail_rgd_id = e.detail_rgd_id
    ),
    del0 AS (SELECT master_rgd_id, detail_rgd_id FROM sync0 WHERE v = 'delete'),
    ins0 AS (SELECT master_rgd_id, detail_rgd_id, inc_sub FROM sync0 WHERE v = 'insert'),
    rev_del AS (
      SELECT DISTINCT detail_rgd_id AS master_rgd_id, master_rgd_id AS detail_rgd_id
      FROM del0
    ),
    kept_ins AS (
      SELECT i.* FROM ins0 i ANTI JOIN rev_del r USING (master_rgd_id, detail_rgd_id)
    ),
    cancelled AS (
      SELECT DISTINCT i.detail_rgd_id AS master_rgd_id,
             i.master_rgd_id AS detail_rgd_id
      FROM ins0 i SEMI JOIN rev_del r USING (master_rgd_id, detail_rgd_id)
    ),
    kept_del AS (
      SELECT d.* FROM del0 d ANTI JOIN cancelled c USING (master_rgd_id, detail_rgd_id)
    ),
    upd AS (SELECT master_rgd_id, detail_rgd_id, inc_sub FROM sync0 WHERE v = 'update'),
    surv AS (
      SELECT a.assoc_type,
             CASE WHEN u.master_rgd_id IS NOT NULL
                       AND a.assoc_type = 'weak_ortholog'
                       AND a.src_pipeline = 'ORTHOLOGS'
                  THEN u.inc_sub ELSE a.assoc_subtype END AS assoc_subtype,
             a.master_rgd_id, a.detail_rgd_id, a.src_pipeline
      FROM (
        SELECT a0.* FROM seed_assoc a0
        ANTI JOIN kept_del d
          ON a0.master_rgd_id = d.master_rgd_id
         AND a0.detail_rgd_id = d.detail_rgd_id
         AND a0.assoc_type = 'weak_ortholog'
         AND a0.src_pipeline = 'ORTHOLOGS') a
      LEFT JOIN upd u
        ON a.master_rgd_id = u.master_rgd_id
       AND a.detail_rgd_id = u.detail_rgd_id
       AND a.assoc_type = 'weak_ortholog'
       AND a.src_pipeline = 'ORTHOLOGS'
    ),
    final_assoc AS (
      SELECT * FROM surv
      UNION ALL
      SELECT 'weak_ortholog', inc_sub, master_rgd_id, detail_rgd_id, 'ORTHOLOGS'
      FROM kept_ins
    )
    SELECT 'orthologs' AS tbl, src_rgd_id AS id_a, dest_rgd_id AS id_b,
           src_species_type_key AS species_a, dest_species_type_key AS species_b,
           xref_data_src AS src, xref_data_set AS evidence,
           created_by AS owner, CAST(NULL AS VARCHAR) AS assoc_type
    FROM final_orth
    UNION ALL
    SELECT 'associations', master_rgd_id, detail_rgd_id,
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           src_pipeline, assoc_subtype, CAST(NULL AS INTEGER), assoc_type
    FROM final_assoc
"""


def _species_world(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The Spark twin of _WORLD_SQL — same formulas over the same tables."""
    c = F.col("c")
    p = F.col("p")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("c")
    )
    part = _t(spark, sf_dir, "part").select(F.col("p_partkey").cast("int").alias("p"))
    orders = _t(spark, sf_dir, "orders")
    hh = (F.lit(1) + (p * 13) % 150).cast("int")

    hgene = cust.select(
        (HB + c).cast("int").alias("rgd_id"),
        F.concat(F.lit("H"), (c % 500).cast("string")).alias("gene_symbol"),
        F.when(c % 41 == 0, "splice").otherwise("protein-coding").alias("gene_type_lc"),
        F.lit(None).cast("string").alias("ensembl_gene_symbol"),
        F.lit(1).cast("int").alias("species_type_key"),
    )
    rgene = part.select(
        (RB + p).cast("int").alias("rgd_id"),
        F.when(p % 11 == 0, F.concat(F.lit("h"), (p % 500).cast("string")))
        .otherwise(F.concat(F.lit("R"), p.cast("string")))
        .alias("gene_symbol"),
        F.when(p % 37 == 0, "allele").otherwise("protein-coding").alias("gene_type_lc"),
        F.lit(None).cast("string").alias("ensembl_gene_symbol"),
        F.lit(3).cast("int").alias("species_type_key"),
    )
    genes = hgene.unionByName(rgene)

    h_ids = cust.select(
        (HB + c).cast("int").alias("rgd_id"),
        F.lit("ACTIVE").alias("object_status"),
        F.lit(1).cast("int").alias("species_type_key"),
        F.lit(1).cast("int").alias("object_key"),
        F.lit(None).cast("int").alias("replaced_by_rgd_id"),
    )
    r_ids = part.select(
        (RB + p).cast("int").alias("rgd_id"),
        F.when((p % 23 == 0) | (p % 29 == 0), "WITHDRAWN")
        .otherwise("ACTIVE")
        .alias("object_status"),
        F.lit(3).cast("int").alias("species_type_key"),
        F.lit(1).cast("int").alias("object_key"),
        F.when(p % 23 == 0, (RB + p - 22).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("replaced_by_rgd_id"),
    )
    rgd_ids = h_ids.unionByName(r_ids)

    ts0 = F.lit(TS0)

    def _xref(rid, acc, key):
        return [
            key.cast("int").alias("acc_xdb_key"),
            rid.cast("int").alias("rgd_id"),
            acc.alias("acc_id"),
            F.lit(3).cast("int").alias("xdb_key"),
            F.lit("ENTREZGENE").alias("src_pipeline"),
            ts0.alias("modification_date"),
        ]

    xh = cust.filter(c % 31 != 0).select(
        *_xref(HB + c, F.concat(F.lit("EGH"), c.cast("string")), c)
    )
    xh2 = cust.filter(c % 53 == 0).select(
        *_xref(HB + c - 1, F.concat(F.lit("EGH"), c.cast("string")), 400000 + c)
    )
    xrr = part.select(
        *_xref(RB + p, F.concat(F.lit("EGR"), p.cast("string")), 800000 + p)
    )
    xrefs = xh.unionByName(xh2).unionByName(xrr)

    def _orth(key, src, dest, ssp, dsp, xsrc, xset, cb):
        return [
            key.cast("long").alias("genetogene_key"),
            src.cast("int").alias("src_rgd_id"),
            dest.cast("int").alias("dest_rgd_id"),
            F.lit(ssp).cast("int").alias("src_species_type_key"),
            F.lit(dsp).cast("int").alias("dest_species_type_key"),
            F.lit(None).cast("int").alias("group_id"),
            xsrc.alias("xref_data_src"),
            xset.alias("xref_data_set"),
            F.lit(11).cast("int").alias("ortholog_type_key"),
            F.lit(None).cast("double").alias("percent_homology"),
            cb.cast("int").alias("created_by"),
            ts0.alias("created_date"),
            cb.cast("int").alias("last_modified_by"),
            ts0.alias("last_modified_date"),
        ]

    p300 = part.filter(p <= 300)
    oa = p300.select(
        *_orth(
            p, HB + hh, RB + p, 1, 3,
            F.when(p % 10 == 0, "RGD")
            .when(p % 10 == 1, "Alliance")
            .when((p % 10).isin(2, 3, 4, 5), "HGNC")
            .otherwise("NCBI"),
            F.when(p % 4 == 0, "Ensembl")
            .when(p % 4 == 1, "Ensembl, OrthoDB")
            .when(p % 4 == 2, "OrthoDB")
            .otherwise("Ensembl, OrthoDB, Panther"),
            F.when(p % 7 == 0, F.lit(99)).otherwise(F.lit(70)),
        )
    )
    ob = p300.filter(p % 9 == 0).select(
        *_orth(300000 + p, HB + hh, RB + p + 1, 1, 3, F.lit("NCBI"),
               F.lit("Ensembl"), F.lit(70))
    )
    oc = p300.filter(p % 100 == 0).select(
        *_orth(100000 + p, HB + hh, RB + p + 2, 1, 3, F.lit("RGD"),
               F.lit(None).cast("string"), F.lit(99))
    )
    od = p300.filter(p % 6 == 0).select(
        *_orth(
            400000 + p, RB + p, HB + hh, 3, 1,
            F.when(p % 12 == 0, "HGNC").otherwise("NCBI"),
            F.lit("OrthoDB"),
            F.when(p % 18 == 0, F.lit(99)).otherwise(F.lit(70)),
        )
    )
    oe = p300.filter(p % 90 == 0).select(
        *_orth(600000 + p, HB + hh, RB + p, 1, 3, F.lit("NCBI"),
               F.lit("Ensembl"), F.lit(70))
    )
    orthologs = oa.unionByName(ob).unionByName(oc).unionByName(od).unionByName(oe)

    p200 = part.filter(p <= 200)
    agr_f = p200.filter(p % 8 == 0).select(
        (HB + hh).cast("int").alias("gene_rgd_id_1"),
        (RB + p).cast("int").alias("gene_rgd_id_2"),
        F.lit("stringent").alias("confidence"),
        F.lit("Y").alias("is_best_score"),
        F.when(p % 16 == 0, "Y").otherwise("N").alias("is_best_rev_score"),
        F.when(p % 24 == 0, "Ensembl Compara|InParanoid")
        .otherwise("OrthoFinder")
        .alias("methods_matched"),
        ts0.alias("created_date"),
        ts0.alias("last_update_date"),
    )
    agr_g = p200.filter(p % 40 == 0).select(
        (HB + hh).cast("int").alias("gene_rgd_id_1"),
        (RB + p + 3).cast("int").alias("gene_rgd_id_2"),
        F.lit("stringent").alias("confidence"),
        F.lit("Y").alias("is_best_score"),
        F.lit("Y").alias("is_best_rev_score"),
        F.lit("PANTHER").alias("methods_matched"),
        ts0.alias("created_date"),
        ts0.alias("last_update_date"),
    )
    agr = agr_f.unionByName(agr_g)

    def _assoc(key, atype, sub, master, detail):
        return [
            key.cast("long").alias("assoc_key"),
            atype.alias("assoc_type"),
            sub.alias("assoc_subtype"),
            master.cast("int").alias("master_rgd_id"),
            detail.cast("int").alias("detail_rgd_id"),
            ts0.alias("creation_date"),
            F.lit("ORTHOLOGS").alias("src_pipeline"),
        ]

    ah = p300.filter(p % 5 == 0).select(
        *_assoc(
            p, F.lit("weak_ortholog"),
            F.when((p % 10 == 0) & (p % 25 != 0), "Ensembl").otherwise(
                "ensembl, orthodb"
            ),
            HB + hh, RB + p,
        )
    )
    ai = p300.filter(p % 15 == 0).select(
        *_assoc(500000 + p, F.lit("weak_ortholog"), F.lit("OrthoDB"),
                RB + p, HB + hh)
    )
    aj = p300.filter(p % 21 == 0).select(
        *_assoc(700000 + p, F.lit("weak_ortholog"), F.lit("Panther"),
                HB + hh, RB + p + 5)
    )
    ak = p300.filter(p % 55 == 0).select(
        *_assoc(800000 + p, F.lit("homolog_note"), F.lit("note"),
                HB + hh, RB + p)
    )
    associations = ah.unionByName(ai).unionByName(aj).unionByName(ak)

    ok = F.col("o_orderkey")
    relations = orders.select(
        F.concat(F.lit("EGH"), F.col("o_custkey").cast("string")).alias("src_other_id"),
        F.concat(F.lit("EGR"), (1 + (ok * 7) % 199).cast("string")).alias(
            "dest_other_id"
        ),
        F.lit(1).cast("int").alias("src_species_type_key"),
        F.lit(3).cast("int").alias("dest_species_type_key"),
        F.when(ok % 3 == 0, "NCBI").otherwise("HGNC").alias("data_source"),
        F.when(ok % 5 == 0, "Ensembl")
        .when(ok % 5 == 1, "OrthoDB")
        .when(ok % 5 == 2, "Ensembl, OrthoDB")
        .when(ok % 5 == 3, "Panther")
        .otherwise("Ensembl, Panther, TreeFam")
        .alias("data_set_name"),
    )
    curated = part.filter((p <= 199) & (p % 25 == 0)).select(
        F.concat(F.lit("EGH"), hh.cast("string")).alias("src_other_id"),
        F.concat(F.lit("EGR"), p.cast("string")).alias("dest_other_id"),
        F.lit(1).cast("int").alias("src_species_type_key"),
        F.lit(3).cast("int").alias("dest_species_type_key"),
        F.lit("HGNC").alias("data_source"),
        F.lit("Ensembl, OrthoDB").alias("data_set_name"),
    )
    relations = relations.unionByName(curated)

    return {
        "genes": genes,
        "rgd_ids": rgd_ids,
        "xrefs": xrefs,
        "orthologs": orthologs,
        "associations": associations,
        "agr_orthologs": agr,
        "relations": relations,
    }


def _seed_store(spark: SparkSession, world: dict[str, DataFrame], prefix: str) -> StateStore:
    store = StateStore(spark, tempfile.mkdtemp(prefix=prefix))
    for t in ("genes", "rgd_ids", "xrefs", "orthologs", "associations", "agr_orthologs"):
        if t in world:
            store.write(t, world[t])
    return store


@register("flow_species_load", _SPECIES_FLOW_SQL)
def flow_species_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 --species end-to-end: seed the state store from the synthetic world,
    run the REAL run_species_load plan (J1 resolve → A2 merge → U4 closure →
    4-tier cascade → W1 → J7 verdicts → deletes w/ REQUIREMENT-2 + ownership
    fences → W2 cleanup → J5/J10/J9 association sync), then return the
    canonicalized final orthologs+associations snapshots (surrogate keys and
    timestamps excluded). The oracle replays the identical relational spec
    end-to-end in SQL. delete_threshold_pct=95 because the synthetic world
    deliberately plants far more churn than the reference's 10%% cap."""
    from ortholog_pipeline_spark.plans.species_load import run_species_load

    world = _species_world(spark, sf_dir)
    store = _seed_store(spark, world, "flow_species_")
    run_species_load(
        store, world["relations"], RUN_TS,
        dest_species_type_key=3, delete_threshold_pct=95.0,
    )
    orth = store.read("orthologs")
    assoc = store.read("associations")
    o_out = orth.select(
        F.lit("orthologs").alias("tbl"),
        F.col("src_rgd_id").alias("id_a"),
        F.col("dest_rgd_id").alias("id_b"),
        F.col("src_species_type_key").alias("species_a"),
        F.col("dest_species_type_key").alias("species_b"),
        F.col("xref_data_src").alias("src"),
        F.col("xref_data_set").alias("evidence"),
        F.col("created_by").alias("owner"),
        F.lit(None).cast("string").alias("assoc_type"),
    )
    a_out = assoc.select(
        F.lit("associations").alias("tbl"),
        F.col("master_rgd_id").alias("id_a"),
        F.col("detail_rgd_id").alias("id_b"),
        F.lit(None).cast("int").alias("species_a"),
        F.lit(None).cast("int").alias("species_b"),
        F.col("src_pipeline").alias("src"),
        F.col("assoc_subtype").alias("evidence"),
        F.lit(None).cast("int").alias("owner"),
        F.col("assoc_type"),
    )
    return o_out.unionByName(a_out)
