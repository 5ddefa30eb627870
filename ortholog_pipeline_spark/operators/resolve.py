"""J1 — external-gene-id → RGD-id resolution as a dimension-table join.

The reference resolves each relation side with a memoized per-row JDBC cascade
(OrthologRelationLoader.java:209-372): EG id → exactly-one ACTIVE gene, else
multiple→drop, withdrawn-with-single-active-replacement→use replacement,
withdrawn-without→drop, no-match→drop. Counters feed audit logs.

Spark-first restatement: build the whole verdict matrix ONCE as a resolution dimension
table (one row per acc_id with a verdict + resolved id), then resolve any number of
relation rows with two broadcast hash joins. The ConcurrentHashMap memoization and
parallelStream of the reference become, respectively, the broadcast and ordinary
partition parallelism — no per-row round trips, no driver loops, scales to any input
size because the dimension is bounded by the xref table, not the relation stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ortholog_pipeline_spark.schemas import XDB_KEY_ENTREZ

#: Resolution verdicts (audit-log names follow README.md:137-144 log concerns).
MATCHED = "matched"
MULTIPLE = "multiple"  # >1 active genes for the id → dropped, multipleMatch log
WITHDRAWN = "withdrawn"  # withdrawn gene, no single active replacement → dropped
REPLACED = "replaced"  # withdrawn but exactly one active replacement → resolved
UNMATCHED = "unmatched"  # id unknown → dropped


def build_resolution_dim(
    xrefs: DataFrame,
    genes: DataFrame,
    rgd_ids: DataFrame,
    xdb_key: int = XDB_KEY_ENTREZ,
    excluded_gene_types: tuple[str, ...] = ("allele", "splice"),
) -> DataFrame:
    """One row per external acc_id: (acc_id, rgd_id, verdict).

    Mirrors the cascade at OrthologRelationLoader.java:309-372 with the gene-type
    exclusion of OrthologRelationDao.java:508-509 (F6) and the replaced-gene history
    lookup of Dao.java:702-705. The output is small (bounded by distinct xref ids) and
    is meant to be broadcast into :func:`resolve_relations`.
    """
    candidates = (
        xrefs.filter(F.col("xdb_key") == xdb_key)
        .select("acc_id", "rgd_id")
        .join(
            genes.filter(~F.col("gene_type_lc").isin(*excluded_gene_types)).select(
                "rgd_id"
            ),
            "rgd_id",
        )
        .join(
            rgd_ids.select("rgd_id", "object_status", "replaced_by_rgd_id"),
            "rgd_id",
        )
    )

    # Active replacements of withdrawn genes must themselves be ACTIVE
    # (getActiveRgdIdFromHistory, Dao.java:702-705).
    active_ids = rgd_ids.filter(F.col("object_status") == "ACTIVE").select(
        F.col("rgd_id").alias("replacement_rgd_id")
    )
    candidates = candidates.join(
        active_ids,
        candidates["replaced_by_rgd_id"] == active_ids["replacement_rgd_id"],
        "left",
    )

    per_acc = candidates.groupBy("acc_id").agg(
        F.count(F.when(F.col("object_status") == "ACTIVE", 1)).alias("n_active"),
        F.min(F.when(F.col("object_status") == "ACTIVE", F.col("rgd_id"))).alias(
            "active_rgd_id"
        ),
        F.count_distinct(
            F.when(F.col("object_status") != "ACTIVE", F.col("replacement_rgd_id"))
        ).alias("n_replacements"),
        F.min(
            F.when(F.col("object_status") != "ACTIVE", F.col("replacement_rgd_id"))
        ).alias("replacement_rgd_id"),
    )

    return per_acc.select(
        "acc_id",
        F.when(F.col("n_active") == 1, F.col("active_rgd_id"))
        .when(
            (F.col("n_active") == 0) & (F.col("n_replacements") == 1),
            F.col("replacement_rgd_id"),
        )
        .otherwise(F.lit(None).cast("int"))
        .alias("rgd_id"),
        F.when(F.col("n_active") == 1, F.lit(MATCHED))
        .when(F.col("n_active") > 1, F.lit(MULTIPLE))
        .when(F.col("n_replacements") == 1, F.lit(REPLACED))
        .otherwise(F.lit(WITHDRAWN))
        .alias("verdict"),
    )


def resolve_relations(relations: DataFrame, resolution_dim: DataFrame) -> DataFrame:
    """Resolve both sides of a relations DataFrame via two broadcast joins.

    Adds ``src_rgd_id/dest_rgd_id`` and ``src_verdict/dest_verdict`` columns; ids not
    present in the dimension get verdict ``unmatched``. Use :func:`split_resolved` to
    separate the clean stream from the audit stream (F3 dropUnmappedRelations,
    OrthologRelationLoader.java:83-96).
    """
    dim = F.broadcast(resolution_dim)
    src_dim = dim.select(
        F.col("acc_id").alias("src_other_id"),
        F.col("rgd_id").alias("src_rgd_id"),
        F.col("verdict").alias("src_verdict"),
    )
    dest_dim = dim.select(
        F.col("acc_id").alias("dest_other_id"),
        F.col("rgd_id").alias("dest_rgd_id"),
        F.col("verdict").alias("dest_verdict"),
    )
    out = (
        relations.join(src_dim, "src_other_id", "left")
        .join(dest_dim, "dest_other_id", "left")
        .withColumn("src_verdict", F.coalesce("src_verdict", F.lit(UNMATCHED)))
        .withColumn("dest_verdict", F.coalesce("dest_verdict", F.lit(UNMATCHED)))
    )
    return out


def split_resolved(resolved: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dropped) — clean rows have both ids resolved; dropped rows carry their
    verdicts for the matched/unmatched/multipleMatch/withdrawn audit logs (A6)."""
    ok = F.col("src_rgd_id").isNotNull() & F.col("dest_rgd_id").isNotNull()
    return resolved.filter(ok), resolved.filter(~ok)


def resolution_metrics(resolved: DataFrame) -> DataFrame:
    """matched/unmatched/withdrawn/multiple counters (Loader.java:243-290) as an exact
    groupBy — one row per (side, verdict)."""
    src = resolved.select(F.lit("src").alias("side"), F.col("src_verdict").alias("verdict"))
    dest = resolved.select(
        F.lit("dest").alias("side"), F.col("dest_verdict").alias("verdict")
    )
    return src.unionByName(dest).groupBy("side", "verdict").count()
