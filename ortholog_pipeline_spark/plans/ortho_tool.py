"""OrthoTool report flow — the reference's side tool that annotates a gene-list
file with its AGR mouse/human ortholog partners (OrthoTool.java:35-166).

Input: a headerless TSV whose first four columns are rat RGD id, rat gene id,
current symbol, current name — values possibly wrapped in double quotes (S6,
OrthoTool.java:119-124). Lines whose first column is not numeric are skipped
(OrthoTool.java:40-44 swallows the NumberFormatException — that is how the
reference skips its header line).

Per input gene the reference queries ``agr_orthologs`` joined to ``genes`` per
species (OrthoTool.java:134-137), keeps only mutual-best partners when any exist
(W5, OrthoTool.java:150-164), then ZIPS the mouse and human partner lists row by
row — the do-while at OrthoTool.java:73-109 emits max(|mouse|, |human|, 1) report
rows per gene, pairing the i-th mouse partner with the i-th human partner and
leaving the shorter side blank. Spark restatement: rank partners per (gene,
species) with a partitioned ``row_number``, full-outer join the two ranked sides on
(gene, rank), then left-join back to the input so partnerless genes still emit
their one blank row. Partner order inside a species is the DB return order in the
reference (undefined); the engine pins ascending partner rgd_id so the report is
deterministic.

Scale shape: the gene list is small → broadcast it into both partner lookups so
the big ``agr_orthologs`` snapshot is filtered map-side and never shuffles; the
rank windows partition by (gene, species-partner set) — no global window. The
report itself (symbols for rat/mouse/human) deviates from the reference only in
omitting gene *name* (the engine's genes table carries symbols, not names).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ortholog_pipeline_spark.functions.strings import strip_quotes
from ortholog_pipeline_spark.operators.bestfit import prefer_mutual_best
from ortholog_pipeline_spark.schemas import SPECIES
from ortholog_pipeline_spark.sources.state import StateStore

MOUSE = SPECIES["mouse"][0]
HUMAN = SPECIES["human"][0]


@dataclass
class OrthoToolResult:
    report: DataFrame
    n_mouse_orthologs: int
    n_human_orthologs: int


def read_gene_list(spark: SparkSession, path: str) -> DataFrame:
    """S6 — the gene-list report input: 4+ tab-separated columns, quote-wrapped
    values, non-numeric first column ⇒ line skipped (OrthoTool.java:37-48)."""
    # spark.read.csv names positional columns _c0.._cN; only the first four are
    # used (a shorter line errors in the reference too — cols[3] at OrthoTool:47)
    raw = spark.read.option("sep", "\t").option("header", "false").csv(path)
    return (
        raw.select(
            strip_quotes(F.col("_c0")).try_cast("int").alias("rat_rgd_id"),
            strip_quotes(F.col("_c1")).try_cast("int").alias("rat_gene_id"),
            strip_quotes(F.col("_c2")).alias("rat_symbol"),
            strip_quotes(F.col("_c3")).alias("rat_name"),
        )
        .filter(F.col("rat_rgd_id").isNotNull())
    )


def _ranked_partners(
    gene_list: DataFrame,
    agr: DataFrame,
    genes: DataFrame,
    species_type_key: int,
    prefix: str,
) -> DataFrame:
    """AGR partners of each listed gene for one species, mutual-best-filtered (W5)
    and ranked 1..n per gene by partner rgd_id (the zip position)."""
    partners = (
        agr.join(
            F.broadcast(gene_list.select(F.col("rat_rgd_id"))),
            agr["gene_rgd_id_1"] == F.col("rat_rgd_id"),
        )
        .join(
            genes.filter(F.col("species_type_key") == species_type_key),
            agr["gene_rgd_id_2"] == genes["rgd_id"],
        )
        .select(
            "rat_rgd_id",
            F.col("rgd_id").alias(f"{prefix}_rgd_id"),
            F.col("gene_symbol").alias(f"{prefix}_symbol"),
            "is_best_score",
            "is_best_rev_score",
        )
    )
    best = prefer_mutual_best(partners, ["rat_rgd_id"])
    w = Window.partitionBy("rat_rgd_id").orderBy(F.col(f"{prefix}_rgd_id").asc())
    return best.select(
        "rat_rgd_id",
        f"{prefix}_rgd_id",
        f"{prefix}_symbol",
    ).withColumn("rnk", F.row_number().over(w))


def run_ortho_tool(
    store: StateStore, gene_list: DataFrame
) -> OrthoToolResult:
    """Build the per-gene mouse/human partner report (OrthoTool.java:35-117)."""
    agr = store.read("agr_orthologs")
    genes = store.read("genes")

    mouse = _ranked_partners(gene_list, agr, genes, MOUSE, "mouse")
    human = _ranked_partners(gene_list, agr, genes, HUMAN, "human")

    # the do-while zip: row i pairs mouse[i] with human[i]; full outer keeps the
    # longer side's tail (OrthoTool.java:73-109)
    m = mouse.select(
        F.col("rat_rgd_id").alias("_m_gene"),
        F.col("rnk").alias("_m_rnk"),
        "mouse_rgd_id",
        "mouse_symbol",
    )
    h = human.select(
        F.col("rat_rgd_id").alias("_h_gene"),
        F.col("rnk").alias("_h_rnk"),
        "human_rgd_id",
        "human_symbol",
    )
    zipped = m.join(
        h,
        (F.col("_m_gene") == F.col("_h_gene"))
        & (F.col("_m_rnk") == F.col("_h_rnk")),
        "full_outer",
    ).select(
        F.coalesce(F.col("_m_gene"), F.col("_h_gene")).alias("rat_rgd_id"),
        "mouse_rgd_id",
        "mouse_symbol",
        "human_rgd_id",
        "human_symbol",
    )

    report = (
        gene_list.join(zipped, "rat_rgd_id", "left")
        .select(
            "rat_rgd_id",
            "rat_gene_id",
            "rat_symbol",
            "rat_name",
            "mouse_rgd_id",
            "mouse_symbol",
            "human_rgd_id",
            "human_symbol",
        )
    )
    counts = report.agg(
        F.count("mouse_rgd_id").alias("m"), F.count("human_rgd_id").alias("h")
    ).collect()[0]
    return OrthoToolResult(
        report=report,
        n_mouse_orthologs=counts.m,
        n_human_orthologs=counts.h,
    )


def write_report(result: OrthoToolResult, out_path: str) -> None:
    """TSV report sink (OrthoTool.java:30, 79-108): tab-separated, blank cells for
    the missing side."""
    (
        result.report.orderBy("rat_rgd_id", "mouse_rgd_id", "human_rgd_id")
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        .csv(out_path)
    )
