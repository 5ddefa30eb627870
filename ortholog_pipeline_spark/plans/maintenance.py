"""§3.3 — the `--fixXRefDataSet` maintenance flow.

One ``withColumn`` per table + a changed-row count + snapshot write — the Spark
restatement of the full-scan UPDATE loops at OrthologRelationDao.java:707-767. The
update rule is the reference's exact guard: replace the packed evidence set only when
the sanitized form is STRICTLY shorter (Dao.java:720-732).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from ortholog_pipeline_spark.functions.strings import sanitize_if_shorter
from ortholog_pipeline_spark.sources.state import StateStore


@dataclass
class FixXrefResult:
    n_orthologs_fixed: int
    n_associations_fixed: int
    orthologs_version: int
    associations_version: int


def run_fix_xref_data_set(store: StateStore) -> FixXrefResult:
    orthologs = store.read("orthologs")
    fixed_o = orthologs.withColumn(
        "xref_data_set", sanitize_if_shorter("xref_data_set")
    )
    n_o = (
        fixed_o.join(
            orthologs.select("genetogene_key", F.col("xref_data_set").alias("_old")),
            "genetogene_key",
        )
        .filter(
            F.col("xref_data_set").eqNullSafe(F.col("_old")) == F.lit(False)
        )
        .count()
    )
    o_version = store.write("orthologs", fixed_o)

    associations = store.read("associations")
    is_weak = F.col("assoc_type") == "weak_ortholog"
    fixed_a = associations.withColumn(
        "assoc_subtype",
        F.when(is_weak, sanitize_if_shorter("assoc_subtype")).otherwise(
            F.col("assoc_subtype")
        ),
    )
    n_a = (
        fixed_a.join(
            associations.select("assoc_key", F.col("assoc_subtype").alias("_old")),
            "assoc_key",
        )
        .filter(F.col("assoc_subtype").eqNullSafe(F.col("_old")) == F.lit(False))
        .count()
    )
    a_version = store.write("associations", fixed_a)
    return FixXrefResult(n_o, n_a, o_version, a_version)
