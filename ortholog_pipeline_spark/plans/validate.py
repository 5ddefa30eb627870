"""State-snapshot validation: the pre-promotion data-quality gate.

Runs the declarative quality suite (`operators/quality`) over the engine's own
state tables, checking the invariants the reference enforces operationally
(SURVEY.md §5: key uniqueness, referential integrity to genes, status domain)
plus the structural completeness a snapshot must have before a load flow trusts
it. One conditional-agg scan per table + two anti-join counts; the report is a
tall (check, metric, passed) frame and `ok` is the conjunction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ortholog_pipeline_spark.operators import quality as QC
from ortholog_pipeline_spark.sources.state import StateStore


@dataclass
class StateValidationResult:
    report: DataFrame
    ok: bool


def run_state_validation(store: StateStore) -> StateValidationResult:
    genes = store.read("genes")
    rgd_ids = store.read("rgd_ids")
    orthologs = store.read("orthologs")
    associations = store.read("associations")

    o_checks = QC.compile_checks(
        completeness=["src_rgd_id", "dest_rgd_id", "xref_data_src"],
        unique=["genetogene_key"],
    )
    g_checks = QC.compile_checks(completeness=["rgd_id"], unique=["rgd_id"])
    r_checks = QC.compile_checks(
        completeness=["rgd_id"],
        unique=["rgd_id"],
        accepted=[("object_status", ("ACTIVE", "WITHDRAWN", "RETIRED"))],
    )
    report = QC.validation_suite(
        [
            QC.single_pass_report(orthologs, o_checks),
            QC.single_pass_report(genes, g_checks),
            QC.single_pass_report(rgd_ids, r_checks),
            QC.referential_report(orthologs, genes, "src_rgd_id", "rgd_id"),
            QC.referential_report(orthologs, genes, "dest_rgd_id", "rgd_id"),
            QC.referential_report(associations, genes, "master_rgd_id", "rgd_id"),
        ]
    )
    rows = report.collect()
    return StateValidationResult(
        report=report, ok=all(r.passed for r in rows)
    )
