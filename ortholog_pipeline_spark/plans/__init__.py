"""End-to-end flows (SURVEY.md §3): the reference's three entry points composed from
the operator layer, each a single declarative Spark DAG over snapshot state.

* ``species_load``  — §3.1 `--species <name>`: HCOP/NCBI parse → J1 resolution →
  A1/A2 group-merge → U4 closure → 4-tier cascade + W1 best-fit → J7 conflict
  verdicts → ortholog/association sync with guards.
* ``agr_load``      — §3.2 `--agrOrthologs`: Alliance TSV → curie/symbol resolution
  cascade → AGR upsert on the 3-col key → stale handling under the churn cap.
* ``maintenance``   — §3.3 `--fixXRefDataSet`: C2 re-canonicalization of packed
  evidence sets, update-if-strictly-shorter.
"""

from ortholog_pipeline_spark.plans.agr_load import check_agr_freshness, run_agr_load
from ortholog_pipeline_spark.plans.maintenance import run_fix_xref_data_set
from ortholog_pipeline_spark.plans.ortho_tool import (
    read_gene_list,
    run_ortho_tool,
    write_report,
)
from ortholog_pipeline_spark.plans.homologene import run_homologene_load
from ortholog_pipeline_spark.plans.species_load import run_species_load
from ortholog_pipeline_spark.plans.validate import run_state_validation

__all__ = [
    "run_homologene_load",
    "run_species_load",
    "run_agr_load",
    "check_agr_freshness",
    "run_fix_xref_data_set",
    "run_state_validation",
    "read_gene_list",
    "run_ortho_tool",
    "write_report",
]
