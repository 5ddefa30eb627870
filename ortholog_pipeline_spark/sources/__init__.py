"""Sources & sinks (SURVEY.md §2.1): schema'd csv readers for the three external feeds
(HCOP, NCBI gene_orthologs, Alliance combined TSV) and the parquet snapshot state
store that replaces the reference's Oracle tables."""

from ortholog_pipeline_spark.sources.files import (  # noqa: F401
    read_agr_tsv,
    read_hcop,
    read_ncbi_orthologs,
)
from ortholog_pipeline_spark.sources.state import StateStore  # noqa: F401
