"""Column-expression helpers. Everything here returns pyspark Columns built from
built-in functions so it stays inside Catalyst/whole-stage codegen — the reference's
string helpers (SURVEY.md §2.8 C1-C14) and the text/vector analytics used by the
training-data operators."""

from ortholog_pipeline_spark.functions.strings import (  # noqa: F401
    evidence_count,
    pipe_set_sort,
    rgd_curie_suffix,
    sanitize_evidence_set,
    source_priority,
    transliterate_greek,
    yes_no_to_yn,
)
