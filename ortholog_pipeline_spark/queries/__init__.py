"""Query registry package: every SURVEY.md §2 operator + the training-data
pipeline extension tier, demonstrated as oracled queries. Split per family
(VERDICT r2 item 2); the registry itself lives in _shared and every family
module registers into it on import."""

# the package's public surface plus the shared SQL fragments consumed by
# out-of-package callers (queries_flows, bench, oracle, tests) — explicit so
# linters and IDEs resolve them (VERDICT r3 item 5; was a globals() copy)
from ortholog_pipeline_spark.queries._shared import (  # noqa: F401
    QueryFn,
    _MINHASH_AB_SQL,
    _POIS24,
    _QUALITY_SQL,
    _STOPS_SQL,
    _TOKS_SQL,
    _lang_hits_sql,
    _t,
    oracle_sql,
    queries,
    register,
)

# family modules register their queries on import (order = original file order)
from ortholog_pipeline_spark.queries import (  # noqa: E402,F401
    ortholog,
    joins,
    windows,
    graph,
    dedup_ann,
    text,
    sampling_stream,
    stats_a,
    stats_b,
    stats_c,
)

# end-to-end flow queries (live one level up; imported last — they read the
# shared fragments re-exported above)
from ortholog_pipeline_spark import queries_flows  # noqa: E402,F401
