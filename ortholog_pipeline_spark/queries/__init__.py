"""Query registry package: every SURVEY.md §2 operator + the training-data
pipeline extension tier, demonstrated as oracled queries. Split per family
(VERDICT r2 item 2); the registry itself lives in _shared and every family
module registers into it on import."""

from ortholog_pipeline_spark.queries import _shared as _S

globals().update(
    {k: v for k, v in vars(_S).items() if k not in ("__name__", "__doc__", "__file__", "__spec__", "__loader__", "__package__", "__builtins__")}
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
