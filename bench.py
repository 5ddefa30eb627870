"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a count() so the full plan executes; a warmup query runs
first so JVM/codegen startup isn't billed to the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

from ortholog_pipeline_spark import queries as Q
from ortholog_pipeline_spark.session import get_spark

#: Headline set: one per operator family — aggregation, join+topk, windows, CDC,
#: set-closure, anti-joins, text analytics, dedup (exact/LSH/jaccard), ANN.
HEADLINE = [
    "a4_pricing_summary",
    "j_join_group_topk",
    "j1_resolution_verdict",
    "w1_best_fit_pick",
    "w2_duplicate_cleanup",
    "j7_conflict_verdict",
    "j10_cdc_sync",
    "a2_merge_dup_relations",
    "u4_complement_closure",
    "j8_missing_reverse",
    "j12_no_orthologs_report",
    "stream_tumbling_window",
    "text_token_stats",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="opspark-bench")
    registry = Q.queries()

    # warmup: JVM + codegen + parquet footer reads
    registry["a4_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
