"""Round-10 optimization profiler (guide §1): isolate registry entries with the
noop sink, capture .explain("formatted"), and summarize plan shape (Exchange
count, join strategies, Python-boundary nodes).

Usage:
    python tools/profile_r10.py NAME [NAME ...]        # time + plan per entry
    python tools/profile_r10.py --plans-only NAME ...  # no timing, just plans
    python tools/profile_r10.py --out plans/r10 --suffix before NAME ...

Timing methodology: one untimed warmup run (codegen/JIT), then best-of-3 with
the noop sink (df.write.format("noop") — computes every column of every row,
guide §1.4) so the measurement is the computation, not the sink or count()'s
column pruning. Jobs are labelled via setJobDescription (guide §1.5).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ortholog_pipeline_spark import queries as Q
from ortholog_pipeline_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_shape(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", text)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", text)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", text)),
        "bnl_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", text)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", text)),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", text, re.M)),
        "python_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)\b", text)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text))),
        "scans": len(re.findall(r"Scan parquet", text)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--out", default=None, help="directory to write <name>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="opspark-profile-r10")
    registry = Q.queries()
    # warmup: JVM + codegen + parquet footers (same as bench)
    registry["a4_pricing_summary"](spark, args.sf_dir).count()

    results = {}
    for name in args.names:
        if name not in registry:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        df = registry[name](spark, args.sf_dir)
        text = plan_text(df)
        shape = plan_shape(text)
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(text)
        entry = {"shape": shape}
        if not args.plans_only:
            spark.sparkContext.setJobDescription(f"r10-profile:{name}")
            # untimed warmup (plan-specific codegen)
            registry[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            best, runs = float("inf"), []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                registry[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                runs.append(round(dt, 3))
                best = min(best, dt)
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            spark.sparkContext._jvm.System.gc()
            entry["noop_best_s"] = round(best, 3)
            entry["noop_runs_s"] = runs
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    print(json.dumps({"profile": results}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
