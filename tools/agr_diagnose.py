"""Stage-level diagnosis of the AGR flow's extra-decade growth (VERDICT r9
ask 1).

The committed SF10_PROBES r9 receipt fit t = a + b*s on the 1x/10x anchors
and read the 300x point 42% above the line (`linear_law_holds: false`) —
but the 10x-1x delta (1.79 s) is noise-scale against the 6.4 s fixed cost,
so the slope is anchor-fragile (judge: re-anchored on 10x/100x the excess
is +11%). This tool answers the ENGINE half of the question with evidence
the wall clock alone can't give:

- per-leg wall split into snapshot-WRITE wall (StateStore.write /
  _append_version, wrapped) vs everything else (parse → resolve →
  full-outer verdicts → counts);
- per-stage Spark metrics over the measured run via the UI REST API
  (executorRunTime, shuffle read/write, memory/disk spill, output bytes),
  summed and top-N by run time — a super-linear term shows up as spill
  appearing at 300x but not 100x, or one stage's time growing faster than
  its input;
- executor storage/disk use after the run (localCheckpoint blocks for the
  45M-row verdicts frame falling out of memory would surface here).

Legs: 100x at base partitions (the committed 100x config), 300x under the
hand-scaled partition rule (the committed 300x config, 96), and optionally
300x under cluster-profile-style AQE sizing (high initialPartitionNum +
coalesce — VERDICT r9 ask 7: does the profile's rule reproduce the
hand-tuned number?).

Run (~10-15 min):  SPARK_GRAFT_DRIVER_MEM=24g python tools/agr_diagnose.py
"""

from __future__ import annotations

import argparse
import gc
import hashlib
import json
import os
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _src_tag(src: str) -> str:
    """Cache-dir tag that keys on the SOURCE, not just the scale (ADVICE r9:
    a scale-only key silently reuses another source's materialized lines)."""
    return hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:10]


def materialize_lines(spark, src: str, scale: int) -> str:
    """The sf10_probes 300x construction: per-replica algorithms suffix (the
    methods_matched key third column differs per replica, so the upsert key
    space genuinely scales), materialized to parquet and cached across runs."""
    from ortholog_pipeline_spark.queries_flows import _agr_world

    path = f"/tmp/agr_lines_{_src_tag(src)}_{scale}x"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        al1 = _agr_world(spark, src)["lines"]
        parts = [al1] + [
            al1.withColumn(
                "algorithms", F.concat(F.col("algorithms"), F.lit(f"|X{i}"))
            )
            for i in range(1, scale)
        ]
        lines = parts[0]
        for p in parts[1:]:
            lines = lines.unionByName(p)
        lines.write.mode("overwrite").parquet(path)
    return path


def rest_json(spark, suffix: str):
    app = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app}/{suffix}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_snapshot(spark) -> dict[int, dict]:
    out = {}
    for st in rest_json(spark, "stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


STAGE_FIELDS = (
    "executorRunTime",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "inputBytes",
    "outputBytes",
)


def diff_stages(before: dict, after: dict) -> dict:
    new = [st for k, st in after.items() if k not in before]
    agg = {f: sum(int(st.get(f) or 0) for st in new) for f in STAGE_FIELDS}
    agg["n_stages"] = len(new)
    top = sorted(new, key=lambda s: -int(s.get("executorRunTime") or 0))[:6]
    agg["top_stages"] = [
        {
            "stageId": st["stageId"],
            "runTime_s": round(int(st.get("executorRunTime") or 0) / 1e3, 1),
            "shuffleRead_mb": round(int(st.get("shuffleReadBytes") or 0) / 2**20),
            "shuffleWrite_mb": round(int(st.get("shuffleWriteBytes") or 0) / 2**20),
            "spill_disk_mb": round(int(st.get("diskBytesSpilled") or 0) / 2**20),
            "output_mb": round(int(st.get("outputBytes") or 0) / 2**20),
            "name": (st.get("name") or "")[:90],
        }
        for st in top
    ]
    return agg


class WriteWallMeter:
    """Wrap StateStore.write + _append_version to split snapshot-write wall
    out of the flow's total (both staged apply_changes paths funnel through
    these two)."""

    def __init__(self):
        from ortholog_pipeline_spark.sources.state import StateStore

        self.cls = StateStore
        self.walls: list[tuple[str, float]] = []
        self._orig_write = StateStore.write
        self._orig_append = StateStore._append_version

    def __enter__(self):
        meter = self

        def timed_write(store, table, df, partition_by=None, publish=True):
            t0 = time.perf_counter()
            try:
                return meter._orig_write(
                    store, table, df, partition_by=partition_by, publish=publish
                )
            finally:
                meter.walls.append((table, time.perf_counter() - t0))

        def timed_append(store, table, inserts, publish=True):
            t0 = time.perf_counter()
            try:
                return meter._orig_append(store, table, inserts, publish=publish)
            finally:
                meter.walls.append((table + "+append", time.perf_counter() - t0))

        self.cls.write = timed_write
        self.cls._append_version = timed_append
        return self

    def __exit__(self, *exc):
        self.cls.write = self._orig_write
        self.cls._append_version = self._orig_append


def run_leg(spark, src: str, scale: int, shuffle_partitions: int | str,
            aqe_initial: int | None = None) -> dict:
    from ortholog_pipeline_spark.plans.agr_load import run_agr_load
    from ortholog_pipeline_spark.queries_flows import (
        RUN_TS,
        _agr_world,
        _seed_store,
    )

    aworld = _agr_world(spark, src)
    lines = spark.read.parquet(materialize_lines(spark, src, scale))
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    base_initial = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", None
    )
    leg = {
        "scale": scale,
        "shuffle_partitions": shuffle_partitions,
        "aqe_initial_partition_num": aqe_initial,
        "runs": [],
    }
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        if aqe_initial is not None:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(aqe_initial),
            )

        def _once():
            st = _seed_store(
                spark, aworld, "agr_diag_", cache_key=f"agr_diag:{src}"
            )
            run_agr_load(st, lines, RUN_TS, delete_threshold_pct=100.0)

        for i in range(2):
            before = stage_snapshot(spark)
            with WriteWallMeter() as meter:
                t0 = time.perf_counter()
                _once()
                wall = time.perf_counter() - t0
            after = stage_snapshot(spark)
            write_wall = sum(w for _, w in meter.walls)
            run = {
                "wall_s": round(wall, 2),
                "snapshot_write_wall_s": round(write_wall, 2),
                "compute_wall_s": round(wall - write_wall, 2),
                "writes": [
                    {"table": t, "wall_s": round(w, 2)} for t, w in meter.walls
                ],
                "stages": diff_stages(before, after),
            }
            leg["runs"].append(run)
            gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
        execs = rest_json(spark, "executors")
        leg["executor_storage"] = [
            {
                "id": e["id"],
                "memoryUsed_mb": round(int(e.get("memoryUsed") or 0) / 2**20),
                "diskUsed_mb": round(int(e.get("diskUsed") or 0) / 2**20),
                "maxMemory_mb": round(int(e.get("maxMemory") or 0) / 2**20),
            }
            for e in execs
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        if aqe_initial is not None:
            if base_initial is None:
                spark.conf.unset(
                    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
                )
            else:
                spark.conf.set(
                    "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                    base_initial,
                )
    return leg


LEGS = {
    # the committed configs: 100x at base partitions, 300x at the hand
    # rule, and the cluster-profile-style AQE sizing (VERDICT r9 ask 7)
    "100x_base": (100, "base", None),
    "300x_hand": (300, "3x_base", None),
    "300x_cluster": (300, 2000, 2000),
}


def run_one(leg_name: str, src: str, out_path: str) -> int:
    """One leg in its own process: a fresh JVM per leg keeps the 45M-row
    localCheckpoint blocks of one leg from colliding with the next leg's
    cache entries (an in-session 300x repeat after a finished 100x leg lost
    checkpoint blocks to the cross-run ContextCleaner race)."""
    from ortholog_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"agr-diagnose-{leg_name}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale, parts, aqe_initial = LEGS[leg_name]
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if parts == "base":
        parts = base
    elif parts == "3x_base":
        parts = max(base, 32) * 3
    leg = run_leg(spark, src, scale, parts, aqe_initial=aqe_initial)
    leg["name"] = leg_name
    leg["driver_heap_max_bytes"] = int(
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    )
    with open(out_path, "w") as f:
        json.dump(leg, f, indent=1)
    spark.stop()
    return 0


def main() -> int:
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/agr_diagnose.json")
    ap.add_argument("--leg", choices=sorted(LEGS), default=None,
                    help="internal: run a single leg in this process")
    ap.add_argument("--skip-cluster-leg", action="store_true")
    args = ap.parse_args()

    if args.leg:
        return run_one(args.leg, args.src, args.out)

    legs = []
    names = ["100x_base", "300x_hand"]
    if not args.skip_cluster_leg:
        names.append("300x_cluster")
    for name in names:
        part = f"/tmp/agr_diag_leg_{name}.json"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--src", args.src,
             "--leg", name, "--out", part],
            cwd=REPO,
        )
        if proc.returncode == 0 and os.path.exists(part):
            with open(part) as f:
                legs.append(json.load(f))
        else:
            legs.append({"name": name, "error": f"leg exited {proc.returncode}"})
    out = {"src": args.src, "legs": legs}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
