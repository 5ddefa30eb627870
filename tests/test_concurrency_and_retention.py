"""VERDICT r5 items 4 and 8: real concurrent flow execution in one session,
and bounded-disk retention under a long run loop.

Concurrency: r5 added the per-call Observation nonce exactly for the hazard of
two flows sharing a SparkSession; nothing had actually RUN two flows
concurrently. The test drives species + AGR on two threads against separate
stores and asserts both equal their sequential twins — exercising the
scheduler-thread commit path (and the run-txn manifests, which are per store
root) under genuine contention.

Retention: versioned snapshots accumulate per run; the vacuum contract is what
keeps time travel from being an unbounded-storage promise. The loop test pins
that a 50-commit loop with periodic vacuum keeps the version count and
on-disk bytes bounded, and that post-vacuum time travel fails CLEANLY
(FileNotFoundError naming the version, not a parquet scan error).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from ortholog_pipeline_spark.plans import run_agr_load, run_species_load
from ortholog_pipeline_spark.sources.state import StateStore

from test_plans import RAT, RUN_TS, _agr_lines, _relations, _seed_store


def _rows(store, table):
    return sorted(tuple(r) for r in store.read(table).collect())


def test_concurrent_species_and_agr_flows_match_sequential(spark, tmp_path):
    con_sp = _seed_store(spark, tmp_path / "con_sp")
    con_ag = _seed_store(spark, tmp_path / "con_ag")
    seq_sp = _seed_store(spark, tmp_path / "seq_sp")
    seq_ag = _seed_store(spark, tmp_path / "seq_ag")

    rel = _relations(spark)
    lines = _agr_lines(spark)

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_sp = pool.submit(
            run_species_load, con_sp, rel, RUN_TS, RAT, delete_threshold_pct=100.0
        )
        f_ag = pool.submit(
            run_agr_load, con_ag, lines, RUN_TS, delete_threshold_pct=100.0
        )
        res_sp, res_ag = f_sp.result(), f_ag.result()
    assert res_sp.resolved_dropped.count() == 1
    assert res_ag.unresolved.count() == 0

    run_species_load(seq_sp, rel, RUN_TS, RAT, delete_threshold_pct=100.0)
    run_agr_load(seq_ag, lines, RUN_TS, delete_threshold_pct=100.0)

    for table in ("orthologs", "associations"):
        assert _rows(con_sp, table) == _rows(seq_sp, table), table
    for table in ("genes", "rgd_ids", "xrefs", "agr_orthologs"):
        assert _rows(con_ag, table) == _rows(seq_ag, table), table
    # neither run left a pending manifest behind
    assert not os.path.exists(con_sp._pending_path)
    assert not os.path.exists(con_ag._pending_path)


def test_concurrent_species_loads_two_stores(spark, tmp_path):
    """Two instances of the SAME flow concurrently (the driver's per-species
    loop parallelized): per-root run manifests must not cross-talk."""
    a = _seed_store(spark, tmp_path / "a")
    b = _seed_store(spark, tmp_path / "b")
    seq = _seed_store(spark, tmp_path / "seq")
    rel = _relations(spark)

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            run_species_load, a, rel, RUN_TS, RAT, delete_threshold_pct=100.0
        )
        fb = pool.submit(
            run_species_load, b, rel, RUN_TS, RAT, delete_threshold_pct=100.0
        )
        fa.result(), fb.result()
    run_species_load(seq, rel, RUN_TS, RAT, delete_threshold_pct=100.0)

    for table in ("orthologs", "associations"):
        expected = _rows(seq, table)
        assert _rows(a, table) == expected, table
        assert _rows(b, table) == expected, table


def _disk_bytes(store, table):
    total = 0
    for root, _dirs, files in os.walk(os.path.join(store.root, table)):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_retention_loop_keeps_disk_bounded(spark, tmp_path):
    """50 commits with vacuum(keep=2) every 5th: version-dir count stays ≤
    keep+4 (the inter-vacuum accumulation), bytes stay within a small multiple
    of one snapshot, and the final state reads correctly."""
    store = StateStore(spark, str(tmp_path / "loop"))
    df0 = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.write("t", df0)
    high_water = 0
    for i in range(1, 51):
        store.apply_changes(
            "t",
            updates=spark.createDataFrame([(1, i)], "k long, v long"),
            update_key=["k"],
        )
        if i % 5 == 0:
            store.vacuum("t", keep=2)
        n_dirs = sum(
            1 for d in os.listdir(os.path.join(store.root, "t")) if d.startswith("v=")
        )
        high_water = max(high_water, n_dirs)
    assert high_water <= 6, f"version dirs grew to {high_water}"
    store.vacuum("t", keep=2)
    assert _disk_bytes(store, "t") < 4 * 1024 * 1024  # few snapshots of a tiny table
    final = {r.k: r.v for r in store.read("t").collect()}
    assert final[1] == 50 and final[7] == 14
    assert store.current_version("t") == 50


def test_time_travel_fails_cleanly_after_vacuum(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "tt"))
    for i in range(4):
        store.write("t", spark.createDataFrame([(i,)], "v int"))
    removed = store.vacuum("t", keep=2)
    assert removed == [0, 1]
    # retained versions still read
    assert store.read("t", version=2).collect()[0].v == 2
    assert store.read("t", version=3).collect()[0].v == 3
    # vacuumed versions fail with the contract error, not a parquet scan error
    with pytest.raises(FileNotFoundError, match="no retained version 0"):
        store.read("t", version=0)


def test_flow_loop_with_vacuum_stays_correct(spark, tmp_path):
    """The real flow, run repeatedly with retention maintenance between runs:
    the store keeps only the newest snapshots yet every subsequent run still
    reads/commits correctly (idempotent re-runs → stable state)."""
    store = _seed_store(spark, tmp_path / "floop")
    rel = _relations(spark)
    for _ in range(3):
        run_species_load(store, rel, RUN_TS, RAT, delete_threshold_pct=100.0)
        for t in ("orthologs", "associations"):
            store.vacuum(t, keep=2)
    for t in ("orthologs", "associations"):
        n_dirs = sum(
            1 for d in os.listdir(os.path.join(store.root, t)) if d.startswith("v=")
        )
        assert n_dirs <= 2, f"{t} retained {n_dirs} versions"
    # a steady-state re-run is a no-op on the ortholog set (idempotence)
    before = _rows(store, "orthologs")
    run_species_load(store, rel, RUN_TS, RAT, delete_threshold_pct=100.0)
    assert _rows(store, "orthologs") == before
