"""StateStore versioning semantics: atomic publish, time-travel by version dir,
merge algebra, partitioned layout; plus the sliding-window streaming op in batch
mode."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ortholog_pipeline_spark.sources.state import StateStore
from ortholog_pipeline_spark.streaming import sliding_counts


def test_versioned_publish_and_time_travel(spark, tmp_path):
    store = StateStore(spark, str(tmp_path))
    assert store.current_version("t") == -1

    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    assert store.write("t", df1) == 0
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert store.write("t", df2) == 1
    assert store.current_version("t") == 1
    assert store.read("t").count() == 2
    # prior version stays on disk — time travel by reading its directory
    old = spark.read.parquet(os.path.join(str(tmp_path), "t", "v=0"))
    assert old.count() == 1


def test_apply_changes_algebra(spark, tmp_path):
    store = StateStore(spark, str(tmp_path))
    store.write(
        "t", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    )
    store.apply_changes(
        "t",
        inserts=spark.createDataFrame([(4, "d")], "k int, v string"),
        deletes=spark.createDataFrame([(1,)], "k int"),
        delete_key=["k"],
        updates=spark.createDataFrame([(2, "B")], "k int, v string"),
        update_key=["k"],
    )
    got = {r.k: r.v for r in store.read("t").collect()}
    assert got == {2: "B", 3: "c", 4: "d"}


def test_partitioned_snapshot_prunes(spark, tmp_path):
    store = StateStore(spark, str(tmp_path))
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("sp")
    )
    store.write("t", df, partition_by=["sp"])
    back = store.read("t")
    assert back.count() == 100
    plan = back.filter(F.col("sp") == 2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # partition pruning: the scan reports a partition filter on sp
    assert "PartitionFilters" in plan and "sp" in plan.split("PartitionFilters")[1][:100]


def test_sliding_counts_batch(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 5), 1),
        (dt.datetime(2024, 1, 1, 0, 20), 1),
        (dt.datetime(2024, 1, 1, 1, 40), 2),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = sliding_counts(ev, window_size="1 hour", slide="30 minutes")
    got = {
        (r.window_start, r.user_id): r.n_events for r in out.collect()
    }
    # both user-1 events fall in the [23:30, 00:30) and [00:00, 01:00) windows
    assert got[(dt.datetime(2024, 1, 1, 0, 0), 1)] == 2
    assert got[(dt.datetime(2023, 12, 31, 23, 30), 1)] == 2
    assert got[(dt.datetime(2024, 1, 1, 1, 30), 2)] == 1


def test_vacuum_keeps_current_and_n_newest(spark, tmp_path):
    from ortholog_pipeline_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path))
    df = spark.range(5).withColumnRenamed("id", "k")
    for _ in range(4):
        store.write("t", df)  # v=0..3
    removed = store.vacuum("t", keep=2)
    assert removed == [0, 1]
    assert store.current_version("t") == 3
    assert store.read("t").count() == 5  # current still readable
    import os
    left = sorted(d for d in os.listdir(tmp_path / "t") if d.startswith("v="))
    assert left == ["v=2", "v=3"]
    assert store.vacuum("t", keep=2) == []  # idempotent


def test_compact_rewrites_small_files_and_publishes(spark, tmp_path):
    from ortholog_pipeline_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path))
    # 32-way write of a tiny frame -> many small files
    df = spark.range(1000).withColumnRenamed("id", "k").repartition(32)
    store.write("t", df)
    import glob
    v0_files = glob.glob(str(tmp_path / "t" / "v=0" / "*.parquet"))
    assert len(v0_files) > 8
    v = store.compact("t")
    assert v == 1 and store.current_version("t") == 1
    v1_files = glob.glob(str(tmp_path / "t" / "v=1" / "*.parquet"))
    assert len(v1_files) == 1  # tiny snapshot -> one right-sized file
    assert store.read("t").count() == 1000


def test_time_travel_read_and_history(spark, tmp_path):
    """Every retained version stays readable by number; history lists them
    oldest-first with the current flag; vacuumed versions raise."""
    import pytest
    from pyspark.sql import functions as F

    from ortholog_pipeline_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path / "tt"))
    store.write("t", spark.range(3).select(F.col("id").alias("k")))
    store.apply_changes("t", inserts=spark.range(3, 5).select(F.col("id").alias("k")))
    store.apply_changes("t", inserts=spark.range(5, 6).select(F.col("id").alias("k")))

    assert store.read("t").count() == 6
    assert store.read("t", version=0).count() == 3
    assert store.read("t", version=1).count() == 5

    hist = store.history("t")
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["current"] for h in hist] == [False, False, True]
    assert all(h["bytes"] > 0 for h in hist)

    store.vacuum("t", keep=1)
    with pytest.raises(FileNotFoundError):
        store.read("t", version=0)
    assert store.read("t", version=2).count() == 6


def test_apply_changes_schema_evolution(spark, tmp_path):
    """evolve_schema=True admits inserts with a NEW column: old rows read NULL
    for it, and the evolved schema persists; without the flag the new column
    is dropped by the align-to-current projection."""
    from pyspark.sql import functions as F

    from ortholog_pipeline_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path / "ev"))
    store.write("t", spark.range(2).select(F.col("id").alias("k")))
    newrows = spark.range(2, 4).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    store.apply_changes("t", inserts=newrows, evolve_schema=True)
    got = store.read("t")
    assert set(got.columns) == {"k", "tag"}
    vals = {r.k: r.tag for r in got.collect()}
    assert vals[0] is None and vals[2] == "x"


def test_forget_keys_erases_history(spark, tmp_path):
    """Right-to-be-forgotten: the subject's rows leave the current snapshot
    AND every retained time-travel version; the audit reports zero residual."""
    from pyspark.sql import Row

    store = StateStore(spark, str(tmp_path / "state"))
    rows = [Row(user_id=i, payload=f"p{i}") for i in range(10)]
    store.write("profiles", spark.createDataFrame(rows))
    # a second version so history exists
    store.apply_changes(
        "profiles",
        inserts=spark.createDataFrame([Row(user_id=99, payload="p99")]),
    )
    assert store.read("profiles").count() == 11

    doomed = spark.createDataFrame([Row(user_id=3), Row(user_id=99)])
    audit = store.forget_keys("profiles", doomed, ["user_id"])
    assert audit["rows_removed"] == 2
    assert audit["residual_rows"] == 0
    left = {r.user_id for r in store.read("profiles").collect()}
    assert 3 not in left and 99 not in left and len(left) == 9
    # older versions that contained the subject are gone from disk
    assert audit["versions_purged"], "history must be truncated"


def test_append_only_fast_path_links_old_files(spark, tmp_path):
    """An insert-only apply_changes must NOT rewrite existing data: the new
    version's pre-existing data files are hardlinks of the previous version's
    (same inode), only the insert files are new, and both versions read
    back exactly their own row sets (time travel unaffected)."""
    import os

    from pyspark.sql import Row

    from ortholog_pipeline_spark.sources.state import StateStore

    store = StateStore(spark, str(tmp_path / "state"))
    store.write(
        "t", spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(5)])
    )
    v0_dir = tmp_path / "state" / "t" / "v=0"
    v0_inodes = {
        f: os.stat(v0_dir / f).st_ino
        for f in os.listdir(v0_dir)
        if not f.startswith(("_", "."))
    }

    store.apply_changes(
        "t", inserts=spark.createDataFrame([Row(k=9, v="v9")])
    )
    v1_dir = tmp_path / "state" / "t" / "v=1"
    shared = {
        f
        for f in os.listdir(v1_dir)
        if f in v0_inodes and os.stat(v1_dir / f).st_ino == v0_inodes[f]
    }
    assert shared == set(v0_inodes), "old data files must be linked, not rewritten"

    assert {r.k for r in store.read("t").collect()} == {0, 1, 2, 3, 4, 9}
    assert {r.k for r in store.read("t", version=0).collect()} == {0, 1, 2, 3, 4}
    # vacuuming the old version must not corrupt the linked current one
    store.apply_changes("t", inserts=spark.createDataFrame([Row(k=10, v="va")]))
    store.vacuum("t", keep=1)
    assert {r.k for r in store.read("t").collect()} == {0, 1, 2, 3, 4, 9, 10}


def test_next_surrogate_keys_is_lazy_and_dense(spark):
    """Keygen must not run Spark jobs at plan-CONSTRUCTION time — it used to
    collect bucket counts eagerly, which materialized the entire insert
    lineage once per keygen call before the real action ran (VERDICT r3 plan
    audit). The in-plan offsets must still mint exactly [start+1, start+n]."""
    from ortholog_pipeline_spark.sources.state import next_surrogate_keys

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup())
    df = spark.range(1000).selectExpr("id AS a", "CAST(id % 7 AS INT) AS b")
    keyed = next_surrogate_keys(df, 100, "k")
    assert len(tracker.getJobIdsForGroup()) == before, (
        "next_surrogate_keys ran a Spark job at plan-construction time"
    )
    assert sorted(r.k for r in keyed.collect()) == list(range(101, 1101))
