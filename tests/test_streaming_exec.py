"""TRUE streaming execution tests (VERDICT r2 item 4): the streaming plans are
driven through an actual StreamingQuery (file source → memory sink,
``.start()`` + ``processAllAvailable()``), not `F.window` over batch frames.

Pinned per operator:
  (a) dropped-late semantics — an event older than the watermark never mutates
      an already-finalized window / re-emits a dedup key;
  (b) bounded state — the state store row count tracks open windows/keys and
      SHRINKS when the watermark passes them, across real micro-batches.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ortholog_pipeline_spark.streaming.joins import interval_equi_join
from ortholog_pipeline_spark.streaming.windows import dedup_stream, tumbling_agg

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path: str, rows, schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _state_rows(q) -> int:
    p = q.lastProgress
    ops = (p or {}).get("stateOperators") or []
    return sum(op.get("numRowsTotal", 0) for op in ops)


@pytest.fixture()
def land(tmp_path):
    return tmp_path


def test_tumbling_window_drops_late_events(spark, land):
    schema = "ts timestamp, event_type string, value double"
    src_dir, ck = str(land / "src"), str(land / "ck")
    _write(spark, src_dir, [(T0, "a", 1.0), (T0 + timedelta(seconds=5), "a", 2.0),
                            (T0 + timedelta(seconds=12), "a", 3.0)], schema)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = tumbling_agg(stream, window_size="10 seconds", watermark="5 seconds")
    q = (
        out.writeStream.format("memory").queryName("tumb")
        .outputMode("append").option("checkpointLocation", ck).start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark past both early windows
        _write(spark, src_dir, [(T0 + timedelta(seconds=30), "a", 4.0)], schema)
        q.processAllAvailable()
        emitted = {
            r["window_start"].second: r["n_events"]
            for r in spark.table("tumb").collect()
        }
        assert emitted.get(0) == 2 and emitted.get(10) == 1
        state_open = _state_rows(q)

        # a LATE event for the already-finalized [0,10) window: watermark is
        # ~25s, so it must be dropped — the finalized window never re-emits
        _write(spark, src_dir, [(T0 + timedelta(seconds=2), "a", 99.0)], schema)
        # and an in-watermark event for the still-open [20,30) window
        _write(spark, src_dir, [(T0 + timedelta(seconds=22), "a", 5.0)], schema)
        q.processAllAvailable()
        # close everything
        _write(spark, src_dir, [(T0 + timedelta(seconds=60), "a", 6.0)], schema)
        q.processAllAvailable()
        rows = {
            r["window_start"].second: (r["n_events"], r["sum_value"])
            for r in spark.table("tumb").collect()
        }
        # [0,10) emitted ONCE with the on-time counts — the late 99.0 vanished
        assert rows[0] == (2, 3.0)
        # the 22s event was late-but-inside-watermark: its window kept it
        assert rows[20] == (1, 5.0)
        assert rows[30] == (1, 4.0)
        # (b) state bounded: after the watermark passed the early windows, the
        # state holds only the open tail, no monotone growth
        assert _state_rows(q) <= state_open + 1
    finally:
        q.stop()


def test_dedup_stream_bounded_state_and_reemit(spark, land):
    schema = "ts timestamp, k string"
    src_dir, ck = str(land / "src"), str(land / "ck")
    _write(spark, src_dir, [(T0, "x"), (T0 + timedelta(seconds=2), "x"),
                            (T0 + timedelta(seconds=3), "y")], schema)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = dedup_stream(stream, key_cols=["k"], watermark="10 seconds")
    q = (
        out.writeStream.format("memory").queryName("dedup")
        .outputMode("append").option("checkpointLocation", ck).start()
    )
    try:
        q.processAllAvailable()
        # in-watermark duplicate: dropped
        _write(spark, src_dir, [(T0 + timedelta(seconds=5), "x")], schema)
        q.processAllAvailable()
        assert spark.table("dedup").filter(F.col("k") == "x").count() == 1
        state_held = _state_rows(q)
        assert state_held >= 2  # x and y keys held

        # advance the watermark far past both keys' event times → state evicted
        _write(spark, src_dir, [(T0 + timedelta(seconds=100), "z")], schema)
        q.processAllAvailable()
        _write(spark, src_dir, [(T0 + timedelta(seconds=101), "w")], schema)
        q.processAllAvailable()
        # (b) x/y state dropped — the store holds only the fresh tail keys
        assert _state_rows(q) <= state_held

        # a NEW x after its watermark window expired is a fresh key: re-emitted
        # (the documented dropDuplicatesWithinWatermark contract — state is
        # bounded, so guarantees only span the watermark horizon)
        _write(spark, src_dir, [(T0 + timedelta(seconds=102), "x")], schema)
        q.processAllAvailable()
        assert spark.table("dedup").filter(F.col("k") == "x").count() == 2
    finally:
        q.stop()


def test_interval_join_matches_and_evicts_state(spark, land):
    lschema = "ts timestamp, user_id long, amount double"
    rschema = "ts timestamp, user_id long, page string"
    ldir, rdir, ck = str(land / "l"), str(land / "r"), str(land / "ck")
    # clicks at t0 and t0+5 for user 1; unrelated user 2 click
    _write(spark, rdir, [(T0, 1, "a"), (T0 + timedelta(seconds=5), 1, "b"),
                         (T0 + timedelta(seconds=1), 2, "c")], rschema)
    # purchase at t0+8 for user 1 → must join both user-1 clicks (10s lookback)
    _write(spark, ldir, [(T0 + timedelta(seconds=8), 1, 9.99)], lschema)
    lstream = spark.readStream.schema(lschema).parquet(ldir)
    rstream = spark.readStream.schema(rschema).parquet(rdir)
    out = interval_equi_join(
        lstream, rstream, key="user_id", lookback="10 seconds",
        watermark="10 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("ij")
        .outputMode("append").option("checkpointLocation", ck).start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table("ij").collect()
        assert sorted(r["r_page"] for r in rows) == ["a", "b"]
        state_full = _state_rows(q)
        assert state_full > 0

        # advance both watermarks far ahead; buffered rows must be evicted
        far = T0 + timedelta(seconds=300)
        _write(spark, rdir, [(far, 9, "zz")], rschema)
        _write(spark, ldir, [(far, 8, 1.0)], lschema)
        q.processAllAvailable()
        _write(spark, rdir, [(far + timedelta(seconds=1), 9, "zz2")], rschema)
        _write(spark, ldir, [(far + timedelta(seconds=1), 8, 2.0)], lschema)
        q.processAllAvailable()
        # (b) the t0-era buffered rows are gone from the join state
        assert _state_rows(q) <= state_full
        # (a) a left row whose lookback window lies entirely before the
        # watermark produces no resurrected matches
        _write(spark, ldir, [(T0 + timedelta(seconds=9), 1, 5.0)], lschema)
        q.processAllAvailable()
        assert spark.table("ij").filter(F.col("l_amount") == 5.0).count() == 0
    finally:
        q.stop()


def test_foreach_batch_sync_checkpoint_recovery(spark, land):
    """Kill-and-resume (VERDICT r3 item 6): a foreach_batch_sync query dies
    mid-stream AFTER committing its first micro-batch; a restart from the same
    checkpoint must (a) never re-apply the committed batch — its rows do not
    re-enter foreachBatch — and (b) leave no gap: the uncommitted batch is
    re-planned and the final snapshot holds every key exactly once."""
    from ortholog_pipeline_spark.sources.state import StateStore
    from ortholog_pipeline_spark.streaming.sync import foreach_batch_sync

    schema = "k int, v string"
    src, ck = str(land / "src"), str(land / "ck")
    store = StateStore(spark, str(land / "state"))
    # two files -> two micro-batches under maxFilesPerTrigger=1
    _write(spark, src, [(1, "a1"), (2, "a2")], schema)
    _write(spark, src, [(3, "b1"), (4, "b2")], schema)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # phase 1: crash on the SECOND batch (the first is already committed)
    calls = {"n": 0}

    def crash_on_second(df):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected mid-stream crash")
        return df

    q1 = foreach_batch_sync(
        stream(), store, "t", ["k"], ["v"], ck, transform=crash_on_second
    )
    with pytest.raises(Exception, match="injected mid-stream crash"):
        q1.awaitTermination()
    struct = spark.createDataFrame([], schema).schema
    mid = {r.k for r in store.read("t", struct).collect()}
    assert len(mid) == 2, "exactly one micro-batch must have committed"

    # phase 2: restart from the SAME checkpoint, recording what replays
    replayed: list[set] = []

    def record(df):
        replayed.append({r.k for r in df.collect()})
        return df

    q2 = foreach_batch_sync(stream(), store, "t", ["k"], ["v"], ck, transform=record)
    q2.awaitTermination(300)

    final = {(r.k, r.v) for r in store.read("t", struct).collect()}
    # (b) no gap, no duplicate: all four keys exactly once, content intact
    assert final == {(1, "a1"), (2, "a2"), (3, "b1"), (4, "b2")}
    # (a) the committed batch never re-entered the sink
    seen_again = set().union(*replayed) if replayed else set()
    assert seen_again == {1, 2, 3, 4} - mid


def test_engine_default_state_store_is_rocksdb_changelog(spark, land):
    """VERDICT r8 ask 1: the 100 TB-state store config (RocksDB provider +
    changelog checkpointing) must be the ENGINE's streaming default, not a
    bench-probe-only setting — the r8 probe measured snapshot-mode commit
    cost growing 25-65% with state while changelog checkpointing stays flat.
    Pinned on a REAL StreamingQuery: the running query's state operator
    reports RocksDB custom metrics, and both confs read back as set."""
    from ortholog_pipeline_spark.session import ROCKSDB_PROVIDER
    from ortholog_pipeline_spark.streaming.state_conf import (
        CHANGELOG_KEY,
        CHOICE_KEY,
        HDFS_PROVIDER,
        PROVIDER_KEY,
        ensure_state_store_conf,
    )

    schema = "ts timestamp, event_type string, value double"
    src_dir, ck = str(land / "src"), str(land / "ck")
    _write(spark, src_dir, [(T0, "a", 1.0), (T0 + timedelta(seconds=12), "b", 2.0)],
           schema)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    # the constructor itself must upgrade the session (get_spark already bakes
    # the confs in; this pins the runtime path for foreign sessions too)
    out = tumbling_agg(stream, window_size="10 seconds", watermark="5 seconds")
    assert spark.conf.get(PROVIDER_KEY) == ROCKSDB_PROVIDER
    assert spark.conf.get(CHANGELOG_KEY) == "true"
    q = (
        out.writeStream.format("memory").queryName("ssconf")
        .outputMode("append").option("checkpointLocation", ck).start()
    )
    try:
        q.processAllAvailable()
        ops = (q.lastProgress or {}).get("stateOperators") or []
        assert ops, "no state operator in progress"
        metrics = ops[0].get("customMetrics") or {}
        rocks_keys = [k for k in metrics if "rocksdb" in k.lower()]
        assert rocks_keys, f"state store is not RocksDB: {sorted(metrics)[:8]}"
    finally:
        q.stop()

    # overrides: the explicit escape hatch keeps the stock provider...
    s2 = spark.newSession()
    s2.conf.set(CHOICE_KEY, "hdfs")
    s2.conf.set(PROVIDER_KEY, HDFS_PROVIDER)
    assert ensure_state_store_conf(s2) is False
    assert s2.conf.get(PROVIDER_KEY) == HDFS_PROVIDER
    # ...and a deliberate third-party provider is never replaced
    s3 = spark.newSession()
    s3.conf.set(PROVIDER_KEY, "com.example.CustomStateStoreProvider")
    assert ensure_state_store_conf(s3) is False
    assert s3.conf.get(PROVIDER_KEY) == "com.example.CustomStateStoreProvider"
