"""Session factory profiles (VERDICT r8 ask 6).

``profile="cluster"`` exists because local mode and a 1000-executor cluster
want OPPOSITE shuffle-partition defaults (local: partitions == cores so one
heap holds a stage; cluster: start high, AQE coalesces down) — but the two
profiles must never change WHAT is computed or HOW the plan is shaped. The
plan-invariance test pins that: both flagship flows compile to the identical
physical operator sequence under both profiles, so the only degree of freedom
the profile touches is partition count.
"""

from __future__ import annotations

import re

from ortholog_pipeline_spark.session import (
    STREAMING_STATE_CONF,
    cluster_profile_conf,
    get_spark,
)


def _node_seq(frame) -> list[str]:
    """Physical operator names, in tree order, partition-count- and
    exprId-free: the 'same plan modulo partition count' comparator."""
    spark = frame.sparkSession
    plan = frame._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    names = []
    for line in plan.splitlines():
        if not line.strip():
            break  # end of the tree section; details follow
        m = re.match(r"^[\s:+\-*]*([A-Za-z][\w ]*?)\s*\(\d+\)$", line)
        if m:
            names.append(m.group(1).strip())
    return names


def test_cluster_profile_conf_rules():
    conf = cluster_profile_conf()
    assert conf["spark.sql.shuffle.partitions"] == "2000"
    assert (
        conf["spark.sql.adaptive.coalescePartitions.initialPartitionNum"]
        == "2000"
    )
    assert cluster_profile_conf(512)["spark.sql.shuffle.partitions"] == "512"
    # profile names are validated, not silently ignored
    import pytest

    with pytest.raises(ValueError, match="unknown profile"):
        get_spark(profile="yarn")
    # the streaming state-store defaults ride along on every profile
    assert "rocksdb" in STREAMING_STATE_CONF[
        "spark.sql.streaming.stateStore.providerClass"
    ].lower()


def test_cluster_profile_plan_invariance(spark, tmp_path):
    """Both flagship flows must compile to the same physical operator
    sequence under the local and cluster profiles — partition counts are the
    profile's ONLY lever. Catches a profile conf accidentally flipping a join
    strategy, adding an exchange, or changing aggregation shape."""
    from tests.test_plans import RAT, RUN_TS, _agr_lines, _relations, _seed_store

    from ortholog_pipeline_spark.plans import run_agr_load, run_species_load

    # two FRESH sessions (newSession resets runtime conf to the initial
    # builder conf): earlier suite tests may have mutated the shared
    # fixture's runtime conf, and this test is about the PROFILE delta only
    local = spark.newSession()
    cluster = spark.newSession()
    for k, v in cluster_profile_conf(shuffle_partitions=64).items():
        cluster.conf.set(k, v)
    assert cluster.conf.get("spark.sql.shuffle.partitions") == "64"
    assert (
        local.conf.get("spark.sql.shuffle.partitions")
        != cluster.conf.get("spark.sql.shuffle.partitions")
    )

    def species_frames(session, sub):
        store = _seed_store(session, tmp_path / sub)
        res = run_species_load(
            store, _relations(session), RUN_TS, RAT, delete_threshold_pct=100.0
        )
        return [res.picks, res.verdicts, res.assoc_verdicts, res.inserted]

    def agr_frames(session, sub):
        store = _seed_store(session, tmp_path / sub)
        res = run_agr_load(
            store, _agr_lines(session), RUN_TS, delete_threshold_pct=100.0
        )
        return [res.resolved, res.unresolved, res.symbol_qc]

    for build in (species_frames, agr_frames):
        local_frames = build(local, f"loc_{build.__name__}")
        cluster_frames = build(cluster, f"clu_{build.__name__}")
        for lf, cf in zip(local_frames, cluster_frames):
            ln, cn = _node_seq(lf), _node_seq(cf)
            assert ln, "empty plan parse — comparator broke"
            assert ln == cn, (
                f"{build.__name__}: plans diverge beyond partition count\n"
                f"local:   {ln}\ncluster: {cn}"
            )
