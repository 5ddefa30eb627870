"""Harness-robustness pins (ADVICE r4): sweep report parsing, CTE-hint
substitution asserts, hardlink-clone degradation. These guard the CERTIFICATION
tooling — a parser that miscounts a green batch as 40 failures or a silently
dropped MATERIALIZED hint corrupts the evidence the judge reads, even when the
engine itself is correct."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest


def _load_sweep():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "sweep_mod", os.path.join(repo, "tools", "sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REPORT = {"q_a": {"hash_match": True}, "q_b": {"err": "boom {not json}"}}


def test_parse_report_clean():
    sweep = _load_sweep()
    assert sweep.parse_report(json.dumps(REPORT, indent=1)) == REPORT


def test_parse_report_warnings_before_and_after():
    sweep = _load_sweep()
    raw = (
        "[12s][warning][gc,alloc] Eden {full}\n"
        + json.dumps(REPORT, indent=1)
        + "\n[956s][warning][gc,alloc] GCLocker { retried }\n"
    )
    assert sweep.parse_report(raw) == REPORT


def test_parse_report_brace_opening_warning_line():
    # a warning line that STARTS with '{' but isn't JSON must not poison the
    # scan — the decoder falls through to the real (earlier-printed) report
    sweep = _load_sweep()
    raw = json.dumps(REPORT, indent=1) + "\n{gc locker stall}\n"
    assert sweep.parse_report(raw) == REPORT


def test_parse_report_garbage_only():
    sweep = _load_sweep()
    assert sweep.parse_report("no json here\n") == {}
    assert sweep.parse_report("") == {}


def test_materialize_ctes_asserts_on_drifted_name():
    from ortholog_pipeline_spark.queries_flows import _materialize_ctes

    sql = "WITH genes AS (SELECT 1), rat AS (SELECT 2) SELECT * FROM genes, rat"
    out = _materialize_ctes(sql, ("genes", "rat"))
    assert out.count("AS MATERIALIZED (") == 2
    with pytest.raises(ValueError, match="renamed or removed"):
        _materialize_ctes(sql, ("genes", "dog"))


def test_species_flow_ctes_all_still_match():
    # import-time construction would have raised already; re-assert explicitly
    # so the failure message names this pin if the flow SQL ever drifts
    from ortholog_pipeline_spark.queries_flows import (
        _SPECIES_MULTI_REF_CTES,
        _materialize_ctes,
        _SPECIES_FLOW_SQL,
    )

    out = _materialize_ctes(_SPECIES_FLOW_SQL, _SPECIES_MULTI_REF_CTES)
    assert out.count("AS MATERIALIZED (") >= len(_SPECIES_MULTI_REF_CTES)


def test_clone_tree_falls_back_to_copy(tmp_path, monkeypatch):
    from ortholog_pipeline_spark import queries_flows as qf

    src = tmp_path / "src" / "v=0"
    src.mkdir(parents=True)
    (src / "part-0.parquet").write_bytes(b"data")

    def _no_link(a, b):
        raise OSError("EXDEV: cross-device link")

    monkeypatch.setattr(qf.os, "link", _no_link)
    dst = tmp_path / "dst"
    qf._clone_tree_hardlink(str(tmp_path / "src"), str(dst))
    assert (dst / "v=0" / "part-0.parquet").read_bytes() == b"data"


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_steady_drift_ignores_window_fill_transient():
    """The first batches aggregate partially-filled windows (structurally
    cheap); the estimator must read ~1.0 on a store whose post-fill commits
    are flat even when early batches are 2x cheaper."""
    bench = _load_bench()
    series = [400, 500, 600, 800] + [1000] * 20
    assert bench.steady_drift(series) == 1.0


def test_steady_drift_catches_injected_linear_regression():
    """VERDICT r7 ask 1: a synthetic commit-cost-grows-with-state series
    (linear growth, every pairwise slope positive) must red-line past the
    pinned bar — the injected-regression proof that the robust estimator
    still catches what the probe exists to catch."""
    bench = _load_bench()
    series = [900] * 4 + [1000 + 50 * i for i in range(20)]  # ~2x over window
    assert bench.steady_drift(series) > bench.STREAM_DRIFT_BAR
    # a ~55%-per-window linear climb still clears the 1.2 bar (the real
    # failure mode — commit cost proportional to a state that grows ~6x
    # across the window — reads far above either)...
    shallow = [900] * 4 + [1000 + 30 * i for i in range(20)]
    assert bench.steady_drift(shallow) > bench.STREAM_DRIFT_BAR
    # ...and so does a sustained LEVEL SHIFT (the rewrite-the-world commit
    # signature actually observed in snapshot-mode RocksDB runs)
    step = [900] * 4 + [750] * 10 + [1250] * 10
    assert bench.steady_drift(step) > bench.STREAM_DRIFT_BAR


def test_steady_drift_tolerates_gc_spikes():
    """The r7 half-means estimator read up to 2.26 on identical code when a
    GC spike landed in one half; the half-medians estimator must hold ~1.0
    on a flat series carrying 3x outliers in EITHER half."""
    bench = _load_bench()
    flat = [900] * 4 + [1000] * 20
    for spike_at in (6, 12, 19, 22):
        series = list(flat)
        series[spike_at] = 3200
        assert bench.steady_drift(series) < bench.STREAM_DRIFT_BAR
    two = list(flat)
    two[8], two[20] = 3000, 2800  # one spike per half: half-means read ~1.2+
    assert bench.steady_drift(two) <= 1.1


def test_steady_drift_short_series_is_none():
    """Below 12 steady batches no estimator separates drift from noise —
    the r7 false flag came from exactly such an 8-batch window."""
    bench = _load_bench()
    assert bench.steady_drift([100] * 15) is None
    assert bench.steady_drift([]) is None


def test_sweep_digest_shape():
    """build_digest (the --digest-out payload) carries rows, hash_match,
    value_hash (checksum-mode entries fall back to their numeric digest),
    err for failures, pass/fail totals and the git head."""
    sweep = _load_sweep()
    report = {
        "q_ok": {"hash_match": True, "spark_rows": 7, "value_hash": "abc"},
        "q_ck": {"hash_match": True, "spark_rows": 3, "mode": "checksum",
                 "spark_digest": 123},
        "q_bad": {"hash_match": False, "spark_rows": 1, "err": "boom"},
    }
    digest = sweep.build_digest(report, "/some/sf_dir")
    assert digest["pass"] == 2 and digest["fail"] == 1
    assert list(digest["names"]) == ["q_bad", "q_ck", "q_ok"]  # sorted
    assert digest["names"]["q_ok"]["value_hash"] == "abc"
    assert digest["names"]["q_ck"]["value_hash"] == 123
    assert digest["names"]["q_bad"]["err"] == "boom"
    assert digest["names"]["q_bad"]["hash_match"] is False
    assert len(digest["git_head"]) == 40


def _load_tool(name):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"{name}_mod", os.path.join(repo, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compare_rounds_hash_and_bench_surfaces(capsys):
    """VERDICT r7 ask 7: the round-diff tool must read the committed r6/r7
    artifacts, report value-hash drift over the hash-bearing sources, and
    normalize bench totals by the calibration anchor (or say it can't)."""
    import sys

    cr = _load_tool("compare_rounds")
    old_argv = sys.argv
    sys.argv = ["compare_rounds.py", "r6", "r7"]
    try:
        cr.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert "value-hash drift r6 -> r7" in out
    assert "SWEEP_r7.json" in out          # r7's hash source found
    assert "CHANGED: 0" in out             # r6/r7 share no hash-bearing names
    assert "bench drift" in out
    assert "raw ratio 0.923" in out        # 362.032 / 392.162
    # r6 predates the anchor: the tool must say so, not fake a normalization
    assert "unanchored" in out


def test_certify_round_pool_prefers_never_committed(tmp_path):
    """VERDICT r7 ask 3: the rotating cert's pool draws first from names
    never present in any committed gate/cert, and --legacy-pool reproduces
    the historical draw (pinned against CERTIFICATION_r7.json's own list)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cr = _load_tool("certify_round")
    gate = os.path.join(repo, "CORRECTNESS_r05.json")
    covered = cr.committed_names(8)
    names = cr.pick_names(8, gate, 75)
    assert len(names) == 75
    assert all(n not in covered for n in names)
    legacy = cr.pick_names(7, gate, 75, legacy_pool=True)
    with open(os.path.join(repo, "CERTIFICATION_r7.json")) as fh:
        assert legacy == json.load(fh)["names"]


def test_certify_round_pool_is_rerun_stable(tmp_path):
    """ADVICE r8 (low): the same-round exclusion must cover EVERY artifact
    family — the old anchor missed CERTIFICATION_r8_complement.json and never
    guarded CORRECTNESS_r*.json, so re-running pick_names(8, ...) after those
    landed yielded a different list than the committed r8 draw. Pinned: the
    fixed pool reproduces CERTIFICATION_r8.json's committed names exactly,
    even though the complement cert and CORRECTNESS_r08 now sit on disk."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cr = _load_tool("certify_round")
    assert cr._artifact_round("CERTIFICATION_r8_complement.json") == 8
    assert cr._artifact_round("CORRECTNESS_r08.json") == 8
    assert cr._artifact_round("SWEEP.json") is None
    gate = os.path.join(repo, "CORRECTNESS_r05.json")
    with open(os.path.join(repo, "CERTIFICATION_r8.json")) as fh:
        assert cr.pick_names(8, gate, 75) == json.load(fh)["names"]


def test_certify_round_stale_weighted_top_up():
    """VERDICT r9 ask 5: with the never-certified complement empty, the
    top-up must retire the stale tail — every name the r9 artifact reported
    at max staleness (7 rounds) is forced into the round-10 draw — while
    --uniform-top-up reproduces the committed r9 list exactly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cr = _load_tool("certify_round")
    gate = os.path.join(repo, "CORRECTNESS_r05.json")
    with open(os.path.join(repo, "CERTIFICATION_r9.json")) as fh:
        r9 = json.load(fh)
    assert cr.pick_names(9, gate, 75, stale_weighted=False) == r9["names"]
    names10 = set(cr.pick_names(10, gate, 75))
    assert len(names10) == 75
    for q in r9["staleness"]["oldest_names"]:
        assert q in names10, f"stale name {q} not retired by the r10 draw"
    # determinism: the stale-weighted draw is a pure function of
    # (seed, committed artifacts, registry)
    assert set(cr.pick_names(10, gate, 75)) == names10


def test_certify_round_staleness_report():
    """VERDICT r8 ask 4: the rotation artifact carries a staleness line —
    max rounds-since-last-certified over the registry, this round's own draw
    counted as fresh, and the never-certified residue named (empty since the
    r8 complement cert)."""
    cr = _load_tool("certify_round")
    newest = cr.last_certified_round()
    assert newest, "no coverage artifacts parsed"
    st = cr.staleness_report(9, [])
    assert st["never_certified"] == []
    assert st["max_rounds_since_certified"] >= 0
    # a name certified THIS round reads age 0
    import __spark_entry__ as e

    some = sorted(e.queries())[:3]
    st2 = cr.staleness_report(9, some)
    assert all(
        q not in st2["oldest_names"] or st2["max_rounds_since_certified"] == 0
        for q in some
    )


def test_compare_rounds_sf10_and_mem_sections():
    """VERDICT r8 ask 3: compare_rounds covers SF10_PROBES and MEM_ENVELOPE —
    older rounds' single-name artifacts resolve through the round's closing
    commit, per-entry/growth-law/probe drift prints without error."""
    cr = _load_tool("compare_rounds")
    a, src_a = cr.round_single_artifact("r8", "SF10_PROBES")
    assert a is not None and "times_sec" in a, src_a
    assert "@" in src_a or src_a.startswith("SF10_PROBES")
    m, src_m = cr.round_single_artifact("r8", "MEM_ENVELOPE")
    assert m is not None and "queries" in m, src_m
    # the full sections execute end-to-end on real artifacts
    cr.diff_sf10("r7", "r8", 1.3)
    cr.diff_mem("r7", "r8", 1.3)
    # ratio helper: flags only genuine over-bar entries
    common, over = cr._ratio_lines({"a": 1.0, "b": 2.0}, {"a": 1.1, "b": 4.0}, 1.3)
    assert common == ["a", "b"]
    assert over == [("b", 2.0, 4.0, 2.0)]
