"""Pins for the deterministic-subsample certification twins
(queries/slice_cert.py, VERDICT r4 item 2). The value-level engine-vs-oracle
check runs through tools/driver_sim.py --slice (PASS=5 at sf0.01 recorded this
round; the ~sf1 sweep uses sweep.py --slice-heavy); these tests pin the
registry-shape invariants that keep that harness honest."""

from __future__ import annotations

import ortholog_pipeline_spark.queries  # noqa: F401 — force registration
from ortholog_pipeline_spark.queries import slice_cert
from ortholog_pipeline_spark.queries._shared import unmaterialized_multi_ref_ctes


def test_slice_registry_covers_exactly_the_heavy_oracles():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "sweep_mod", os.path.join(repo, "tools", "sweep.py")
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    assert set(slice_cert.slice_queries()) == set(sweep.HEAVY_ORACLE)
    assert set(slice_cert.slice_oracle_sql()) == set(sweep.HEAVY_ORACLE)


def test_slice_twins_shadow_real_registry_entries():
    from ortholog_pipeline_spark.queries import queries

    q = queries()
    for name in slice_cert.slice_queries():
        assert name in q, f"slice twin {name} shadows nothing in the registry"


def test_slice_oracles_are_lint_clean():
    for name, sql in slice_cert.slice_oracle_sql().items():
        assert sql.strip()
        assert unmaterialized_multi_ref_ctes(sql) == [], name


def test_slice_rewrites_fail_loud_on_drift():
    # the two string-surgery slice oracles assert their markers still exist;
    # exercise the guard paths so a drift fails here, not mid-certification
    assert "c_custkey % 100 = 0" in slice_cert._slice_er_blocking_sql()
    assert f"a.doc_id % {slice_cert.SLICE_MOD} = 0" in slice_cert._sliced_jaccard_verify()
