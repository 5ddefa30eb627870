"""plans/homologene.py — hand-fixture semantics tests for the deprecated
HomoloGene flow (S5 + J13 + per-group CDC; HomologeneLoader.java:95-205)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ortholog_pipeline_spark.plans.homologene import run_homologene_load
from ortholog_pipeline_spark.schemas import HOMOLOGENE_SCHEMA, ORTHOLOGS_SCHEMA, XREFS_SCHEMA
from ortholog_pipeline_spark.sources.state import StateStore

TS = datetime(2024, 1, 2)
T0 = datetime(2020, 1, 1)


def _store(spark, tmp_path, xrefs, orthologs):
    store = StateStore(spark, str(tmp_path / "state"))
    store.write("xrefs", spark.createDataFrame(xrefs, XREFS_SCHEMA))
    store.write("orthologs", spark.createDataFrame(orthologs, ORTHOLOGS_SCHEMA))
    return store


def test_homologene_pairs_cdc_and_scope_fence(spark, tmp_path):
    # genes: EG1->101, EG2->102, EG3->103; EGM multi (2 rows); EGX absent
    xrefs = [
        (1, 101, "EG1", 3, "E", T0),
        (2, 102, "EG2", 3, "E", T0),
        (3, 103, "EG3", 3, "E", T0),
        (4, 104, "EGM", 3, "E", T0),
        (5, 105, "EGM", 3, "E", T0),
    ]
    # group 7 file entries: EG1(human) EG2(mouse) EG3(rat) EGM(multi->drop)
    # EGX(no match->drop) + a frog entry (bad species)
    entries = spark.createDataFrame(
        [
            (7, "9606", "EG1"),
            (7, "10090", "EG2"),
            (7, "10116", "EG3"),
            (7, "9606", "EGM"),
            (7, "9606", "EGX"),
            (7, "8355", "EG1"),  # frog: unsupported species
        ],
        HOMOLOGENE_SCHEMA,
    )
    def orow(key, g, src, dest, xsrc):
        return (key, src, dest, 1, 2, g, xsrc, "HOMOLOGENE", 11, None, 70, T0, 70, T0)
    orthologs = [
        orow(1, 7, 101, 102, "HOMOLOGENE"),   # matched by incoming -> touch
        orow(2, 7, 101, 999, "HOMOLOGENE"),   # stale in-scope -> delete
        orow(3, 7, 101, 998, "HGNC"),         # other source, same group -> fenced
        orow(4, 8, 201, 202, "HOMOLOGENE"),   # group absent from file -> fenced
    ]
    store = _store(spark, tmp_path, xrefs, orthologs)
    res = run_homologene_load(store, entries, TS)

    # 3 resolved entries -> 3 unordered pairs -> 6 directed incoming rows;
    # one matches existing row 1 -> 5 inserts
    assert res.n_bad_species == 1
    assert res.n_no_rgd == 1
    assert res.n_multi_rgd == 1
    assert res.n_matched == 1
    assert res.n_inserted == 5
    assert res.n_deleted == 1

    final = store.read("orthologs")
    keys = {r["genetogene_key"] for r in final.collect()}
    assert 2 not in keys           # stale in-scope row deleted
    assert 3 in keys and 4 in keys  # fenced rows survive
    # matched row restamped
    m = final.filter(F.col("genetogene_key") == 1).collect()[0]
    assert m["last_modified_date"] == TS and m["created_date"] == T0
    # inserted pairs are symmetric: (102,103) and (103,102) both present
    pairs = {
        (r["src_rgd_id"], r["dest_rgd_id"])
        for r in final.filter(F.col("xref_data_src") == "HOMOLOGENE").collect()
    }
    assert (102, 103) in pairs and (103, 102) in pairs
    # ... and the complement of the matched direction was inserted too
    assert (102, 101) in pairs


def test_homologene_empty_group_deletes_all_in_scope(spark, tmp_path):
    """A file group whose entries all fail resolution still syncs: its
    existing HOMOLOGENE rows are all stale (qcGroups removes the entries but
    the group object remains, so inRgdList drains to deleteList)."""
    xrefs = [(1, 101, "EG1", 3, "E", T0)]
    entries = spark.createDataFrame([(9, "9606", "EGX")], HOMOLOGENE_SCHEMA)
    orthologs = [
        (1, 301, 302, 1, 2, 9, "HOMOLOGENE", "HOMOLOGENE", 11, None, 70, T0, 70, T0),
    ]
    store = _store(spark, tmp_path, xrefs, orthologs)
    res = run_homologene_load(store, entries, TS)
    assert res.n_deleted == 1 and res.n_inserted == 0
    assert store.read("orthologs").count() == 0
