"""Hand-data tests for the wave-54+ operators: profiling verdicts on planted
schemas and geodesic nearest-neighbor against a brute-force recomputation."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from ortholog_pipeline_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(spark):
    """Minimal orders/customer/lineitem/part/nation tables with PLANTED
    profiling facts: one dirty FD, one near-key, one orphaned FK value."""
    td = tempfile.mkdtemp()
    orders = spark.createDataFrame(
        # o_orderkey unique (KEY); custkey 7 appears with two priorities
        # only via two different orders (fine for o_custkey->priority? NO:
        # custkey 7 maps to two priorities -> violation of that FD)
        [
            (1, 7, "F", 10.0, "2024-01-01", "1-URGENT"),
            (2, 7, "O", 20.0, "2024-01-02", "5-LOW"),
            (3, 8, "F", 30.0, "2024-01-03", "2-HIGH"),
        ],
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    customer = spark.createDataFrame(
        # c_name has a duplicate -> NOT a key (2 dupes of 4 rows = NOT_KEY)
        [
            (7, "Alice", 1, 0.0, "AUTO"),
            (8, "Bob", 1, 0.0, "AUTO"),
            (9, "Alice", 2, 0.0, "BIKE"),
            (10, "Dora", 2, 0.0, "BIKE"),
        ],
        schema="c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    lineitem = spark.createDataFrame(
        # l_suppkey 99 has no nation -> orphan for the negative IND check
        [
            (1, 100, 99, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", "2024-01-05"),
            (1, 101, 99, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-06"),
            (2, 100, 98, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", "2024-01-07"),
        ],
        schema="l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    part = spark.createDataFrame(
        [(100, "p", "B", "T", 1, 1.0), (101, "q", "B", "T", 2, 2.0)],
        schema="p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    nation = spark.createDataFrame(
        [(1, "N1", 0), (2, "N2", 0)],
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    for name, df in [
        ("orders", orders),
        ("customer", customer),
        ("lineitem", lineitem),
        ("part", part),
        ("nation", nation),
    ]:
        df.write.parquet(f"{td}/{name}.parquet")
    return td


def test_fd_discovery_flags_planted_violation(spark, planted_dir):
    out = {
        r["fd"]: r
        for r in Q.queries()["a_fd_discovery"](spark, planted_dir).collect()
    }
    # custkey 7 has two priorities -> 1 of 2 groups violating
    r = out["o_custkey->priority"]
    assert r["n_violating_groups"] == 1 and r["verdict"] == "NO_FD"
    # orderkey -> status is an exact FD (keys can't violate)
    assert out["o_orderkey->status"]["verdict"] == "EXACT_FD"


def test_ucc_discovery_verdicts(spark, planted_dir):
    out = {
        r["ucc"]: r["verdict"]
        for r in Q.queries()["a_ucc_discovery"](spark, planted_dir).collect()
    }
    assert out["orders(o_orderkey)"] == "KEY"
    assert out["customer(c_name)"] == "NOT_KEY"  # planted duplicate name
    assert out["lineitem(l_orderkey,l_linenumber)"] == "KEY"


def test_ind_discovery_flags_orphans(spark, planted_dir):
    out = {
        r["ind"]: r
        for r in Q.queries()["a_ind_discovery"](spark, planted_dir).collect()
    }
    assert out["orders.custkey<=customer"]["verdict"] == "FK_CANDIDATE"
    neg = out["lineitem.suppkey<=nation(neg)"]
    assert neg["n_orphans"] == 2 and neg["verdict"] == "NOT_CONTAINED"


def test_haversine_nearest_matches_recomputation(spark):
    """Every reported (query, neighbor, dist) must equal the true nearest
    within the 3x3 probed neighborhood, recomputed point-by-point."""
    rows = Q.queries()["j_haversine_nearest"](spark, SF_DIR).collect()
    # rebuild the synthesized points
    import hashlib

    def coord(key, salt, span, lo):
        h = int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)
        return (h % 1_000_000) / 1_000_000.0 * span + lo

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    pts = {
        r["c_custkey"]: (
            coord(r["c_custkey"], "lat", 120, -60),
            coord(r["c_custkey"], "lon", 360, -180),
        )
        for r in cust
        if r["c_custkey"] % 3 == 0
    }

    def hav(p, q):
        la1, lo1 = map(math.radians, p)
        la2, lo2 = map(math.radians, q)
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return round(2 * 6371000 * math.asin(math.sqrt(a)))

    def cell(p):
        return (math.floor(p[0] / 5), math.floor(p[1] / 5))

    for r in rows:
        qp = pts[r["query_id"]]
        qc = cell(qp)
        cands = [
            (hav(qp, pts[i]), i)
            for i, p in pts.items()
            if i != r["query_id"]
            and abs(cell(p)[0] - qc[0]) <= 1
            and abs(cell(p)[1] - qc[1]) <= 1
        ]
        best = min(cands)
        assert (best[1], best[0]) == (r["neighbor_id"], r["dist_m"]), r
