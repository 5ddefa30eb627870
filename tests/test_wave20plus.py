"""Property tests for the wave-20+ operators: the invariants the oracle
hash-match can't express (banding recall, greedy-merge semantics, resampling
distribution shape, metric bounds)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from ortholog_pipeline_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_phash_banding_perfect_recall(spark):
    """4 bands x 4 bits has PERFECT recall at Hamming<=3 (pigeonhole): the
    banded candidate join must find EVERY pair the brute-force O(n^2) scan
    finds. Verified against an exhaustive comparison of the same signatures."""
    from ortholog_pipeline_spark import multimodal as MM

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = (
        MM.synthesize_media_from_documents(docs)
        .filter(F.col("media_type") == "image")
        .select("media_id", F.md5(F.lower(F.hex(F.col("payload")))).alias("ph"))
    )
    bit_terms = [
        F.when(
            F.conv(F.substring("ph", 2 * i + 1, 2), 16, 10).cast("long") >= 128,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(16)
    ]
    sigs = {
        r["media_id"]: r["phash"]
        for r in media.select(
            "media_id", sum(bit_terms[1:], bit_terms[0]).alias("phash")
        ).collect()
    }
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in Q.queries()["mm_phash_neardup"](spark, SF_DIR).collect()
    }
    assert banded == brute, (
        f"banding missed {brute - banded} / invented {banded - brute}"
    )


def test_bpe_train_rounds_hand_vocab(spark):
    """Greedy BPE on a tiny hand corpus: 'aaab' x3 + 'ab' x2. Pair counts in
    round 1: (a,a) appears 2 per 'aaab' -> 6; (a,b) 1 per word -> 5. So merge 1
    must be (a,a). After rewriting 'a a a b' -> 'aa a b' (left-to-right,
    non-overlapping), round 2 counts: (aa,a)=3, (a,b)=5 -> merge 2 = (a,b)."""
    docs = spark.createDataFrame(
        [(i, "aaab") for i in range(3)] + [(i + 3, "ab") for i in range(2)],
        schema="doc_id long, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        out = {
            r["round"]: (r["left_sym"], r["right_sym"], r["pair_freq"])
            for r in Q.queries()["text_bpe_train_rounds"](spark, td).collect()
        }
    assert out[1] == ("a", "a", 6)
    assert out[2] == ("a", "b", 5)


def test_poisson_bootstrap_weight_distribution(spark):
    """The md5-derived Poisson(1) weights must (a) be deterministic across
    reruns and partitionings, and (b) have the Poisson(1) shape: mean ~1 and
    ~36.8% zeros over many draws. Uses the production 24-bit-slice
    derivation (first slice of each md5)."""
    from ortholog_pipeline_spark.queries import _POIS24

    rows = spark.range(0, 20000).select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bs0_"), F.col("id").cast("string"))), 1, 6
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u")
    )
    wt = F.coalesce(
        *[F.when(F.col("u") < t, F.lit(k)) for k, t in enumerate(_POIS24)], F.lit(6)
    )
    stats = rows.select(wt.alias("w")).agg(
        F.avg("w").alias("mean"),
        F.avg(F.when(F.col("w") == 0, 1.0).otherwise(0.0)).alias("p0"),
    ).collect()[0]
    assert abs(stats["mean"] - 1.0) < 0.03
    assert abs(stats["p0"] - 0.3679) < 0.02
    # determinism under repartitioning
    again = (
        spark.range(0, 20000)
        .repartition(13)
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bs0_"), F.col("id").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("u")
        )
        .select(wt.alias("w"))
        .agg(F.sum("w").alias("s"))
        .collect()[0]["s"]
    )
    first = rows.select(wt.alias("w")).agg(F.sum("w").alias("s")).collect()[0]["s"]
    assert first == again


def test_ks_and_auc_bounds(spark):
    """Metric sanity: KS D in [0,1]; AUC in [0,1]; both defined (non-null)."""
    ks = Q.queries()["a_ks_test"](spark, SF_DIR).collect()[0]
    assert ks["ks_d"] is not None and 0.0 <= ks["ks_d"] <= 1.0
    auc = Q.queries()["a_auc_rank"](spark, SF_DIR).collect()[0]
    assert auc["auc"] is not None and 0.0 <= auc["auc"] <= 1.0
    assert auc["n_pos"] + auc["n_neg"] == 500 or auc["n_pos"] + auc["n_neg"] == 50


def test_label_propagation_partition_invariance(spark):
    """The LPA result (community -> size map) must not depend on the physical
    partitioning: deterministic tie-breaks make synchronous LPA a pure
    function of the graph."""
    df1 = Q.queries()["g_label_propagation"](spark, SF_DIR)
    rows1 = {(r["community"], r["size"]) for r in df1.collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        rows2 = {
            (r["community"], r["size"])
            for r in Q.queries()["g_label_propagation"](spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows1 == rows2


@pytest.mark.parametrize(
    "name",
    [
        "j_returned_items_topk",
        "emb_covariance_topk",
        "g_link_prediction",
        "emb_triplet_mining",
        "a_top_supplier",
        "j_dbscan_grid",
    ],
)
def test_topk_sets_partition_invariant(spark, name):
    """Every ranked/selected SET must be a pure function of the data, not of
    the physical partitioning: integer-snapped orderings + explicit
    tie-breaks are the mechanism, this is the regression net."""
    df1 = Q.queries()[name](spark, SF_DIR)
    rows1 = {tuple(r) for r in df1.collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        rows2 = {
            tuple(r) for r in Q.queries()[name](spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows1 == rows2
