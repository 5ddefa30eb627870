"""Property pins for the round-3 LLM-corpus prep additions: benchmark
decontamination and domain-mixture rebalancing. Cross-engine value parity is
certified by the oracle sweep; these tests pin the *semantic invariants* the
oracle compare cannot express. (Chunking, shard packing, and repetition
filtering already exist as doc_context_chunks / doc_shard_packing /
text_repetition_stats with their own pins.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from ortholog_pipeline_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_decontaminate_reports_only_real_overlap(spark):
    """Every reported doc is a training doc (never in the eval suite), its
    shared-gram count is positive and bounded by its total grams, and the
    permille rate is consistent integer arithmetic."""
    rows = queries()["text_decontaminate_ngrams"](spark, SF).collect()
    assert rows, "fixture corpus must produce non-trivial contamination"
    for r in rows:
        assert r["doc_id"] % 97 != 0  # eval docs are never reported
        assert 1 <= r["n_shared"] <= r["n_grams"]
        assert r["overlap_permille"] == (1000 * r["n_shared"]) // r["n_grams"]


def test_decontaminate_matches_bruteforce(spark, tmp_path):
    """The broadcast semi-probe reports exactly the docs a brute-force
    gram-set intersection finds. The fixture corpus has no 4-7-token
    documents (min observed is 10), so we union synthetic short docs —
    one 4-token eval doc (97*1000), 4/5/7-token training docs sharing its
    gram, and a 3-token doc that must stay excluded — to exercise the
    minimum-length boundary of the >= 4 token filter (ADVICE r3)."""
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    short = spark.createDataFrame(
        [
            (97 * 1000, "alpha beta gamma delta"),  # eval doc, exactly 4 tokens
            (97 * 1000 + 1, "alpha beta gamma delta"),  # 4-token train, full overlap
            (97 * 1000 + 2, "alpha beta gamma delta epsilon"),  # 5 tokens
            (97 * 1000 + 4, "x alpha beta gamma delta y z"),  # 7 tokens
            (97 * 1000 + 5, "alpha beta gamma"),  # 3 tokens: below the bound
        ],
        "doc_id LONG, text STRING",
    )
    sf_dir = str(tmp_path / "sf_short")
    base.unionByName(short).write.parquet(f"{sf_dir}/documents.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    grams = (
        docs.filter(F.size("t") >= 4)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 4),"
                    " i -> array_join(slice(t, i + 1, 4), ' '))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    eval_set = {
        r["g"] for r in grams.filter(F.col("doc_id") % 97 == 0).collect()
    }
    expected = {
        r["doc_id"]
        for r in grams.filter(F.col("doc_id") % 97 != 0).collect()
        if r["g"] in eval_set
    }
    got = {
        r["doc_id"]
        for r in queries()["text_decontaminate_ngrams"](spark, sf_dir).collect()
    }
    assert got == expected
    # The boundary rows themselves: 4/5/7-token training docs are reported,
    # the 3-token doc is not (it cannot form a 4-gram).
    assert {97_000 + 1, 97_000 + 2, 97_000 + 4} <= got
    assert 97_000 + 5 not in got


def test_domain_mixture_balances_to_smallest(spark):
    """The smallest domain keeps everything (rate 1e6); every kept count is
    <= n_before; the rebalanced mixture is near-uniform (each domain within
    25% of the smallest domain's mass at this scale)."""
    rows = queries()["sample_mixture_rebalance"](spark, SF).collect()
    assert rows
    min_lang = min(rows, key=lambda r: (r["n_before"], r["lang"]))
    assert min_lang["rate_ppm"] == 1_000_000
    assert min_lang["n_after"] == min_lang["n_before"]
    for r in rows:
        assert 0 <= r["n_after"] <= r["n_before"]
    lo = min(r["n_after"] for r in rows)
    hi = max(r["n_after"] for r in rows)
    assert hi <= 1.25 * min_lang["n_before"] + 2
    assert lo >= 0.5 * min_lang["n_before"] - 2
