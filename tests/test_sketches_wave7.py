"""Wave-7 operator tests: Count-Min sketch, KMV sketch, repeated-span dedup,
hashing-trick quality scorer, k-fold assignment."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ortholog_pipeline_spark.functions.text import linear_quality_score
from ortholog_pipeline_spark.operators import sketches as SK
from ortholog_pipeline_spark.operators.dedup import repeated_spans
from ortholog_pipeline_spark.operators.sampling import kfold_assign


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def _freq_df(spark, items):
    return spark.createDataFrame([Row(k=x) for x in items])


def test_countmin_never_underestimates(spark):
    items = [i % 17 for i in range(1000)] + [3] * 200  # key 3 is hot
    df = _freq_df(spark, items)
    sketch = SK.cm_sketch(df, "k", width=64, depth=4)  # tiny width → collisions
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["cm_estimate"]
        for r in SK.cm_estimate(sketch, keys, "k", width=64, depth=4).collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, f"CM underestimated key {k}"
    # the hot key has enough mass that even a 64-slot sketch stays within 2x
    assert est[3] < 2 * exact[3]


def test_countmin_merge_equals_combined(spark):
    a = _freq_df(spark, [i % 11 for i in range(300)])
    b = _freq_df(spark, [i % 7 for i in range(200)])
    merged = (
        SK.cm_sketch(a, "k", width=128, depth=4)
        .unionByName(SK.cm_sketch(b, "k", width=128, depth=4))
        .groupBy("depth", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    combined = SK.cm_sketch(a.unionByName(b), "k", width=128, depth=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, combined.collect())
    )


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_sketch_size_and_estimate(spark):
    df = spark.createDataFrame([Row(g="x", k=i) for i in range(5000)])
    sk = SK.kmv_sketch(df, "k", ["g"], k=64)
    assert sk.count() == 64
    est = SK.kmv_distinct_estimate(sk, ["g"], k=64).collect()[0]["kmv_estimate"]
    # stderr ~ 1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
    assert abs(est - 5000) / 5000 < 0.5


def test_kmv_small_group_reports_exact(spark):
    df = spark.createDataFrame([Row(g="s", k=i) for i in range(10)])
    sk = SK.kmv_sketch(df, "k", ["g"], k=64)
    assert sk.count() == 10
    est = SK.kmv_distinct_estimate(sk, ["g"], k=64).collect()[0]["kmv_estimate"]
    assert est == 10.0


def test_kmv_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([Row(g="u", k=i) for i in range(0, 800)])
    b = spark.createDataFrame([Row(g="u", k=i) for i in range(400, 1200)])
    ska = SK.kmv_sketch(a, "k", ["g"], k=32).select("g", "h")
    skb = SK.kmv_sketch(b, "k", ["g"], k=32).select("g", "h")
    # merge: union sketch rows, re-rank, keep 32 smallest
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    merged = (
        ska.unionByName(skb)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 32)
    )
    direct = SK.kmv_sketch(a.unionByName(b), "k", ["g"], k=32)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


# ---------------------------------------------------------------------------
# Repeated spans
# ---------------------------------------------------------------------------


def test_repeated_spans_finds_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(8))  # exactly one 8-token span
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=boiler + " unique tail one two three four"),
            Row(doc_id=2, text=boiler + " other ending words here now ok"),
            Row(doc_id=3, text="totally different content with no overlap at all x y"),
        ]
    )
    out = repeated_spans(docs, span=8, stride=4).collect()
    # the boilerplate span (start=1) recurs in docs 1+2; stride-4 offsets differ
    assert any(r["n_docs"] == 2 and r["first_doc"] == 1 for r in out)
    # doc 3 shares nothing
    assert all(r["first_doc"] != 3 for r in out)


def test_repeated_spans_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a b c")]
    )
    # < 8 tokens → no spans at all (short exact dups are exact_dedup's job)
    assert repeated_spans(docs, span=8, stride=4).count() == 0


# ---------------------------------------------------------------------------
# Linear quality scorer
# ---------------------------------------------------------------------------


def test_linear_quality_score_matches_manual(spark):
    import hashlib

    def w(tok):
        return int(hashlib.md5(f"w|{tok}".encode()).hexdigest()[:15], 16) % 101 - 50

    text = "alpha beta gamma alpha"
    expected = round(sum(w(t) for t in text.split()) / 4, 6)
    got = (
        spark.createDataFrame([Row(text=text)])
        .select(linear_quality_score("text").alias("s"))
        .collect()[0]["s"]
    )
    assert got == expected


def test_linear_quality_score_empty_is_zero(spark):
    got = (
        spark.createDataFrame([Row(text="")])
        .select(linear_quality_score("text").alias("s"))
        .collect()[0]["s"]
    )
    assert got == 0.0


# ---------------------------------------------------------------------------
# k-fold assignment
# ---------------------------------------------------------------------------


def test_kfold_partitioning_invariance_and_coverage(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    f1 = {r["doc_id"]: r["fold"] for r in kfold_assign(df, "doc_id", k=5).collect()}
    f2 = {
        r["doc_id"]: r["fold"]
        for r in kfold_assign(df.repartition(13), "doc_id", k=5).collect()
    }
    assert f1 == f2  # partitioning-independent
    assert set(f1.values()) == {0, 1, 2, 3, 4}  # every fold populated
    sizes = [list(f1.values()).count(i) for i in range(5)]
    assert sum(sizes) == 500
    # roughly balanced (hash-uniform): no fold is empty or > 2x expected
    assert all(40 < s < 200 for s in sizes)
