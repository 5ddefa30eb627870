"""Wave-8 tests: CM join-size estimation, BPE pair stats, domain mixture,
k-anonymity, cumulative distinct users."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ortholog_pipeline_spark.operators import sketches as SK


def test_cm_join_size_never_underestimates(spark):
    a = spark.createDataFrame([Row(k=i % 50) for i in range(400)])
    b = spark.createDataFrame([Row(k=i % 30) for i in range(300)])
    exact = a.join(b, "k").count()
    sa = SK.cm_sketch(a, "k", width=256, depth=4).withColumnRenamed("cnt", "ca")
    sb = SK.cm_sketch(b, "k", width=256, depth=4).withColumnRenamed("cnt", "cb")
    est = (
        sa.join(sb, ["depth", "slot"])
        .groupBy("depth")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("e"))
        .agg(F.min("e").alias("est"))
        .collect()[0]["est"]
    )
    # CM inner product is an upward-biased estimator of the true join size
    assert est >= exact
    assert est < 3 * exact  # and sane at this width


def test_bpe_pair_stats_manual(spark):
    from ortholog_pipeline_spark import queries as Q

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abc abc ab"), Row(doc_id=2, text="abc x")]
    )
    vc = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = F.when(
        F.length("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("t") - 1),
            lambda i: F.col("t").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = {
        r["pair"]: r["n"]
        for r in vc.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    # 'abc' x3 + 'ab' x1 -> ab:4, bc:3; 'x' contributes no pair
    assert out == {"ab": 4, "bc": 3}


def test_k_anonymity_flags_small_groups(spark):
    rows = [Row(c_nationkey=1, c_mktsegment="A")] * 15 + [
        Row(c_nationkey=2, c_mktsegment="B")
    ] * 3
    df = spark.createDataFrame(rows)
    small = (
        df.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 10)
        .collect()
    )
    assert len(small) == 1 and small[0]["c_nationkey"] == 2


def test_cumulative_distinct_users_manual(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [
            Row(user_id=1, day=dt.date(2026, 1, 1)),
            Row(user_id=2, day=dt.date(2026, 1, 1)),
            Row(user_id=1, day=dt.date(2026, 1, 2)),
            Row(user_id=3, day=dt.date(2026, 1, 2)),
            Row(user_id=3, day=dt.date(2026, 1, 3)),
        ]
    )
    from pyspark.sql import Window

    fd = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    nd = fd.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = {
        str(r["day"]): r["c"]
        for r in nd.select("day", F.sum("n_new").over(w).alias("c")).collect()
    }
    # day 3 brings no NEW users, so the first-day frame has no row for it;
    # the registry query left-joins this onto the all-active-days frame
    assert cum == {"2026-01-01": 2, "2026-01-02": 3}


def test_er_blocking_respects_nation(spark):
    """Same-typo names in DIFFERENT nations must not merge (blocking key), and
    a transitive typo chain within one nation must merge to one entity."""
    from pyspark.sql import Row

    from ortholog_pipeline_spark.operators import components as CCop
    from ortholog_pipeline_spark.operators.dedup import editdist1_join

    cust = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="Acme Corp", c_nationkey=1),
            Row(c_custkey=2, c_name="Acme Cort", c_nationkey=1),  # typo of 1
            Row(c_custkey=3, c_name="Acme Cort", c_nationkey=2),  # other nation
            Row(c_custkey=4, c_name="Acme Corz", c_nationkey=1),  # typo of 2
            Row(c_custkey=5, c_name="Unrelated", c_nationkey=1),
        ]
    )
    pairs = editdist1_join(cust, "c_name")
    m1 = cust.select(
        F.col("c_name").alias("s1"),
        F.col("c_custkey").alias("k1"),
        F.col("c_nationkey").alias("n1"),
    )
    m2 = cust.select(
        F.col("c_name").alias("s2"),
        F.col("c_custkey").alias("k2"),
        F.col("c_nationkey").alias("n2"),
    )
    edges = (
        pairs.join(m1, "s1")
        .join(m2, "s2")
        .filter(F.col("n1") == F.col("n2"))
        .select(
            F.least("k1", "k2").alias("id_1"), F.greatest("k1", "k2").alias("id_2")
        )
    )
    comp = {r["node"]: r["component"] for r in CCop.connected_components(edges).collect()}
    # 1-2-4 chain merges (Corp~Cort~Corz), 3 (nation 2) and 5 stay out
    assert comp.get(1) == comp.get(2) == comp.get(4) == 1
    assert 3 not in comp and 5 not in comp


def test_observed_metrics_free_ride(spark):
    """observe() metrics arrive with the action that ran anyway — row counts
    and conditional null counts, no second scan."""
    from pyspark.sql import Row

    from ortholog_pipeline_spark.operators.quality import observed

    df = spark.createDataFrame(
        [Row(k=1, v=10), Row(k=2, v=None), Row(k=3, v=30)]
    )
    out, obs = observed(
        df,
        "ingest",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("int")).alias("n_null_v"),
    )
    assert out.filter(F.col("k") > 0).count() == 3  # the action
    assert obs.get == {"n_rows": 3, "n_null_v": 1}
