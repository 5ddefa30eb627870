"""Layout-controlled writer tests: ORC/parquet round-trip fidelity, partition
pruning of the written layout, file-count bounds, and within-file sort order."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ortholog_pipeline_spark.sources.writer import (
    layout_stats,
    read_dataset,
    write_dataset,
)

SF = "/root/testdata/sf0.001"


def _li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )


def test_orc_roundtrip_identical(spark, tmp_path):
    df = _li(spark)
    p = str(tmp_path / "orc_ds")
    write_dataset(df, p, fmt="orc")
    back = read_dataset(spark, p, fmt="orc")
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    df = _li(spark)
    p = str(tmp_path / "part_ds")
    write_dataset(df, p, fmt="parquet", partition_by=["l_returnflag"])
    stats = layout_stats(p)
    n_flags = df.select("l_returnflag").distinct().count()
    assert stats["n_partition_dirs"] == n_flags
    # a returnflag filter on the round-trip must prune to one partition dir
    back = read_dataset(spark, p).filter(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "l_returnflag=R" in plan or back.rdd.getNumPartitions() <= max(
        1, spark.sparkContext.defaultParallelism
    )
    assert back.count() == df.filter(F.col("l_returnflag") == "R").count()


def test_max_records_per_file_bounds_files(spark, tmp_path):
    df = _li(spark).repartition(1)
    n = df.count()
    p = str(tmp_path / "bounded_ds")
    write_dataset(df, p, max_records_per_file=1000)
    files = glob.glob(f"{p}/*.parquet")
    import math

    assert len(files) == math.ceil(n / 1000)


def test_sort_within_partitions_orders_files(spark, tmp_path):
    df = _li(spark).repartition(2, "l_returnflag")
    p = str(tmp_path / "sorted_ds")
    write_dataset(df, p, sort_by=["l_orderkey", "l_linenumber"])
    import pyarrow.parquet as pq

    for f in glob.glob(f"{p}/*.parquet"):
        t = pq.read_table(f, columns=["l_orderkey", "l_linenumber"]).to_pandas()
        keys = list(zip(t["l_orderkey"], t["l_linenumber"]))
        assert keys == sorted(keys), f"file {f} not sorted"
