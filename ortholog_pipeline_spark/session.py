"""SparkSession factory for the engine.

Defaults are chosen for correctness tests on local[N] but deliberately mirror what a
large cluster run needs: AQE on (runtime re-planning, skew-join splitting, dynamic
coalescing of shuffle partitions), auto-broadcast for dimension tables, and Arrow for
any Pandas-UDF exchange. On a real cluster only master/shuffle-partitions change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ortholog-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, falling back to all
    cores); on a cluster pass ``None`` master via spark-submit instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, dynamic join-strategy switch.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (species, xref resolution maps at test scale) broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for the few Pandas-UDF paths (multimodal stubs, minhash batches).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps behave like the reference's wall-clock stamps (no TZ shifting
        # between the Spark run and the DuckDB oracle).
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (the events table) reads as long nanos; the
        # events loader converts with exact integer division (see queries._t).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


#: The driver's testdata tables (TESTDATA.md) — the names oracle SQL uses.
TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata parquet table as a temp view so users can run
    `spark.sql(...)` directly — the same names the DuckDB oracles use, making
    any oracle_sql() string (minus DuckDB-specific functions) runnable against
    Spark SQL too. The events view gets the same NANOS/NTZ normalization as
    `queries._t`."""
    from ortholog_pipeline_spark import queries as _q

    for t in TESTDATA_TABLES:
        _q._t(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TESTDATA_TABLES)
