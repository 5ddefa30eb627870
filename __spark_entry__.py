"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (the W1 best-fit picker, the reference's semantic
               heart) on sf0.001.
queries()    — one entry per implemented SURVEY.md §2 operator + the training-data
               pipeline ops (dedup/ANN/text), from ortholog_pipeline_spark.queries.
oracle_sql() — matching DuckDB SQL for EVERY registry entry (as of round 2 the
               LSH/IVF/multimodal queries are oracled too: plane signs, cell
               assignments, and stub decodes are deterministic md5 arithmetic
               reproduced exactly in SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ortholog_pipeline_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.queries()["w1_best_fit_pick"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
