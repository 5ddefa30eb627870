"""Bucketed snapshot publishing: co-located joins without a shuffle.

The hottest join key in the engine is ``src_rgd_id`` (resolution, conflict
verdicts, association sync all join orthologs/xrefs/genes on it — SURVEY.md
§2.3). A plain parquet snapshot makes every such join exchange BOTH sides on the
key; a snapshot published with ``bucketBy(key)`` records the hash-partitioning
in the catalog, so two bucketed tables with the same bucket spec sort-merge-join
with ZERO Exchange — the plan audit test pins exactly that.

At 100 TB this converts the per-run cost of the big state⋈state joins from two
full shuffles into a local per-bucket merge; the price is one bucketed write at
publish time (which the sync flow pays anyway when writing the next snapshot).

Spark constraint: bucket metadata lives in the catalog, so this path uses
``saveAsTable`` into the session warehouse rather than ``parquet(path)`` —
that is the documented Spark mechanism, not a limitation of the store design;
Delta/Iceberg deployments get the same effect from their table layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def publish_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32
) -> None:
    """Publish a snapshot as a bucketed catalog table (overwrite semantics)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
