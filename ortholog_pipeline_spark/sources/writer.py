"""Layout-controlled dataset writer: the output-side counterpart of the scan
pushdown rules (`tests/test_explain_plans.py`) — at 100 TB the FILE LAYOUT you
write is the query performance the next job gets.

What it controls, and why each matters at scale:

* **format** — parquet or ORC, both JVM-native columnar writers (same
  DataFrame, same plan; only the sink node differs). ORC coverage means a
  consumer standardized on Hive/Presto-era ORC pipelines can read the
  engine's outputs without a conversion hop.
* **partition_by** — directory partitioning drives partition PRUNING for
  every downstream reader; choose low-cardinality columns (a high-cardinality
  partition column is the classic small-files generator).
* **sort_by** — `sortWithinPartitions` before the write gives every file
  tight min/max column statistics, which is what parquet/ORC row-group
  skipping and Z-order-style clustering (operators/layout.py) consume. The
  sort is per output TASK (no global shuffle added by this writer).
* **max_records_per_file** — bounds file size without a repartition; combined
  with `StateStore.compact` this is the small-file lifecycle: bound at write
  time, compact after many incremental publishes.

Reference: OrthologRelationDao.java writes rows one UPDATE at a time into
Oracle (no layout concept); this module is the engine-native replacement for
"the table the next stage reads"."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc")


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    bloom_filter_cols: list[str] | None = None,
    bloom_filter_ndv: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` with explicit layout control (see module docstring).

    ``bloom_filter_cols`` (parquet only) embeds a bloom filter per listed
    column in every file — the point-lookup complement to min/max stats: sort
    keys skip RANGES, blooms skip files for high-cardinality EQUALITY probes
    (needle-in-haystack id lookups) where min/max spans everything. ``ndv``
    sizes the filter (expected distinct values per file). Note parquet-mr
    intentionally writes NO bloom for a column whose pages all stayed
    dictionary-encoded — the dictionary is already an exact membership
    filter; the option only pays bytes on genuinely high-cardinality data,
    which is exactly when you want it."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if bloom_filter_cols and fmt != "parquet":
        raise ValueError("bloom_filter_cols is parquet-only")
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).format(fmt)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    for c in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_filter_ndv)
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_dataset(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    return spark.read.format(fmt).load(path)


def layout_stats(path: str) -> dict:
    """Audit the written layout: data-file count, total bytes, partition
    directory count. Driver-side directory walk (metadata-sized, not
    data-sized)."""
    n_files = n_dirs = total = 0
    for root, dirs, files in os.walk(path):
        for d in dirs:
            if "=" in d:
                n_dirs += 1
        for f in files:
            if f.endswith((".parquet", ".orc")):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    return {"n_data_files": n_files, "n_partition_dirs": n_dirs, "total_bytes": total}
