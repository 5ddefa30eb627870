"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API): a
deterministic synthetic-events generator.

Why this exists: load/perf testing and pipeline rehearsal need input that (a)
parallelizes like a real source — the reader declares ``partitions()`` and
Spark schedules one task per partition, exactly like file splits — and (b) is
REPRODUCIBLE: every cell derives from md5(seed, row_id), so two clusters, two
runs, or two engines generate the identical table (the same portability
contract as the registry's sampling/sketch operators; a DuckDB oracle could
replay it cell-for-cell).

This is also the template for wrapping any external system Spark lacks a
connector for (a cursor-paged REST API, a bespoke binary format): implement
``partitions()`` to carve the keyspace and ``read(partition)`` to yield rows
for one shard — the API keeps fetching distributed and restartable instead of
a driver-side download.

Usage::

    from ortholog_pipeline_spark.sources.pyds import register_synth_source
    register_synth_source(spark)
    df = (spark.read.format("synth_events")
          .option("rows", 100000).option("partitions", 32).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "signup", "purchase", "error")

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _cell(seed: str, row: int, field: str) -> int:
    """60-bit deterministic hash for one cell — the generator's only RNG."""
    h = hashlib.md5(f"{seed}|{row}|{field}".encode()).hexdigest()[:15]
    return int(h, 16)


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = options.get("seed", "s0")

    def partitions(self) -> list[InputPartition]:
        # carve [0, rows) into contiguous shards — one Spark task each
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        lo = self.rows * i // self.n_parts
        hi = self.rows * (i + 1) // self.n_parts
        for r in range(lo, hi):
            yield (
                r,
                _cell(self.seed, r, "u") % 1000,
                EVENT_TYPES[_cell(self.seed, r, "t") % len(EVENT_TYPES)],
                (_cell(self.seed, r, "v") % 100_000) / 100.0,
            )


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)


def register_synth_source(spark) -> None:
    spark.dataSource.register(SynthEventsDataSource)
