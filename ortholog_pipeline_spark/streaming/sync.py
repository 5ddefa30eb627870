"""``foreachBatch`` adapter: run the batch CDC sync graph per micro-batch.

This is how the engine turns the reference's cron-style incremental load
(SURVEY.md §3.1/§3.2) into a continuous pipeline without duplicating logic: each
micro-batch of freshly landed source rows is pushed through the SAME batch operators
(sync_full_outer J10 → verdict sets → StateStore.apply_changes), so batch and
streaming share one tested code path. Exactly-once comes from the sink side:
micro-batch outputs are idempotent snapshot merges keyed on the unique key, and the
checkpoint dir makes replays re-run the same deterministic merge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ortholog_pipeline_spark.operators import sync as sync_ops
from ortholog_pipeline_spark.sources.state import StateStore


def foreach_batch_sync(
    stream: DataFrame,
    store: StateStore,
    table: str,
    unique_key: list[str],
    content_cols: list[str],
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Write a stream into a state table via per-batch CDC merge.

    Per micro-batch: optional ``transform`` (the batch parser/filter stack) →
    J10 full-outer verdict join vs the current snapshot → apply
    inserts/updates (deletes never happen from a partial batch — staleness is a
    batch-level decision, mirroring the reference's run-scoped stale pass).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        incoming = transform(batch_df) if transform is not None else batch_df
        incoming = incoming.select(*unique_key, *content_cols).dropDuplicates(unique_key)
        existing = store.read(table, incoming.schema)
        verdicts = sync_ops.sync_full_outer(
            incoming, existing, unique_key, content_cols
        )
        inserts = verdicts.filter(
            F.col("sync_verdict") == sync_ops.INSERT
        ).select(*unique_key, *content_cols)
        updates = verdicts.filter(
            F.col("sync_verdict") == sync_ops.UPDATE
        ).select(*unique_key, *content_cols)
        store.apply_changes(
            table,
            inserts=inserts,
            updates=updates,
            update_key=unique_key,
            schema=incoming.schema,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
