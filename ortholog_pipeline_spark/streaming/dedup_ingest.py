"""Streaming corpus ingest with incremental near-dup rejection.

The batch operator (``dedup.incremental_minhash_dedup``) probes a new batch
against the existing corpus; this module wires it into a Structured Streaming
ingest: documents land as files, each micro-batch is (a) exact-deduped against
the corpus by content fingerprint, (b) near-dup-probed against the corpus with
the batch-side-broadcast MinHash band join, and only the survivors are appended
to the corpus snapshot. This is the standard admission-control shape for a
continuously-growing 100 TB training corpus — per-batch cost proportional to
the batch, never the corpus (the corpus side's shingle/band frames are
recomputed here from the snapshot for simplicity; production stores them as
derived snapshot tables the same way ``ann_index`` stores its cells).

Idempotency: the checkpoint processes each landed file once, and the sink
re-checks doc_id existence per batch, so replays insert nothing — the same
two-layer guard as ``ann_ingest``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ortholog_pipeline_spark.functions.text import fingerprint
from ortholog_pipeline_spark.operators.dedup import incremental_minhash_dedup
from ortholog_pipeline_spark.sources.state import StateStore

#: Landed document files match the driver's documents.parquet shape.
DOCUMENTS_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_stream_documents(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    reader = (
        spark.readStream.format("parquet")
        .schema(DOCUMENTS_LANDING_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(landing_dir)


def dedup_ingest_stream(
    store: StateStore,
    stream: DataFrame,
    checkpoint_dir: str,
    name: str = "corpus",
    threshold: float = 0.5,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Admit only novel documents into the corpus snapshot: drop micro-batch
    rows that (1) repeat an already-ingested doc_id, (2) exactly match an
    existing document's fingerprint, or (3) near-duplicate an existing
    document above ``threshold`` Jaccard."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        corpus = store.read(name)
        batch = batch_df.dropDuplicates(["doc_id"]).join(
            corpus.select("doc_id"), "doc_id", "left_anti"
        )
        # exact content dup: fingerprint anti-join (cheap, catches verbatim)
        batch = batch.withColumn("_fp", fingerprint("text")).join(
            corpus.select(fingerprint("text").alias("_fp")).dropDuplicates(),
            "_fp",
            "left_anti",
        )
        # near-dup: batch-broadcast MinHash probe against the corpus
        near = incremental_minhash_dedup(
            corpus, batch, threshold=threshold
        ).select(F.col("batch_id").alias("doc_id"))
        fresh = batch.join(near.dropDuplicates(), "doc_id", "left_anti").drop(
            "_fp"
        )
        if fresh.limit(1).count() == 0:
            return
        store.apply_changes(name, inserts=fresh)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
