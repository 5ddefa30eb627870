"""ortholog_pipeline_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rat-genome-database/ortholog-pipeline.

The reference (surveyed in SURVEY.md) is a single-JVM Java batch ETL pipeline. This
package re-expresses its dataflow semantics — schema'd file scans, lookup/resolution
joins, per-group top-1 selection windows, set-valued string columns, symmetric relation
closure, and incremental CDC sync against persistent snapshots — as declarative Spark
DataFrame plans that Catalyst/Tungsten can optimize and that scale by partitioning.

Layout:
    session     SparkSession factory tuned for the engine (AQE, shuffle partitions)
    schemas     explicit StructType schemas for source files and state tables
    sources/    HCOP / NCBI / Alliance TSV readers + snapshot state store
    functions/  scalar/string/text/vector column helpers (Catalyst-side, no UDFs
                in the hot path)
    operators/  the §2 operator inventory: resolution join, grouping+dedup-merge,
                complement closure, best-fit windows, CDC sync, dedup, similarity
    plans/      end-to-end flows (species load, AGR load, fix-xref maintenance)
    streaming/  Structured Streaming wrappers over the batch graph
    multimodal  binary media columns over Arrow-batched mapInPandas (stub codecs)
"""

__version__ = "0.1.0"
