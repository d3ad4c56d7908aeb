"""Structured Streaming ingest for the interleaved document table.

The reference is strictly batch (SURVEY §2.8) — its only pipelining is
Python generators. At 10¹²-doc scale, ingest is continuous: new document
files land and must flow through parse → typed tables → incremental
aggregates without reprocessing history. This module provides that path:

- ``read_doc_stream``: file-source stream over the documents table schema
  (Iceberg/parquet directory; new files are discovered incrementally)
- ``stream_spans``: the same lossless posexplode parse as batch — the
  transformation layer is shared, only the source/sink differ
- ``stream_span_counts``: event-time-style windowed aggregation example
  with a watermark (late spans beyond the watermark are dropped
  deterministically)

All sinks are checkpointed (``checkpointLocation``) — exactly-once into
file sinks, at-least-once into foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.docs import DOC_SCHEMA


def read_doc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16,
) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_spans(docs: DataFrame) -> DataFrame:
    """Identical transformation to sources.docs.explode_spans — reused on a
    streaming DataFrame (the plan is source-agnostic)."""
    from ..sources.docs import explode_spans

    return explode_spans(docs)


def stream_span_counts(
    spans: DataFrame, ingest_ts_col: str = "ingest_ts",
    window: str = "1 minute", watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed per-kind span counts with a watermark — the incremental
    analog of the batch per-partition row-count metrics (A16 / north_rule
    lineage metrics)."""
    with_ts = spans.withColumn(
        ingest_ts_col, F.current_timestamp()) if ingest_ts_col not in spans.columns else spans
    return (
        with_ts.withWatermark(ingest_ts_col, watermark)
        .groupBy(F.window(F.col(ingest_ts_col), window), F.col("kind"))
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


def write_stream_parquet(
    df: DataFrame, out_path: str, checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Checkpointed append sink; availableNow processes the backlog then
    stops (batch-like semantics for tests and backfills)."""
    w = df.writeStream.format("parquet") \
        .option("path", out_path) \
        .option("checkpointLocation", checkpoint_path) \
        .outputMode("append")
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
