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


def stream_exact_dedup(
    docs: DataFrame, ingest_ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash wins
    across micro-batches. ``dropDuplicates`` on a streaming frame keeps
    per-key state; the watermark bounds that state (a hash unseen for
    ``watermark`` of event time is evicted — at 10¹² docs unbounded state
    is the failure mode, so eviction is the design, not a compromise).
    Incremental analog of ``operators.dedup.exact_duplicates``."""
    with_ts = docs.withColumn(
        ingest_ts_col, F.current_timestamp()
    ) if ingest_ts_col not in docs.columns else docs
    return (
        with_ts
        .withColumn("content_hash", F.md5(F.col("text")))
        .withWatermark(ingest_ts_col, watermark)
        .dropDuplicates(["content_hash"])
    )


def stream_running_class_state(
    pixel_classes: DataFrame, ingest_ts_col: str = "ingest_ts",
    watermark: str = "10 minutes", timeout_minutes: int = 30,
):
    """Custom stateful operator (applyInPandasWithState): running per-face
    class-vote totals over a stream of (face_id, class_id, pixel_count)
    observations — the incremental form of ``aggregate_images`` (new
    cameras land continuously; the per-face argmax must update without
    reprocessing history). Emits one row per face per micro-batch with the
    current winner; per-face state times out after ``timeout_minutes`` of
    no observations."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("face_id", T.LongType()),
        T.StructField("pred_class", T.LongType()),
        T.StructField("total_weight", T.LongType()),
        T.StructField("n_obs", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("classes", T.ArrayType(T.LongType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
        T.StructField("n_obs", T.LongType()),
    ])

    def update(key, pdfs, state):
        votes: dict[int, int] = {}
        n_obs = 0
        if state.exists:
            classes, weights, n_obs = state.get
            votes = dict(zip(classes, weights))
        for pdf in pdfs:
            for cls, w in zip(pdf["class_id"], pdf["pixel_count"]):
                votes[int(cls)] = votes.get(int(cls), 0) + int(w)
                n_obs += 1
        state.update((list(votes), [votes[c] for c in votes], n_obs))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        # deterministic winner: max weight, ties to lowest class id
        pred = min(votes, key=lambda c: (-votes[c], c))
        yield pd.DataFrame({
            "face_id": [int(key[0])], "pred_class": [pred],
            "total_weight": [votes[pred]], "n_obs": [n_obs]})

    with_ts = pixel_classes.withColumn(
        ingest_ts_col, F.current_timestamp()
    ) if ingest_ts_col not in pixel_classes.columns else pixel_classes
    return (
        with_ts.withWatermark(ingest_ts_col, watermark)
        .groupBy("face_id")
        .applyInPandasWithState(
            update, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
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
