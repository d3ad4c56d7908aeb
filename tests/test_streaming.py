"""Streaming ingest: file-source doc stream → span parse → checkpointed
sink; resume processes only new files."""

import numpy as np

from geograypher_spark.sources import docs as D
from geograypher_spark.sources.scene import make_scene
from geograypher_spark.streaming import ingest as ST


def test_stream_parse_roundtrip(spark, tmp_path):
    scene = make_scene(seed=5, camera_grid=2, ground_grid=8)
    docs, payloads = D.docs_from_scene(spark, scene)
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    stream = ST.read_doc_stream(spark, src)
    assert stream.isStreaming
    spans = ST.stream_spans(stream)
    out = str(tmp_path / "spans_out")
    ckpt = str(tmp_path / "ckpt")
    q = ST.write_stream_parquet(spans, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = D.explode_spans(docs)
    assert got.count() == expected.count()
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in expected.collect()}
    assert a == b

    # resume: append one new doc file; only the delta is processed
    extra = docs.limit(1).withColumnRenamed("doc_id", "doc_id")
    extra = extra.selectExpr("concat('extra-', doc_id) AS doc_id", "spans")
    extra.write.mode("append").parquet(src)
    q2 = ST.write_stream_parquet(
        ST.stream_spans(ST.read_doc_stream(spark, src)), out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    n_extra = got2.filter("doc_id LIKE 'extra-%'").count()
    assert n_extra > 0
    assert got2.count() == expected.count() + n_extra


def test_stream_exact_dedup(spark, tmp_path):
    """First occurrence wins across micro-batches; state bounded by
    watermark. Duplicate docs written across two source files must emit
    exactly one row per content hash."""
    import pandas as pd

    src = str(tmp_path / "dd_src")
    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["same text", "same text", "unique text"]})
    spark.createDataFrame(pdf).write.parquet(src)

    from pyspark.sql import functions as F
    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    deduped = ST.stream_exact_dedup(stream)
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    q = (deduped.select("doc_id", "text", "content_hash")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2  # one per distinct text
    assert got.select("content_hash").distinct().count() == 2


def test_stream_running_class_state(spark, tmp_path):
    """applyInPandasWithState running per-face vote totals: two source
    files (two micro-batches) accumulate across batches — camera 2's votes
    must ADD to camera 1's state, flipping the winner."""
    import pandas as pd

    src = str(tmp_path / "pc_src")
    # batch 1: face 7 sees class 10 with 5 px
    spark.createDataFrame(pd.DataFrame({
        "face_id": [7], "class_id": [10], "pixel_count": [5]})) \
        .write.parquet(src)
    # batch 2: class 20 arrives with 3 px then 4 px → total 7 > 5
    spark.createDataFrame(pd.DataFrame({
        "face_id": [7, 7], "class_id": [20, 20], "pixel_count": [3, 4]})) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream
              .schema("face_id long, class_id long, pixel_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    running = ST.stream_running_class_state(stream)
    out = str(tmp_path / "pc_out")
    ckpt = str(tmp_path / "pc_ckpt")
    # update-mode operator → foreachBatch sink (file sinks are append-only)
    q = (running.writeStream
         .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
         .option("checkpointLocation", ckpt)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    # one emission per micro-batch that touched the face; the LAST state
    # must show the accumulated winner
    final = max(got, key=lambda r: r["n_obs"])
    assert final["n_obs"] == 3
    assert final["pred_class"] == 20 and final["total_weight"] == 7
