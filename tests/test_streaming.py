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
