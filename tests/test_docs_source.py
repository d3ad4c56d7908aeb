"""Interleaved-document source: span-sequence equality round trip (the
driver's per-row invariant) + lossless typed parsing."""

import numpy as np
from pyspark.sql import functions as F

from geograypher_spark.sources import docs as D
from geograypher_spark.sources.scene import make_scene


def test_span_roundtrip_equality(spark, scene):
    docs, payloads = D.docs_from_scene(spark, scene)
    spans = D.explode_spans(docs)
    rebuilt = D.reassemble_docs(spans)
    orig = {r["doc_id"]: r["spans"] for r in docs.collect()}
    back = {r["doc_id"]: r["spans"] for r in rebuilt.collect()}
    assert orig.keys() == back.keys()
    for k in orig:
        o = [(s.kind, s.text, s.media_ref, s.offset) for s in orig[k]]
        b = [(s.kind, s.text, s.media_ref, s.offset) for s in back[k]]
        assert o == b, f"span sequence mismatch for {k}"


def test_parse_cameras_lossless(spark, scene):
    docs, payloads = D.docs_from_scene(spark, scene)
    spans = D.explode_spans(docs)
    cams = D.parse_cameras(spans, payloads).orderBy("camera_id").collect()
    assert len(cams) == len(scene.cameras)
    for row, ref in zip(cams, scene.cameras):
        assert row["camera_id"] == ref["camera_id"]
        np.testing.assert_allclose(row["cam_to_world"], ref["cam_to_world"])
        assert row["f"] == ref["f"]
        assert (row["w"], row["h"]) == (ref["w"], ref["h"])


def test_parse_faces_lossless(spark, scene):
    docs, payloads = D.docs_from_scene(spark, scene)
    spans = D.explode_spans(docs)
    faces = D.parse_faces(spans, payloads)
    n_ref = len(scene.faces["face_id"])
    assert faces.count() == n_ref
    got = {r["face_id"]: r for r in faces.collect()}
    f = scene.faces
    for i in (0, n_ref // 2, n_ref - 1):
        fid = int(f["face_id"][i])
        r = got[fid]
        for k in ("x0", "y0", "z0", "x1", "y1", "z1", "x2", "y2", "z2"):
            assert r[k] == f[k][i]
        ref_cls = f["class_id"][i]
        if np.isnan(ref_cls):
            assert r["class_id"] is None
        else:
            assert r["class_id"] == ref_cls


def test_parse_polygons_lossless(spark, scene):
    docs, payloads = D.docs_from_scene(spark, scene)
    spans = D.explode_spans(docs)
    polys = D.parse_polygons(spans, payloads).orderBy("polygon_id").collect()
    assert len(polys) == len(scene.polygons)
    for row, ref in zip(polys, scene.polygons):
        assert bytes(row["geometry_wkb"]) == ref["wkb"]
        assert row["class_name"] == ref["class_name"]


def test_media_spans_reference_every_payload(spark, scene):
    docs, payloads = D.docs_from_scene(spark, scene)
    spans = D.explode_spans(docs)
    n_media = spans.filter(F.col("kind") == "media").count()
    assert n_media == payloads.count()
    # anti-join: no dangling refs either direction (F9 validation analog)
    dangling = (
        spans.filter(F.col("kind") == "media")
        .join(payloads, "media_ref", "left_anti").count()
    )
    assert dangling == 0
