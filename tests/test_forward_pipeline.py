"""End-to-end forward pipeline (aggregate_images analog): images → mesh →
map. Semantic oracle: every object face visible to ≥1 camera must get its
own true class back; ground faces stay unlabeled; the exported per-class
unions contain the object centroids."""

import json

import numpy as np
from pyspark.sql import functions as F

from geograypher_spark.functions import geometry as geom
from geograypher_spark.plans.pipelines import forward_pipeline
from geograypher_spark.sources.scene import scene_to_spark


def test_forward_pipeline_recovers_classes(spark, scene, tmp_path):
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    truth = faces.select("face_id", "class_id").filter(
        F.col("class_id").isNotNull())
    out = str(tmp_path / "preds.geojson")
    pred = forward_pipeline(spark, cams, faces, verts, truth,
                            export_geojson_path=out)
    rows = pred.collect()
    assert len(rows) > 0
    # every predicted face matches its true class (LookUp segmentation is
    # exact, so any mismatch = a visibility/aggregation bug)
    true_map = {r["face_id"]: r["class_id"] for r in truth.collect()}
    for r in rows:
        assert float(r["pred_class"]) == true_map[r["face_id"]], r
    # only object faces are ever predicted (ground has NULL class)
    assert set(true_map) >= {r["face_id"] for r in rows}
    # at least one face of most objects is visible from the camera grid
    f = scene.faces
    pred_objs = {int(f["object_id"][r["face_id"]]) for r in rows}
    assert len(pred_objs) >= scene.params["n_objects"] - 1

    # exported unions exist and contain their object centroids
    doc = json.load(open(out))
    assert len(doc["features"]) >= 1
    feats = {feat["properties"]["class_id"]: feat for feat in doc["features"]}
    for p in scene.polygons:
        cls = float(p["class_id"])
        if cls not in feats:
            continue
        rings = geom.wkb_to_rings(p["wkb"])
        cx, cy = geom.ring_centroid(rings[0][0])
        coords = feats[cls]["geometry"]["coordinates"]
        hit = any(
            geom.points_in_polygon(
                np.array([cx]), np.array([cy]),
                [np.array(ring) for ring in poly])[0]
            for poly in coords)
        assert hit, f"object {p['polygon_id']} centroid not in class {cls} union"


def test_aggregate_images_n_cameras_across_classes(spark):
    """n_cameras is the distinct cameras observing a FACE, not the max of
    per-class camera counts: a face seen by 2 cameras voting different
    classes must report n_cameras=2 and survive min_observations=2."""
    from geograypher_spark.plans.pipelines import aggregate_images

    rows = [
        # face 1: cam 1 says class 10 (3 px), cam 2 says class 20 (1 px)
        (1, 1, 10, 3), (2, 1, 20, 1),
        # face 2: one camera only
        (3, 2, 10, 5),
    ]
    pc = spark.createDataFrame(
        rows, "camera_id long, face_id long, class_id long, pixel_count long")
    got = {r["face_id"]: r for r in aggregate_images(pc).collect()}
    assert got[1]["n_cameras"] == 2 and got[1]["pred_class"] == 10
    assert got[2]["n_cameras"] == 1
    kept = aggregate_images(pc, min_observations=2).collect()
    assert [r["face_id"] for r in kept] == [1]
