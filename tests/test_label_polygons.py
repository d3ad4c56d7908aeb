"""End-to-end label_polygons slice: semantic oracle (each footprint polygon
must be labeled with its own object's class) + numpy brute-force parity."""

import numpy as np
from pyspark.sql import functions as F

from geograypher_spark.functions import geometry as geom
from geograypher_spark.operators import aggregates as A
from geograypher_spark.operators import spatial_join as SJ
from geograypher_spark.plans import pipelines as P
from geograypher_spark.sources.scene import scene_to_spark


def test_label_polygons_semantic_oracle(spark, scene):
    """Each object's footprint polygon contains (mostly) that object's own
    faces → predicted class must equal the true class for every polygon."""
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    labeled = P.label_polygons(faces, polys).collect()
    truth = {p["polygon_id"]: p["class_id"] for p in scene.polygons}
    got = {r["polygon_id"]: int(r["pred_class"]) for r in labeled}
    assert got.keys() == truth.keys()
    assert got == truth


def test_overlap_area_matches_bruteforce(spark, scene):
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    got = SJ.triangles_polygon_overlap(
        faces.select("face_id", "x0", "y0", "z0", "x1", "y1", "z1",
                     "x2", "y2", "z2", "class_id"),
        polys.select("polygon_id", "geometry_wkb"),
    ).select("face_id", "polygon_id", "overlap_area").collect()
    got_map = {(r["face_id"], r["polygon_id"]): r["overlap_area"] for r in got}

    # brute force with the same clip kernel over ALL pairs (no candidate
    # pruning) — verifies the cell join loses nothing and areas agree
    f = scene.faces
    expected = {}
    for p in scene.polygons:
        polys_np = geom.wkb_to_rings(p["wkb"])
        for i in range(len(f["face_id"])):
            tri = np.array([
                [f["x0"][i], f["y0"][i]],
                [f["x1"][i], f["y1"][i]],
                [f["x2"][i], f["y2"][i]],
            ])
            a = 0.0
            for rings in polys_np:
                a += geom.clip_area_convex(rings[0], tri)
                for hole in rings[1:]:
                    a -= geom.clip_area_convex(hole, tri)
            if a > 1e-9:  # same sliver threshold as the operator default
                expected[(int(f["face_id"][i]), int(p["polygon_id"]))] = a
    assert got_map.keys() == expected.keys()
    for k in expected:
        assert abs(got_map[k] - expected[k]) < 1e-9


def test_weighted_argmax_tie_break_deterministic(spark):
    rows = [(1, 0, 2.0), (1, 1, 2.0), (2, 5, 1.0)]  # polygon 1: exact tie
    df = spark.createDataFrame(rows, "polygon_id int, class_id int, weight double")
    out = {r["polygon_id"]: r["pred_class"]
           for r in A.weighted_argmax(df, ["polygon_id"], "class_id", "weight").collect()}
    assert out == {1: 0, 2: 5}  # lowest class wins ties


def test_mode_vote(spark):
    rows = [(1, 0), (1, 0), (1, 1), (2, 3), (2, 3), (2, 2), (2, 2)]
    df = spark.createDataFrame(rows, "face_id int, class_id int")
    out = {r["face_id"]: (r["mode_class"], r["votes"])
           for r in A.mode_vote(df, ["face_id"], "class_id").collect()}
    assert out == {1: (0, 2), 2: (2, 2)}  # tie at face 2 → lowest class


def test_multiview_mean_null_semantics(spark):
    rows = [(1, 2.0), (1, 4.0), (1, None), (2, None)]
    df = spark.createDataFrame(rows, "face_id int, v double")
    out = {r["face_id"]: (r["mean_value"], r["n_obs"])
           for r in A.multiview_mean(df, ["face_id"], "v").collect()}
    assert out[1] == (3.0, 2)
    assert out[2][0] is None and out[2][1] == 0


def test_covering_grid(spark, scene):
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    grid = A.covering_grid(verts, "x", "y", "z", n_cells=10,
                           xmin=0, ymin=0, xmax=10, ymax=10, z_buffer=0.25)
    rows = grid.collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert r["z_ceiling"] >= r["z_floor"]
    # objects have z up to 1.0 → some cell ceiling reaches 1.25 with buffer
    assert max(r["z_ceiling"] for r in rows) >= 1.0
