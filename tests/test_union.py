"""Per-class geometry union via boundary-edge extraction, on the scene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geograypher_spark.functions import geometry as geom
from geograypher_spark.operators.union import face_class_union
from geograypher_spark.sources.scene import scene_to_spark


def kgon_area(r, k):
    return 0.5 * k * r * r * np.sin(2 * np.pi / k)


def test_class_union_areas(spark, scene):
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    got = {r["class_id"]: r for r in face_class_union(faces, verts).collect()}
    # cube class 0: 4 objects, square base (k=4) radius 0.45
    # cylinder class 1: 5 objects, 12-gon; cone class 2: 3 objects, 12-gon
    expect = {
        0.0: 4 * kgon_area(0.45, 4),
        1.0: 5 * kgon_area(0.45, 12),
        2.0: 3 * kgon_area(0.45, 12),
    }
    assert got.keys() == expect.keys()
    for cls, area in expect.items():
        assert got[cls]["area"] == pytest.approx(area, rel=1e-9)
    assert got[0.0]["n_rings"] == 4
    assert got[1.0]["n_rings"] == 5
    assert got[2.0]["n_rings"] == 3


def test_union_geometry_contains_object_centers(spark, scene):
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    unions = {r["class_id"]: bytes(r["geometry_wkb"])
              for r in face_class_union(faces, verts).collect()}
    # each object's footprint centroid must be inside its class union and
    # outside every other class union
    for p in scene.polygons:
        rings = geom.wkb_to_rings(p["wkb"])
        cx, cy = geom.ring_centroid(np.vstack([rings[0][0], rings[0][0][:1]])
                                    if len(rings[0][0]) < 3 else rings[0][0])
        for cls, wkb in unions.items():
            hit = geom.points_in_wkb(np.array([cx]), np.array([cy]), wkb)[0]
            assert hit == (cls == float(p["class_id"]))


def test_ground_plane_union_open_sheet(spark, scene):
    """Ground faces (class NULL) tagged with a fake class → whole plane."""
    verts, faces, polys, cams = scene_to_spark(spark, scene)
    ground = faces.filter(F.col("class_id").isNull()).withColumn(
        "class_id", F.lit(99.0))
    got = face_class_union(ground, verts).collect()
    assert len(got) == 1
    size = scene.params["size"]
    assert got[0]["area"] == pytest.approx(size * size)
    assert got[0]["n_rings"] == 1
