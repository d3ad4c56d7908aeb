"""Deterministic synthetic drone-survey scene generator (pure numpy).

Fixture analog of the reference's procedural test scene
(``utils/example_data.py:9-113``: boxes/cylinders/cones on a triangulated
ground plane, seed=42) and its analytic nadir camera harness
(``utils/test_utils.py:11-156``). Re-derived from the documented behavior,
not copied: we emit *tables* (verts/faces/polygons/cameras/dtm tiles), which
is what the Spark engine consumes.

All geometry is in a planar working CRS (meters). Classes:
0=cube, 1=cylinder, 2=cone; ground faces have class NULL (NaN).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions import geometry as geom

CLASS_NAMES = {0: "cube", 1: "cylinder", 2: "cone"}


@dataclass
class SceneTables:
    """Columnar scene fixture. Arrays are parallel per table."""
    verts: dict[str, np.ndarray]      # vert_id, x, y, z
    faces: dict[str, np.ndarray]      # face_id, v0..v2, 9 coords, cx/cy/cz, object_id, class_id
    polygons: list[dict]              # polygon_id, wkb, class_id, class_name
    cameras: list[dict]               # camera_id, cam_to_world(16), f, cx, cy, w, h
    params: dict = field(default_factory=dict)


def _non_overlapping_points(n: int, size: float, min_dist: float, rng: np.random.Generator) -> np.ndarray:
    """Rejection-sample n points in [1, size-1]^2 pairwise ≥ min_dist apart
    (same contract as reference ``create_non_overlapping_points``)."""
    pts: list[np.ndarray] = []
    while len(pts) < n:
        cand = rng.uniform(1.0, size - 1.0, size=2)
        if all(np.linalg.norm(cand - p) >= min_dist for p in pts):
            pts.append(cand)
    return np.asarray(pts)


def _kgon(cx: float, cy: float, radius: float, k: int) -> np.ndarray:
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
    return np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], axis=1)


def _extrude(base: np.ndarray, z0: float, z1: float, apex: bool) -> tuple[np.ndarray, np.ndarray]:
    """Triangulate a prism (apex=False) or cone (apex=True) over a convex
    CCW base ring. Returns (verts (m,3), tris (t,3) local indices)."""
    k = len(base)
    cx, cy = base.mean(axis=0)
    verts = [np.array([bx, by, z0]) for bx, by in base]          # 0..k-1 bottom
    tris: list[list[int]] = []
    if apex:
        verts.append(np.array([cx, cy, z1]))                     # k apex
        verts.append(np.array([cx, cy, z0]))                     # k+1 bottom center
        for i in range(k):
            j = (i + 1) % k
            tris.append([i, j, k])          # side
            tris.append([j, i, k + 1])      # bottom
    else:
        for bx, by in base:
            verts.append(np.array([bx, by, z1]))                 # k..2k-1 top
        verts.append(np.array([cx, cy, z1]))                     # 2k top center
        verts.append(np.array([cx, cy, z0]))                     # 2k+1 bottom center
        for i in range(k):
            j = (i + 1) % k
            tris.append([i, j, k + i])
            tris.append([j, k + j, k + i])
            tris.append([k + i, k + j, 2 * k])   # top fan
            tris.append([j, i, 2 * k + 1])       # bottom fan
    return np.vstack(verts), np.asarray(tris, dtype=np.int64)


def make_scene(
    n_boxes: int = 4,
    n_cylinders: int = 5,
    n_cones: int = 3,
    seed: int = 42,
    size: float = 10.0,
    distance_thresh: float = 1.0,
    ground_grid: int = 20,
    object_radius: float = 0.45,
    object_height: float = 1.0,
    camera_grid: int = 3,
    camera_height: float = 12.0,
    image_size: int = 200,
    focal: float = 120.0,
) -> SceneTables:
    rng = np.random.default_rng(seed)
    verts: list[np.ndarray] = []
    tris: list[np.ndarray] = []
    face_obj: list[np.ndarray] = []
    face_cls: list[np.ndarray] = []

    # ground plane grid, z=0, class NaN
    g = ground_grid
    xs = np.linspace(0, size, g + 1)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    ground_v = np.stack([gx.ravel(), gy.ravel(), np.zeros((g + 1) ** 2)], axis=1)
    verts.append(ground_v)
    idx = np.arange((g + 1) ** 2).reshape(g + 1, g + 1)
    a = idx[:-1, :-1].ravel(); b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel(); d = idx[:-1, 1:].ravel()
    ground_t = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)])
    tris.append(ground_t)
    face_obj.append(np.full(len(ground_t), np.nan))
    face_cls.append(np.full(len(ground_t), np.nan))
    v_off = len(ground_v)

    # objects
    n_obj = n_boxes + n_cylinders + n_cones
    centers = _non_overlapping_points(n_obj, size, distance_thresh, rng)
    polygons: list[dict] = []
    obj_id = 0
    specs = [(n_boxes, 0, 4), (n_cylinders, 1, 12), (n_cones, 2, 12)]
    for count, cls, kgon in specs:
        for _ in range(count):
            cx, cy = centers[obj_id]
            base = _kgon(cx, cy, object_radius, kgon)
            ov, ot = _extrude(base, 0.0, object_height, apex=(cls == 2))
            verts.append(ov)
            tris.append(ot + v_off)
            face_obj.append(np.full(len(ot), float(obj_id)))
            face_cls.append(np.full(len(ot), float(cls)))
            v_off += len(ov)
            polygons.append({
                "polygon_id": obj_id,
                "wkb": geom.polygon_to_wkb([base]),
                "class_id": cls,
                "class_name": CLASS_NAMES[cls],
            })
            obj_id += 1

    V = np.vstack(verts)
    T = np.vstack(tris)
    OBJ = np.concatenate(face_obj)
    CLS = np.concatenate(face_cls)
    p0, p1, p2 = V[T[:, 0]], V[T[:, 1]], V[T[:, 2]]
    centroid = (p0 + p1 + p2) / 3.0

    faces = {
        "face_id": np.arange(len(T), dtype=np.int64),
        "v0": T[:, 0], "v1": T[:, 1], "v2": T[:, 2],
        "x0": p0[:, 0], "y0": p0[:, 1], "z0": p0[:, 2],
        "x1": p1[:, 0], "y1": p1[:, 1], "z1": p1[:, 2],
        "x2": p2[:, 0], "y2": p2[:, 1], "z2": p2[:, 2],
        "cx": centroid[:, 0], "cy": centroid[:, 1], "cz": centroid[:, 2],
        "object_id": OBJ, "class_id": CLS,
    }
    vert_tab = {
        "vert_id": np.arange(len(V), dtype=np.int64),
        "x": V[:, 0], "y": V[:, 1], "z": V[:, 2],
    }

    # nadir camera grid: look straight down (camera +z axis = world -z),
    # matching the reference's downward_view convention
    # (utils/test_utils.py: cam_to_world = [[1,0,0],[0,-1,0],[0,0,-1]] + t)
    cameras: list[dict] = []
    cam_xy = np.linspace(size * 0.2, size * 0.8, camera_grid)
    cam_id = 0
    for cyy in cam_xy:
        for cxx in cam_xy:
            c2w = np.array([
                [1, 0, 0, cxx],
                [0, -1, 0, cyy],
                [0, 0, -1, camera_height],
                [0, 0, 0, 1],
            ], dtype=np.float64)
            cameras.append({
                "camera_id": cam_id,
                "cam_to_world": c2w.ravel().tolist(),
                "f": focal, "cx": 0.0, "cy": 0.0,
                "w": image_size, "h": image_size,
            })
            cam_id += 1

    return SceneTables(
        verts=vert_tab, faces=faces, polygons=polygons, cameras=cameras,
        params={"size": size, "seed": seed, "n_objects": n_obj},
    )


def scene_to_spark(spark, scene: SceneTables):
    """Materialize the fixture as Spark DataFrames (verts, faces, polygons,
    cameras)."""
    import pandas as pd

    verts = spark.createDataFrame(pd.DataFrame(scene.verts))
    faces = spark.createDataFrame(pd.DataFrame(scene.faces))
    polys = spark.createDataFrame(
        pd.DataFrame([
            {"polygon_id": p["polygon_id"], "geometry_wkb": p["wkb"],
             "class_id": p["class_id"], "class_name": p["class_name"]}
            for p in scene.polygons
        ])
    )
    cams = spark.createDataFrame(pd.DataFrame(scene.cameras))
    return verts, faces, polys, cams
