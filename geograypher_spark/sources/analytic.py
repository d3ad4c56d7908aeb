"""Analytic flat-mesh fixtures for the driver-contract render queries.

The scene-fixture render pipelines (visibility z-buffer, tile
rasterization, forward aggregation) had no SQL oracle in round 1. On a
FLAT axis-aligned grid mesh with nadir cameras, the pixel→face mapping is
closed-form floor arithmetic — the same analytic oracle the pixel-exact
pytest uses (tests/test_visibility.py), expressible in plain SQL. These
fixtures re-point the contract queries at that construction so the DuckDB
oracle can compute the full expected output from first principles (no
pinned values).

EXACTNESS ARGUMENT (cross-engine): the camera offsets and grid origins are
chosen so every pixel-center's fractional cell coordinate stays ≥ 0.0125
cells away from every face edge (vertical, horizontal and the quad
diagonal u==v) — a margin 10 orders of magnitude above double-precision
noise. Both the engine's rasterizer and the oracle's floor arithmetic
therefore compute the mathematically exact mapping, so they agree bit-for-
bit on face ids and pixel counts. See the per-constant derivations below.

Mesh: (N x N) verts at (i*CELL - EXTENT, j*CELL - EXTENT, 0); quad (i, j)
splits into lower (a=(i,j), b=(i+1,j), c=(i+1,j+1)) covering v <= u and
upper (a, c, d=(i,j+1)); face ids: lower = i*(N-1)+j, upper = +(N-1)^2.
Class per face: (i + 2*j + is_upper) % N_CLASSES.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# mesh
N = 101                  # verts per side -> 100x100 quads, 20_000 faces
EXTENT = 2.0             # mesh spans [-2, 2]^2, z = 0
CELL = 2 * EXTENT / (N - 1)   # 0.04
N_CLASSES = 5

# nadir cameras: c2w = [1,0,0,offx; 0,-1,0,offy; 0,0,-1,Z]
CAM_F = 80.0
CAM_W = CAM_H = 160
CAM_Z = 2.0
# fi frac = frac(0.625*c + 0.3125 + 25*offx): offx=0.011 -> min gap to an
# integer 0.0375; offx=-0.013 -> 0.0125. fj analog with offy. Diagonal
# u-v = 0.125*m - 0.275 (cam 0) / - 0.925 (cam 1) mod 1: never 0, gap
# >= 0.025. All gaps >> 1e-12 double noise.
CAMERAS = [
    {"camera_id": 0, "offx": 0.011, "offy": 0.007},
    {"camera_id": 1, "offx": -0.013, "offy": 0.009},
]

# tile grid for the rasterization query: origins offset by 0.003/0.001 so
# pixel centers x = -2.003 + (gx+0.5)*0.05 give fi frac in {.55,.8,.05,.3}
# (gap 0.05) and fj frac in {.4,.15,.9,.65} (gap 0.1); u-v in
# {.15,.4,.65,.9} (gap 0.1) — no edge or diagonal ties.
GRID_X0 = -2.003
GRID_Y0 = 2.001
GRID_GSD = 0.05
GRID_TILE_PX = 32


def flat_mesh_faces_pdf() -> pd.DataFrame:
    """Faces table (face_id, v0..v2, x0..z2, cx, cy, cz, class_id)."""
    xs = np.linspace(-EXTENT, EXTENT, N)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([gx.ravel(), gy.ravel(), np.zeros(N * N)], axis=1)
    idx = np.arange(N * N).reshape(N, N)
    a = idx[:-1, :-1].ravel(); b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel(); d = idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)])
    ii, jj = np.meshgrid(np.arange(N - 1), np.arange(N - 1), indexing="ij")
    quad_class_lower = (ii.ravel() + 2 * jj.ravel()) % N_CLASSES
    quad_class_upper = (ii.ravel() + 2 * jj.ravel() + 1) % N_CLASSES
    classes = np.concatenate([quad_class_lower, quad_class_upper])
    p0, p1, p2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    cen = (p0 + p1 + p2) / 3
    return pd.DataFrame({
        "face_id": np.arange(len(tris), dtype=np.int64),
        "v0": tris[:, 0].astype(np.int64), "v1": tris[:, 1].astype(np.int64),
        "v2": tris[:, 2].astype(np.int64),
        "x0": p0[:, 0], "y0": p0[:, 1], "z0": p0[:, 2],
        "x1": p1[:, 0], "y1": p1[:, 1], "z1": p1[:, 2],
        "x2": p2[:, 0], "y2": p2[:, 1], "z2": p2[:, 2],
        "cx": cen[:, 0], "cy": cen[:, 1], "cz": cen[:, 2],
        "class_id": classes.astype(np.int64),
    })


def nadir_cameras_pdf() -> pd.DataFrame:
    rows = []
    for cam in CAMERAS:
        # all-float literals: the driver harness runs without Arrow, and
        # Spark's non-Arrow schema inference rejects mixed int/float lists.
        c2w = [1.0, 0.0, 0.0, float(cam["offx"]),
               0.0, -1.0, 0.0, float(cam["offy"]),
               0.0, 0.0, -1.0, float(CAM_Z),
               0.0, 0.0, 0.0, 1.0]
        rows.append({"camera_id": cam["camera_id"], "cam_to_world": c2w,
                     "f": CAM_F, "cx": 0.0, "cy": 0.0,
                     "w": CAM_W, "h": CAM_H})
    return pd.DataFrame(rows)


def _faces_schema():
    from pyspark.sql import types as T
    fields = [T.StructField("face_id", T.LongType())]
    fields += [T.StructField(c, T.LongType()) for c in ("v0", "v1", "v2")]
    fields += [T.StructField(c, T.DoubleType())
               for c in ("x0", "y0", "z0", "x1", "y1", "z1",
                         "x2", "y2", "z2", "cx", "cy", "cz")]
    fields.append(T.StructField("class_id", T.LongType()))
    return T.StructType(fields)


def _cameras_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("camera_id", T.LongType()),
        T.StructField("cam_to_world", T.ArrayType(T.DoubleType())),
        T.StructField("f", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("w", T.LongType()),
        T.StructField("h", T.LongType()),
    ])


def flat_mesh_spark(spark):
    # Explicit schemas on both calls: the driver's Arrow-less session cannot
    # infer array<double> from pandas object columns (round-2 VERDICT #1).
    faces = spark.createDataFrame(flat_mesh_faces_pdf(), schema=_faces_schema())
    cams = spark.createDataFrame(nadir_cameras_pdf(), schema=_cameras_schema())
    return faces, cams


# ---------------------------------------------------------------------------
# Reverse-pipeline fixture: stripe label polygons over the flat mesh
# ---------------------------------------------------------------------------
# Vertical x-stripes STRIPE_W cells wide label every mesh vertex; stripe
# boundaries sit at (STRIPE_W*m - 0.5)*CELL - EXTENT, half a cell from any
# vertex, so the PIP stage is unambiguous. Vertex i (vert-index along x)
# gets class (i // STRIPE_W) % N_CLASSES. The per-face 3-vertex mode vote
# is then closed-form: the lower triangle of cell (i, j) has two vertices
# at vert-index i+1 (majority), the upper two at i — so
#   face_class(lower) = cls(i+1),  face_class(upper) = cls(i),
# with ties only when cls(i) == cls(i+1) (unanimous, same answer).

STRIPE_W = 4


def flat_mesh_verts_pdf() -> pd.DataFrame:
    xs = np.linspace(-EXTENT, EXTENT, N)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    return pd.DataFrame({
        "vert_id": np.arange(N * N, dtype=np.int64),
        "x": gx.ravel(), "y": gy.ravel()})


def stripe_polygons_pdf() -> pd.DataFrame:
    from ..functions import geometry as geom

    n_stripes = (N - 1) // STRIPE_W + 1
    rows = []
    for m in range(n_stripes):
        x_lo = (STRIPE_W * m - 0.5) * CELL - EXTENT
        x_hi = (STRIPE_W * (m + 1) - 0.5) * CELL - EXTENT
        wkb = geom.polygon_to_wkb(
            [geom.rect_ring(x_lo, -EXTENT - 1.0, x_hi, EXTENT + 1.0)])
        rows.append({"polygon_id": m, "class_id": m % N_CLASSES,
                     "geometry_wkb": wkb})
    return pd.DataFrame(rows)


def reverse_fixture_spark(spark):
    """(faces, cams, verts, polygons) for render_labels_pipeline."""
    from pyspark.sql import types as T

    faces, cams = flat_mesh_spark(spark)
    verts = spark.createDataFrame(flat_mesh_verts_pdf(), schema=T.StructType([
        T.StructField("vert_id", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType())]))
    polys = spark.createDataFrame(stripe_polygons_pdf(), schema=T.StructType([
        T.StructField("polygon_id", T.LongType()),
        T.StructField("class_id", T.LongType()),
        T.StructField("geometry_wkb", T.BinaryType())]))
    return faces, cams, verts, polys


def render_labels_oracle_sql() -> str:
    """Per-camera per-class label-image pixel counts, closed-form: pixel →
    cell (i, u, v) via the shared visibility mapping, face class via the
    stripe mode-vote formula above."""
    return f"""
WITH {visibility_pixels_sql()}
SELECT camera_id,
       CAST((CASE WHEN v <= u THEN (i + 1) // {STRIPE_W}
                  ELSE i // {STRIPE_W} END) % {N_CLASSES} AS INTEGER)
         AS class_id,
       count(*) AS pixel_count
FROM pixface GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# SQL oracle fragments (DuckDB): the analytic pixel→face mapping
# ---------------------------------------------------------------------------

def _cam_values_sql() -> str:
    return ", ".join(
        f"({c['camera_id']}, {c['offx']!r}, {c['offy']!r})" for c in CAMERAS)


def visibility_pixels_sql() -> str:
    """CTE body mapping every (camera, pixel) to its face id (NULL if the
    pixel misses the mesh). Mirrors tests/test_visibility.py:expected_face."""
    return f"""
cams(camera_id, offx, offy) AS (VALUES {_cam_values_sql()}),
pix AS (
  SELECT camera_id, offx, offy, r.generate_series AS r, c.generate_series AS c
  FROM cams, generate_series(0, {CAM_H - 1}) r, generate_series(0, {CAM_W - 1}) c
),
world AS (
  SELECT camera_id,
         (c + 0.5 - {CAM_W / 2}) / ({CAM_F} / {CAM_Z}) + offx AS wx,
         -(r + 0.5 - {CAM_H / 2}) / ({CAM_F} / {CAM_Z}) + offy AS wy
  FROM pix
),
fij AS (
  SELECT camera_id,
         (wx + {EXTENT}) / {CELL} AS fi,
         (wy + {EXTENT}) / {CELL} AS fj
  FROM world
),
cellidx AS (
  SELECT camera_id,
         CAST(floor(fi) AS BIGINT) AS i, CAST(floor(fj) AS BIGINT) AS j,
         fi - floor(fi) AS u, fj - floor(fj) AS v
  FROM fij
),
pixface AS (
  SELECT camera_id,
         CASE WHEN v <= u THEN i * {N - 1} + j
              ELSE i * {N - 1} + j + {(N - 1) ** 2} END AS face_id,
         i, j, u, v
  FROM cellidx
  WHERE i >= 0 AND i < {N - 1} AND j >= 0 AND j < {N - 1}
)"""


SQL_VISIBILITY_ANALYTIC = f"""
WITH {visibility_pixels_sql()}
SELECT camera_id, face_id, count(*) AS pixel_count
FROM pixface GROUP BY 1, 2
"""


def forward_oracle_sql() -> str:
    return f"""
WITH {visibility_pixels_sql()},
perface AS (
  SELECT face_id, camera_id, count(*) AS pc FROM pixface GROUP BY 1, 2
)
SELECT face_id,
       (((face_id % {(N - 1) ** 2}) // {N - 1})
         + 2 * (face_id % {N - 1})
         + (CASE WHEN face_id >= {(N - 1) ** 2} THEN 1 ELSE 0 END))
         % {N_CLASSES} AS pred_class,
       CAST(sum(pc) AS BIGINT) AS total_weight,
       count(DISTINCT camera_id) AS n_cameras
FROM perface GROUP BY 1
"""


def rasterize_oracle_sql() -> str:
    """Tile rasterization oracle: every tile pixel center → face → class,
    grouped per (tile, class). 3x3 tiles of {GRID_TILE_PX}px cover the mesh."""
    n_tiles = 3
    tp = GRID_TILE_PX
    return f"""
WITH gpix AS (
  SELECT gx.generate_series AS gx, gy.generate_series AS gy
  FROM generate_series(0, {n_tiles * tp - 1}) gx,
       generate_series(0, {n_tiles * tp - 1}) gy
),
world AS (
  SELECT gx, gy,
         {GRID_X0} + (gx + 0.5) * {GRID_GSD} AS x,
         {GRID_Y0} - (gy + 0.5) * {GRID_GSD} AS y
  FROM gpix
),
fij AS (
  SELECT gx, gy, (x + {EXTENT}) / {CELL} AS fi, (y + {EXTENT}) / {CELL} AS fj
  FROM world
),
cellidx AS (
  SELECT gx, gy,
         CAST(floor(fi) AS BIGINT) AS i, CAST(floor(fj) AS BIGINT) AS j,
         fi - floor(fi) AS u, fj - floor(fj) AS v
  FROM fij
  WHERE fi >= 0 AND fi < {N - 1} AND fj >= 0 AND fj < {N - 1}
)
SELECT gx // {tp} AS tile_x, gy // {tp} AS tile_y,
       CAST((i + 2 * j + (CASE WHEN v <= u THEN 0 ELSE 1 END))
            % {N_CLASSES} AS INTEGER) AS class_id,
       count(*) AS pixel_count
FROM cellidx GROUP BY 1, 2, 3
"""
