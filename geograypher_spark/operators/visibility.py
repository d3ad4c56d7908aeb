"""Visibility join: per-(camera, pixel) first mesh face hit — z-buffer
rasterization as a distributed join.

Reference J1 (``meshes/meshes.py:1645-1823``): off-screen VTK rendering of
faces colored with base-256-encoded ids, screenshot, decode. Here instead:

1. **Candidate stage** — camera frustum-footprint covering cells ⋈ face
   bbox covering cells (cell equi-join, broadcast cameras when few, salted
   otherwise). Keeps the per-camera rasterizer input bounded: each camera
   sees only faces its frustum can reach, the Spark analog of the
   reference's per-cluster submeshes (J12).
2. **Rasterize stage** — ``applyInPandas`` grouped by camera_id: software
   z-buffer with perspective-correct depth (linear 1/z in screen space),
   pixel-center sampling. Emits ``(camera_id, face_id, pixel_count)``
   (the aggregated pix2face map) or per-pixel rows for rendering sinks.

No GPU, no VTK, no base-256 trick (X9) — face ids stay int64 end to end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import camera as cam
from ..functions import cells as C

FACE_COORD_COLS = ["x0", "y0", "z0", "x1", "y1", "z1", "x2", "y2", "z2"]

# samples per barycentric chunk in rasterize_zbuffer: sized so the ~10
# per-chunk (m, side, side) float64 temporaries stay cache-resident under
# MANY concurrent renders — one render per core means the budget is the
# PER-CORE cache share, not the whole LLC. Measured pinned at 16
# concurrent renders: 65536 (≈5 MB of temporaries) beats 262144 (≈20 MB)
# by 10-25% on both the ortho tile and perspective camera workloads, and
# costs nothing at 4 cores. Overridable for re-tuning on other hardware.
_CHUNK_SAMPLES = int(__import__("os").environ.get(
    "SPARK_GRAFT_RASTER_CHUNK", "65536"))


# ---------------------------------------------------------------------------
# Rasterizer kernel (numpy, used inside applyInPandas)
# ---------------------------------------------------------------------------

def rasterize_zbuffer(
    tri_px: np.ndarray,  # (n, 3, 2) screen coords per face vertex
    tri_z: np.ndarray,   # (n, 3) camera-frame depths
    face_ids: np.ndarray,
    w: int, h: int,
    return_depth: bool = False,
    ortho: bool = False,
):
    """(h, w) int64 image of face ids, -1 = no hit. Pixel (r, c) sampled at
    image coords (c+0.5, r+0.5). Perspective-correct depth via linear 1/z.
    ``return_depth=True`` also returns the (h, w) float64 depth buffer
    (inf = no hit) for partial-image z-merging.

    ``ortho=True`` switches to orthographic semantics: depth interpolates
    LINEARLY in screen space (exact for a parallel projection) and the
    behind-camera vertex gate is skipped (any depth sign is valid — an
    orthographic 'camera' has no apex). Winner per pixel is still
    min (depth, face_id); callers wanting highest-z-wins pass depth = -z.

    FULLY VECTORIZED: faces are bucketed by power-of-two bbox size class,
    each bucket evaluates its barycentrics for all faces at once (chunked
    to stay cache-resident), and each chunk resolves STREAMING into the
    global z-buffer: a chunk-local lexsort picks the chunk winner per
    pixel, then one gather/compare/scatter merges it lexicographically.
    Winner per pixel = min (depth, face_id), which is EXACTLY what the
    sequential face_id-ordered strict-< loop computed (a
    20k-small-triangle render was ~80 µs/face of Python loop overhead;
    this is ~30× faster and bit-identical). Hits are never accumulated
    across chunks, so resolve memory traffic is one gather + one scatter
    per unique (chunk, pixel) instead of a stored-and-twice-re-read
    per-render hit log."""
    # img_face doubles as the fid min-buffer during the streaming resolve
    # (sentinel = int64 max, so any real face id wins a tie-compare);
    # _out() rewrites never-hit pixels to the public -1 sentinel.
    img_face = np.full((h, w), np.iinfo(np.int64).max, dtype=np.int64)
    img_depth = np.full((h, w), np.inf, dtype=np.float64)

    def _out():
        img_face[~np.isfinite(img_depth)] = -1
        return (img_face, img_depth) if return_depth else img_face

    n = len(face_ids)
    if n == 0:
        return _out()
    if ortho:
        P = np.asarray(tri_px, dtype=np.float64)
        Z = np.asarray(tri_z, dtype=np.float64)
        FID = np.asarray(face_ids, dtype=np.int64)
    else:
        # skip faces with any vertex at/behind the camera (scene cameras are
        # above the mesh; general frustum clipping is future work)
        ok = (tri_z > 1e-12).all(axis=1)
        P = np.asarray(tri_px, dtype=np.float64)[ok]
        Z = np.asarray(tri_z, dtype=np.float64)[ok]
        FID = np.asarray(face_ids, dtype=np.int64)[ok]
    if len(P) == 0:
        return _out()
    x0, y0 = P[:, 0, 0], P[:, 0, 1]
    x1, y1 = P[:, 1, 0], P[:, 1, 1]
    x2, y2 = P[:, 2, 0], P[:, 2, 1]
    dd = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    xs_min = P[:, :, 0].min(axis=1); xs_max = P[:, :, 0].max(axis=1)
    ys_min = P[:, :, 1].min(axis=1); ys_max = P[:, :, 1].max(axis=1)
    xmin = np.maximum(np.floor(xs_min - 0.5), 0).astype(np.int64)
    xmax = np.minimum(np.ceil(xs_max - 0.5), w - 1).astype(np.int64)
    ymin = np.maximum(np.floor(ys_min - 0.5), 0).astype(np.int64)
    ymax = np.minimum(np.ceil(ys_max - 0.5), h - 1).astype(np.int64)
    good = (np.abs(dd) >= 1e-300) & (xmin <= xmax) & (ymin <= ymax)
    idx_all = np.nonzero(good)[0]
    if len(idx_all) == 0:
        return _out()
    bw = xmax - xmin + 1
    bh = ymax - ymin + 1
    # power-of-two size class (shared bucket grid, padded mask)
    size_cls = np.maximum(
        np.ceil(np.log2(bw[idx_all])), np.ceil(np.log2(bh[idx_all]))
    ).astype(np.int64)
    # streaming resolve state: flat views of the two global buffers. Each
    # chunk merges its hits immediately (see below) instead of appending
    # them to per-render part lists — the old accumulate-then-two-pass
    # resolve wrote every hit (pix, dep, fid = 24 B) to memory once and
    # re-read it twice through np.minimum.at, which is what saturated the
    # shared bus on 100M-px renders.
    depth_flat = img_depth.ravel()
    fid_flat = img_face.ravel()
    for cls in np.unique(size_cls):
        members = idx_all[size_cls == cls]
        side = 1 << int(cls)
        per_face = side * side
        # small chunk target keeps the 5 per-chunk barycentric temporaries
        # cache-resident (~2 MB each) — at 32 concurrent renders the large
        # version saturated the shared memory bus
        chunk = max(1, _CHUNK_SAMPLES // per_face)
        off = np.arange(side)
        for lo in range(0, len(members), chunk):
            i = members[lo:lo + chunk]           # (m,)
            rx = xmin[i][:, None, None] + off[None, None, :]   # (m,1,side)
            ry = ymin[i][:, None, None] + off[None, :, None]   # (m,side,1)
            inbox = (rx <= xmax[i][:, None, None]) & (ry <= ymax[i][:, None, None])
            # barycentric numerators factor into a column-only and a
            # row-only term — compute them SMALL ((m,1,side)/(m,side,1))
            # and materialize only the broadcast sum. Together with
            # in-place ops and hit-gathered depth this holds full-size
            # traffic to 3 float + 2 bool arrays per chunk (the naive
            # expression tree made ~12 and saturated the memory bus at
            # high render concurrency). Arithmetic order is unchanged →
            # bit-identical output.
            gxd = (rx + 0.5) - x2[i][:, None, None]            # (m,1,side)
            gyd = (ry + 0.5) - y2[i][:, None, None]            # (m,side,1)
            ddi = dd[i][:, None, None]
            l0 = np.add((y1[i] - y2[i])[:, None, None] * gxd,
                        (x2[i] - x1[i])[:, None, None] * gyd)  # full
            l0 /= ddi
            l1 = np.add((y2[i] - y0[i])[:, None, None] * gxd,
                        (x0[i] - x2[i])[:, None, None] * gyd)  # full
            l1 /= ddi
            l2 = np.subtract(1.0, l0)                          # full
            l2 -= l1
            inside = l0 >= 0                                   # full bool
            inside &= l1 >= 0
            inside &= l2 >= 0
            inside &= inbox
            fi, rr, cc = np.nonzero(inside)
            if len(fi) == 0:
                continue
            # depth only at hit samples (~half the box): same scalar ops
            # on the same values as the full-array form
            l0h = l0[fi, rr, cc]
            l1h = l1[fi, rr, cc]
            l2h = l2[fi, rr, cc]
            ii = i[fi]
            if ortho:
                dep = l0h * Z[ii, 0] + l1h * Z[ii, 1] + l2h * Z[ii, 2]
            else:
                inv_z = l0h / Z[ii, 0] + l1h / Z[ii, 1] + l2h / Z[ii, 2]
                with np.errstate(divide="ignore"):
                    dep = 1.0 / inv_z
            pix = (ry[fi, rr, 0] * w + rx[fi, 0, cc]).astype(np.int64)
            fid = FID[ii]
            # streaming per-chunk resolve. Winner per pixel is the
            # lexicographic min of (depth, face_id) — min is associative,
            # so (a) reduce the chunk locally, (b) merge the chunk winner
            # against the global buffers. Identical semantics to the old
            # two-global-pass resolve (and to the sequential
            # face_id-ordered strict-< loop), but the hit arrays are never
            # stored or re-read, and the slow np.minimum.at ufunc loop is
            # replaced by a cache-resident lexsort (≤ _CHUNK_SAMPLES rows)
            # plus one vectorized gather/compare/scatter.
            order = np.lexsort((fid, dep, pix))
            pix_s = pix[order]
            keep = np.empty(len(pix_s), dtype=bool)
            keep[0] = True
            np.not_equal(pix_s[1:], pix_s[:-1], out=keep[1:])
            pu = pix_s[keep]
            du = dep[order][keep]
            fu = fid[order][keep]
            cur_d = depth_flat[pu]
            win = du < cur_d
            win |= (du == cur_d) & (fu < fid_flat[pu])
            pw = pu[win]
            depth_flat[pw] = du[win]
            fid_flat[pw] = fu[win]
    return _out()


def _scaled_intrinsics(cam_params: dict, scale: float):
    """(f, cx, cy, w, h) after the render-scale factor — shared by the
    render kernel and the split-path merge so canvas geometry agrees."""
    f = float(cam_params["f"])
    cx, cy = float(cam_params["cx"]), float(cam_params["cy"])
    w, h = int(cam_params["w"]), int(cam_params["h"])
    if scale != 1.0:
        f, cx, cy = f * scale, cx * scale, cy * scale
        w, h = int(round(w * scale)), int(round(h * scale))
    return f, cx, cy, w, h


def _render_group(pdf: pd.DataFrame, cam_params: dict, scale: float,
                  return_depth: bool = False,
                  distortion_mode: str = "vertex",
                  _ideal_canvas: tuple[int, int, int, int] | None = None):
    """Shared per-camera render: returns the (h, w) face-id image.

    ``cam_params`` comes from the broadcast camera map — candidate rows
    carry ONLY (camera_id, face_id, 9 coords); shipping the 4×4 transform
    on every row through the shuffle costs ~2.5× the bytes for nothing.

    ``distortion_mode`` picks how a camera's Brown–Conrady parameters are
    honoured: ``"vertex"`` (default) warps the projected vertices — cheap
    and exact for triangles small relative to the distortion field;
    ``"warp"`` renders the ideal pinhole image on an expanded canvas and
    remaps it per distorted output pixel through the fixed-point inverse
    (the reference's render-undistorted-then-warp, ``meshes.py:1817-1820``)
    — exact for arbitrarily large triangles (a straight edge renders as
    the properly curved image curve) at the cost of one (h, w) inverse
    map per render.

    ``_ideal_canvas`` is internal (split-render path): render the IDEAL
    pinhole image shifted into the given ``(x_off, y_off, W, H)`` canvas
    and skip distortion entirely — the split-path merge applies the warp
    ONCE after depth-min-merging the ideal partials (warping each partial
    would double-resample).
    """
    # deterministic z-tie resolution: rasterize in face_id order regardless
    # of shuffle-dependent group row order
    pdf = pdf.sort_values("face_id")
    c2w = np.asarray(cam_params["cam_to_world"], dtype=np.float64).reshape(4, 4)
    f, cx, cy, w, h = _scaled_intrinsics(cam_params, scale)
    coords = pdf[FACE_COORD_COLS].to_numpy(dtype=np.float64)
    n = len(coords)
    # coords row = [x0,y0,z0,x1,y1,z1,x2,y2,z2] → (n*3, 3) points
    pts = coords.reshape(n, 3, 3).reshape(n * 3, 3)
    distortion = cam_params.get("distortion") or {}
    if _ideal_canvas is not None:
        px, py, z = cam.project_points(pts, c2w, f, cx, cy, w, h)
        x_off, y_off, w, h = _ideal_canvas
        px = px - x_off
        py = py - y_off
    elif distortion and distortion_mode == "warp":
        rows, cols, valid, (x_off, y_off, cw, ch) = cam.inverse_distortion_map(
            distortion, f, cx, cy, w, h)
        px, py, z = cam.project_points(pts, c2w, f, cx, cy, w, h)
        tri_px = np.stack([px - x_off, py - y_off], axis=1).reshape(n, 3, 2)
        tri_z = z.reshape(n, 3)
        img_u, dep_u = rasterize_zbuffer(
            tri_px, tri_z, pdf["face_id"].to_numpy(np.int64), cw, ch,
            return_depth=True)
        img = np.where(valid, img_u[rows, cols], np.int64(-1))
        if return_depth:
            return img, np.where(valid, dep_u[rows, cols], np.inf)
        return img
    elif distortion:
        # project via normalized coords → Brown–Conrady warp → pixels
        # (reference renders undistorted then warps, meshes.py:1817-1820;
        # distorting the vertices directly is the vectorized equivalent
        # for geometry whose triangles are small vs the distortion field)
        world_to_cam = cam.invert_rigid(c2w)
        pc = cam.apply_transform(world_to_cam, pts)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            xn = pc[:, 0] / z
            yn = pc[:, 1] / z
        xd, yd = cam.brown_conrady_distort(xn, yn, distortion)
        px = f * xd + cx + w / 2.0
        py = f * yd + cy + h / 2.0
    else:
        px, py, z = cam.project_points(pts, c2w, f, cx, cy, w, h)
    tri_px = np.stack([px, py], axis=1).reshape(n, 3, 2)
    tri_z = z.reshape(n, 3)
    return rasterize_zbuffer(
        tri_px, tri_z, pdf["face_id"].to_numpy(np.int64), w, h,
        return_depth=return_depth)


# ---------------------------------------------------------------------------
# Candidate generation
# ---------------------------------------------------------------------------

def _footprint_bboxes(
    c2w_flat: np.ndarray, f: np.ndarray, cx: np.ndarray, cy: np.ndarray,
    w: np.ndarray, h: np.ndarray, z_min: float, z_max: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batched corner-ray footprint: for n cameras at once, intersect the
    4 image-corner rays with both z-planes and bbox the valid hits.
    Returns (any_valid, xmin, ymin, xmax, ymax), each (n,). Same math as
    ``cam.cast_rays`` (normalized dirs, scale-normalized rotation) — one
    numpy pass instead of a per-camera iterrows loop."""
    n = len(f)
    c2w = np.asarray(c2w_flat, dtype=np.float64).reshape(n, 4, 4)
    zeros = np.zeros(n)
    px = np.stack([zeros, w, zeros, w], axis=1)           # (n, 4)
    py = np.stack([zeros, zeros, h, h], axis=1)
    dirs_cam = np.stack([
        (px - cx[:, None] - w[:, None] / 2.0) / f[:, None],
        (py - cy[:, None] - h[:, None] / 2.0) / f[:, None],
        np.ones((n, 4)),
    ], axis=2)                                            # (n, 4, 3)
    dirs_cam /= np.linalg.norm(dirs_cam, axis=2, keepdims=True)
    R = c2w[:, :3, :3]
    scale = np.cbrt(np.abs(np.linalg.det(R)))
    Rn = R / scale[:, None, None]
    d = np.einsum("nij,nkj->nki", Rn, dirs_cam)           # (n, 4, 3)
    o = c2w[:, :3, 3]                                     # (n, 3)
    hx_parts, hy_parts, v_parts = [], [], []
    for zp in (z_min, z_max):
        dz = d[:, :, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (zp - o[:, None, 2]) / np.where(dz == 0, np.nan, dz)
        valid = np.isfinite(t) & (t > 0)
        ts = np.nan_to_num(t, nan=0.0)
        hx_parts.append(o[:, None, 0] + d[:, :, 0] * ts)
        hy_parts.append(o[:, None, 1] + d[:, :, 1] * ts)
        v_parts.append(valid)
    HX = np.concatenate(hx_parts, axis=1)                 # (n, 8)
    HY = np.concatenate(hy_parts, axis=1)
    V = np.concatenate(v_parts, axis=1)
    any_valid = V.any(axis=1)
    with np.errstate(invalid="ignore"):
        xmin = np.nanmin(np.where(V, HX, np.nan), axis=1)
        xmax = np.nanmax(np.where(V, HX, np.nan), axis=1)
        ymin = np.nanmin(np.where(V, HY, np.nan), axis=1)
        ymax = np.nanmax(np.where(V, HY, np.nan), axis=1)
    return any_valid, xmin, ymin, xmax, ymax


def camera_footprint_cells(
    cameras: DataFrame, z_min: float, z_max: float,
    res: int, max_cells: int = 4096,
) -> DataFrame:
    """(camera cols..., cell): covering cells of each camera's frustum
    footprint over the mesh z-slab [z_min, z_max] — corner rays intersected
    with both planes, bbox of the 8 hits, covered at ``res``."""
    cols = cameras.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"cell": pd.Series([], dtype="int64"),
                     **{c: pd.Series([], dtype=object) for c in cols}})
                continue
            ok, xmin, ymin, xmax, ymax = _footprint_bboxes(
                np.stack(pdf["cam_to_world"].to_numpy()),
                pdf["f"].to_numpy(np.float64),
                pdf["cx"].to_numpy(np.float64), pdf["cy"].to_numpy(np.float64),
                pdf["w"].to_numpy(np.float64), pdf["h"].to_numpy(np.float64),
                z_min, z_max)
            # batch emission: all cells of the batch in one np.repeat
            # gather instead of a per-camera DataFrame append
            keep = np.nonzero(ok)[0]
            cells, counts = C.covering_cells_batch(
                xmin[keep], ymin[keep], xmax[keep], ymax[keep],
                res, max_cells=max_cells)
            o = pdf.iloc[np.repeat(keep, counts)].reset_index(drop=True)
            o.insert(0, "cell", cells)
            yield o

    schema = T.StructType(
        [T.StructField("cell", T.LongType())] + list(cameras.schema.fields))
    return cameras.mapInPandas(gen, schema=schema)


def camera_footprint_cells_driver(
    cameras: DataFrame, z_min: float, z_max: float,
    res: int, max_cells: int = 4096,
) -> tuple[DataFrame, list[int]]:
    """Driver-side footprint covering for the BROADCAST path: the camera
    table is the broadcast side by definition (it's also collected for the
    render params), so covering it locally removes a python mapInPandas
    stage from every downstream action.

    Returns ``(covering_df, res_levels)``: an oblique camera whose footprint
    bbox exceeds ``max_cells`` coarsens its covering (see
    ``covering_cells_np``), so the face side must key itself at every
    resolution the covering actually uses."""
    rows = cameras.collect()
    out = {"cell": [], **{c: [] for c in cameras.columns}}
    if rows:
        ok, xmin, ymin, xmax, ymax = _footprint_bboxes(
            np.stack([np.asarray(r["cam_to_world"], dtype=np.float64)
                      for r in rows]),
            np.array([float(r["f"]) for r in rows]),
            np.array([float(r["cx"]) for r in rows]),
            np.array([float(r["cy"]) for r in rows]),
            np.array([float(r["w"]) for r in rows]),
            np.array([float(r["h"]) for r in rows]),
            z_min, z_max)
        keep = np.nonzero(ok)[0]
        cells, counts = C.covering_cells_batch(
            xmin[keep], ymin[keep], xmax[keep], ymax[keep],
            res, max_cells=max_cells)
        out["cell"] = cells.tolist()
        for i, cnt in zip(keep, counts):
            for c in cameras.columns:
                out[c].extend([rows[int(i)][c]] * int(cnt))
    spark = cameras.sparkSession
    levels = C.res_levels_of_cells(out["cell"]) or [res]
    schema = T.StructType(
        [T.StructField("cell", T.LongType())] + list(cameras.schema.fields))
    return (spark.createDataFrame(pd.DataFrame(out), schema=schema)
            .coalesce(1), levels)


def candidate_camera_faces(
    cameras: DataFrame, faces: DataFrame, res: int = 4,
    broadcast_cameras: bool = True, salt_factor: int | None = None,
    max_cells: int = 4096, z_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Cell equi-join of camera footprints × face BBOX covering cells →
    (camera cols + face cols) candidate pairs.

    Faces key on their bbox covering (not the centroid cell): a face whose
    centroid sits one cell outside the camera footprint but whose triangle
    still reaches into the frustum would otherwise never be shipped to the
    rasterizer (hole at the image edge). The face side is keyed at every
    resolution the camera covering uses, so coarsened (oblique, large-
    footprint) cameras still match (``covering_cells_np`` contract).

    ``z_range``: precomputed (zmin, zmax) of the mesh — pass it to skip the
    per-call faces scan (e.g. from table stats at 100 TB scale).
    """
    if z_range is None:
        zstats = faces.agg(
            F.min(F.least("z0", "z1", "z2")).alias("zmin"),
            F.max(F.greatest("z0", "z1", "z2")).alias("zmax"),
        ).collect()[0]
        z_range = (float(zstats["zmin"]), float(zstats["zmax"]))
    if broadcast_cameras and salt_factor is None:
        cam_cells, levels = camera_footprint_cells_driver(
            cameras, z_range[0], z_range[1], res, max_cells=max_cells)
    else:
        cam_cells = camera_footprint_cells(
            cameras, z_range[0], z_range[1], res, max_cells=max_cells)
        from .spatial_join import covering_res_levels
        levels = covering_res_levels(cam_cells) or [res]
    # face centroid cx/cy collides with the camera principal point cx/cy —
    # only the bbox is needed for the cell key, so drop centroids after
    fxmin = F.least("x0", "x1", "x2"); fxmax = F.greatest("x0", "x1", "x2")
    fymin = F.least("y0", "y1", "y2"); fymax = F.greatest("y0", "y1", "y2")
    face_cells = faces.withColumn(
        "cell", F.explode(C.multires_bbox_cells_col(fxmin, fymin, fxmax, fymax,
                                                    levels))
    ).drop("cx", "cy", "cz")
    if broadcast_cameras and salt_factor is None:
        cand = face_cells.join(F.broadcast(cam_cells), "cell")
    elif salt_factor:
        from .spatial_join import salted_equi_join
        cand = salted_equi_join(face_cells, cam_cells, "cell", salt_factor)
    else:
        cand = face_cells.join(cam_cells, "cell")
    # a face bbox spanning k covering cells of one camera yields k copies of
    # the (camera, face) pair. The z-buffer rasterizer is idempotent per
    # face (strict depth-<, deterministic face_id order), so duplicates are
    # render-time overhead only — cheaper than a global dedup shuffle here;
    # callers that need distinct pairs dedup on (camera_id, face_id).
    return cand.drop("cell")


# ---------------------------------------------------------------------------
# The operator
# ---------------------------------------------------------------------------

VISIBILITY_SCHEMA = T.StructType([
    T.StructField("camera_id", T.LongType()),
    T.StructField("face_id", T.LongType()),
    T.StructField("pixel_count", T.LongType()),
])


_CAM_PARAM_KEYS = ("cam_to_world", "f", "cx", "cy", "w", "h")


def _broadcast_cameras(cameras: DataFrame):
    """Camera params as a broadcast dict {camera_id: params}. The camera
    table is the small side of the visibility join by design (thousands of
    rows vs billions of faces); candidate rows then carry only ids+coords.
    An optional ``distortion`` map column (Brown–Conrady params) rides
    along for distortion-aware rendering."""
    keys = list(_CAM_PARAM_KEYS)
    if "distortion" in cameras.columns:
        keys.append("distortion")

    def _plain(v):
        if v is None:
            return v
        if hasattr(v, "asDict"):   # Row (struct-typed distortion)
            return {k: x for k, x in v.asDict().items() if x is not None}
        return v                    # MapType already collects as dict

    rows = cameras.select("camera_id", *keys).collect()
    cam_map = {
        int(r["camera_id"]): {k: _plain(r[k]) for k in keys} for r in rows}
    return cameras.sparkSession.sparkContext.broadcast(cam_map)


def _counts_pdf(camera_id, img: np.ndarray) -> pd.DataFrame:
    hit = img[img >= 0]
    if len(hit) == 0:
        return pd.DataFrame({"camera_id": pd.Series([], dtype="int64"),
                             "face_id": pd.Series([], dtype="int64"),
                             "pixel_count": pd.Series([], dtype="int64")})
    ids, counts = np.unique(hit, return_counts=True)
    return pd.DataFrame({
        "camera_id": np.full(len(ids), camera_id, dtype=np.int64),
        "face_id": ids,
        "pixel_count": counts.astype(np.int64),
    })


_PARTIAL_SCHEMA = T.StructType([
    T.StructField("camera_id", T.LongType()),
    T.StructField("x0", T.IntegerType()),   # crop origin in the image
    T.StructField("y0", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("faces", T.BinaryType()),   # int64 (h, w) face ids
    T.StructField("depths", T.BinaryType()),  # float64 (h, w) depths
])


def visibility_join(
    cameras: DataFrame, faces: DataFrame,
    res: int = 4, scale: float = 1.0,
    salt_factor: int | None = None,
    max_cells: int = 4096, z_range: tuple[float, float] | None = None,
    split_res_delta: int = 0, distortion_mode: str = "vertex",
) -> DataFrame:
    """→ (camera_id, face_id, pixel_count): for every camera, the number of
    pixels whose first hit is each face (pixel_count > 0 only). The
    engine's pix2face analog, aggregated (SURVEY §1.1 'pix2face map').

    ``split_res_delta > 0`` breaks the one-task-per-camera ceiling: each
    camera's candidates split into spatial sub-groups (face cells at
    res + delta), every sub-group rasterizes independently into a
    bbox-CROPPED partial z-buffer (face ids + depths), and a per-camera
    depth-min merge reduces the partials. Spatially coherent sub-groups
    keep each partial's crop small, so the merge shuffle moves ~the
    footprint area once, not #subgroups full frames. Exact: merge ties on
    (depth, face_id) reproduce the single-pass face_id-sorted strict-<
    rule. Use for wide scenes where cameras >> cores is false (the
    per-camera group is the straggler at 100× face counts).

    ``distortion_mode``: ``"vertex"`` (default) or ``"warp"`` — see
    :func:`_render_group`. In the split path the partials always render
    the IDEAL pinhole image (on the expanded warp canvas when mode is
    ``"warp"``) and the per-camera merge applies the inverse-distortion
    remap exactly once, so split and non-split agree bit-for-bit."""
    cand = candidate_camera_faces(
        cameras, faces, res=res, salt_factor=salt_factor,
        max_cells=max_cells, z_range=z_range,
    ).select("camera_id", "face_id", *FACE_COORD_COLS)
    bc = _broadcast_cameras(cameras)

    from .balanced import grouped_apply_balanced

    if split_res_delta <= 0:
        def agg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return _counts_pdf(int(key[0]),
                               _render_group(pdf, bc.value[int(key[0])], scale,
                                             distortion_mode=distortion_mode))

        # camera renders are compute-dense (bytes-cheap candidate rows,
        # z-buffer kernel per group): the balanced grouped-apply keeps the
        # render stage at one task per camera stripe instead of the
        # handful AQE's byte-based coalescing leaves. The key domain is
        # the broadcast camera dict — no probe action on the candidate
        # join lineage.
        return grouped_apply_balanced(
            cand, ["camera_id"], agg, VISIBILITY_SCHEMA,
            groups=[(int(cid),) for cid in bc.value])

    sub = C.cell_id_col(F.col("x0"), F.col("y0"), res + split_res_delta)
    cand = cand.withColumn("_sub", sub)

    def _warp_canvas(p) -> tuple[int, int, int, int] | None:
        """Expanded ideal-render canvas for this camera, or None when the
        camera is undistorted / mode is vertex. Deterministic in the
        camera params, so partial-render and merge tasks agree with no
        coordination."""
        dist = p.get("distortion") or {}
        if not dist or distortion_mode != "warp":
            return None
        return cam.inverse_distortion_canvas(
            dist, *_scaled_intrinsics(p, scale))

    def render_partial(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cam_id = int(key[0])
        img, depth = _render_group(pdf, bc.value[cam_id], scale,
                                   return_depth=True,
                                   distortion_mode=distortion_mode,
                                   _ideal_canvas=_warp_canvas(bc.value[cam_id]))
        ys, xs = np.nonzero(img >= 0)
        empty = pd.DataFrame({
            "camera_id": pd.Series([], dtype="int64"),
            "x0": pd.Series([], dtype="int32"), "y0": pd.Series([], dtype="int32"),
            "w": pd.Series([], dtype="int32"), "h": pd.Series([], dtype="int32"),
            "faces": pd.Series([], dtype=object),
            "depths": pd.Series([], dtype=object)})
        if len(ys) == 0:
            return empty
        y0, y1 = int(ys.min()), int(ys.max()) + 1
        x0, x1 = int(xs.min()), int(xs.max()) + 1
        return pd.DataFrame({
            "camera_id": [cam_id], "x0": [x0], "y0": [y0],
            "w": [x1 - x0], "h": [y1 - y0],
            "faces": [img[y0:y1, x0:x1].astype("<i8").tobytes()],
            "depths": [depth[y0:y1, x0:x1].astype("<f8").tobytes()]})

    # (camera, sub-cell) keys are data-dependent and numerous by
    # construction (the split path exists for cameras << cores) — skip
    # the enumeration probe, hash routing is balanced by volume
    partials = grouped_apply_balanced(
        cand, ["camera_id", "_sub"], render_partial, _PARTIAL_SCHEMA,
        volume=True)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cam_id = int(key[0])
        p = bc.value[cam_id]
        f, cx, cy, w, h = _scaled_intrinsics(p, scale)
        canvas = _warp_canvas(p)
        mw, mh = (canvas[2], canvas[3]) if canvas is not None else (w, h)
        img = np.full((mh, mw), -1, dtype=np.int64)
        depth = np.full((mh, mw), np.inf, dtype=np.float64)
        for r in pdf.itertuples(index=False):
            pw, ph = int(r.w), int(r.h)
            pf = np.frombuffer(r.faces, dtype="<i8").reshape(ph, pw)
            pdp = np.frombuffer(r.depths, dtype="<f8").reshape(ph, pw)
            sl = (slice(r.y0, r.y0 + ph), slice(r.x0, r.x0 + pw))
            cur_f, cur_d = img[sl], depth[sl]
            # strict-< plus lower-face tie-break == the single-pass
            # face_id-sorted strict-< rule
            take = (pdp < cur_d) | ((pdp == cur_d) & (pf >= 0) & (pf < cur_f))
            cur_f[take] = pf[take]
            cur_d[take] = pdp[take]
        if canvas is not None:
            # one inverse-distortion remap of the merged ideal frame —
            # identical to the non-split warp render by construction
            rows, cols, valid, _ = cam.inverse_distortion_map(
                p.get("distortion") or {}, f, cx, cy, w, h, canvas=canvas)
            img = np.where(valid, img[rows, cols], np.int64(-1))
        return _counts_pdf(cam_id, img)

    return grouped_apply_balanced(
        partials, ["camera_id"], merge, VISIBILITY_SCHEMA,
        groups=[(int(cid),) for cid in bc.value])


def render_label_images(
    cameras: DataFrame, faces_with_class: DataFrame,
    class_col: str = "face_class", nodata: int = 255,
    res: int = 4, scale: float = 1.0, distortion_mode: str = "vertex",
    z_range: tuple[float, float] | None = None,
) -> DataFrame:
    """→ (camera_id, w, h, label_image): per-camera uint8 CLASS images —
    the reverse-pipeline render (reference ``face_texture[pix2face]``
    gather, ``meshes.py:1825-1909``). The face→class gather happens INSIDE
    each camera's render group (its candidate rows already carry the
    class), so no face-scale map ever hits the driver or a broadcast.

    ``z_range``: precomputed mesh (zmin, zmax). Pass it whenever
    ``faces_with_class`` is an EXPENSIVE lineage (e.g. the reverse
    pipeline's faces ⋈ PIP-voted classes): the footprint-covering z-stats
    agg otherwise re-executes that whole lineage once more just to read
    two numbers the raw face table already answers."""
    cand = candidate_camera_faces(
        cameras, faces_with_class, res=res, z_range=z_range).select(
        "camera_id", "face_id", class_col, *FACE_COORD_COLS)
    bc = _broadcast_cameras(cameras)
    schema = T.StructType([
        T.StructField("camera_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("label_image", T.BinaryType()),
    ])

    def agg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        img = _render_group(pdf, bc.value[int(key[0])], scale,
                            distortion_mode=distortion_mode)
        lab = np.full(img.shape, nodata, dtype=np.uint8)
        hit = img >= 0
        if hit.any():
            # sorted-gather instead of a per-pixel dict lambda: on a real
            # 4000x3000 frame the lambda was ~10^7 Python calls per camera
            fids = pdf["face_id"].to_numpy(np.int64)
            order = np.argsort(fids, kind="stable")
            sf = fids[order]
            scls = pdf[class_col].to_numpy(np.int64)[order]
            ids = img[hit]
            pos = np.clip(np.searchsorted(sf, ids), 0, len(sf) - 1)
            vals = scls[pos].astype(np.uint8)
            vals[sf[pos] != ids] = nodata   # id not in group (defensive)
            lab[hit] = vals
        return pd.DataFrame({
            "camera_id": [key[0]],
            "w": [img.shape[1]], "h": [img.shape[0]],
            "label_image": [lab.tobytes()],
        })

    # same compute-dense exchange as visibility_join: per-camera renders
    # are ~1000x compute per byte, so AQE's byte-based coalescing would
    # collapse the render stage to a handful of tasks (the rasterize_big
    # scaling cap, round-4). Key domain = the broadcast camera dict.
    from .balanced import grouped_apply_balanced

    return grouped_apply_balanced(
        cand, ["camera_id"], agg, schema,
        groups=[(int(cid),) for cid in bc.value])


def render_face_images(
    cameras: DataFrame, faces: DataFrame,
    res: int = 4, scale: float = 1.0, distortion_mode: str = "vertex",
    z_range: tuple[float, float] | None = None,
) -> DataFrame:
    """→ (camera_id, w, h, face_image:binary): full pix2face images as
    int64-LE bytes — feeds the render sink (S12) / label-mask export.
    ``z_range`` as in :func:`render_label_images`."""
    cand = candidate_camera_faces(
        cameras, faces, res=res, z_range=z_range).select(
        "camera_id", "face_id", *FACE_COORD_COLS)
    bc = _broadcast_cameras(cameras)
    schema = T.StructType([
        T.StructField("camera_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("face_image", T.BinaryType()),
    ])

    def agg(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        img = _render_group(pdf, bc.value[int(key[0])], scale,
                            distortion_mode=distortion_mode)
        return pd.DataFrame({
            "camera_id": [key[0]],
            "w": [img.shape[1]], "h": [img.shape[0]],
            "face_image": [np.ascontiguousarray(img).astype("<i8").tobytes()],
        })

    from .balanced import grouped_apply_balanced

    return grouped_apply_balanced(
        cand, ["camera_id"], agg, schema,
        groups=[(int(cid),) for cid in bc.value])
