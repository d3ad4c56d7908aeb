"""Hierarchical square-grid spatial cell index (H3/S2 analog, planar).

The reference (geograypher) prefilters expensive geometry ops with dissolved
+ buffered + simplified ROI polygons (``meshes/meshes.py:1210-1237``) and
hand-chunks work into KMeans clusters (``meshes/derived_meshes.py:26-151``).
This module replaces both with a deterministic hierarchical grid over a
planar working CRS:

    cell(r, x, y) = (r, floor(x / s(r)), floor(y / s(r))),  s(r) = BASE / 2^r

packed into one int64 so Spark can hash-partition / equi-join on it.
Everything here is **pure Spark column expressions** (whole-stage codegen,
no Python), with numpy twins for use inside pandas UDFs and tests.

Layout of the packed id (63 usable bits):
    [ res:5 bits | ix+OFFSET : 29 bits | iy+OFFSET : 29 bits ]
valid for ix, iy in [-2^28, 2^28), i.e. any coordinate |x| < BASE * 2^(28-r).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Base cell size in working-CRS units (meters for UTM scenes). Resolution r
# has cells of BASE / 2**r meters: r=0 → 1024 m, r=10 → 1 m.
BASE = 1024.0
_COORD_BITS = 29
_OFFSET = 1 << 28
MAX_RES = 30


def cell_size(res: int) -> float:
    return BASE / (1 << res)


# ---------------------------------------------------------------------------
# Column-expression forms (JVM-side, codegen'd)
# ---------------------------------------------------------------------------

def cell_id_col(x: Column, y: Column, res: int) -> Column:
    """Packed cell id for point columns (x, y) at resolution ``res``."""
    s = F.lit(cell_size(res))
    ix = F.floor(x / s).cast("long") + F.lit(_OFFSET)
    iy = F.floor(y / s).cast("long") + F.lit(_OFFSET)
    return (
        F.shiftleft(F.lit(int(res)).cast("long"), 2 * _COORD_BITS)
        .bitwiseOR(F.shiftleft(ix, _COORD_BITS))
        .bitwiseOR(iy)
    )


def cell_res_col(cell: Column) -> Column:
    return F.shiftright(cell, 2 * _COORD_BITS).cast("int")


def cell_ix_col(cell: Column) -> Column:
    mask = F.lit((1 << _COORD_BITS) - 1)
    return F.shiftright(cell, _COORD_BITS).bitwiseAND(mask) - F.lit(_OFFSET)


def cell_iy_col(cell: Column) -> Column:
    mask = F.lit((1 << _COORD_BITS) - 1)
    return cell.bitwiseAND(mask) - F.lit(_OFFSET)


def cell_parent_col(cell: Column, steps: int = 1) -> Column:
    """Ancestor cell ``steps`` resolutions coarser (prefix for prefix-joins)."""
    res = cell_res_col(cell).cast("long") - F.lit(steps)
    ix = F.shiftright(cell_ix_col(cell) + F.lit(_OFFSET), steps)
    iy = F.shiftright(cell_iy_col(cell) + F.lit(_OFFSET), steps)
    return (
        F.shiftleft(res, 2 * _COORD_BITS)
        .bitwiseOR(F.shiftleft(ix, _COORD_BITS))
        .bitwiseOR(iy)
    )


# ---------------------------------------------------------------------------
# Numpy twins (for pandas UDFs / drivers / tests)
# ---------------------------------------------------------------------------

def cell_id_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    s = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / s).astype(np.int64) + _OFFSET
    iy = np.floor(np.asarray(y, dtype=np.float64) / s).astype(np.int64) + _OFFSET
    return (np.int64(res) << (2 * _COORD_BITS)) | (ix << _COORD_BITS) | iy


def cell_decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> (2 * _COORD_BITS)).astype(np.int64)
    mask = np.int64((1 << _COORD_BITS) - 1)
    ix = ((cell >> _COORD_BITS) & mask) - _OFFSET
    iy = (cell & mask) - _OFFSET
    return res, ix, iy


def cell_bounds_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(xmin, ymin, xmax, ymax) of each cell square."""
    res, ix, iy = cell_decode_np(cell)
    s = BASE / np.exp2(res)
    xmin = ix * s
    ymin = iy * s
    return xmin, ymin, xmin + s, ymin + s


def cell_ring_np(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (the (2k+1)^2 block).

    Used by the kNN join's ring-expansion search (reference analog: KDTree
    1-NN query, ``meshes/meshes.py:287-322``).
    """
    res, ix, iy = cell_decode_np(np.asarray([cell]))
    res, ix, iy = int(res[0]), int(ix[0]), int(iy[0])
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    nix = (ix + dx.ravel()) + _OFFSET
    niy = (iy + dy.ravel()) + _OFFSET
    return (np.int64(res) << (2 * _COORD_BITS)) | (nix << _COORD_BITS) | niy


def covering_cells_np(
    xmin: float, ymin: float, xmax: float, ymax: float, res: int,
    max_cells: int | None = None,
) -> np.ndarray:
    """Cells at ``res`` covering an axis-aligned bbox (polygon covering,
    frustum-footprint covering). Coarsens resolution if the covering would
    exceed ``max_cells`` (keeps the candidate join bounded for huge ROIs).
    """
    r = res
    while True:
        s = cell_size(r)
        ix0, ix1 = int(np.floor(xmin / s)), int(np.floor(xmax / s))
        iy0, iy1 = int(np.floor(ymin / s)), int(np.floor(ymax / s))
        n = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        if max_cells is None or n <= max_cells or r == 0:
            break
        r -= 1
    gx = np.arange(ix0, ix1 + 1, dtype=np.int64)
    gy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    mx, my = np.meshgrid(gx, gy, indexing="ij")
    return (
        (np.int64(r) << (2 * _COORD_BITS))
        | ((mx.ravel() + _OFFSET) << _COORD_BITS)
        | (my.ravel() + _OFFSET)
    )
