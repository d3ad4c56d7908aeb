"""Hierarchical square-grid spatial cell index (H3/S2 analog, planar).

The reference (geograypher) prefilters expensive geometry ops with dissolved
+ buffered + simplified ROI polygons (``meshes/meshes.py:1210-1237``) and
hand-chunks work into KMeans clusters (``meshes/derived_meshes.py:26-151``).
This module replaces both with a deterministic hierarchical grid over a
planar working CRS:

    cell(r, x, y) = (r, floor(x / s(r)), floor(y / s(r))),  s(r) = BASE / 2^r

packed into one int64 so Spark can hash-partition / equi-join on it.
(Caveat found by property testing: for SUBNORMAL coordinates within
~1e-308 of a cell edge, floor(x/s) can underflow inconsistently across
resolutions; meter-valued survey coordinates never get there.)
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


def cell_ancestor_col(cell: Column, level: int) -> Column:
    """Ancestor of each (finer-res) cell at the fixed resolution ``level``.
    Per-row shift count (res - level) varies, so use exact power-of-two
    integer division (ix + OFFSET < 2^29 is exact in double). Only call on
    rows whose res >= level."""
    steps = (cell_res_col(cell) - F.lit(level)).cast("double")
    factor = F.pow(F.lit(2.0), steps)
    # divide the UNBIASED index (floor-div matches arithmetic shift for
    # negatives), then re-bias — dividing ix+OFFSET would halve the offset
    ix = F.floor(cell_ix_col(cell).cast("double") / factor).cast("long") + F.lit(_OFFSET)
    iy = F.floor(cell_iy_col(cell).cast("double") / factor).cast("long") + F.lit(_OFFSET)
    return (
        F.shiftleft(F.lit(int(level)).cast("long"), 2 * _COORD_BITS)
        .bitwiseOR(F.shiftleft(ix, _COORD_BITS))
        .bitwiseOR(iy)
    )


def multires_cell_array_col(x: Column, y: Column, res_levels: list[int]) -> Column:
    """Array of packed cell ids for point (x, y), one per resolution in
    ``res_levels``. Explode + equi-join this against a MIXED-resolution
    covering (``covering_cells_np`` coarsens per-row when a bbox would
    exceed ``max_cells``): each covering row is at exactly one res, so a
    point matches a given geometry through at most one array element.
    Blow-up factor = len(res_levels), which is 1 in the common case and
    bounded by the coarsening depth otherwise."""
    return F.array(*[cell_id_col(x, y, r) for r in res_levels])


def bbox_cells_array_col(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, res: int,
) -> Column:
    """Array column of the cells at ``res`` covering a per-row bbox — the
    pure-column-expr twin of ``covering_cells_np`` (whole-stage codegen,
    no Python). Intended for per-row-small bboxes (triangles, face bboxes);
    large-ROI coverings go through ``covering_cells_np`` which bounds the
    count by coarsening."""
    s = F.lit(cell_size(res))
    ix0 = F.floor(xmin / s).cast("long")
    ix1 = F.floor(xmax / s).cast("long")
    iy0 = F.floor(ymin / s).cast("long")
    iy1 = F.floor(ymax / s).cast("long")
    offset = F.lit(_OFFSET).cast("long")
    res_bits = F.lit(int(res)).cast("long")
    return F.flatten(F.transform(
        F.sequence(ix0, ix1),
        lambda ix: F.transform(
            F.sequence(iy0, iy1),
            lambda iy: F.shiftleft(res_bits, 2 * _COORD_BITS)
            .bitwiseOR(F.shiftleft(ix + offset, _COORD_BITS))
            .bitwiseOR(iy + offset),
        ),
    ))


def multires_bbox_cells_col(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column,
    res_levels: list[int],
) -> Column:
    """Concatenated bbox-covering cells over every resolution in
    ``res_levels`` — the bbox analog of ``multires_cell_array_col``."""
    arrays = [bbox_cells_array_col(xmin, ymin, xmax, ymax, r)
              for r in res_levels]
    return arrays[0] if len(arrays) == 1 else F.concat(*arrays)


def res_levels_of_cells(cell_values) -> list[int]:
    """Distinct resolutions present in an iterable/array of packed cell ids
    (driver-side twin of ``cell_res_col``)."""
    arr = np.asarray(list(cell_values), dtype=np.int64)
    if arr.size == 0:
        return []
    return sorted({int(r) for r in np.unique(arr >> (2 * _COORD_BITS))})


# ---------------------------------------------------------------------------
# Numpy twins (for pandas UDFs / drivers / tests)
# ---------------------------------------------------------------------------

def cell_id_np(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    s = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / s).astype(np.int64) + _OFFSET
    iy = np.floor(np.asarray(y, dtype=np.float64) / s).astype(np.int64) + _OFFSET
    return (np.int64(res) << (2 * _COORD_BITS)) | (ix << _COORD_BITS) | iy


def covering_cells_batch(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray,
    res: int, max_cells: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``covering_cells_np`` over n bboxes at once →
    ``(cells, counts)``: one flat int64 cell array (row i's cells occupy
    the slice ``[counts[:i].sum(), counts[:i+1].sum())``, x-major like the
    scalar twin) and the per-row counts. Identical per-row output to
    calling ``covering_cells_np`` n times — including the per-row
    coarsening loop — but emission is one ``np.repeat`` pass instead of a
    per-geometry meshgrid + DataFrame append (round-3 VERDICT #7)."""
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    n = len(xmin)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    r = np.full(n, res, dtype=np.int64)
    while True:
        s = BASE / np.exp2(r)
        ix0 = np.floor(xmin / s).astype(np.int64)
        ix1 = np.floor(xmax / s).astype(np.int64)
        iy0 = np.floor(ymin / s).astype(np.int64)
        iy1 = np.floor(ymax / s).astype(np.int64)
        counts = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        if max_cells is None:
            break
        over = (counts > max_cells) & (r > 0)
        if not over.any():
            break
        r[over] -= 1
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    row = np.repeat(np.arange(n), counts)
    k = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
    ny = iy1 - iy0 + 1
    dx = k // ny[row]
    dy = k % ny[row]
    cells = (
        (r[row] << (2 * _COORD_BITS))
        | ((ix0[row] + dx + _OFFSET) << _COORD_BITS)
        | (iy0[row] + dy + _OFFSET)
    )
    return cells, counts


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
    """Cells covering an axis-aligned bbox (polygon covering,
    frustum-footprint covering). Coarsens resolution if the covering would
    exceed ``max_cells`` (keeps the candidate join bounded for huge ROIs).

    CONTRACT: output may be at a resolution COARSER than ``res`` (the res
    is encoded in the id's top bits, so coarse ids never equi-join-match
    fixed-res ids). Consumers must join the other side at every resolution
    present in the covering — use ``res_levels_of_cells`` /
    ``covering_res_levels`` + ``multires_cell_array_col`` /
    ``multires_bbox_cells_col``. Joining a mixed-res covering against a
    single fixed-res key silently drops every coarsened row's matches.
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
