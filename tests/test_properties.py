"""Property-based tests (hypothesis) for the round-2 geometry kernels:
the convex-decomposition difference behind W3 and the mixed-resolution
cell coverings behind every candidate join."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geograypher_spark.functions import cells as C
from geograypher_spark.functions import geometry as geom

coord = st.floats(min_value=-50.0, max_value=50.0,
                  allow_nan=False, allow_infinity=False)


def _tri(pts):
    t = np.array(pts, dtype=np.float64).reshape(3, 2)
    return t


def _area(ring):
    return abs(geom.ring_signed_area(np.vstack([ring, ring[:1]])))


@st.composite
def triangles(draw):
    """Constructive well-formed triangles (no filtering): base point, two
    edge lengths and a separation angle bounded away from 0/pi — area is
    guaranteed >= 0.6, so no hypothesis health-check filtering."""
    px = draw(st.floats(-40.0, 40.0, allow_nan=False))
    py = draw(st.floats(-40.0, 40.0, allow_nan=False))
    a = draw(st.floats(0.0, 6.283, allow_nan=False))
    b = draw(st.floats(0.3, 2.84, allow_nan=False))
    r1 = draw(st.floats(2.0, 30.0, allow_nan=False))
    r2 = draw(st.floats(2.0, 30.0, allow_nan=False))
    p0 = np.array([px, py])
    p1 = p0 + r1 * np.array([np.cos(a), np.sin(a)])
    p2 = p0 + r2 * np.array([np.cos(a + b), np.sin(a + b)])
    return np.stack([p0, p1, p2])


@settings(max_examples=60, deadline=None)
@given(triangles(), triangles())
def test_triangle_difference_area_identity(a, b):
    """area(A \\ B) + area(A ∩ B) == area(A), pieces pairwise disjoint and
    disjoint from B — for arbitrary triangle pairs."""
    if geom.ring_signed_area(np.vstack([a, a[:1]])) < 0:
        a = a[::-1]
    pieces = geom.convex_pieces_minus_triangle([a], b)
    diff_area = sum(_area(p) for p in pieces)
    inter_area = geom.clip_area_convex(a, b)
    np.testing.assert_allclose(diff_area + inter_area, _area(a),
                               rtol=1e-9, atol=1e-7)
    # pieces don't overlap B
    for p in pieces:
        assert geom.clip_area_convex(p, b) <= 1e-7
    # pieces pairwise disjoint
    for i in range(len(pieces)):
        for j in range(i + 1, len(pieces)):
            assert geom.polygon_intersection_area(
                [[pieces[i]]], [[pieces[j]]]) <= 1e-7


@settings(max_examples=60, deadline=None)
@given(st.lists(triangles(), min_size=1, max_size=4), triangles())
def test_region_minus_many(tris, clip):
    """Subtracting one triangle from a multi-piece region preserves the
    area identity piecewise."""
    pieces = [t if geom.ring_signed_area(np.vstack([t, t[:1]])) > 0 else t[::-1]
              for t in tris]
    out = geom.convex_pieces_minus_triangle(pieces, clip)
    expect = sum(_area(p) - geom.clip_area_convex(p, clip) for p in pieces)
    got = sum(_area(p) for p in out)
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-6)


@settings(max_examples=100, deadline=None)
@given(st.floats(-1e5, 1e5), st.floats(-1e5, 1e5),
       st.floats(0.1, 5000.0), st.floats(0.1, 5000.0),
       st.integers(0, 10))
def test_covering_contains_every_interior_point(x0, y0, w, h, res):
    """Any point inside a bbox must reach the covering through the cell at
    the covering's own resolution — the invariant the coarsening bug broke."""
    cc = C.covering_cells_np(x0, y0, x0 + w, y0 + h, res, max_cells=256)
    levels = C.res_levels_of_cells(cc)
    assert len(levels) == 1  # per-bbox coverings are single-res
    r = levels[0]
    cover = set(int(c) for c in cc)
    rng = np.random.default_rng(7)
    px = x0 + rng.random(20) * w
    py = y0 + rng.random(20) * h
    ids = C.cell_id_np(px, py, r)
    assert all(int(i) in cover for i in ids)
    assert len(cc) <= 256


@settings(max_examples=100, deadline=None)
# subnormal coords excluded: floor(y/s) underflows inconsistently across
# resolutions within ~1e-308 of a cell edge — physically meaningless for
# meter-valued coordinates (documented in cells.py)
@given(st.floats(-1e5, 1e5, allow_subnormal=False),
       st.floats(-1e5, 1e5, allow_subnormal=False),
       st.integers(0, 12), st.integers(0, 12))
def test_ancestor_matches_direct_encoding_property(x, y, r1, r2):
    lvl, r = min(r1, r2), max(r1, r2)
    a = C.cell_id_np(np.array([x]), np.array([y]), r)[0]
    direct = C.cell_id_np(np.array([x]), np.array([y]), lvl)[0]
    # numpy twin of cell_ancestor_col
    res, ix, iy = C.cell_decode_np(np.array([a]))
    steps = int(res[0]) - lvl
    pix = int(np.floor(ix[0] / (2 ** steps)))
    piy = int(np.floor(iy[0] / (2 ** steps)))
    packed = (lvl << 58) | ((pix + (1 << 28)) << 29) | (piy + (1 << 28))
    assert packed == int(direct)
