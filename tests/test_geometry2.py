"""Second geometry kernel batch: triangulation, overlay areas, simplify,
buffer/hull, ray-triangle, CRS round trips."""

import numpy as np
import pytest

from geograypher_spark.functions import crs
from geograypher_spark.functions import geometry as geom


class TestTriangulate:
    def test_convex(self):
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
        tris = geom.triangulate_ring(sq)
        assert len(tris) == 2
        assert sum(abs(geom.ring_signed_area(np.vstack([t, t[:1]]))) for t in tris) \
            == pytest.approx(4.0)

    def test_concave(self):
        L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4.0]])
        tris = geom.triangulate_ring(L)
        total = sum(abs(geom.ring_signed_area(np.vstack([t, t[:1]]))) for t in tris)
        assert total == pytest.approx(12.0)
        assert len(tris) == 4

    def test_cw_input(self):
        sq = np.array([[0, 0], [0, 2], [2, 2], [2, 0.0]])  # CW
        tris = geom.triangulate_ring(sq)
        total = sum(abs(geom.ring_signed_area(np.vstack([t, t[:1]]))) for t in tris)
        assert total == pytest.approx(4.0)


class TestOverlay:
    def test_rect_rect(self):
        a = [[geom.rect_ring(0, 0, 4, 4)]]
        b = [[geom.rect_ring(2, 2, 6, 6)]]
        assert geom.polygon_intersection_area(a, b) == pytest.approx(4.0)

    def test_concave_concave(self):
        L1 = [[np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4.0]])]]
        L2 = [[np.array([[1, 1], [5, 1], [5, 3], [3, 3], [3, 5], [1, 5.0]])]]
        # analytic: L1∩L2 — compute via fine-grid Monte Carlo-free check
        # use a deterministic dense grid as the oracle
        xs = np.linspace(0.005, 5, 500)
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        in1 = geom.points_in_polygon(gx.ravel(), gy.ravel(), L1[0])
        in2 = geom.points_in_polygon(gx.ravel(), gy.ravel(), L2[0])
        approx = (in1 & in2).sum() * (xs[1] - xs[0]) ** 2
        got = geom.polygon_intersection_area(L1, L2)
        assert got == pytest.approx(approx, abs=0.05)

    def test_hole_subtracts(self):
        outer = geom.rect_ring(0, 0, 10, 10)
        hole = geom.rect_ring(4, 4, 6, 6)
        a = [[outer, hole]]
        b = [[geom.rect_ring(3, 3, 7, 7)]]
        # B is 4x4=16; hole removes 2x2=4 → 12
        assert geom.polygon_intersection_area(a, b) == pytest.approx(12.0)


class TestSimplifyBufferHull:
    def test_simplify_collinear(self):
        ring = np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 0.0]])
        out = geom.simplify_ring(ring, tol=0.01)
        assert len(out) <= len(ring)
        # area preserved for collinear removal
        assert abs(geom.ring_signed_area(out)) == pytest.approx(4.0)

    def test_simplify_tolerance(self):
        # ring with a small bump that should vanish at tol=0.5
        ring = np.array([[0, 0], [2, 0], [2.1, 0.2], [2.2, 0], [4, 0],
                         [4, 4], [0, 4], [0, 0.0]])
        out = geom.simplify_ring(ring, tol=0.5)
        assert len(out) < len(ring)

    def test_convex_hull(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 10, (200, 2))
        hull = geom.convex_hull(pts)
        inside = geom.points_in_ring(pts[:, 0], pts[:, 1],
                                     np.vstack([hull, hull[:1]]))
        # all points inside or on the hull (on-boundary may test False for
        # the hull vertices themselves under the half-open rule)
        hull_set = {tuple(h) for h in hull}
        interior = np.array([tuple(p) not in hull_set for p in pts])
        assert inside[interior].mean() > 0.95

    def test_buffer_contains_originals(self):
        pts = np.array([[0, 0], [3, 1], [1, 4.0]])
        buf = geom.buffer_convex(pts, 0.5)
        inside = geom.points_in_ring(pts[:, 0], pts[:, 1],
                                     np.vstack([buf, buf[:1]]))
        assert inside.all()
        # area ≥ triangle area + something
        assert abs(geom.ring_signed_area(np.vstack([buf, buf[:1]]))) > 5.0


class TestRayTriangle:
    def test_hit_and_miss(self):
        tri0 = np.array([[0, 0, 1.0]])
        tri1 = np.array([[2, 0, 1.0]])
        tri2 = np.array([[0, 2, 1.0]])
        starts = np.array([[0.5, 0.5, 0.0], [5, 5, 0.0]])
        dirs = np.array([[0, 0, 1.0], [0, 0, 1.0]])
        t, hit = geom.rays_triangles_first_hit(starts, dirs, tri0, tri1, tri2)
        assert hit.tolist() == [True, False]
        assert t[0] == pytest.approx(1.0)

    def test_first_of_two(self):
        tri0 = np.array([[0, 0, 1.0], [0, 0, 3.0]])
        tri1 = np.array([[2, 0, 1.0], [2, 0, 3.0]])
        tri2 = np.array([[0, 2, 1.0], [0, 2, 3.0]])
        starts = np.array([[0.5, 0.5, 0.0]])
        dirs = np.array([[0, 0, 1.0]])
        t, hit = geom.rays_triangles_first_hit(starts, dirs, tri0, tri1, tri2)
        assert hit[0] and t[0] == pytest.approx(1.0)


class TestCrs:
    def test_ecef_roundtrip(self):
        rng = np.random.default_rng(0)
        lon = rng.uniform(-179, 179, 500)
        lat = rng.uniform(-85, 85, 500)
        h = rng.uniform(-100, 9000, 500)
        x, y, z = crs.geodetic_to_ecef(lon, lat, h)
        lon2, lat2, h2 = crs.ecef_to_geodetic(x, y, z)
        np.testing.assert_allclose(lon2, lon, atol=1e-12)
        np.testing.assert_allclose(lat2, lat, atol=1e-12)
        np.testing.assert_allclose(h2, h, atol=1e-7)

    def test_utm_roundtrip(self):
        rng = np.random.default_rng(1)
        lon = rng.uniform(-125.9, -120.1, 500)  # zone 10
        lat = rng.uniform(-80, 84, 500)
        e, n = crs.geodetic_to_utm(lon, lat, zone=10)
        lon2, lat2 = crs.utm_to_geodetic(e, n, zone=10)
        np.testing.assert_allclose(lon2, lon, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, atol=1e-10)

    def test_utm_known_values(self):
        e, n = crs.geodetic_to_utm(np.array([-123.0]), np.array([0.0]), 10)
        assert e[0] == pytest.approx(500000.0)
        assert n[0] == pytest.approx(0.0, abs=1e-6)

    def test_epsg_formula(self):
        got = crs.utm_epsg_from_lonlat(
            np.array([-123.0, 151.2, 0.4]), np.array([45.0, -33.8, 51.0]))
        assert got.tolist() == [32610, 32756, 32631]

    def test_ecef_axis_convention(self):
        # lon=0, lat=0 → +X axis at equatorial radius
        x, y, z = crs.geodetic_to_ecef(np.array([0.0]), np.array([0.0]), np.array([0.0]))
        assert x[0] == pytest.approx(6378137.0)
        assert abs(y[0]) < 1e-9 and abs(z[0]) < 1e-9
