"""Tile/raster layer: top-down rasterization, weighted window assembly,
zonal stats — hand-computable fixtures + scene-level invariants."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geograypher_spark.functions import geometry as geom
from geograypher_spark.operators import tiles as TL
from geograypher_spark.sources.scene import scene_to_spark

GRID = TL.TileGrid(x0=0.0, y0=10.0, gsd=0.1, tile_px=32)


def _square_faces(spark, xmin, ymin, xmax, ymax, z, class_id, fid0=0):
    quad = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    rows = []
    for k, tri in enumerate([(0, 1, 2), (0, 2, 3)]):
        p = [quad[i] for i in tri]
        rows.append({
            "face_id": fid0 + k, "class_id": class_id,
            "x0": p[0][0], "y0": p[0][1], "z0": z,
            "x1": p[1][0], "y1": p[1][1], "z1": z,
            "x2": p[2][0], "y2": p[2][1], "z2": z,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


class TestRasterize:
    def test_square_pixel_counts(self, spark):
        # 2x2m square at origin (0..2), gsd 0.1 → 20x20 = 400 px of class 1
        df = _square_faces(spark, 0.0, 0.0, 2.0, 2.0, z=1.0, class_id=1)
        got = TL.rasterize_face_labels(df, GRID).collect()
        total = sum(r["pixel_count"] for r in got)
        assert total == 400
        assert all(r["class_id"] == 1 for r in got)

    def test_occlusion_higher_wins(self, spark):
        low = _square_faces(spark, 0.0, 0.0, 2.0, 2.0, z=0.0, class_id=1, fid0=0)
        high = _square_faces(spark, 0.5, 0.5, 1.5, 1.5, z=2.0, class_id=2, fid0=2)
        got = TL.rasterize_face_labels(low.unionByName(high), GRID).collect()
        by_class = {}
        for r in got:
            by_class[r["class_id"]] = by_class.get(r["class_id"], 0) + r["pixel_count"]
        assert by_class[2] == 100          # 1x1m at 0.1 gsd
        assert by_class[1] == 400 - 100    # occluded region goes to class 2

    def test_tile_split_consistency(self, spark):
        # square spanning multiple tiles: per-tile counts sum to the total
        df = _square_faces(spark, 1.0, 1.0, 9.0, 9.0, z=0.5, class_id=3)
        got = TL.rasterize_face_labels(df, GRID).collect()
        assert sum(r["pixel_count"] for r in got) == 80 * 80
        assert len({(r["tile_x"], r["tile_y"]) for r in got}) > 1

    def test_images_match_counts(self, spark, scene):
        verts, faces, polys, cams = scene_to_spark(spark, scene)
        labeled = faces.filter(F.col("class_id").isNotNull())
        counts = TL.rasterize_face_labels(labeled, GRID).collect()
        images = TL.rasterize_face_labels(labeled, GRID, emit_images=True).collect()
        img_counts = {}
        for r in images:
            img = np.frombuffer(bytes(r["data"]), dtype=np.uint8)
            for v, c in zip(*np.unique(img[img != TL.NODATA], return_counts=True)):
                img_counts[(r["tile_x"], r["tile_y"], int(v))] = int(c)
        cnt = {(r["tile_x"], r["tile_y"], r["class_id"]): r["pixel_count"] for r in counts}
        assert cnt == img_counts


class TestAssembly:
    def test_single_window_identity(self, spark):
        cls = np.zeros((32, 32), dtype=np.uint8)
        cls[:, 16:] = 1
        win = spark.createDataFrame(pd.DataFrame([{
            "win_gx": 0, "win_gy": 0, "w": 32, "h": 32, "classes": cls.tobytes()}]))
        got = TL.assemble_tiled_predictions(win, GRID, n_classes=2).collect()
        by_class = {r["class_id"]: r["pixel_count"] for r in got}
        assert by_class == {0: 512, 1: 512}

    def test_overlapping_windows_argmax(self, spark):
        # two windows overlap on [8,24): left says class 0, right says 1.
        # ramp weights make the left half of the overlap favor the left
        # window and vice versa — recompute expectation with the same mask.
        w = h = 16
        a = np.zeros((h, w), dtype=np.uint8)
        b = np.ones((h, w), dtype=np.uint8)
        win = spark.createDataFrame(pd.DataFrame([
            {"win_gx": 0, "win_gy": 0, "w": w, "h": h, "classes": a.tobytes()},
            {"win_gx": 8, "win_gy": 0, "w": w, "h": h, "classes": b.tobytes()},
        ]))
        got = TL.assemble_tiled_predictions(win, GRID, n_classes=2,
                                            emit_images=True).collect()
        acc = np.zeros((32, 32, 2))
        m = TL.ramp_weights(h, w)
        acc[0:16, 0:16, 0] += m
        acc[0:16, 8:24, 1] += m
        exp = acc.argmax(axis=2).astype(np.uint8)
        exp[acc.sum(axis=2) <= 0] = TL.NODATA
        assert len(got) == 1
        img = np.frombuffer(bytes(got[0]["data"]), dtype=np.uint8).reshape(32, 32)
        np.testing.assert_array_equal(img, exp)

    def test_window_crossing_tiles(self, spark):
        # window straddling 4 tiles reassembles exactly
        cls = np.full((16, 16), 1, dtype=np.uint8)
        win = spark.createDataFrame(pd.DataFrame([{
            "win_gx": 24, "win_gy": 24, "w": 16, "h": 16, "classes": cls.tobytes()}]))
        got = TL.assemble_tiled_predictions(win, GRID, n_classes=2).collect()
        assert sum(r["pixel_count"] for r in got) == 256
        assert len({(r["tile_x"], r["tile_y"]) for r in got}) == 4


class TestZonal:
    def test_counts_inside_square(self, spark):
        # one tile: left half class 0, right half class 7
        img = np.zeros((32, 32), dtype=np.uint8)
        img[:, 16:] = 7
        tiles_df = spark.createDataFrame(pd.DataFrame([{
            "tile_x": 0, "tile_y": 0, "data": img.tobytes()}]))
        # polygon = world square covering pixel block cols 8..23, rows 8..23
        # tile (0,0) world x ∈ [0, 3.2], y ∈ [6.8, 10]
        wkb = geom.polygon_to_wkb([np.array([
            [0.8, 10 - 2.4], [2.4, 10 - 2.4], [2.4, 10 - 0.8], [0.8, 10 - 0.8]])])
        polys = spark.createDataFrame(
            pd.DataFrame([{"polygon_id": 1, "geometry_wkb": wkb}]))
        got = {r["class_id"]: r["pixel_count"]
               for r in TL.zonal_stats(polys, tiles_df, GRID).collect()}
        # 16x16 px window, split 8/8 between the classes
        assert got == {0: 128, 7: 128}

    def test_polygon_spanning_tiles(self, spark):
        img0 = np.zeros((32, 32), dtype=np.uint8)
        img1 = np.ones((32, 32), dtype=np.uint8)
        tiles_df = spark.createDataFrame(pd.DataFrame([
            {"tile_x": 0, "tile_y": 0, "data": img0.tobytes()},
            {"tile_x": 1, "tile_y": 0, "data": img1.tobytes()},
        ]))
        # square straddling the tile boundary at x=3.2: x∈[2.2,4.2], y∈[8,9]
        wkb = geom.polygon_to_wkb([np.array([
            [2.2, 8.0], [4.2, 8.0], [4.2, 9.0], [2.2, 9.0]])])
        polys = spark.createDataFrame(
            pd.DataFrame([{"polygon_id": 5, "geometry_wkb": wkb}]))
        got = {r["class_id"]: r["pixel_count"]
               for r in TL.zonal_stats(polys, tiles_df, GRID).collect()}
        assert got == {0: 100, 1: 100}  # 10px tall x 10px in each tile


class TestGeoTiffSink:
    def test_encode_decode_roundtrip(self):
        from geograypher_spark.sources.gtiff import encode_geotiff, read_geotiff

        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, size=(40, 56), dtype=np.uint8)
        buf = encode_geotiff(img, 432100.5, 5321000.25, 0.125,
                             epsg=32610, nodata=255)
        # structural: little-endian magic, ascending tag order
        assert buf[:4] == b"II\x2a\x00"
        import struct
        (ifd_off,) = struct.unpack_from("<I", buf, 4)
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        tags = [struct.unpack_from("<H", buf, ifd_off + 2 + 12 * k)[0]
                for k in range(n)]
        assert tags == sorted(tags)
        out, meta = read_geotiff(buf)
        np.testing.assert_array_equal(out, img)
        assert meta["origin_x"] == 432100.5 and meta["origin_y"] == 5321000.25
        assert meta["gsd"] == 0.125 and meta["epsg"] == 32610
        assert meta["nodata"] == 255

    def test_tile_sink_gtiff_end_to_end(self, spark, tmp_path):
        from geograypher_spark.operators.tiles import TileGrid, rasterize_face_labels
        from geograypher_spark.sources.sinks import write_raster_tiles
        from geograypher_spark.sources.gtiff import read_geotiff
        import pandas as pd

        grid = TileGrid(0.0, 4.0, 0.25, 16)
        faces = spark.createDataFrame(pd.DataFrame([{
            "face_id": 0, "class_id": 3,
            "x0": 0.1, "y0": 0.1, "z0": 0.0,
            "x1": 3.9, "y1": 0.1, "z1": 0.0,
            "x2": 0.1, "y2": 3.9, "z2": 0.0,
        }]))
        tiles = rasterize_face_labels(faces, grid, emit_images=True)
        write_raster_tiles(tiles, str(tmp_path), grid, fmt="gtiff", epsg=32611)
        import glob
        files = sorted(glob.glob(str(tmp_path / "*.tif")))
        assert files
        img, meta = read_geotiff(open(files[0], "rb").read())
        assert img.shape == (16, 16) and meta["epsg"] == 32611
        assert (img == 3).any() and meta["gsd"] == 0.25
