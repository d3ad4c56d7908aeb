"""Per-class geometry union for vector export.

Reference A6 (``meshes/meshes.py:1345-1381`` + ``utils/geometric.py:13-94``):
thousands of face triangles per class merged with batched/hierarchical GEOS
``unary_union`` (batch 500k, recursive batch 4, simplify between levels).

Spark-first replacement for triangulated face sets: the union boundary of a
set of edge-sharing triangles is exactly the set of undirected edges used
by ONE triangle (interior edges are used by two). So the union is

1. explode every labeled face into its 3 edges          (narrow)
2. groupBy (class, undirected edge) → keep count == 1   (one shuffle)
3. attach vertex coords (join on vertex id)             (one shuffle)
4. chain boundary edges into rings per class            (applyInPandas —
   boundary size ∝ perimeter, tiny vs face count)

Exact (no floating-point constructions), no GEOS, and the heavy lifting is
plain groupBy — the reference's "embarrassingly parallel" comment
(``utils/geometric.py:51-52``) realized as an actual shuffle plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geometry as geom

UNION_SCHEMA = T.StructType([
    T.StructField("class_id", T.DoubleType()),
    T.StructField("geometry_wkb", T.BinaryType()),
    T.StructField("area", T.DoubleType()),
    T.StructField("n_rings", T.IntegerType()),
    T.StructField("n_boundary_edges", T.LongType()),
])


def face_class_union(
    faces: DataFrame, verts: DataFrame, class_col: str = "class_id",
    upward_only: bool = True,
) -> DataFrame:
    """faces (v0, v1, v2, x0..y2, class_col) + verts (vert_id, x, y) →
    (class_id, geometry_wkb, area, n_rings): one MultiPolygon per class.

    ``upward_only=True`` keeps only faces whose plan-view signed area is
    positive-definite (upward normal) — on a closed mesh EVERY edge is
    interior, so the plan-view footprint is the boundary of the
    visible-from-above subset (the silhouette). Requires a height-field-like
    surface per class (no overhangs), which drone-survey meshes are.
    With ``upward_only=False``, faces are re-oriented CCW first (for open
    sheets like a bare ground plane with mixed orientation).
    """
    f = faces.filter(F.col(class_col).isNotNull())
    # plan-view cross product = 2 × signed area = (scaled) normal z
    cross = (
        (F.col("x1") - F.col("x0")) * (F.col("y2") - F.col("y0"))
        - (F.col("y1") - F.col("y0")) * (F.col("x2") - F.col("x0"))
    )
    a, b, c = F.col("v0"), F.col("v1"), F.col("v2")
    if upward_only:
        ordered = f.filter(cross > 1e-12).select(
            F.col(class_col).cast("double").alias("class_id"),
            a.alias("e0"), b.alias("e1"), c.alias("e2"),
        )
    else:
        ordered = f.filter(F.abs(cross) > 1e-12).select(
            F.col(class_col).cast("double").alias("class_id"),
            a.alias("e0"),
            F.when(cross >= 0, b).otherwise(c).alias("e1"),
            F.when(cross >= 0, c).otherwise(b).alias("e2"),
        )
    edges = (
        ordered.select("class_id", F.col("e0").alias("u"), F.col("e1").alias("v"))
        .union(ordered.select("class_id", F.col("e1").alias("u"), F.col("e2").alias("v")))
        .union(ordered.select("class_id", F.col("e2").alias("u"), F.col("e0").alias("v")))
    )
    # boundary = undirected edge with exactly one use; keep its direction
    und = edges.withColumn("lo", F.least("u", "v")).withColumn("hi", F.greatest("u", "v"))
    boundary = (
        und.groupBy("class_id", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"), F.first("u").alias("u"), F.first("v").alias("v"))
        .filter(F.col("n") == 1)
        .select("class_id", "u", "v")
    )
    vxy = verts.select("vert_id", "x", "y")
    with_coords = (
        boundary
        .join(vxy.select(F.col("vert_id").alias("u"), F.col("x").alias("ux"), F.col("y").alias("uy")), "u")
        .join(vxy.select(F.col("vert_id").alias("v"), F.col("x").alias("vx"), F.col("y").alias("vy")), "v")
    )

    def chain(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # successor map u→(v, coords); boundary of a valid triangulation is
        # a 1-manifold so each u has exactly one outgoing edge per ring pass
        nxt: dict[int, list[tuple[int, float, float]]] = {}
        coord: dict[int, tuple[float, float]] = {}
        for r in pdf.itertuples(index=False):
            nxt.setdefault(int(r.u), []).append(int(r.v))
            coord[int(r.u)] = (float(r.ux), float(r.uy))
            coord[int(r.v)] = (float(r.vx), float(r.vy))
        visited: set[tuple[int, int]] = set()
        rings: list[np.ndarray] = []
        for r in pdf.itertuples(index=False):
            a0, b0 = int(r.u), int(r.v)
            if (a0, b0) in visited:
                continue
            path = [a0]
            a_, b_ = a0, b0
            ok = True
            while True:
                visited.add((a_, b_))
                path.append(b_)
                if b_ == a0:
                    break
                cands = [c2 for c2 in nxt.get(b_, []) if (b_, c2) not in visited]
                if not cands:
                    ok = False
                    break
                a_, b_ = b_, cands[0]
            if ok and len(path) > 3:
                rings.append(np.array([coord[i] for i in path]))
        if not rings:
            return pd.DataFrame({"class_id": pd.Series([], dtype="float64"),
                                 "geometry_wkb": pd.Series([], dtype=object),
                                 "area": pd.Series([], dtype="float64"),
                                 "n_rings": pd.Series([], dtype="int32"),
                                 "n_boundary_edges": pd.Series([], dtype="int64")})
        # CCW rings are exteriors, CW are holes; assign each hole to the
        # smallest exterior containing its first vertex
        exts = [r for r in rings if geom.ring_signed_area(r) > 0]
        holes = [r for r in rings if geom.ring_signed_area(r) <= 0]
        polys: list[list[np.ndarray]] = [[e] for e in exts]
        order = np.argsort([abs(geom.ring_signed_area(e)) for e in exts])
        for h in holes:
            px, py = h[0, 0], h[0, 1]
            for i in order:
                if geom.points_in_ring(np.array([px]), np.array([py]), exts[i])[0]:
                    polys[i].append(h)
                    break
        wkb = geom.multipolygon_to_wkb(polys)
        area = sum(geom.polygon_area(rings_) for rings_ in polys)
        return pd.DataFrame({
            "class_id": [key[0]], "geometry_wkb": [wkb],
            "area": [area], "n_rings": [len(rings)],
            "n_boundary_edges": [sum(len(r) - 1 for r in rings)]})

    return with_coords.groupBy("class_id").applyInPandas(chain, schema=UNION_SCHEMA)


RESOLVED_SCHEMA = T.StructType([
    T.StructField("class_id", T.DoubleType()),
    T.StructField("geometry_wkb", T.BinaryType()),
    T.StructField("area", T.DoubleType()),
])


def ensure_non_overlapping_unions(
    unions: DataFrame, class_col: str = "class_id",
    wkb_col: str = "geometry_wkb", min_area: float = 1e-9,
) -> DataFrame:
    """W3 vector-space non-overlap resolution (reference
    ``utils/geospatial.py:74-107`` ``ensure_non_overlapping_polygons``):
    process class geometries in area-ASCENDING order; each output is the
    geometry minus the union of all previously-processed ORIGINAL
    geometries (originals accumulate, not the differenced outputs — same
    boundary-artifact guard as the reference). Exported per-class
    geometries are pairwise disjoint.

    No GEOS: the difference is computed by convex decomposition — region →
    convex pieces (triangulate exterior, subtract hole triangles), running
    union kept as a triangle soup, piece ∖ triangle via half-plane
    splitting. Output geometry per class is a MultiPolygon of the
    surviving convex pieces: area-identical to the dissolved GEOS result,
    just not re-dissolved (a finer partition of the same region).

    Driver-side sequential loop BY DESIGN: the per-class union table is
    one row per class (the collapsed small side of A6), and the
    running-union recurrence is inherently serial in class order — the
    reference runs the identical loop.
    """
    rows = unions.select(class_col, wkb_col).collect()
    items = []
    for r in rows:
        polys = geom.wkb_to_rings(bytes(r[wkb_col]))
        items.append((float(geom.multipolygon_area(polys)), r[class_col], polys))
    # area asc; class id breaks ties deterministically
    items.sort(key=lambda it: (it[0], it[1]))
    acc_tris: list[np.ndarray] = []
    out = {"class_id": [], "geometry_wkb": [], "area": []}
    for _, cls, polys in items:
        original = geom.polygon_region_pieces(polys)
        pieces = list(original)
        for tri in acc_tris:
            pieces = geom.convex_pieces_minus_triangle(pieces, tri)
            if not pieces:
                break
        pieces = [p for p in pieces if abs(geom.ring_signed_area(
            np.vstack([p, p[:1]]))) > min_area]
        area = float(sum(abs(geom.ring_signed_area(np.vstack([p, p[:1]])))
                         for p in pieces))
        out["class_id"].append(float(cls))
        out["geometry_wkb"].append(geom.multipolygon_to_wkb([[p] for p in pieces]))
        out["area"].append(area)
        # accumulate the ORIGINAL region (fan-triangulate its convex pieces)
        for p in original:
            for k in range(1, len(p) - 1):
                acc_tris.append(np.array([p[0], p[k], p[k + 1]]))
    spark = unions.sparkSession
    return spark.createDataFrame(pd.DataFrame(out), schema=RESOLVED_SCHEMA)
