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


def _resolve_nonoverlap_pdf(pdf: pd.DataFrame, min_area: float) -> pd.DataFrame:
    """The non-overlap recurrence kernel (pandas in, pandas out).

    The accumulated-union region is a bbox-indexed soup of CONVEX pieces:
    a class piece only subtracts accumulated pieces whose bbox intersects
    its own (disjoint-bbox pieces cannot change it), and each subtraction
    clips against a whole convex piece, not its fan triangles. The old
    version rescanned the ENTIRE fan-triangle soup for every class —
    O(classes x total-vertices) geometry calls (round-2 VERDICT #6)."""
    items = []
    for r in pdf.itertuples(index=False):
        polys = geom.wkb_to_rings(bytes(r.geometry_wkb))
        items.append((float(geom.multipolygon_area(polys)), r.class_id, polys))
    # area asc; class id breaks ties deterministically
    items.sort(key=lambda it: (it[0], it[1]))
    acc: list[np.ndarray] = []
    acc_bbox: list[tuple[float, float, float, float]] = []
    out = {"class_id": [], "geometry_wkb": [], "area": []}
    for _, cls, polys in items:
        original = geom.polygon_region_pieces(polys)
        # two-level pruning: class bbox first (drops far classes wholesale),
        # then per piece within the class-local subset
        csel = np.empty(0, dtype=np.int64)
        B = Bc = None
        if acc_bbox and original:
            B = np.asarray(acc_bbox, dtype=np.float64)
            cxmin = min(float(p[:, 0].min()) for p in original)
            cymin = min(float(p[:, 1].min()) for p in original)
            cxmax = max(float(p[:, 0].max()) for p in original)
            cymax = max(float(p[:, 1].max()) for p in original)
            csel = np.nonzero(
                (B[:, 0] <= cxmax) & (B[:, 2] >= cxmin)
                & (B[:, 1] <= cymax) & (B[:, 3] >= cymin))[0]
            Bc = B[csel] if len(csel) else None
        surviving: list[np.ndarray] = []
        for p in original:
            pieces = [p]
            if Bc is not None:
                pxmin, pymin = p.min(axis=0)
                pxmax, pymax = p.max(axis=0)
                sel = csel[
                    (Bc[:, 0] <= pxmax) & (Bc[:, 2] >= pxmin)
                    & (Bc[:, 1] <= pymax) & (Bc[:, 3] >= pymin)]
                for ti in sel:
                    pieces = geom.convex_pieces_minus_convex(pieces, acc[ti])
                    if not pieces:
                        break
            surviving.extend(pieces)
        pieces = [p for p in surviving if abs(geom.ring_signed_area(
            np.vstack([p, p[:1]]))) > min_area]
        area = float(sum(abs(geom.ring_signed_area(np.vstack([p, p[:1]])))
                         for p in pieces))
        out["class_id"].append(float(cls))
        out["geometry_wkb"].append(geom.multipolygon_to_wkb([[p] for p in pieces]))
        out["area"].append(area)
        # accumulate the ORIGINAL region's convex pieces
        for p in original:
            acc.append(p)
            acc_bbox.append((float(p[:, 0].min()), float(p[:, 1].min()),
                             float(p[:, 0].max()), float(p[:, 1].max())))
    return pd.DataFrame({
        "class_id": pd.Series(out["class_id"], dtype="float64"),
        "geometry_wkb": pd.Series(out["geometry_wkb"], dtype=object),
        "area": pd.Series(out["area"], dtype="float64")})


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
    union kept as a bbox-indexed triangle soup, piece ∖ triangle via
    half-plane splitting. Output geometry per class is a MultiPolygon of
    the surviving convex pieces: area-identical to the dissolved GEOS
    result, just not re-dissolved (a finer partition of the same region).

    The recurrence is inherently serial in class order (the reference runs
    the identical loop), but it runs in ONE executor task via
    ``applyInPandas`` — the class-union table is one row per class (the
    collapsed small side of A6), so a single task holds it comfortably and
    the driver never materializes geometry."""
    sel = unions.select(
        F.col(class_col).cast("double").alias("class_id"),
        F.col(wkb_col).alias("geometry_wkb"))

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _resolve_nonoverlap_pdf(pdf, min_area)

    return (sel.withColumn("_g", F.lit(0))
            .groupBy("_g").applyInPandas(run, schema=RESOLVED_SCHEMA))
