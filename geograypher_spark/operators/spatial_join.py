"""Spatial join spine: cell-prefix candidate join + exact PIP refinement.

Replaces the reference's geopandas joins:
- ``gpd.sjoin(faces, polygons, predicate="within")`` (``meshes/meshes.py:1226-1237``)
- ``gpd.tools.overlay(verts, gdf, how="intersection")`` (``meshes/meshes.py:1013-1056``)
- coarse-then-exact ROI prefilter (``meshes/meshes.py:1210-1237``)

Pattern (the engine's core, per north_rule):
1. encode point side to grid cells — pure column expr, codegen'd
2. cover each polygon with cells at the same resolution — small side,
   computed in one Arrow batch, usually broadcast
3. equi-join on cell id (hash join; broadcast when the covering fits,
   salted shuffle join otherwise — skew handled *explicitly*)
4. refine candidates with the exact winding-number PIP kernel in a
   vectorized pandas UDF (Arrow batches, no per-row Python)

At 100 TB the point side never moves twice: one projection to add the cell
column, one (broadcast) join, one Arrow-batched refine. No driver collect.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import cells as C
from ..functions import geometry as geom

DEFAULT_RES = 7  # 8 m cells at BASE=1024 — tuned to forest-plot object size


def with_cell(df: DataFrame, x: str = "x", y: str = "y", res: int = DEFAULT_RES,
              out: str = "cell") -> DataFrame:
    return df.withColumn(out, C.cell_id_col(F.col(x), F.col(y), res))


def with_cell_multires(
    df: DataFrame, x: str = "x", y: str = "y",
    res_levels: list[int] | None = None, out: str = "cell",
) -> DataFrame:
    """Cell key(s) for the point side of a covering join. With one level
    this is a plain column (no row blow-up); with several (a covering that
    coarsened some rows) the point gets one row per level via explode —
    each covering row is single-res, so a (point, geometry) pair still
    matches through exactly one leg."""
    levels = sorted(set(res_levels or [DEFAULT_RES]))
    if len(levels) == 1:
        return df.withColumn(out, C.cell_id_col(F.col(x), F.col(y), levels[0]))
    return df.withColumn(
        out, F.explode(C.multires_cell_array_col(F.col(x), F.col(y), levels)))


def covering_res_levels(cover: DataFrame) -> list[int]:
    """Distinct resolutions present in a covering DataFrame — one tiny agg
    job on the SMALL (covering) side, never on the point side."""
    rows = (cover.select(C.cell_res_col(F.col("cell")).alias("r"))
            .distinct().collect())
    return sorted(int(r["r"]) for r in rows)


def _polygon_covering_pdf(
    polygons_pdf: "pd.DataFrame", wkb_col: str, res: int,
    max_cells_per_polygon: int,
) -> "pd.DataFrame":
    if not len(polygons_pdf):
        return pd.DataFrame(
            {"cell": pd.Series([], dtype="int64"),
             **{c: pd.Series([], dtype=object)
                for c in polygons_pdf.columns}})
    # bbox per geometry (WKB parse is per-row by nature), then ONE
    # batched covering + np.repeat emission for the whole frame
    boxes = np.array([
        geom.rings_bbox(geom.wkb_to_rings(bytes(v)))
        for v in polygons_pdf[wkb_col]], dtype=np.float64)
    cells, counts = C.covering_cells_batch(
        boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], res,
        max_cells=max_cells_per_polygon)
    out = polygons_pdf.iloc[
        np.repeat(np.arange(len(polygons_pdf)), counts)].reset_index(drop=True)
    out.insert(0, "cell", cells)
    return out


def polygon_covering_cells_driver(
    polygons: DataFrame, wkb_col: str = "geometry_wkb", res: int = DEFAULT_RES,
    max_cells_per_polygon: int = 4096,
) -> tuple[DataFrame, list[int]]:
    """Driver-side covering for the BROADCAST path: the polygon side is by
    definition small enough to broadcast, so collecting it is free and
    avoids a 32-task python stage for a 3-row table.

    Returns ``(covering_df, res_levels)`` — the levels come free from the
    local pandas frame, so the point side can key itself at every res the
    covering actually uses (coarsened large-ROI rows included) without an
    extra Spark job."""
    pdf = polygons.toPandas()
    cover_pdf = _polygon_covering_pdf(pdf, wkb_col, res, max_cells_per_polygon)
    levels = C.res_levels_of_cells(cover_pdf["cell"].to_numpy()) or [res]
    spark = polygons.sparkSession
    schema = T.StructType(
        [T.StructField("cell", T.LongType())] + list(polygons.schema.fields))
    return spark.createDataFrame(cover_pdf, schema=schema).coalesce(1), levels


def polygon_covering_cells(
    polygons: DataFrame, wkb_col: str = "geometry_wkb", res: int = DEFAULT_RES,
    max_cells_per_polygon: int = 4096,
) -> DataFrame:
    """(polygon keys..., cell) — one row per covering cell.

    Bbox covering (safe overestimate); the exact PIP refine removes false
    positives, so correctness never depends on covering tightness.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _polygon_covering_pdf(pdf, wkb_col, res, max_cells_per_polygon)

    schema = T.StructType(
        [T.StructField("cell", T.LongType())] + list(polygons.schema.fields))
    return polygons.mapInPandas(gen, schema=schema)


def _pip_ring_expr(px, py, ring: np.ndarray):
    """Crossing-number test for one closed ring as a pure column
    expression — the EXACT arithmetic of ``geom.points_in_ring`` compiled
    per edge: ``cond = (y0 <= py) != (y1 <= py)`` and
    ``px < x0 + (py - y0) * dx / dy`` with dx/dy precomputed in float64
    (the same subtractions numpy performs), same op order, so every
    comparison is bit-identical to the kernel. Horizontal edges are
    skipped (``cond`` is identically false for them — numpy reaches the
    same result through its inf-divisor guard). Returns (expr, n_edges)."""
    x0s, y0s = ring[:-1, 0], ring[:-1, 1]
    x1s, y1s = ring[1:, 0], ring[1:, 1]
    crossings = None
    n = 0
    for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
        if y0 == y1:
            continue
        dx = float(x1 - x0)
        dy = float(y1 - y0)
        cond = ((F.lit(float(y0)) <= py) != (F.lit(float(y1)) <= py)) & (
            px < F.lit(float(x0)) + (py - F.lit(float(y0)))
            * F.lit(dx) / F.lit(dy))
        c = F.when(cond, 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
        n += 1
    if crossings is None:
        return F.lit(False), 0
    return (crossings % 2) == 1, n


def _pip_polys_expr(px, py, polys: list[list[np.ndarray]]):
    """``geom.points_in_multipolygon`` as a column expression: OR over
    polygons of (exterior ring & ~holes). Returns (expr, n_edges)."""
    def _closed(r: np.ndarray) -> np.ndarray:
        return r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]])

    out = None
    total = 0
    for rings in polys:
        e, n = _pip_ring_expr(px, py, _closed(np.asarray(rings[0])))
        total += n
        for hole in rings[1:]:
            he, hn = _pip_ring_expr(px, py, _closed(np.asarray(hole)))
            e = e & ~he
            total += hn
        out = e if out is None else out | e
    return (F.lit(False) if out is None else out), total


def pip_filter_expr(px, py, pid_col, wkb_map: dict,
                    max_edges: int = 512):
    """The whole broadcast-path PIP refine as ONE JVM expression (a
    polygon_id CASE over per-polygon crossing tests), or None when the
    polygon set is too big to inline (edge budget keeps the generated
    method well under janino limits — the caller falls back to the Arrow
    kernel).

    Guide §4: the refine predicate was the only Python boundary in the
    point/vert spatial joins — every candidate row crossed JVM→Arrow→
    pandas and back just to evaluate a handful of edge comparisons. As a
    codegen'd expression the filter fuses into the scan/join stage
    (measured at sf1.0: points_in_polygons 0.94 s → ~0.55 s,
    ArrowEvalPython gone from the plan). The kernel path stays the
    implementation for polygon sets beyond the inlining budget."""
    total = 0
    expr = None
    for pid, wkb in wkb_map.items():
        polys = geom.wkb_to_rings(bytes(wkb))
        e, n = _pip_polys_expr(px, py, polys)
        total += n
        if total > max_edges:
            return None
        expr = (F.when(pid_col == F.lit(pid), e) if expr is None
                else expr.when(pid_col == F.lit(pid), e))
    if expr is None:
        return F.lit(False)
    return expr.otherwise(F.lit(False))


@pandas_udf(T.BooleanType())
def pip_udf(x: pd.Series, y: pd.Series, wkb: pd.Series) -> pd.Series:
    """Exact point-in-polygon over Arrow batches. Batches are grouped by
    polygon bytes first so each distinct polygon decodes once."""
    out = np.zeros(len(x), dtype=bool)
    xv = x.to_numpy(dtype=np.float64)
    yv = y.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb, use_na_sentinel=True)
    for u_idx, u_wkb in enumerate(uniques):
        m = codes == u_idx
        out[m] = geom.points_in_wkb(xv[m], yv[m], bytes(u_wkb))
    return pd.Series(out)


def choose_salt_factor(
    df: DataFrame, key: str = "cell",
    target_rows_per_task: int = 200_000, cap: int = 64,
) -> int:
    """Salting factor from the key histogram (north_rule: skew handled
    EXPLICITLY, AQE as backstop). Forest plots concentrate faces in a few
    cells; the hottest key's row count divided by a per-task budget gives
    the number of salt shards needed to level it. One cheap agg job."""
    row = (
        df.groupBy(key).count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .collect()[0]
    )
    mx = int(row["mx"] or 0)
    avg = float(row["avg"] or 1.0)
    # no salting unless the hottest key is both big and skewed
    if mx <= target_rows_per_task or mx <= 4 * avg:
        return 1
    import math

    return min(cap, math.ceil(mx / target_rows_per_task))


def salted_equi_join(
    big: DataFrame, small: DataFrame, key: str, salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle equi-join with explicit salting for skewed keys (north_rule).

    The big side gets a deterministic salt derived from its whole row hash;
    the small side is exploded ×salt_factor. Use when the small side exceeds
    broadcast threshold AND key histogram is skewed (forest plots concentrate
    faces in few cells). AQE skew-join remains on as backstop.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
    joined = big_s.join(small_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


@pandas_udf(T.DoubleType())
def overlap_area_udf(
    x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series,
    x2: pd.Series, y2: pd.Series, wkb: pd.Series,
) -> pd.Series:
    """Exact 2D intersection area of triangle (x0..y2) with a WKB
    (Multi)Polygon. Clips each polygon ring (concave OK) against the convex
    triangle (Sutherland–Hodgman), exterior minus holes, summed over parts.

    Replaces ``gpd.overlay(..., how="intersection")`` area computation
    (reference ``meshes/meshes.py:1240-1244``) without GEOS.
    """
    n = len(x0)
    out = np.zeros(n, dtype=np.float64)
    tri = np.stack([
        np.stack([x0.to_numpy(float), y0.to_numpy(float)], axis=1),
        np.stack([x1.to_numpy(float), y1.to_numpy(float)], axis=1),
        np.stack([x2.to_numpy(float), y2.to_numpy(float)], axis=1),
    ], axis=1)  # (n, 3, 2)
    codes, uniques = pd.factorize(wkb, use_na_sentinel=True)
    for u_idx, u_wkb in enumerate(uniques):
        polys = geom.wkb_to_rings(bytes(u_wkb))
        idxs = np.nonzero(codes == u_idx)[0]
        for i in idxs:
            a = 0.0
            for rings in polys:
                a += geom.clip_area_convex(rings[0], tri[i])
                for hole in rings[1:]:
                    a -= geom.clip_area_convex(hole, tri[i])
            out[i] = a
    return pd.Series(out)


def triangles_polygon_overlap(
    faces: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
    broadcast_covering: bool = True,
    salt_factor: int | None = None,
    min_area: float = 1e-9,
) -> DataFrame:
    """Candidate cell join (triangle bbox covering × polygon covering) +
    exact intersection-area refine → one row per overlapping (face, polygon)
    pair with ``overlap_area``.

    ``min_area`` (default 1e-9, i.e. nm² in meter CRS) drops degenerate
    boundary-touch slivers whose area is floating-point noise — the
    reference's GEOS ``set_precision`` snapping plays the same role
    (``meshes/meshes.py:1197-1203``).

    ``faces`` needs columns x0..y2 (triangle 2D coords) plus any keys.
    """
    if broadcast_covering and salt_factor is None:
        cover, levels = polygon_covering_cells_driver(polygons, res=res)
    else:
        cover = polygon_covering_cells(polygons, res=res)
        # one tiny agg on the covering (polygon) side to learn which
        # resolutions coarsening actually produced — never scans faces
        levels = covering_res_levels(cover) or [res]
    # triangle covering: cells of the triangle's bbox at every covering res
    # via explode of a per-row cell array (triangles are small vs cells;
    # usually 1-4 cells; extra levels only appear when some polygon's ROI
    # was coarsened)
    fxmin = F.least("x0", "x1", "x2"); fxmax = F.greatest("x0", "x1", "x2")
    fymin = F.least("y0", "y1", "y2"); fymax = F.greatest("y0", "y1", "y2")
    cells = C.multires_bbox_cells_col(fxmin, fymin, fxmax, fymax, levels)
    tri_cells = faces.withColumn("cell", F.explode(cells))
    if broadcast_covering and salt_factor is None:
        cand = tri_cells.join(F.broadcast(cover), "cell")
    elif salt_factor:
        cand = salted_equi_join(tri_cells, cover, "cell", salt_factor)
    else:
        cand = tri_cells.join(cover, "cell")
    # a (face, polygon) pair can match in several cells → dedup before the
    # expensive refine (cheap: candidate set is already small)
    key_cols = [c for c in cand.columns if c != "cell"]
    cand = cand.dropDuplicates(key_cols)
    refined = cand.withColumn(
        "overlap_area",
        overlap_area_udf("x0", "y0", "x1", "y1", "x2", "y2", "geometry_wkb"),
    ).filter(F.col("overlap_area") > min_area)
    return refined.drop("cell", "geometry_wkb")


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    x: str = "x", y: str = "y",
    point_keys: list[str] | None = None,
    res: int = DEFAULT_RES,
    broadcast_covering: bool = True,
    salt_factor: int | None = None,
    polygon_id_col: str = "polygon_id",
) -> DataFrame:
    """Inner join: each point row × each polygon containing it.

    Output = point columns + polygon columns (minus wkb/cell plumbing).

    Broadcast path ships polygon geometry to executors ONCE as a
    {polygon_id: wkb} broadcast dict — candidate rows carry only the id,
    not a duplicated WKB blob per row (10-100× less Arrow traffic at
    scale). Salted/shuffle paths keep the wkb column (the polygon side is
    too big to broadcast there by definition).
    """
    if broadcast_covering and salt_factor is None:
        cover, levels = polygon_covering_cells_driver(polygons, res=res)
        pts = with_cell_multires(points, x, y, levels)
        wkb_map = {row[0]: bytes(row[1]) for row in
                   polygons.select(polygon_id_col, "geometry_wkb").collect()}
        cand = pts.join(
            F.broadcast(cover.drop("geometry_wkb")), "cell")

        # small polygon sets compile to a pure JVM predicate (bit-exact
        # twin of the winding kernel) — no Python boundary in the refine
        expr = pip_filter_expr(F.col(x), F.col(y), F.col(polygon_id_col),
                               wkb_map)
        if expr is not None:
            return cand.filter(expr).drop("cell")

        bc = points.sparkSession.sparkContext.broadcast(wkb_map)

        @pandas_udf(T.BooleanType())
        def pip_by_id(xs: pd.Series, ys: pd.Series, pids: pd.Series) -> pd.Series:
            out = np.zeros(len(xs), dtype=bool)
            xv = xs.to_numpy(dtype=np.float64)
            yv = ys.to_numpy(dtype=np.float64)
            codes, uniques = pd.factorize(pids)
            for u_idx, pid in enumerate(uniques):
                m = codes == u_idx
                out[m] = geom.points_in_wkb(xv[m], yv[m], bc.value[pid])
            return pd.Series(out)

        refined = cand.filter(pip_by_id(F.col(x), F.col(y), F.col(polygon_id_col)))
        return refined.drop("cell")
    elif salt_factor:
        cover = polygon_covering_cells(polygons, res=res)
        pts = with_cell_multires(points, x, y, covering_res_levels(cover) or [res])
        cand = salted_equi_join(pts, cover, "cell", salt_factor)
    else:
        cover = polygon_covering_cells(polygons, res=res)
        pts = with_cell_multires(points, x, y, covering_res_levels(cover) or [res])
        cand = pts.join(cover, "cell")
    refined = cand.filter(pip_udf(F.col(x), F.col(y), F.col("geometry_wkb")))
    return refined.drop("cell", "geometry_wkb")
