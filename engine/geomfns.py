"""Geometry measurement functions: ST_Area / ST_Length / ST_Perimeter analogs.

Pure Column expressions over coordinate-array columns (xs/ys or lons/lats as
array<double>), matching the engine's geometry representation everywhere else
(engine/joins.py polygons, engine/lines.py polylines). No UDFs: the shoelace /
Chamberlain-Duquette / haversine sums are array HOFs (zip_with + aggregate),
whole-stage-codegen-friendly and shuffle-free (per-row math).

Rings may be open or explicitly closed (first == last): the wraparound term
of a closed ring contributes exactly zero, so both encodings yield identical
results. Spherical formulas assume no edge spans more than half the globe in
longitude (same no-dateline-crossing caveat as the planar cover machinery;
coalesce.bbox_union is the dateline-aware component).

The reference has no measurement functions (its geometry handling is bbox
union only, BboxUtil.scala); these complete the spatial-function surface a
user of a geospatial engine expects next to the join/index operators.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from engine.joins import EARTH_RADIUS_M

_DEG2RAD = 0.017453292519943295


def _rot(arr: Column) -> Column:
    """Rotate an array left by one: [a1..an] -> [a2..an, a1] (ring successor)."""
    return F.concat(F.slice(arr, 2, F.size(arr) - 1), F.slice(arr, 1, 1))


def _arr_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def polygon_area(xs: Column, ys: Column) -> Column:
    """Planar polygon area (shoelace), absolute value — vertex order agnostic.
    Exact for simple (non-self-intersecting) rings in any planar CRS; the
    result is in squared input units."""
    cross = F.zip_with(
        F.zip_with(xs, _rot(ys), lambda x, y2: x * y2),
        F.zip_with(_rot(xs), ys, lambda x2, y: x2 * y),
        lambda a, b: a - b,
    )
    # CASE WHEN evaluates lazily per row: degenerate rings (< 3 vertices)
    # short-circuit to 0 before _rot's negative slice length on empties
    return F.when(
        F.size(xs) >= 3, F.abs(_arr_sum(cross)) / F.lit(2.0)
    ).otherwise(F.lit(0.0))


def polygon_area_sphere_m2(lons: Column, lats: Column) -> Column:
    """Spherical polygon area in m² (Chamberlain-Duquette signed excess,
    |Σ (λ_{i+1}-λ_i)(2 + sin φ_i + sin φ_{i+1})| · R²/2 with λ, φ in radians)
    — exact for lat-lon rectangles (reduces to R²·Δλ·Δsinφ) and the standard
    small-error approximation for general geodesic-edged rings."""
    lam = F.transform(lons, lambda x: x * F.lit(_DEG2RAD))
    sphi = F.transform(lats, lambda x: F.sin(x * F.lit(_DEG2RAD)))
    terms = F.zip_with(
        F.zip_with(_rot(lam), lam, lambda l2, l1: l2 - l1),
        F.zip_with(sphi, _rot(sphi), lambda s1, s2: F.lit(2.0) + s1 + s2),
        lambda dl, s: dl * s,
    )
    return F.when(
        F.size(lons) >= 3,
        F.abs(_arr_sum(terms)) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0),
    ).otherwise(F.lit(0.0))


def polyline_length(xs: Column, ys: Column) -> Column:
    """Planar polyline length: Σ sqrt(dx² + dy²) over consecutive vertices
    (open path — use polygon_perimeter for the closed ring)."""
    n = F.size(xs)
    dx = F.zip_with(F.slice(xs, 2, n - 1), F.slice(xs, 1, n - 1), lambda a, b: a - b)
    dy = F.zip_with(F.slice(ys, 2, n - 1), F.slice(ys, 1, n - 1), lambda a, b: a - b)
    total = _arr_sum(F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b)))
    # degenerate paths (< 2 vertices): zero length, and short-circuit before
    # the negative slice length an empty array would produce under ANSI
    return F.when(n >= 2, total).otherwise(F.lit(0.0))


def polygon_perimeter(xs: Column, ys: Column) -> Column:
    """Planar ring perimeter: polyline length including the closing edge
    (zero-length if the ring is already explicitly closed)."""
    dx = F.zip_with(_rot(xs), xs, lambda a, b: a - b)
    dy = F.zip_with(_rot(ys), ys, lambda a, b: a - b)
    total = _arr_sum(F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b)))
    return F.when(F.size(xs) >= 2, total).otherwise(F.lit(0.0))


def polygon_centroid(xs: Column, ys: Column) -> Column:
    """Planar polygon centroid (shoelace first moments): struct(cx, cy) with
    cx = Σ (x_i + x_{i+1}) * cross_i / (6 A_signed) — vertex-order agnostic
    because the signed area divides out. Degenerate rings (|A| == 0: fewer
    than 3 vertices, or collinear) fall back to the vertex mean, so every
    ring gets a finite representative point."""
    cross = F.zip_with(
        F.zip_with(xs, _rot(ys), lambda x, y2: x * y2),
        F.zip_with(_rot(xs), ys, lambda x2, y: x2 * y),
        lambda a, b: a - b,
    )
    a2 = _arr_sum(cross)  # 2 * signed area
    mx = _arr_sum(
        F.zip_with(F.zip_with(xs, _rot(xs), lambda a, b: a + b), cross,
                   lambda s, c: s * c)
    )
    my = _arr_sum(
        F.zip_with(F.zip_with(ys, _rot(ys), lambda a, b: a + b), cross,
                   lambda s, c: s * c)
    )
    mean_x = _arr_sum(xs) / F.size(xs)
    mean_y = _arr_sum(ys) / F.size(ys)
    ok = (F.size(xs) >= 3) & (a2 != 0.0)
    return F.struct(
        F.when(ok, mx / (F.lit(3.0) * a2)).otherwise(mean_x).alias("cx"),
        F.when(ok, my / (F.lit(3.0) * a2)).otherwise(mean_y).alias("cy"),
    )


def label_point(rings: Column) -> Column:
    """Interior representative point (the ST_PointOnSurface analog a map
    labeling layer needs — the centroid of a concave/holed polygon can fall
    OUTSIDE it): scan the horizontal line through a candidate height of the
    bbox, sort the even-odd edge crossings (the rasterize_polygons rule),
    and return the midpoint of the WIDEST interior span — guaranteed inside
    for any simple multi-ring polygon when the scan row is non-degenerate.
    Candidate heights 1/2, 1/4, 3/4 of the bbox are tried in order (a row
    through a vertex can yield a degenerate odd crossing set); if all three
    degenerate, falls back to the outer ring's vertex mean (the only
    non-guaranteed case, flagged by `interior` = false).

    `rings` is array<array<struct<x,y>>> (outer + holes, open rings — the
    rasterize_polygons convention). Pure Column HOFs: no shuffle, no UDF.
    Returns struct(x, y, interior boolean)."""

    ys_all = F.flatten(F.transform(rings, lambda r: F.transform(r, lambda p: p["y"])))
    ymin, ymax = F.array_min(ys_all), F.array_max(ys_all)

    def crossings_at(yc: Column) -> Column:
        def ring_cross(r):
            n = F.size(r)

            def vx(i):
                return F.element_at(r, (i + 1).cast("int"))["x"]

            def vy(i):
                return F.element_at(r, (i + 1).cast("int"))["y"]

            idx = F.filter(
                F.sequence(F.lit(0), n - 1),
                lambda i: (vy(i) <= yc) != (vy((i + 1) % n) <= yc),
            )
            return F.transform(
                idx,
                lambda i: vx(i)
                + (yc - vy(i)) * (vx((i + 1) % n) - vx(i))
                / (vy((i + 1) % n) - vy(i)),
            )

        return F.array_sort(F.flatten(F.transform(rings, ring_cross)))

    def widest_mid(yc: Column) -> Column:
        xs = crossings_at(yc)
        half = F.floor(F.size(xs) / 2).cast("long")
        spans = F.transform(
            F.sequence(F.lit(1).cast("long"), half),
            lambda j: F.struct(
                (
                    F.element_at(xs, (j * 2).cast("int"))
                    - F.element_at(xs, (j * 2 - 1).cast("int"))
                ).alias("w"),
                F.element_at(xs, (j * 2 - 1).cast("int")).alias("lo"),
                F.element_at(xs, (j * 2).cast("int")).alias("hi"),
            ),
        )
        best = F.array_max(spans)  # struct order: widest, then lo/hi tiebreak
        # usable iff crossings pair up (even, >= 2) and the best span is open
        ok = (F.size(xs) >= 2) & (F.size(xs) % 2 == 0) & (best["w"] > 0)
        return F.when(
            ok,
            F.struct(
                ((best["lo"] + best["hi"]) / 2).alias("x"),
                yc.alias("y"),
                F.lit(True).alias("interior"),
            ),
        )

    outer = F.element_at(rings, 1)
    fallback = F.struct(
        _arr_sum(F.transform(outer, lambda p: p["x"])) / F.size(outer),
        _arr_sum(F.transform(outer, lambda p: p["y"])) / F.size(outer),
        F.lit(False),
    ).cast("struct<x:double,y:double,interior:boolean>")
    cand = None
    for frac in (0.5, 0.25, 0.75):
        c = widest_mid(ymin + F.lit(frac) * (ymax - ymin))
        cand = c if cand is None else F.coalesce(cand, c)
    return F.coalesce(cand, fallback)


def polyline_length_geodesic_m(lons: Column, lats: Column) -> Column:
    """Geodesic polyline length in meters: Σ haversine over consecutive
    vertices (same constants and op order as joins.haversine_m, so parity
    with its SQL twin discipline holds)."""
    from engine.joins import haversine_m

    n = F.size(lons)
    idx = F.sequence(F.lit(1), n - 1)
    seg = F.transform(
        idx,
        lambda i: haversine_m(
            F.element_at(lons, i),
            F.element_at(lats, i),
            F.element_at(lons, i + 1),
            F.element_at(lats, i + 1),
        ),
    )
    # guard: sequence(1, 0) would DESCEND ([1, 0]) for single-vertex paths
    return F.when(n >= 2, _arr_sum(seg)).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# DuckDB twins (pytest parity; same formulas, same op order)
# ---------------------------------------------------------------------------
def polygon_area_sql(xs: str, ys: str) -> str:
    return f"""(abs(list_sum(list_transform(range(1, len({xs}) + 1),
      i -> {xs}[i] * {ys}[CASE WHEN i = len({ys}) THEN 1 ELSE i + 1 END]
         - {xs}[CASE WHEN i = len({xs}) THEN 1 ELSE i + 1 END] * {ys}[i]
    ))) / 2.0)"""


def polygon_area_sphere_m2_sql(lons: str, lats: str) -> str:
    c = repr(_DEG2RAD)
    r2h = repr(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)
    nxt = f"CASE WHEN i = len({lons}) THEN 1 ELSE i + 1 END"
    return f"""(abs(list_sum(list_transform(range(1, len({lons}) + 1),
      i -> ({lons}[{nxt}] * {c} - {lons}[i] * {c})
         * (2.0 + sin({lats}[i] * {c}) + sin({lats}[{nxt}] * {c}))
    ))) * {r2h})"""


def polyline_length_sql(xs: str, ys: str) -> str:
    return f"""(coalesce(list_sum(list_transform(range(1, len({xs})),
      i -> sqrt(({xs}[i + 1] - {xs}[i]) * ({xs}[i + 1] - {xs}[i])
              + ({ys}[i + 1] - {ys}[i]) * ({ys}[i + 1] - {ys}[i]))
    )), 0.0))"""


def np_convex_hull(pts):
    """Monotone-chain convex hull of an (n, 2) float array: CCW vertex
    order starting at the lexicographically smallest point, strictly convex
    (collinear boundary points dropped). Degenerate inputs return what they
    are: 1 point -> itself, collinear set -> its 2 extreme endpoints."""
    p = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # sorts lexicographically
    if len(p) <= 2:
        return p

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(points):
        out = []
        for q in points:
            while len(out) >= 2 and cross(out[-2], out[-1], q) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 2:  # all collinear: keep the two extremes
        return np.array([p[0], p[-1]])
    return np.array(hull)


def convex_hull(
    points,
    group_col: str = "group_id",
    x_col: str = "x",
    y_col: str = "y",
):
    """Per-group convex hull, distributed with the two-level PRE-HULL trick:
    stage 1 reduces every (group, input-partition) slice to its local hull
    (<= a few dozen points — the hull of a union is the hull of the unions'
    hulls), so the only group-keyed shuffle moves hull-sized point sets no
    matter how many raw points a group has; stage 2 merges per group.
    Output: (group_id, hull array<struct<x,y>> CCW from the lexicographic
    minimum, n_hull, hull_area) — deterministic (pure function of the point
    SET; both stages run the same strict monotone chain).

    The reference has no geometry constructors; this adds the
    ST_ConvexHull analog next to the measurement functions above."""
    import pandas as pd

    from pyspark.sql import types as T

    schema_pts = T.StructType(
        [
            T.StructField("group_id", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )

    def local_hull(key, pdf):
        h = np_convex_hull(pdf[["x", "y"]].to_numpy())
        return pd.DataFrame(
            {"group_id": key[0], "x": h[:, 0], "y": h[:, 1]}
        )

    final_schema = T.StructType(
        [
            T.StructField("group_id", T.LongType()),
            T.StructField(
                "hull",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("x", T.DoubleType()),
                            T.StructField("y", T.DoubleType()),
                        ]
                    )
                ),
            ),
            T.StructField("n_hull", T.IntegerType()),
            T.StructField("hull_area", T.DoubleType()),
        ]
    )

    def merge_hull(key, pdf):
        h = np_convex_hull(pdf[["x", "y"]].to_numpy())
        if len(h) >= 3:
            x, y = h[:, 0], h[:, 1]
            area = 0.5 * float(
                np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
            )
        else:
            area = 0.0
        return pd.DataFrame(
            {
                "group_id": [key[0]],
                "hull": [[{"x": float(a), "y": float(b)} for a, b in h]],
                "n_hull": [len(h)],
                "hull_area": [area],
            }
        )

    pts = points.select(
        F.col(group_col).cast("long").alias("group_id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    pre = pts.groupBy(
        "group_id", F.spark_partition_id().alias("_p")
    ).applyInPandas(lambda k, pdf: local_hull((k[0],), pdf), schema_pts)
    return pre.groupBy("group_id").applyInPandas(merge_hull, final_schema)
