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
