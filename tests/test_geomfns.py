"""Geometry measurement functions (engine/geomfns.py): analytic values,
open/closed ring invariance, DuckDB twin parity."""

import math
import random

import pytest
from pyspark.sql import functions as F

from engine import geomfns
from engine.joins import EARTH_RADIUS_M


def _one(spark, xs, ys, expr_fn):
    df = spark.createDataFrame(
        [(xs, ys)], "xs array<double>, ys array<double>"
    )
    return df.select(expr_fn(F.col("xs"), F.col("ys")).alias("v")).collect()[0]["v"]


def test_square_area_planar(spark):
    v = _one(spark, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0],
             geomfns.polygon_area)
    assert v == pytest.approx(12.0)


def test_closed_ring_same_as_open(spark):
    open_v = _one(spark, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0],
                  geomfns.polygon_area)
    closed_v = _one(spark, [0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 3.0, 3.0, 0.0],
                    geomfns.polygon_area)
    assert closed_v == pytest.approx(open_v)


def test_vertex_order_agnostic(spark):
    cw = _one(spark, [0.0, 0.0, 4.0, 4.0], [0.0, 3.0, 3.0, 0.0],
              geomfns.polygon_area)
    assert cw == pytest.approx(12.0)


def test_sphere_rectangle_exact(spark):
    # lat-lon rectangle: analytic area R^2 * dlam * (sin(lat2) - sin(lat1))
    lon1, lon2, lat1, lat2 = 10.0, 12.0, 40.0, 41.5
    expected = (
        EARTH_RADIUS_M**2
        * math.radians(lon2 - lon1)
        * (math.sin(math.radians(lat2)) - math.sin(math.radians(lat1)))
    )
    v = _one(spark, [lon1, lon2, lon2, lon1], [lat1, lat1, lat2, lat2],
             geomfns.polygon_area_sphere_m2)
    assert v == pytest.approx(expected, rel=1e-12)


def test_polyline_length_345(spark):
    v = _one(spark, [0.0, 3.0, 3.0], [0.0, 0.0, 4.0], geomfns.polyline_length)
    assert v == pytest.approx(7.0)
    # perimeter closes the triangle: + hypotenuse 5
    p = _one(spark, [0.0, 3.0, 3.0], [0.0, 0.0, 4.0], geomfns.polygon_perimeter)
    assert p == pytest.approx(12.0)


def test_degenerate_paths(spark):
    assert _one(spark, [1.0], [1.0], geomfns.polyline_length) == 0.0
    assert _one(spark, [1.0], [1.0], geomfns.polyline_length_geodesic_m) == 0.0
    assert _one(spark, [1.0, 2.0], [1.0, 2.0], geomfns.polygon_area) == 0.0
    assert _one(spark, [], [], geomfns.polygon_area) == 0.0
    assert _one(spark, [], [], geomfns.polygon_area_sphere_m2) == 0.0
    assert _one(spark, [1.0], [1.0], geomfns.polygon_perimeter) == 0.0


def test_geodesic_equator_degree(spark):
    # 1 degree along the equator = 2*pi*R / 360
    v = _one(spark, [0.0, 1.0], [0.0, 0.0], geomfns.polyline_length_geodesic_m)
    assert v == pytest.approx(2 * math.pi * EARTH_RADIUS_M / 360, rel=1e-9)


def test_duckdb_twin_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(11)
    rows = []
    for i in range(20):
        n = rng.randint(3, 8)
        xs = [round(rng.uniform(-170, 170), 6) for _ in range(n)]
        ys = [round(rng.uniform(-80, 80), 6) for _ in range(n)]
        rows.append((i, xs, ys))
    df = spark.createDataFrame(rows, ["gid", "xs", "ys"])
    got = {
        r["gid"]: (r["a"], r["s"], r["l"])
        for r in df.select(
            "gid",
            geomfns.polygon_area(F.col("xs"), F.col("ys")).alias("a"),
            geomfns.polygon_area_sphere_m2(F.col("xs"), F.col("ys")).alias("s"),
            geomfns.polyline_length(F.col("xs"), F.col("ys")).alias("l"),
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {xs}, {ys})" for i, xs, ys in rows)
    con.execute(f"CREATE TABLE g AS SELECT * FROM (VALUES {vals}) t(gid, xs, ys)")
    q = (
        f"SELECT gid, {geomfns.polygon_area_sql('xs', 'ys')} AS a, "
        f"{geomfns.polygon_area_sphere_m2_sql('xs', 'ys')} AS s, "
        f"{geomfns.polyline_length_sql('xs', 'ys')} AS l FROM g"
    )
    for gid, a, s, l in con.execute(q).fetchall():
        assert got[gid][0] == pytest.approx(a, rel=1e-12)
        assert got[gid][1] == pytest.approx(s, rel=1e-12)
        assert got[gid][2] == pytest.approx(l, rel=1e-12)


# ---------------------------------------------------------------------------
# convex hull (two-level distributed monotone chain)
# ---------------------------------------------------------------------------
def _py_hull(pts):
    import numpy as np

    from engine import geomfns

    return [tuple(p) for p in geomfns.np_convex_hull(np.array(pts))]


def _py_hull_ref(pts):
    """Independent O(n^3) hull membership check: a point is a STRICT hull
    vertex iff it is not inside/on the hull of the others; order-check is
    done against the monotone chain separately."""
    out = []
    for i, p in enumerate(set(pts)):
        others = [q for q in set(pts) if q != p]
        if len(others) < 2:
            out.append(p)
            continue
        # p is a hull vertex iff some closed half-plane through p contains all
        hull = _py_hull(others + [p])
        if p in hull:
            out.append(p)
    return set(out)


def test_convex_hull_matches_python(spark):
    import random

    from engine import geomfns

    rng = random.Random(3)
    rows, want = [], {}
    for g in range(8):
        pts = [
            (round(rng.uniform(-50, 50), 3), round(rng.uniform(-50, 50), 3))
            for _ in range(rng.randint(1, 120))
        ]
        rows += [(g, x, y) for x, y in pts]
        want[g] = _py_hull(pts)
    df = spark.createDataFrame(rows, "group_id long, x double, y double")
    for reparted in (df, df.repartition(7)):  # partition invariance
        got = {
            r["group_id"]: [(p["x"], p["y"]) for p in r["hull"]]
            for r in geomfns.convex_hull(reparted).collect()
        }
        assert {g: tuple(v) for g, v in got.items()} == {
            g: tuple(v) for g, v in want.items()
        }
    # independent membership check on one group
    got_set = set(want[0])
    assert got_set == _py_hull_ref([(x, y) for g, x, y in rows if g == 0])


def test_convex_hull_shapes(spark):
    from engine import geomfns

    rows = []
    # group 1: unit square + interior points -> exactly the 4 corners, CCW
    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    rows += [(1, x, y) for x, y in sq]
    rows += [(1, 2.0, 2.0), (1, 1.0, 3.0), (1, 2.0, 0.0)]  # interior + edge
    # group 2: collinear -> two extremes; group 3: single point
    rows += [(2, float(i), float(2 * i)) for i in range(5)]
    rows += [(3, 7.0, -7.0)]
    df = spark.createDataFrame(rows, "group_id long, x double, y double")
    out = {r["group_id"]: r for r in geomfns.convex_hull(df).collect()}
    h1 = [(p["x"], p["y"]) for p in out[1]["hull"]]
    assert h1 == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]  # CCW from min
    assert out[1]["n_hull"] == 4 and out[1]["hull_area"] == 16.0
    assert [(p["x"], p["y"]) for p in out[2]["hull"]] == [(0.0, 0.0), (4.0, 8.0)]
    assert out[2]["hull_area"] == 0.0
    assert out[3]["n_hull"] == 1


# ---------------------------------------------------------------------------
# polygon centroid
# ---------------------------------------------------------------------------
def test_polygon_centroid(spark):
    from pyspark.sql import functions as F

    from engine import geomfns

    rows = [
        # unit square (ccw), centroid (0.5, 0.5)
        (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
        # same square CW: order-agnostic
        (2, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
        # right triangle (0,0)(3,0)(0,3): centroid (1, 1)
        (3, [0.0, 3.0, 0.0], [0.0, 0.0, 3.0]),
        # L-shape: 3x1 bar + 1x2 stem; area 5, moments by decomposition:
        # bar [0,3]x[0,1] area 3 c=(1.5,0.5); stem [0,1]x[1,3] area 2 c=(0.5,2)
        # -> cx = (3*1.5 + 2*0.5)/5 = 1.1, cy = (3*0.5 + 2*2)/5 = 1.1
        (4, [0.0, 3.0, 3.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0, 3.0, 3.0]),
        # degenerate: collinear -> vertex mean
        (5, [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),
        # translation far from origin (moment cancellation stress)
        (6, [100.0, 101.0, 101.0, 100.0], [200.0, 200.0, 201.0, 201.0]),
    ]
    df = spark.createDataFrame(rows, "pid long, xs array<double>, ys array<double>")
    got = {
        r["pid"]: (r["c"]["cx"], r["c"]["cy"])
        for r in df.select(
            "pid", geomfns.polygon_centroid(F.col("xs"), F.col("ys")).alias("c")
        ).collect()
    }
    assert got[1] == (0.5, 0.5) and got[2] == (0.5, 0.5)
    assert abs(got[3][0] - 1.0) < 1e-12 and abs(got[3][1] - 1.0) < 1e-12
    assert abs(got[4][0] - 1.1) < 1e-12 and abs(got[4][1] - 1.1) < 1e-12
    assert got[5] == (1.0, 1.0)
    assert abs(got[6][0] - 100.5) < 1e-9 and abs(got[6][1] - 200.5) < 1e-9


def test_label_point_interior(spark):
    import math

    from pyspark.sql import functions as F

    from engine import geomfns

    def ring(pts):
        return [{"x": float(x), "y": float(y)} for x, y in pts]

    rows = [
        # unit square: midline span [0,1] at y=0.5 -> (0.5, 0.5)
        (1, [ring([(0, 0), (1, 0), (1, 1), (0, 1)])]),
        # U-shape (concave, centroid near the void): outer
        # [0,3]x[0,3] minus the notch [1,2]x[1,3] — at y=1.5 spans are
        # [0,1] and [2,3]; widest tie -> array_max struct order picks the
        # later (lo bigger), midpoint in a leg, INSIDE
        (2, [ring([(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3),
                   (0, 3)])]),
        # donut: hole [1,2]^2 inside [0,3]^2 — at y=1.5 spans [0,1],[2,3];
        # the naive center (1.5, 1.5) is IN THE HOLE, label point is not
        (3, [ring([(0, 0), (3, 0), (3, 3), (0, 3)]),
             ring([(1, 1), (2, 1), (2, 2), (1, 2)])]),
        # degenerate: zero-height segment -> vertex-mean fallback
        (4, [ring([(0, 0), (2, 0), (1, 0)])]),
    ]
    df = spark.createDataFrame(
        rows, "pid long, rings array<array<struct<x:double,y:double>>>"
    )
    got = {
        r["pid"]: (r["c"]["x"], r["c"]["y"], r["c"]["interior"])
        for r in df.select(
            "pid", geomfns.label_point(F.col("rings")).alias("c")
        ).collect()
    }
    assert got[1] == (0.5, 0.5, True)

    def even_odd(rings, x, y):
        cnt = 0
        for r in rings:
            n = len(r)
            for i in range(n):
                y1, y2 = r[i]["y"], r[(i + 1) % n]["y"]
                if (y1 <= y) != (y2 <= y):
                    cx = r[i]["x"] + (y - y1) * (r[(i + 1) % n]["x"] - r[i]["x"]) / (y2 - y1)
                    if cx > x:
                        cnt += 1
        return cnt % 2 == 1

    for pid in (2, 3):
        x, y, interior = got[pid]
        assert interior
        assert even_odd(rows[pid - 1][1], x, y), (pid, x, y)
    assert got[3][0] != 1.5 or got[3][1] != 1.5  # not the hole center
    assert got[4][2] is False
    assert math.isclose(got[4][0], 1.0) and got[4][1] == 0.0
