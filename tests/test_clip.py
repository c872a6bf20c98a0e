"""Liang-Barsky tile clipping: brute-force numpy oracle parity (exact doubles),
containment invariants, degenerate cases."""

import math
import random

import pytest
from pyspark.sql import functions as F

from engine import clip


def _py_clip(ax, ay, bx, by, rx0, ry0, rx1, ry1):
    """Reference Liang-Barsky, replicating the engine's op order exactly."""
    dx, dy = bx - ax, by - ay
    if (dx == 0 and (ax < rx0 or ax > rx1)) or (dy == 0 and (ay < ry0 or ay > ry1)):
        return None
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, ax - rx0), (dx, rx1 - ax), (-dy, ay - ry0), (dy, ry1 - ay)):
        if p == 0:
            continue
        t = q / p
        if p < 0:
            if t > t0:
                t0 = t
        else:
            if t < t1:
                t1 = t
    if t0 > t1:
        return None
    return (ax + t0 * dx, ay + t0 * dy, ax + t1 * dx, ay + t1 * dy)


def _oracle(rows, s):
    """rows = [(line_id, [(x,y), ...])] -> {(line_id, tx, ty): [(seg_idx, clip...)]}"""
    out = {}
    for lid, pts in rows:
        for i in range(len(pts) - 1):
            ax, ay = pts[i]
            bx, by = pts[i + 1]
            tx_lo = math.floor(min(ax, bx) / s) - 1
            tx_hi = math.floor(max(ax, bx) / s) + 1
            ty_lo = math.floor(min(ay, by) / s) - 1
            ty_hi = math.floor(max(ay, by) / s) + 1
            for tx in range(tx_lo, tx_hi + 1):
                for ty in range(ty_lo, ty_hi + 1):
                    got = _py_clip(ax, ay, bx, by, tx * s, ty * s,
                                   tx * s + s, ty * s + s)
                    if got is not None:
                        out.setdefault((lid, tx, ty), []).append((i, *got))
    return {k: sorted(v) for k, v in out.items()}


def _walk(rng, n, lo=-40.0, hi=40.0, step=6.0):
    x, y = rng.uniform(lo, hi), rng.uniform(lo, hi)
    pts = [(x, y)]
    for _ in range(n - 1):
        x += rng.uniform(-step, step)
        y += rng.uniform(-step, step)
        pts.append((x, y))
    return pts


@pytest.fixture(scope="module")
def walks():
    rng = random.Random(19)
    return [(lid, _walk(rng, rng.randint(2, 25))) for lid in range(25)]


def _spark_result(spark, rows, s):
    df = spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in pts]) for lid, pts in rows],
        "line_id: long, pts: array<struct<x:double,y:double>>",
    )
    out = {}
    for r in clip.line_clip_to_tiles(df.repartition(7), s).collect():
        out[(r["line_id"], r["tx"], r["ty"])] = sorted(
            (x["seg_idx"], x["cx0"], x["cy0"], x["cx1"], x["cy1"]) for x in r["segs"]
        )
    return out


def test_matches_bruteforce_oracle_exactly(spark, walks):
    s = 5.0
    got = _spark_result(spark, walks, s)
    want = _oracle(walks, s)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k  # exact double equality (same IEEE op order)


def test_clipped_points_inside_tile(spark, walks):
    s = 7.5
    got = _spark_result(spark, walks, s)
    eps = 1e-9
    for (lid, tx, ty), segs in got.items():
        for _, cx0, cy0, cx1, cy1 in segs:
            for x, y in ((cx0, cy0), (cx1, cy1)):
                assert tx * s - eps <= x <= tx * s + s + eps
                assert ty * s - eps <= y <= ty * s + s + eps


def test_axis_aligned_and_degenerate(spark):
    rows = [
        (0, [(-3.0, 2.0), (13.0, 2.0)]),   # horizontal through 4 tiles (s=5)
        (1, [(2.0, 2.0), (2.0, 2.0)]),     # zero-length inside one tile
        (2, [(5.0, 0.0), (5.0, 9.0)]),     # runs ON a vertical tile boundary
    ]
    got = _spark_result(spark, rows, 5.0)
    h_tiles = sorted(t for (lid, t, _) in got if lid == 0)
    assert h_tiles == [-1, 0, 1, 2]
    assert (1, 0, 0) in got and got[(1, 0, 0)][0][1:] == (2.0, 2.0, 2.0, 2.0)
    # boundary line belongs to both adjacent tile columns (closed rects)
    cols2 = sorted({t for (lid, t, _) in got if lid == 2})
    assert cols2 == [0, 1]


# ---------------------------------------------------------------------------
# Polygons (Sutherland-Hodgman)
# ---------------------------------------------------------------------------
def _py_sh_stage(ring, axis, bound, keep_ge):
    """Reference S-H pass, replicating the engine's op order exactly."""
    a = 0 if axis == "x" else 1
    o = 1 - a
    inside = (lambda p: p[a] >= bound) if keep_ge else (lambda p: p[a] <= bound)
    out = []
    n = len(ring)
    for i in range(n):
        cur, nxt = ring[i], ring[(i + 1) % n]
        ic, inn = inside(cur), inside(nxt)
        if ic and inn:
            out.append(nxt)
        elif ic or inn:
            t = (bound - cur[a]) / (nxt[a] - cur[a])
            ov = cur[o] + t * (nxt[o] - cur[o])
            ipt = (bound, ov) if axis == "x" else (ov, bound)
            if ic:
                out.append(ipt)
            else:
                out.extend([ipt, nxt])
    return out


def _py_area(ring):
    acc = 0.0
    n = len(ring)
    for i in range(n):
        x, y = ring[i]
        x2, y2 = ring[(i + 1) % n]
        acc = acc + (x * y2 - x2 * y)
    return abs(acc) / 2.0


def _py_clip_ring(ring, rx0, ry0, rx1, ry1):
    r = _py_sh_stage(ring, "x", rx0, True)
    r = _py_sh_stage(r, "x", rx1, False)
    r = _py_sh_stage(r, "y", ry0, True)
    r = _py_sh_stage(r, "y", ry1, False)
    return r


def _poly_oracle(rows, s):
    out = {}
    for pid, ring in rows:
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        for tx in range(math.floor(min(xs) / s), math.floor(max(xs) / s) + 1):
            for ty in range(math.floor(min(ys) / s), math.floor(max(ys) / s) + 1):
                r = _py_clip_ring(ring, tx * s, ty * s, tx * s + s, ty * s + s)
                if len(r) >= 3 and _py_area(r) > 0.0:
                    out[(pid, tx, ty)] = r
    return out


def _star_poly(rng, n, cx, cy, rmax):
    """Star-convex (possibly concave) simple polygon around (cx, cy)."""
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
    return [
        (cx + r * math.cos(a), cy + r * math.sin(a))
        for a, r in ((a, rng.uniform(0.3 * rmax, rmax)) for a in angles)
    ]


@pytest.fixture(scope="module")
def polys():
    rng = random.Random(7)
    return [
        (pid, _star_poly(rng, rng.randint(3, 14),
                         rng.uniform(-30, 30), rng.uniform(-30, 30),
                         rng.uniform(2.0, 18.0)))
        for pid in range(30)
    ]


def _spark_polys(spark, rows, s):
    df = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in ring]) for pid, ring in rows],
        "poly_id: long, ring: array<struct<x:double,y:double>>",
    )
    out = {}
    for r in clip.polygon_clip_to_tiles(df.repartition(5), s).collect():
        out[(r["poly_id"], r["tx"], r["ty"])] = (
            [(p["x"], p["y"]) for p in r["ring"]], r["area"]
        )
    return out


def test_polygon_matches_sh_oracle_exactly(spark, polys):
    s = 5.0
    got = _spark_polys(spark, polys, s)
    want = _poly_oracle(polys, s)
    assert set(got) == set(want)
    for k, (ring, area) in got.items():
        assert ring == want[k], k          # exact doubles, same IEEE op order
        assert area == _py_area(want[k]), k


def test_polygon_area_conserved(spark, polys):
    # tile pieces partition the polygon: per-poly tile areas sum to shoelace
    s = 4.0
    got = _spark_polys(spark, polys, s)
    by_poly = {}
    for (pid, _, _), (_, area) in got.items():
        by_poly[pid] = by_poly.get(pid, 0.0) + area
    for pid, ring in polys:
        assert by_poly[pid] == pytest.approx(_py_area(ring), rel=1e-9), pid


def test_polygon_tile_inside_and_containment(spark):
    # 20x20 square over a 5-lattice: 16 full tiles + boundary pieces; every
    # clipped vertex inside its tile; a tile deep inside gets the full square
    sq = [(1.0, 1.0), (21.0, 1.0), (21.0, 21.0), (1.0, 21.0)]
    got = _spark_polys(spark, [(0, sq)], 5.0)
    assert sum(a for _, a in got.values()) == pytest.approx(400.0)
    # interior tile [5,10]x[5,10] is fully covered: its piece is the tile
    ring, area = got[(0, 1, 1)]
    assert area == pytest.approx(25.0)
    eps = 1e-9
    for (pid, tx, ty), (r, _) in got.items():
        for x, y in r:
            assert tx * 5.0 - eps <= x <= tx * 5.0 + 5.0 + eps
            assert ty * 5.0 - eps <= y <= ty * 5.0 + 5.0 + eps


def test_polygon_outside_tiles_dropped(spark):
    # small triangle far from origin: exactly one tile row, nothing else
    tri = [(101.0, 101.0), (102.0, 101.0), (101.5, 102.0)]
    got = _spark_polys(spark, [(0, tri)], 50.0)
    assert list(got) == [(0, 2, 2)]
    assert got[(0, 2, 2)][1] == pytest.approx(0.5)


def test_total_geometry_conserved(spark, walks):
    # sum of clipped lengths within each line's tiles ~= original length
    # (interior overlap only on boundaries, measure-zero)
    s = 5.0
    got = _spark_result(spark, walks, s)
    by_line = {}
    for (lid, _, _), segs in got.items():
        by_line.setdefault(lid, 0.0)
        for _, cx0, cy0, cx1, cy1 in segs:
            by_line[lid] += math.hypot(cx1 - cx0, cy1 - cy0)
    for lid, pts in walks:
        want = sum(
            math.hypot(b[0] - a[0], b[1] - a[1]) for a, b in zip(pts, pts[1:])
        )
        assert by_line.get(lid, 0.0) == pytest.approx(want, rel=1e-9)
