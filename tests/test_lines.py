"""line_radius_join: cover soundness vs brute force, int-exact arithmetic,
segment explode, length."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import lines as L


def lines_df(spark, rows):
    return spark.createDataFrame(
        rows, "line_id long, pts array<struct<x:double,y:double>>"
    )


def points_df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "point_id long, x double, y double",
    )


def mkline(lid, coords):
    return (lid, [{"x": float(x), "y": float(y)} for x, y in coords])


def pairs(df):
    return {(r["point_id"], r["line_id"]) for r in df.collect()}


class TestSegments:
    def test_explode(self, spark):
        ld = lines_df(spark, [mkline(7, [(0, 0), (10, 0), (10, 5)])])
        segs = L.line_segments(ld).orderBy("seg_idx").collect()
        assert [(s["ax"], s["ay"], s["bx"], s["by"]) for s in segs] == [
            (0.0, 0.0, 10.0, 0.0),
            (10.0, 0.0, 10.0, 5.0),
        ]

    def test_length(self, spark):
        ld = lines_df(spark, [mkline(1, [(0, 0), (3, 4), (3, 10)])])
        out = L.line_length(ld).collect()[0]
        assert out["length"] == pytest.approx(11.0)


class TestJoin:
    def test_known_hits(self, spark):
        ld = lines_df(spark, [mkline(0, [(0, 0), (100, 0)])])
        pts = points_df(spark, [(50, 3), (50, 7), (-4, 0), (-4, 3), (104, 4)])
        got = pairs(L.line_radius_join(pts, ld, radius=5.0))
        # endpoint caps are round: (-4,0) d=4 in; (-4,3) d=5 on-boundary in;
        # (104,4) d=sqrt(32)>5 out; (50,7) d=7 out
        assert got == {(0, 0), (2, 0), (3, 0)}

    def test_fuzz_parity_vs_brute_force(self, spark):
        rng = np.random.default_rng(3)
        lrows = []
        for i in range(12):
            start = rng.uniform(0, 1000, 2)
            steps = rng.uniform(-150, 150, (rng.integers(1, 5), 2))
            coords = np.vstack([start, start + np.cumsum(steps, axis=0)])
            lrows.append(mkline(i, coords))
        ld = lines_df(spark, lrows)
        pts = points_df(spark, rng.uniform(-100, 1100, (400, 2)))
        for r in (7.0, 31.0):
            got = pairs(L.line_radius_join(pts, ld, radius=r))
            want = pairs(L.line_radius_brute_force(pts, ld, radius=r))
            assert got == want, f"radius {r}"
        assert len(want) > 5

    def test_int_exact_parity(self, spark):
        rng = np.random.default_rng(13)
        lrows = []
        for i in range(8):
            coords = rng.integers(0, 2000, (4, 2))
            lrows.append(mkline(i, coords))
        ld = lines_df(spark, lrows)
        pts = points_df(spark, rng.integers(0, 2000, (300, 2)))
        got = pairs(L.line_radius_join(pts, ld, radius=25.0, arithmetic="int_exact"))
        want = pairs(
            L.line_radius_brute_force(pts, ld, radius=25.0, arithmetic="int_exact")
        )
        assert got == want
        assert len(want) > 0

    def test_int_exact_boundary(self, spark):
        # exact on-circle point: d^2 == r^2 must be IN (<=) in both paths
        ld = lines_df(spark, [mkline(0, [(0, 0), (10, 0)])])
        pts = points_df(spark, [(5, 5), (5, 6), (13, 4), (14, 4)])
        got = pairs(L.line_radius_join(pts, ld, radius=5.0, arithmetic="int_exact"))
        # (5,5): d=5 in; (5,6): 6 out; (13,4): d^2=9+16=25 in; (14,4): 32 out
        assert got == {(0, 0), (2, 0)}

    def test_shuffled_cover(self, spark):
        ld = lines_df(spark, [mkline(0, [(0, 0), (50, 50)])])
        pts = points_df(spark, [(25, 26), (0, 10)])
        got = pairs(L.line_radius_join(pts, ld, radius=3.0, broadcast_cover=False))
        assert got == {(0, 0)}

    def test_bad_arithmetic(self, spark):
        ld = lines_df(spark, [mkline(0, [(0, 0), (1, 1)])])
        with pytest.raises(ValueError):
            L.line_radius_join(points_df(spark, [(0, 0)]), ld, 1.0,
                               arithmetic="decimal")


def _py_seg_intersect(a, b):
    (ax, ay), (bx, by) = a
    (cx, cy), (dx, dy) = b

    def o(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    o1 = o(ax, ay, bx, by, cx, cy)
    o2 = o(ax, ay, bx, by, dx, dy)
    o3 = o(cx, cy, dx, dy, ax, ay)
    o4 = o(cx, cy, dx, dy, bx, by)
    if ((o1 > 0) != (o2 > 0)) and o1 != 0 and o2 != 0 and \
       ((o3 > 0) != (o4 > 0)) and o3 != 0 and o4 != 0:
        return True

    def btw(px, py, qx, qy, rx, ry):
        return min(px, qx) <= rx <= max(px, qx) and min(py, qy) <= ry <= max(py, qy)

    return (
        (o1 == 0 and btw(ax, ay, bx, by, cx, cy))
        or (o2 == 0 and btw(ax, ay, bx, by, dx, dy))
        or (o3 == 0 and btw(cx, cy, dx, dy, ax, ay))
        or (o4 == 0 and btw(cx, cy, dx, dy, bx, by))
    )


def _rand_lines(rng, n, span=200.0, steps=4):
    out = []
    for i in range(n):
        x, y = rng.uniform(0, span), rng.uniform(0, span)
        pts = [{"x": round(x, 1), "y": round(y, 1)}]
        for _ in range(steps):
            x += rng.uniform(-40, 40)
            y += rng.uniform(-40, 40)
            pts.append({"x": round(x, 1), "y": round(y, 1)})
        out.append((i, pts))
    return out


@pytest.mark.parametrize("seed,cell", [(1, 32.0), (2, 64.0), (3, 17.0)])
def test_line_intersection_join_matches_bruteforce(spark, seed, cell):
    import random

    rng = random.Random(seed)
    la = _rand_lines(rng, 25)
    lb = _rand_lines(rng, 25)
    schema = "line_id long, pts array<struct<x:double,y:double>>"
    got = {
        (r["a_id"], r["b_id"]): r["n_seg_pairs"]
        for r in L.line_intersection_join(
            spark.createDataFrame(la, schema),
            spark.createDataFrame(lb, schema),
            cell_size=cell,
        ).collect()
    }
    want = {}
    for aid, apts in la:
        for bid, bpts in lb:
            n = 0
            for i in range(len(apts) - 1):
                for j in range(len(bpts) - 1):
                    a = ((apts[i]["x"], apts[i]["y"]), (apts[i + 1]["x"], apts[i + 1]["y"]))
                    b = ((bpts[j]["x"], bpts[j]["y"]), (bpts[j + 1]["x"], bpts[j + 1]["y"]))
                    if _py_seg_intersect(a, b):
                        n += 1
            if n:
                want[(aid, bid)] = n
    assert got == want
    assert len(want) > 5


def test_line_intersection_touch_and_collinear(spark):
    schema = "line_id long, pts array<struct<x:double,y:double>>"
    la = spark.createDataFrame(
        [(1, [{"x": 0.0, "y": 0.0}, {"x": 10.0, "y": 0.0}])], schema
    )
    lb = spark.createDataFrame(
        [
            (10, [{"x": 5.0, "y": -5.0}, {"x": 5.0, "y": 5.0}]),   # proper cross
            (11, [{"x": 10.0, "y": 0.0}, {"x": 20.0, "y": 7.0}]),  # endpoint touch
            (12, [{"x": 3.0, "y": 0.0}, {"x": 7.0, "y": 0.0}]),    # collinear overlap
            (13, [{"x": 0.0, "y": 1.0}, {"x": 10.0, "y": 1.0}]),   # parallel, no touch
        ],
        schema,
    )
    got = {
        (r["a_id"], r["b_id"]): r["n_seg_pairs"]
        for r in L.line_intersection_join(la, lb, cell_size=8.0).collect()
    }
    assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 1}


# ---------------------------------------------------------------------------
# polyline network dissolve
# ---------------------------------------------------------------------------
def _py_dissolve(segs, scale=1000.0):
    """Union-find oracle: {comp_members frozenset of seg ids -> summary}."""
    import math

    def q(v):
        return math.floor(v * scale + 0.5)

    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes_of = {}
    for sid, cls, x1, y1, x2, y2 in segs:
        u = (cls, q(x1), q(y1))
        v = (cls, q(x2), q(y2))
        for n in (u, v):
            parent.setdefault(n, n)
        union(u, v)
        nodes_of[sid] = (u, v, cls, math.hypot(x2 - x1, y2 - y1))
    comp_of_seg = {sid: find(t[0]) for sid, t in nodes_of.items()}
    groups = {}
    for sid, root in comp_of_seg.items():
        groups.setdefault(root, []).append(sid)
    out = {}
    import collections

    for root, sids in groups.items():
        deg = collections.Counter()
        ln = 0
        for sid in sids:
            u, v, cls, L = nodes_of[sid]
            deg[u] += 1
            deg[v] += 1
            ln += math.floor(L * 1e6)
        odd = sum(1 for d in deg.values() if d % 2)
        out[frozenset(sids)] = (
            len(sids), ln, len(deg), odd,
        )
    return out


def test_dissolve_segments_oracle(spark):
    import random as _r

    rng = _r.Random(77)
    # build a random planar mini-network on a lattice of junction points so
    # endpoints genuinely coincide
    pts = [(rng.uniform(0, 20), rng.uniform(0, 20)) for _ in range(12)]
    segs = []
    for sid in range(25):
        a, b = rng.sample(range(12), 2)
        cls = rng.randint(0, 1)
        segs.append((sid, cls, *pts[a], *pts[b]))
    df = spark.createDataFrame(
        segs, "seg_id long, cls long, x1 double, y1 double, x2 double, y2 double"
    ).repartition(3)
    from engine.lines import dissolve_segments

    memb, summ = dissolve_segments(df, cls_col="cls")
    groups = {}
    for r in memb.collect():
        groups.setdefault(r["comp"], set()).add(r["seg_id"])
    got = {}
    for r in summ.collect():
        got[frozenset(groups[r["comp"]])] = (
            r["n_segs"], r["length_e6"], r["n_nodes"], r["n_odd"],
        )
    assert got == _py_dissolve(segs)


def test_dissolve_closed_forms_and_snap(spark):
    from engine.lines import dissolve_segments

    segs = [
        # an open 3-segment chain (path: 2 odd nodes)
        (0, 0, 0.0, 0.0, 1.0, 0.0),
        (1, 0, 1.0, 0.0, 2.0, 0.0),
        (2, 0, 2.0, 0.0, 2.0, 1.0),
        # a triangle loop (0 odd nodes)
        (3, 0, 10.0, 0.0, 11.0, 0.0),
        (4, 0, 11.0, 0.0, 10.5, 1.0),
        (5, 0, 10.5, 1.0, 10.0, 0.0),
        # same place as the chain but a different class: separate comp
        (6, 1, 0.0, 0.0, 1.0, 0.0),
        # endpoint within snap tolerance (scale=1000 -> 1e-3): merges
        (7, 0, 2.0002, 1.0003, 3.0, 1.0),
    ]
    df = spark.createDataFrame(
        segs, "seg_id long, cls long, x1 double, y1 double, x2 double, y2 double"
    )
    memb, summ = dissolve_segments(df, cls_col="cls")
    comp_of = {r["seg_id"]: r["comp"] for r in memb.collect()}
    rows = {r["comp"]: r for r in summ.collect()}
    chain = comp_of[0]
    assert comp_of[1] == chain and comp_of[2] == chain
    assert comp_of[7] == chain  # snapped within tolerance
    assert comp_of[6] != chain  # class wall
    tri = comp_of[3]
    assert comp_of[4] == tri == comp_of[5]
    assert rows[chain]["is_path"] and not rows[chain]["is_loop"]
    assert rows[chain]["n_segs"] == 4 and rows[chain]["n_odd"] == 2
    assert rows[tri]["is_loop"] and rows[tri]["n_odd"] == 0
    assert rows[comp_of[6]]["n_segs"] == 1
    # guard: coordinates beyond the packed domain raise loudly
    import pytest as _pt

    bad = spark.createDataFrame(
        [(0, 0, 1e9, 0.0, 1e9, 1.0)],
        "seg_id long, cls long, x1 double, y1 double, x2 double, y2 double",
    )
    with _pt.raises(Exception, match="dissolve_segments"):
        m, s = dissolve_segments(bad)
        m.collect()


# ---------------------------------------------------------------------------
# ring validity (self-intersection core of ST_IsValid)
# ---------------------------------------------------------------------------
def test_validate_rings(spark):
    from engine.lines import validate_rings

    def ring(pts):
        return [{"x": float(x), "y": float(y)} for x, y in pts]

    rows = [
        # convex square: valid
        (1, ring([(0, 0), (4, 0), (4, 4), (0, 4)])),
        # bowtie (figure-eight): the two diagonals cross -> invalid
        (2, ring([(0, 0), (4, 4), (4, 0), (0, 4)])),
        # concave L: valid
        (3, ring([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])),
        # spike touching a non-adjacent edge: vertex (2, 0) lies ON the
        # bottom edge -> invalid
        (4, ring([(0, 0), (4, 0), (4, 4), (2, 0), (0, 4)])),
        # degenerate: 2 vertices
        (5, ring([(0, 0), (1, 1)])),
    ]
    df = spark.createDataFrame(
        rows, "poly_id long, ring array<struct<x double, y double>>"
    )
    got = {r["id"]: r for r in validate_rings(df).collect()}
    assert got[1]["is_valid"] and got[1]["n_bad_pairs"] == 0
    assert not got[2]["is_valid"] and got[2]["n_bad_pairs"] >= 1
    assert got[3]["is_valid"]
    assert not got[4]["is_valid"]
    assert not got[5]["is_valid"] and got[5]["n_bad_pairs"] == -1
    # brute-force python replay of the pair set on the bowtie
    import itertools

    pts = [(0, 0), (4, 4), (4, 0), (0, 4)]
    n = len(pts)

    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return (v > 0) - (v < 0)

    def on_seg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    def inter(a, b, c, d):
        o1, o2 = orient(a, b, c), orient(a, b, d)
        o3, o4 = orient(c, d, a), orient(c, d, b)
        if o1 != o2 and o3 != o4:
            return True
        return ((o1 == 0 and on_seg(a, b, c)) or (o2 == 0 and on_seg(a, b, d))
                or (o3 == 0 and on_seg(c, d, a)) or (o4 == 0 and on_seg(c, d, b)))

    bad = 0
    for i, j in itertools.combinations(range(n), 2):
        if j == i + 1 or (i == 0 and j == n - 1):
            continue
        a, b = pts[i], pts[(i + 1) % n]
        c, d = pts[j], pts[(j + 1) % n]
        if inter(a, b, c, d):
            bad += 1
    assert got[2]["n_bad_pairs"] == bad


def test_dissolve_methods_identical(spark):
    """tile_local_components vs generic CC produce IDENTICAL dissolve labels
    (component min packed key) — including negative coordinates (anchors are
    shifted non-negative before the tile shiftright) and cross-tile chains
    (a long chain spanning many 256-cell tiles exercises the stitch path)."""
    import random as _r

    from engine.lines import dissolve_segments

    rng = _r.Random(5)
    segs = []
    sid = 0
    # random mini-network around the origin (negative coords included)
    pts = [(rng.uniform(-10, 10), rng.uniform(-10, 10)) for _ in range(15)]
    for _ in range(30):
        a, b = rng.sample(range(15), 2)
        segs.append((sid, rng.randint(0, 1), *pts[a], *pts[b]))
        sid += 1
    # one long chain spanning many tiles (x from 0 to 3.0 at scale=1000 ->
    # qx 0..3000 -> 12 tiles at shift 8)
    for i in range(30):
        segs.append((sid, 0, i * 0.1, 50.0, (i + 1) * 0.1, 50.0))
        sid += 1
    df = spark.createDataFrame(
        segs, "seg_id long, cls long, x1 double, y1 double, x2 double, y2 double"
    ).repartition(4)
    m_t, s_t = dissolve_segments(df, cls_col="cls", method="tiles")
    m_c, s_c = dissolve_segments(df, cls_col="cls", method="cc")
    assert sorted(map(tuple, m_t.collect())) == sorted(map(tuple, m_c.collect()))
    assert sorted(map(tuple, s_t.collect())) == sorted(map(tuple, s_c.collect()))


def test_tile_components_hot_tile_skew(spark):
    """80%-hot-tile fixture (VERDICT r5 item 1): most edges land in ONE tile,
    far beyond the per-group cap, so the salted hot-tile split must engage —
    every Arrow group stays bounded — and labels must still equal the generic
    CC exactly (the stitch merges salted sub-groups like it merges tiles)."""
    import random as _r

    from engine.graph import connected_components, tile_local_components

    rng = _r.Random(11)
    rows = []
    # hot tile: 2000 edges over 300 nodes, all anchored in one 4x4 tile
    for _ in range(2000):
        a, b = rng.sample(range(300), 2)
        rows.append((a, b, rng.randint(0, 3), rng.randint(0, 3)))
    # sparse remainder: a few chains elsewhere (cross-tile stitch kept live)
    for i in range(50):
        rows.append((1000 + i, 1001 + i, 40 + i * 7, 40 + i * 5))
    edges = spark.createDataFrame(rows, "u long, v long, ax long, ay long")
    # edges_per_tile=4 -> hot_cap=256 << 2000: the hot tile must split
    t = tile_local_components(edges, tile_shift=2, edges_per_tile=4)
    c = connected_components(edges.select("u", "v"))
    assert sorted(map(tuple, t.collect())) == sorted(map(tuple, c.collect()))
