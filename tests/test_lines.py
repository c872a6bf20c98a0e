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
