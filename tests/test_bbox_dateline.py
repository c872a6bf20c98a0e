"""Dateline-crossing bbox union — the reference declares these three cases and
leaves them as empty ignored specs (BboxTest.scala:14-24; Bbox.scala:3 "TODO:
Handle meridian"). Promoted to real tests with engine-defined semantics
(minimal covering lon arc; wrapped bbox has min.lon > max.lon)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine import coalesce


def _bbox(lo_lon, lo_lat, hi_lon, hi_lat):
    return F.struct(
        F.struct(F.lit(float(lo_lon)).alias("lon"), F.lit(float(lo_lat)).alias("lat")).alias("min"),
        F.struct(F.lit(float(hi_lon)).alias("lon"), F.lit(float(hi_lat)).alias("lat")).alias("max"),
    )


def _union(spark, b1, b2):
    row = spark.range(1).select(
        coalesce.bbox_union_wrap(_bbox(*b1), _bbox(*b2)).alias("u")
    ).collect()[0]["u"]
    return (row["min"]["lon"], row["min"]["lat"], row["max"]["lon"], row["max"]["lat"])


def test_union_plain(spark):
    # the reference's one live case (BboxTest.scala:7-12)
    assert _union(spark, (75, 35, 76, 38), (75.5, 37, 77, 39)) == (75, 35, 77, 39)


def test_union_first_crosses_dateline(spark):
    # [178 -> -178] wrapped, plus a plain box at [170, 175]:
    # minimal cover runs east from 170 through the dateline to -178
    got = _union(spark, (178, -10, -178, 10), (170, -5, 175, 5))
    assert got == (170, -10, -178, 10)


def test_union_other_crosses_dateline(spark):
    # symmetric: the wrapped box comes second
    got = _union(spark, (170, -5, 175, 5), (178, -10, -178, 10))
    assert got == (170, -10, -178, 10)


def test_union_both_cross_dateline(spark):
    # [179 -> -179] and [177 -> -175]: cover = [177 -> -175]
    got = _union(spark, (179, 0, -179, 1), (177, -2, -175, 3))
    assert got == (177, -2, -175, 3)


def test_union_near_full_circle_degenerates(spark):
    # two arcs whose minimal cover exceeds the circle -> full [-180, 180]
    got = _union(spark, (-90, 0, 90, 1), (90, 0, -90, 1))
    assert got[0] == -180.0 and got[2] == 180.0


def test_union_prefers_narrower_candidate(spark):
    # boxes at [10, 20] and [30, 40]: east-from-10 cover (width 30) beats
    # east-from-30 cover (width 350)
    assert _union(spark, (10, 0, 20, 0), (30, 0, 40, 0)) == (10, 0, 40, 0)


def test_union_full_circle_box_is_absorbing(spark):
    """Regression (ADVICE r1): a 360-degree-wide box — including the union's own
    'full' output — must act as the absorbing element, not collapse to a point
    via _lon_width's pmod(360, 360) == 0."""
    full = (-180.0, -10.0, 180.0, 10.0)
    other = (30.0, -5.0, 40.0, 20.0)
    for pair in [(full, other), (other, full), (full, full)]:
        got = _union(spark, *pair)
        assert got[0] == -180.0 and got[2] == 180.0, (pair, got)
    # latitudes still union component-wise
    assert _union(spark, full, other)[1] == -10.0
    assert _union(spark, full, other)[3] == 20.0


def test_wrap_bbox_agg_points(spark):
    # points clustered around the dateline: minimal arc wraps; a naive
    # min/max bbox would span nearly the whole world
    rows = [(1, 179.0, 0.0), (1, -179.5, 2.0), (1, 178.5, -1.0),
            (2, 0.0, 0.0), (2, 10.0, 5.0)]
    df = spark.createDataFrame(rows, "fid long, lon double, lat double")
    out = {r["fid"]: r["bbox"] for r in
           coalesce.wrap_bbox_agg(df, ["fid"]).collect()}
    b1 = out[1]
    assert b1["min"]["lon"] == 178.5 and b1["max"]["lon"] == -179.5  # wrapped
    assert b1["min"]["lat"] == -1.0 and b1["max"]["lat"] == 2.0
    b2 = out[2]
    assert b2["min"]["lon"] == 0.0 and b2["max"]["lon"] == 10.0  # plain


def test_wrap_bbox_agg_single_point(spark):
    df = spark.createDataFrame([(1, 5.0, 6.0)], "fid long, lon double, lat double")
    b = coalesce.wrap_bbox_agg(df, ["fid"]).collect()[0]["bbox"]
    assert (b["min"]["lon"], b["max"]["lon"], b["min"]["lat"], b["max"]["lat"]) == (
        5.0, 5.0, 6.0, 6.0
    )


def test_wrap_union_properties(spark):
    """Property sweep (deterministic grid, no hypothesis-Spark session churn):
    for arcs on a discretized circle, the union (a) contains both inputs and
    (b) is minimal among covering intervals — checked against a brute-force
    scan of all candidate covers."""
    import itertools

    def contains(lo, hi, x):
        w = (hi - lo) % 360.0
        return (x - lo) % 360.0 <= w + 1e-9

    def width(lo, hi):
        return (hi - lo) % 360.0

    # build all test pairs first, evaluate in ONE Spark job
    starts = [-170.0, -60.0, 0.0, 60.0, 170.0]
    widths = [10.0, 90.0, 170.0, 250.0]
    cases = []
    for (a1, w1), (a2, w2) in itertools.product(
        itertools.product(starts, widths), repeat=2
    ):
        h1 = ((a1 + w1 + 180.0) % 360.0) - 180.0
        h2 = ((a2 + w2 + 180.0) % 360.0) - 180.0
        cases.append((a1, h1, a2, h2, w1, w2))

    df = spark.createDataFrame(
        [(i, c[0], c[1], c[2], c[3]) for i, c in enumerate(cases)],
        "i long, a1 double, h1 double, a2 double, h2 double",
    )
    b1 = F.struct(
        F.struct(F.col("a1").alias("lon"), F.lit(0.0).alias("lat")).alias("min"),
        F.struct(F.col("h1").alias("lon"), F.lit(0.0).alias("lat")).alias("max"),
    )
    b2 = F.struct(
        F.struct(F.col("a2").alias("lon"), F.lit(0.0).alias("lat")).alias("min"),
        F.struct(F.col("h2").alias("lon"), F.lit(0.0).alias("lat")).alias("max"),
    )
    got = {
        r["i"]: (r["u"]["min"]["lon"], r["u"]["max"]["lon"])
        for r in df.select("i", coalesce.bbox_union_wrap(b1, b2).alias("u")).collect()
    }
    for i, (a1, h1, a2, h2, w1, w2) in enumerate(cases):
        lo, hi = got[i]
        full = lo == -180.0 and hi == 180.0
        # containment of both input arcs' endpoints (sufficient for arcs given
        # the output is a single interval that also contains each start)
        for x in (a1, h1, a2, h2):
            assert full or contains(lo, hi, x), (i, (a1, h1), (a2, h2), (lo, hi))
        # minimality: brute force over every integer start position — the
        # narrowest interval covering BOTH ARCS (interval containment, not
        # just endpoints: arc [a,h] fits in [s, s+cov] iff (a-s)%360 + w(a,h)
        # <= cov)
        wu = width(lo, hi) if not full else 360.0
        best = 360.0
        for s_deg in range(-180, 180):
            need = max(
                (a1 - s_deg) % 360.0 + width(a1, h1),
                (a2 - s_deg) % 360.0 + width(a2, h2),
            )
            best = min(best, need)
        assert wu <= best + 1e-9, f"case {i}: got width {wu}, minimal {best}"
