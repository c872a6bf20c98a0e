"""PIP join vs the numpy brute-force oracle (FIXTURES.md §2: the oracle is ray-cast
in NumPy, never the engine itself)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from engine import cells, joins, synth


def _brute_force_pairs(points_pdf, rings):
    got = set()
    for pid, (xs, ys) in rings.items():
        inside = joins.np_point_in_polygon(
            points_pdf["lon"].to_numpy(), points_pdf["lat"].to_numpy(), xs, ys
        )
        for img in points_pdf.loc[inside, "image_id"]:
            got.add((img, pid))
    return got


def test_pip_join_matches_brute_force(spark):
    images = synth.images_df(spark, 3000, hot_frac=0.3).select(
        "image_id",
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    polys = synth.polygons_df(spark, p=25, hot_frac=0.3)
    out = joins.pip_join(images, polys)
    got = {(r["image_id"], r["poly_id"]) for r in out.collect()}
    rings = joins.collect_poly_rings(polys)
    want = _brute_force_pairs(images.toPandas(), rings)
    assert got == want
    assert len(want) > 0  # fixture must actually exercise containment


def test_pip_join_shuffle_path_same_result(spark):
    images = synth.images_df(spark, 1500, hot_frac=0.5).select(
        "image_id",
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    polys = synth.polygons_df(spark, p=12, hot_frac=0.4)
    a = {
        (r["image_id"], r["poly_id"])
        for r in joins.pip_join(images, polys, broadcast_cover=True).collect()
    }
    b = {
        (r["image_id"], r["poly_id"])
        for r in joins.pip_join(images, polys, broadcast_cover=False).collect()
    }
    assert a == b


def test_pip_multiring_matches_brute_force(spark):
    """pip_join_multiring (outer ring + holes, OSM outer/inner roles) vs the
    numpy even-odd multipolygon oracle: ellipse outers with rect holes."""
    images = synth.images_df(spark, 3000, hot_frac=0.3).select(
        "image_id",
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    rng = np.random.default_rng(7)
    polys, py_rings = [], {}
    for i in range(8):
        clon, clat = rng.uniform(-150, 150), rng.uniform(-60, 60)
        rlon, rlat = 8.0 + rng.random() * 10, 6.0 + rng.random() * 8
        ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
        ox, oy = clon + rlon * np.cos(ang), clat + rlat * np.sin(ang)
        hx0, hx1 = clon - rlon * 0.3, clon + rlon * 0.3
        hy0, hy1 = clat - rlat * 0.3, clat + rlat * 0.3
        outer = [{"lon": float(a), "lat": float(b)} for a, b in zip(ox, oy)]
        hole = [
            {"lon": hx0, "lat": hy0}, {"lon": hx1, "lat": hy0},
            {"lon": hx1, "lat": hy1}, {"lon": hx0, "lat": hy1},
        ]
        polys.append({
            "poly_id": i,
            "bbox": {"min": {"lon": float(ox.min()), "lat": float(oy.min())},
                     "max": {"lon": float(ox.max()), "lat": float(oy.max())}},
            "rings": [outer, hole],
        })
        py_rings[i] = [
            (ox, oy),
            (np.array([hx0, hx1, hx1, hx0]), np.array([hy0, hy0, hy1, hy1])),
        ]
    pdf = spark.createDataFrame(
        polys,
        schema="poly_id long, bbox struct<min:struct<lon:double,lat:double>,"
               "max:struct<lon:double,lat:double>>, "
               "rings array<array<struct<lon:double,lat:double>>>",
    )
    out = joins.pip_join_multiring(images, pdf, res_min=4, res_max=9)
    got = {(r["image_id"], r["poly_id"]) for r in out.collect()}
    pts = images.toPandas()
    want = set()
    holes_excluded = 0
    for pid, rings in py_rings.items():
        inside = joins.np_point_in_multipolygon(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(), rings
        )
        outer_only = joins.np_point_in_polygon(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(), rings[0][0], rings[0][1]
        )
        holes_excluded += int((outer_only & ~inside).sum())
        for img in pts.loc[inside, "image_id"]:
            want.add((img, pid))
    assert got == want
    assert len(want) > 0 and holes_excluded > 0  # holes must actually exclude


def test_polygon_cover_contains_all_inside_points(spark):
    """Cover must be a superset: every inside point's cell appears in the cover."""
    polys = synth.polygons_df(spark, p=10)
    cover = joins.polygon_cover(polys).toPandas()
    rings = joins.collect_poly_rings(polys)
    rng = np.random.default_rng(7)
    for pid, (xs, ys) in rings.items():
        sub = cover[cover["poly_id"] == pid]
        assert len(sub) > 0
        res = int(sub["res"].iloc[0])
        lon = rng.uniform(xs.min(), xs.max(), 200)
        lat = rng.uniform(ys.min(), ys.max(), 200)
        inside = joins.np_point_in_polygon(lon, lat, xs, ys)
        cc = cells.np_grid_encode_lonlat(lon[inside], lat[inside], res)
        assert set(cc.tolist()) <= set(sub["cell"].tolist())


def test_tile_assign_matches_bounds(spark):
    images = synth.images_df(spark, 500).select(
        "image_id",
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    out = joins.tile_assign(images, 9).toPandas()
    n = 2**9
    want_x = np.clip(np.floor((out["lon"] + 180) / 360 * n), 0, n - 1).astype(np.int64)
    want_y = np.clip(np.floor((out["lat"] + 90) / 180 * n), 0, n - 1).astype(np.int64)
    assert (out["tile_id"] == 9 * 2**50 + want_x * 2**25 + want_y).all()


def test_cell_to_tile_consistent_with_tile_assign(spark):
    images = synth.images_df(spark, 500).select(
        "image_id",
        F.col("phash"),
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    via_point = joins.tile_assign(images, 8).select("image_id", "tile_id")
    via_cell = images.select(
        "image_id",
        joins.cell_to_tile(
            cells.grid_encode_phash(F.col("phash"), 11), 11, 8
        ).alias("tile_id2"),
    )
    j = via_point.join(via_cell, "image_id")
    assert j.filter(F.col("tile_id") != F.col("tile_id2")).count() == 0


def test_pip_join_nonconvex_exact(spark):
    """assume_convex=False must be exact for ANY simple polygon: interior
    classification and the SAT cull are skipped, every bbox-cover candidate
    runs the ray cast. Fixture: a star (concave) and an L-shape, with points
    placed in the concavities (where a convex treatment would differ)."""
    import math

    star_xs, star_ys = [], []
    for i in range(10):
        r = 20.0 if i % 2 == 0 else 7.0
        a = math.pi * i / 5.0
        star_xs.append(10.0 + r * math.cos(a))
        star_ys.append(5.0 + r * math.sin(a))
    lshape = ([-60.0, -40.0, -40.0, -50.0, -50.0, -60.0],
              [-30.0, -30.0, -25.0, -25.0, -10.0, -10.0])
    rings = {0: (np.array(star_xs), np.array(star_ys)),
             1: (np.array(lshape[0]), np.array(lshape[1]))}

    rows = []
    for pid, (xs, ys) in rings.items():
        for r in [
            {"poly_id": pid,
             "bbox": {"min": {"lon": float(xs.min()), "lat": float(ys.min())},
                      "max": {"lon": float(xs.max()), "lat": float(ys.max())}},
             "ring": [{"lon": float(a), "lat": float(b)} for a, b in zip(xs, ys)]}
        ]:
            rows.append(r)
    polys = spark.createDataFrame(
        rows,
        schema="poly_id long, bbox struct<min:struct<lon:double,lat:double>,"
               "max:struct<lon:double,lat:double>>, "
               "ring array<struct<lon:double,lat:double>>",
    )
    # deterministic grid of probe points incl. concavity interiors
    pts = [(f"p{i}", -70.0 + (i % 40) * 2.7, -35.0 + (i // 40) * 2.3)
           for i in range(800)]
    points = spark.createDataFrame(pts, "image_id string, lon double, lat double")
    out = joins.pip_join(points, polys, assume_convex=False)
    got = {(r["image_id"], r["poly_id"]) for r in out.collect()}
    want = _brute_force_pairs(points.toPandas(), rings)
    assert got == want
    assert len(want) > 10  # star + L interiors actually hit
