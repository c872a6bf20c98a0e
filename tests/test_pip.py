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


def _multiring_fixture_rows(n_polys=8, seed=7, concave=False):
    """Ellipse-ish (or concave star) outers with a rect hole each; returns
    (spark rows, {pid: [(xs, ys), ...]}) for the numpy oracle."""
    import math

    rng = np.random.default_rng(seed)
    rows, py_rings = [], {}
    for i in range(n_polys):
        clon, clat = rng.uniform(-150, 150), rng.uniform(-60, 60)
        rlon, rlat = 8.0 + rng.random() * 10, 6.0 + rng.random() * 8
        if concave:
            # 10-point star: alternating outer/inner radius -> concave outer
            ang = np.array([math.pi * j / 5.0 for j in range(10)])
            rr = np.where(np.arange(10) % 2 == 0, 1.0, 0.35)
            ox = clon + rlon * rr * np.cos(ang)
            oy = clat + rlat * rr * np.sin(ang)
        else:
            ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
            ox, oy = clon + rlon * np.cos(ang), clat + rlat * np.sin(ang)
        hx0, hx1 = clon - rlon * 0.15, clon + rlon * 0.15
        hy0, hy1 = clat - rlat * 0.15, clat + rlat * 0.15
        outer = [{"lon": float(a), "lat": float(b)} for a, b in zip(ox, oy)]
        hole = [
            {"lon": hx0, "lat": hy0}, {"lon": hx1, "lat": hy0},
            {"lon": hx1, "lat": hy1}, {"lon": hx0, "lat": hy1},
        ]
        rows.append({
            "poly_id": i,
            "bbox": {"min": {"lon": float(ox.min()), "lat": float(oy.min())},
                     "max": {"lon": float(ox.max()), "lat": float(oy.max())}},
            "rings": [outer, hole],
        })
        py_rings[i] = [
            (ox, oy),
            (np.array([hx0, hx1, hx1, hx0]), np.array([hy0, hy0, hy1, hy1])),
        ]
    return rows, py_rings


_MULTIRING_SCHEMA = (
    "poly_id long, bbox struct<min:struct<lon:double,lat:double>,"
    "max:struct<lon:double,lat:double>>, "
    "rings array<array<struct<lon:double,lat:double>>>"
)


def _multiring_want(pts, py_rings):
    want = set()
    for pid, rings in py_rings.items():
        inside = joins.np_point_in_multipolygon(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(), rings
        )
        for img in pts.loc[inside, "image_id"]:
            want.add((img, pid))
    return want


def test_pip_multiring_concave_outer(spark):
    """Concave OUTER rings (the real OSM relation case) must pass
    assume_convex=False: the 4-corner full_inside test is unsound for them.
    Verified against the numpy even-odd multipolygon oracle, with probe points
    that land in the concavities (inside the outer bbox, outside the star)."""
    rows, py_rings = _multiring_fixture_rows(n_polys=6, seed=11, concave=True)
    pdf = spark.createDataFrame(rows, schema=_MULTIRING_SCHEMA)
    pts = [(f"p{i}", -170.0 + (i % 80) * 4.3, -75.0 + (i // 80) * 3.7)
           for i in range(3200)]
    points = spark.createDataFrame(pts, "image_id string, lon double, lat double")
    out = joins.pip_join_multiring(
        points, pdf, res_min=4, res_max=9, assume_convex=False
    )
    got = {(r["image_id"], r["poly_id"]) for r in out.collect()}
    ppdf = points.toPandas()
    want = _multiring_want(ppdf, py_rings)
    assert got == want
    # the fixture must actually exercise the concavity: some points inside the
    # outer ring's CONVEX HULL bbox-cover but outside the star
    in_hull_not_star = 0
    for pid, rings in py_rings.items():
        ox, oy = rings[0]
        bbox_in = (
            (ppdf["lon"] >= ox.min()) & (ppdf["lon"] <= ox.max())
            & (ppdf["lat"] >= oy.min()) & (ppdf["lat"] <= oy.max())
        ).to_numpy()
        star_in = joins.np_point_in_polygon(
            ppdf["lon"].to_numpy(), ppdf["lat"].to_numpy(), ox, oy
        )
        in_hull_not_star += int((bbox_in & ~star_in).sum())
    assert in_hull_not_star > 0


def test_pip_multiring_distributed_path(spark, tmp_path):
    """Polygon sets larger than driver_side_limit must take the distributed
    cover path: no .collect() of the polygons, no LocalRelation anywhere in
    the plan (the round-2 version force-collected + force-broadcast the
    polygon side). Same answers as the numpy oracle."""
    rows, py_rings = _multiring_fixture_rows(n_polys=8, seed=7)
    # polygons come from parquet so any LocalRelation in the plan could only
    # be a driver-collected cover
    ppath = str(tmp_path / "mpolys.parquet")
    spark.createDataFrame(rows, schema=_MULTIRING_SCHEMA).write.parquet(ppath)
    pdf = spark.read.parquet(ppath)
    images = synth.images_df(spark, 2000, hot_frac=0.3).select(
        "image_id",
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )
    out = joins.pip_join_multiring(
        images, pdf, res_min=4, res_max=9, driver_side_limit=3
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan
    got = {(r["image_id"], r["poly_id"]) for r in out.collect()}
    want = _multiring_want(images.toPandas(), py_rings)
    assert got == want
    assert len(want) > 0


def test_cover_tmp_dirs_cleaned(spark):
    """_materialize_if_large tracks its temp dirs; cleanup_cover_dirs removes
    them (and is registered atexit) — no orphan dir per pip_join call."""
    import os

    rows, _ = _multiring_fixture_rows(n_polys=4, seed=3)
    pdf = spark.createDataFrame(rows, schema=_MULTIRING_SCHEMA)
    cover = joins.multiring_cover(pdf, driver_side_limit=2)  # forces materialize
    cover.count()
    assert len(joins._COVER_TMP_DIRS) >= 1
    dirs = list(joins._COVER_TMP_DIRS)
    assert all(os.path.isdir(d) for d in dirs)
    removed = joins.cleanup_cover_dirs()
    assert removed >= 1
    assert not any(os.path.isdir(d) for d in dirs)
    assert joins._COVER_TMP_DIRS == []
