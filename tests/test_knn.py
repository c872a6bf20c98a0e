"""kNN join: ring-expansion result must exactly equal brute force (FIXTURES.md §5
golden_knn contract)."""

import pandas as pd
from pyspark.sql import functions as F

from engine import cells, joins, synth


def _points(spark, n, hot_frac=0.0, id_col="point_id"):
    return synth.images_df(spark, n, hot_frac=hot_frac).select(
        F.col("image_id").alias(id_col),
        cells.phash_x(F.col("phash")).alias("x"),
        cells.phash_y(F.col("phash")).alias("y"),
    )


def test_knn_matches_brute_force(spark):
    points = _points(spark, 2000, hot_frac=0.4)
    queries = (
        synth.images_df(spark, 30)
        .select(
            F.col("image_id").alias("query_id"),
            cells.phash_x(F.col("phash")).alias("x"),
            cells.phash_y(F.col("phash")).alias("y"),
        )
    )
    got = (
        joins.knn_join(queries, points, k=3, res=7)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_brute_force(queries, points, k=3)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def _geo_points(spark, n, id_col="point_id"):
    return synth.images_df(spark, n).select(
        F.col("image_id").alias(id_col),
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    )


def test_knn_geo_matches_brute_force(spark):
    """Geodesic ring expansion (haversine guarantee) must exactly equal the
    haversine brute force — VERDICT r3 item 4 parity gate."""
    points = _geo_points(spark, 2000)
    queries = _geo_points(spark, 30, id_col="query_id")
    got = (
        joins.knn_geo_join(queries, points, k=3, res=6)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_geo_brute_force(queries, points, k=3)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_knn_geo_dateline_wrap(spark):
    """A query at lon 179.9 whose true nearest neighbor sits at lon -179.9
    (22 km away across the antimeridian, vs a 44 km decoy on the same side):
    an unwrapped settle bound would retire the query with the decoy; the
    wrap-aware bound must refuse to settle and recover the true neighbor."""
    points = spark.createDataFrame(
        [(1, -179.9, 0.0), (2, 179.5, 0.0), (3, -170.0, 40.0), (4, 150.0, -30.0)],
        ["point_id", "lon", "lat"],
    )
    queries = spark.createDataFrame([(10, 179.9, 0.0)], ["query_id", "lon", "lat"])
    got = (
        joins.knn_geo_join(queries, points, k=2, res=5, max_radius=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_geo_brute_force(queries, points, k=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["point_id"].tolist()[0] == 1  # the cross-dateline neighbor wins


def test_knn_geo_polar(spark):
    """Near the pole the cos-floor lon bound degrades to 0 (the covered rect's
    lat band touches 90, where every meridian converges), so lon separation
    can never justify settling there — exactly what keeps the bound sound. A
    query at lat 88 whose true nearest neighbor sits on the OPPOSITE meridian
    (~390 km over the pole, 16 lon cells away at res 5 — unreachable by ring
    radius 2) must refuse to settle with the same-meridian decoy (~556 km)
    and recover the polar neighbor through the brute-force residue. Also
    covers the iy clamp at the grid's top row."""
    points = spark.createDataFrame(
        [
            (1, -179.0, 88.5),   # across the pole: ~390 km great-circle
            (2, 1.0, 83.0),      # same meridian, farther (~556 km)
            (3, 10.0, 70.0),
            (4, -90.0, 87.0),
        ],
        ["point_id", "lon", "lat"],
    )
    queries = spark.createDataFrame([(10, 1.0, 88.0)], ["query_id", "lon", "lat"])
    got = (
        joins.knn_geo_join(queries, points, k=2, res=5, max_radius=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_geo_brute_force(queries, points, k=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["point_id"].tolist()[0] == 1  # the over-the-pole neighbor wins


def test_geo_settle_bound_sound(spark):
    """Soundness fuzz of the settle bound that makes knn_geo_join exact: for
    tens of thousands of random (query, point) pairs — heavily oversampled
    near the poles and the antimeridian, across several (res, radius) grid
    shapes — every point whose cell lies OUTSIDE the covered rect must be at
    least the bound away. A single violation means the ring expansion could
    retire a query with a wrong neighbor. All-Column evaluation: one Spark
    job per grid shape."""
    import numpy as np

    rng = np.random.default_rng(42)
    n = 30000

    def sample(lo_lon, hi_lon, lo_lat, hi_lat, m):
        return (rng.uniform(lo_lon, hi_lon, m), rng.uniform(lo_lat, hi_lat, m))

    # uniform + dateline band + polar caps, for queries and points independently
    parts = [
        sample(-180, 180, -90, 90, n // 2),
        sample(170, 180, -90, 90, n // 8),
        sample(-180, -170, -90, 90, n // 8),
        sample(-180, 180, 85, 90, n // 8),
        sample(-180, 180, -90, -85, n // 8),
    ]
    qlon = np.concatenate([p[0] for p in parts])
    qlat = np.concatenate([p[1] for p in parts])
    perm = rng.permutation(len(qlon))
    plon, plat = qlon[perm], qlat[perm]  # same heavy-tailed distribution
    pdf = pd.DataFrame({"qlon": qlon, "qlat": qlat, "plon": plon, "plat": plat})
    df = spark.createDataFrame(pdf)

    for res, radius in [(2, 0), (3, 1), (4, 2), (5, 0), (6, 3)]:
        ncells = 2**res
        cw_lon, cw_lat = 360.0 / ncells, 180.0 / ncells

        def ix(lon):
            return F.least(
                F.lit(ncells - 1),
                F.greatest(F.lit(0), F.floor((lon + 180.0) / cw_lon)),
            ).cast("long")

        def iy(lat):
            return F.least(
                F.lit(ncells - 1),
                F.greatest(F.lit(0), F.floor((lat + 90.0) / cw_lat)),
            ).cast("long")

        qix, qiy = ix(F.col("qlon")), iy(F.col("qlat"))
        pix, piy = ix(F.col("plon")), iy(F.col("plat"))
        outside = (
            (pix < qix - radius) | (pix > qix + radius)
            | (piy < qiy - radius) | (piy > qiy + radius)
        )
        bound = joins.geo_settle_bound(
            F.col("qlon"), F.col("qlat"), qix, qiy, radius, res
        )
        dist = joins.haversine_m(
            F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat")
        )
        checked = df.filter(outside).select(
            bound.alias("bound"), dist.alias("dist")
        )
        stats = checked.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("bound") > F.col("dist") + 1e-3, 1).otherwise(0))
            .alias("violations"),
        ).collect()[0]
        assert stats["n"] > 1000, f"vacuous fuzz at res={res} r={radius}"
        assert stats["violations"] == 0, (
            f"unsound settle bound at res={res} radius={radius}: "
            f"{stats['violations']}/{stats['n']}"
        )


def test_knn_geo_sparse_fallback(spark):
    """Sparse geodesic points escalate to the brute-force residue and stay exact."""
    points = _geo_points(spark, 40)
    queries = _geo_points(spark, 8, id_col="query_id")
    got = (
        joins.knn_geo_join(queries, points, k=5, res=7, max_radius=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_geo_brute_force(queries, points, k=5)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_knn_sparse_region_fallback(spark):
    """Few points, far apart: disk expansion must escalate to the brute-force
    fallback and still be exact."""
    points = _points(spark, 40)
    queries = (
        synth.images_df(spark, 8)
        .select(
            F.col("image_id").alias("query_id"),
            cells.phash_x(F.col("phash")).alias("x"),
            cells.phash_y(F.col("phash")).alias("y"),
        )
    )
    got = (
        joins.knn_join(queries, points, k=5, res=7, max_radius=2)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        joins.knn_brute_force(queries, points, k=5)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
