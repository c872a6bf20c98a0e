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
