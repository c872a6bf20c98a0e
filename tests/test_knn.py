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
