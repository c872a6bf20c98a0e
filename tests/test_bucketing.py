"""Bucketed co-located join: pre-bucketing both sides on the join key removes the
shuffle from later joins (SURVEY.md §4 physical-layout tooling)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from engine import cells, synth


def test_bucketed_join_has_no_shuffle(spark):
    pts = synth.images_df(spark, 2000).select(
        "image_id", cells.grid_encode_phash(F.col("phash"), 7).alias("cell")
    )
    dim = pts.select("cell").distinct().withColumn("label", F.col("cell") % 10)
    spark.sql("DROP TABLE IF EXISTS pts_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    # default catalog is in-memory: a previous session's managed-table dirs are
    # invisible to DROP TABLE, so clear the locations physically
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("pts_b", "dim_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    pts.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite").saveAsTable("pts_b")
    dim.write.bucketBy(8, "cell").sortBy("cell").mode("overwrite").saveAsTable("dim_b")
    # disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("pts_b").join(spark.table("dim_b"), "cell")
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # bucketed co-location: no shuffle Exchange feeding the join
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 2000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
