"""Structured Streaming: incremental ingest drives the same cell kernels."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine import cells, streaming


@pytest.fixture()
def stream_dir(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    for batch in range(3):
        rows = [
            (
                f"img{batch:02d}_{i:04d}",
                (batch * 1000 + i) * 2654435761 % (2**62),
                f"caption {batch}/{i}",
                base + dt.timedelta(minutes=5 * batch),
            )
            for i in range(50)
        ]
        # duplicate ids across batches for the dedup test
        if batch == 2:
            rows += [
                ("img00_0000", 12345, "dup", base + dt.timedelta(minutes=12)),
            ]
        df = spark.createDataFrame(rows, schema=streaming.STREAM_IMAGES_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    return str(tmp_path / "in")


def test_streaming_cell_counts_match_batch(spark, stream_dir):
    stream = streaming.read_image_stream(spark, stream_dir)
    agg = streaming.streaming_cell_counts(stream, res=5, window="10 minutes")
    q = streaming.run_to_memory(agg, "cell_counts", output_mode="complete")
    try:
        got = spark.sql(
            "SELECT cell, sum(n_images) AS n FROM cell_counts GROUP BY cell"
        ).collect()
        batch = (
            spark.read.parquet(stream_dir)
            .withColumn("cell", cells.grid_encode_phash(F.col("phash"), 5))
            .groupBy("cell")
            .count()
            .collect()
        )
        assert {(r["cell"], r["n"]) for r in got} == {
            (r["cell"], r["count"]) for r in batch
        }
    finally:
        q.stop()


def test_streaming_dedup(spark, stream_dir):
    stream = streaming.read_image_stream(spark, stream_dir)
    dd = streaming.streaming_dedup(stream)
    q = streaming.run_to_memory(dd, "dedup", output_mode="append")
    try:
        total = spark.read.parquet(stream_dir).count()
        distinct = spark.sql("SELECT count(*) AS n FROM dedup").first()["n"]
        assert distinct == total - 1  # exactly one duplicate id was injected
    finally:
        q.stop()
