"""Structured Streaming operators: incremental image ingest -> cell aggregation.

The reference is pure batch (Spark 2.2, no watermarks/state anywhere — SURVEY.md
§2.8); its incremental story is snapshot-based checkpointed batch, which this
engine provides via iceberg_lite. These operators are the additional
Structured-Streaming surface for genuinely continuous feeds: file-source ingest
of image batches, watermarked per-cell windowed counts, and streaming
exact-dedup. They reuse the batch engine's Column kernels (cell encode is the
same expression in both modes — Catalyst doesn't care).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells

# streamed image batches carry an event-time column
STREAM_IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def read_image_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a directory of image-batch parquet files."""
    return (
        spark.readStream.format("parquet")
        .schema(STREAM_IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def streaming_cell_counts(
    stream: DataFrame,
    res: int = 7,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-(window, cell) counts — the streaming twin of the batch
    rollup. Late rows beyond the watermark are dropped; state is bounded."""
    return (
        stream.withWatermark("event_time", watermark)
        .withColumn("cell", cells.grid_encode_phash(F.col("phash"), res))
        .groupBy(F.window("event_time", window), F.col("cell"))
        .agg(F.count("*").alias("n_images"))
    )


def streaming_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on image_id within the watermark horizon (state is
    expired past it) — the streaming twin of textops.exact_dedup."""
    return stream.withWatermark("event_time", watermark).dropDuplicates(
        ["image_id"]
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming frame to completion against currently-available input
    (test/bench harness): memory sink + processAllAvailable."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q
