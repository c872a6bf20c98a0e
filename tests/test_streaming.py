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


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions across micro-batches
    equal the batch sessionizer's non-final sessions."""
    import datetime as dt

    from engine import streaming, temporal

    d = str(tmp_path / "sess_in")
    base = dt.datetime(2024, 1, 1)
    # two keys; gaps > 30 min inside and across batches
    batches = [
        [("a", base), ("a", base + dt.timedelta(minutes=5)), ("b", base)],
        [("a", base + dt.timedelta(minutes=50)),  # closes a's first session
         ("b", base + dt.timedelta(minutes=10))],
        [("a", base + dt.timedelta(minutes=55)),
         ("b", base + dt.timedelta(minutes=120))],  # closes b's first session
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(k, 0, None, t) for k, t in rows], schema=streaming.STREAM_IMAGES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)

    stream = streaming.read_image_stream(spark, d, max_files_per_trigger=1)
    sess = streaming.streaming_sessionize(stream, key="image_id", ts="event_time",
                                          gap_minutes=30)
    q = streaming.run_to_memory(sess, "t_sessionize", output_mode="append")
    try:
        got = {
            (r["key"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sessionize").collect()
        }
    finally:
        q.stop()

    # batch twin over the union of all batches
    all_rows = [(k, t) for b in batches for k, t in b]
    bdf = spark.createDataFrame(all_rows, "key string, ts timestamp")
    from pyspark.sql import functions as F

    s = temporal.sessionize(bdf, key="key", ts="ts", gap_minutes=30)
    agg = (
        s.groupBy("key", "session_idx")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count("*").alias("n"),
            F.max("session_idx").alias("_si"),
        )
    )
    last = {r["key"]: r for r in
            agg.groupBy("key").agg(F.max("session_idx").alias("m")).collect()}
    want = {
        (r["key"], r["start_us"], r["end_us"], r["n"])
        for r in agg.collect()
        if r["session_idx"] < last[r["key"]]["m"]  # only CLOSED sessions
    }
    assert got == want
    assert len(got) == 2  # one closed session per key


def test_write_stream_to_table_idempotent(spark, tmp_path):
    """foreachBatch -> iceberg_lite sink: every micro-batch commits once; a
    replayed batch id is skipped (idempotent commits)."""
    import datetime as dt

    from engine import iceberg_lite, streaming

    d = str(tmp_path / "sink_in")
    loc = str(tmp_path / "sink_table")
    base = dt.datetime(2024, 1, 1)
    for i in range(3):
        rows = [(f"img{i}_{j}", i * 100 + j, None, base) for j in range(10)]
        spark.createDataFrame(
            rows, schema=streaming.STREAM_IMAGES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)

    stream = streaming.read_image_stream(spark, d, max_files_per_trigger=1)
    q = streaming.write_stream_to_table(
        stream.withColumn("cell", F.lit(0).cast("long")), loc, range_cols=["phash"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    t = iceberg_lite.Table(loc)
    assert t.row_count() == 30
    # replaying batch 0 by hand must be a no-op
    before_sid = t.current_snapshot_id()
    from engine.streaming import write_stream_to_table as _  # noqa: F401
    # simulate the replay path: pending_units says batch-0 is done
    assert t.pending_units("__stream__", ["batch-0", "batch-99"]) == ["batch-99"]
    assert t.current_snapshot_id() == before_sid
