"""streaming_trip_segments: batch==streaming parity + tail expiry."""

import datetime as dt
import random

from pyspark.sql import functions as F  # noqa: F401

from engine import streaming, trajectory
from tests.conftest import spark  # noqa: F401

FIX_SCHEMA = "entity_id long, event_time timestamp, lon double, lat double"
BASE = dt.datetime(2024, 3, 1)


def _fix(eid, minutes, lon, lat):
    return (eid, BASE + dt.timedelta(minutes=minutes), lon, lat)


def _run_stream(spark, tmp_path, batches, gap_minutes=30.0, name="t_trips"):
    d = str(tmp_path / "fixes_in")
    for rows in batches:
        spark.createDataFrame(rows, FIX_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    stream = (
        spark.readStream.schema(FIX_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    trips = streaming.streaming_trip_segments(stream, gap_minutes=gap_minutes)
    q = streaming.run_to_memory(trips, name, output_mode="append")
    try:
        q.processAllAvailable()
        return [
            tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()
        ]
    finally:
        q.stop()


def _batch_trips(spark, rows, gap_minutes=30.0):
    df = spark.createDataFrame(rows, FIX_SCHEMA).select(
        "entity_id",
        F.unix_micros("event_time").alias("ts_us"),
        "lon",
        "lat",
    )
    return {
        tuple(r)
        for r in trajectory.trip_segments(df, gap_minutes=gap_minutes)
        .select(
            "entity_id", "trip_idx", "start_us", "end_us",
            "duration_us", "n_points", "length_mm",
        )
        .collect()
    }


def test_batch_parity_multi_entity_multi_batch(spark, tmp_path):
    """Fixes arrive in order per entity, split across 4 micro-batches so
    trips span batch boundaries; a far-future sentinel entity advances the
    watermark so every real entity's tail trip flushes. Closed trips must
    equal the batch twin bit-for-bit (incl. integer-mm geodesic length)."""
    rng = random.Random(31)
    real = []
    for eid in (1, 2, 3):
        m = 0.0
        for _trip in range(3):
            for _ in range(rng.randint(2, 5)):
                real.append(
                    _fix(eid, m, rng.uniform(-10, 10), rng.uniform(40, 50))
                )
                m += rng.uniform(1, 20)  # within the 30-min gap
            m += rng.uniform(40, 90)  # gap > 30 min: trip boundary
    real.sort(key=lambda r: r[1])
    cut1, cut2, cut3 = len(real) // 4, len(real) // 2, 3 * len(real) // 4
    sentinel = [_fix(99, 10 * 24 * 60, 0.0, 0.0)]
    batches = [
        real[:cut1], real[cut1:cut2], real[cut2:cut3], real[cut3:], sentinel
    ]
    got = set(_run_stream(spark, tmp_path, batches))
    want = _batch_trips(spark, real)
    assert got == want  # sentinel's own open tail never closes => absent


def test_single_trip_across_batches_exact_length(spark, tmp_path):
    """One entity, one trip, one fix per micro-batch: the leg accumulator
    crosses every batch boundary and must still match batch exactly."""
    fixes = [
        _fix(7, 5 * i, -122.4 + 0.01 * i, 37.77 + 0.005 * i) for i in range(6)
    ]
    sentinel = [_fix(99, 10 * 24 * 60, 0.0, 0.0)]
    batches = [[f] for f in fixes] + [sentinel]
    got = set(_run_stream(spark, tmp_path, batches, name="t_trips_one"))
    want = _batch_trips(spark, fixes)
    assert got == want
    assert len(got) == 1
    (row,) = got
    assert row[5] == 6 and row[6] > 0  # n_points, nonzero length


def test_tail_expiry_removes_state_and_numbers_trips(spark, tmp_path):
    """Two trips for one entity arriving in separate batches: the first
    closes when the second's opening fix is observed; the second closes via
    event-time timeout. trip_idx must number them 1, 2."""
    t1 = [_fix(5, 0, 0.0, 0.0), _fix(5, 10, 0.1, 0.0)]
    t2 = [_fix(5, 120, 1.0, 0.0), _fix(5, 125, 1.1, 0.0)]
    sentinel = [_fix(99, 10 * 24 * 60, 0.0, 0.0)]
    got = sorted(
        _run_stream(spark, tmp_path, [t1, t2, sentinel], name="t_trips_exp"),
        key=lambda r: r[1],
    )
    assert [r[1] for r in got] == [1, 2]
    assert [r[5] for r in got] == [2, 2]
    assert got == sorted(_batch_trips(spark, t1 + t2), key=lambda r: r[1])


# ---------------------------------------------------------------------------
# streaming_kinematics: batch==streaming parity + state GC
# ---------------------------------------------------------------------------
def _run_kin_stream(spark, tmp_path, batches, name="t_kin", **kw):
    d = str(tmp_path / "kin_in")
    for rows in batches:
        spark.createDataFrame(rows, FIX_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    stream = (
        spark.readStream.schema(FIX_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    kin = streaming.streaming_kinematics(stream, **kw)
    q = streaming.run_to_memory(kin, name, output_mode="append")
    try:
        q.processAllAvailable()
        return {
            (r["entity_id"], r["ts_us"]): (
                r["dt_us"], r["leg_mm"], r["speed_mmps"], r["accel_mmps2"],
                r["sector"],
            )
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()


def _batch_kin(spark, rows):
    df = spark.createDataFrame(rows, FIX_SCHEMA).select(
        "entity_id",
        F.unix_micros("event_time").alias("ts_us"),
        "lon",
        "lat",
    )
    return {
        (r["entity_id"], r["ts_us"]): (
            r["dt_us"], r["leg_mm"], r["speed_mmps"], r["accel_mmps2"],
            r["sector"],
        )
        for r in trajectory.kinematics(df).collect()
    }


def test_kinematics_batch_parity_across_batches(spark, tmp_path):
    """Per-fix derivative rows across 4 micro-batch splits equal the batch
    twin bit-for-bit (integer speeds/accels, comparison sectors)."""
    rng = random.Random(47)
    real = []
    for eid in (1, 2, 3):
        m = 0.0
        for _ in range(rng.randint(8, 14)):
            real.append(
                _fix(eid, m, rng.uniform(-10, 10), rng.uniform(40, 50))
            )
            m += rng.uniform(0.5, 20)
    real.sort(key=lambda r: r[1])
    cut1, cut2, cut3 = len(real) // 4, len(real) // 2, 3 * len(real) // 4
    batches = [real[:cut1], real[cut1:cut2], real[cut2:cut3], real[cut3:]]
    got = _run_kin_stream(spark, tmp_path, batches)
    want = _batch_kin(spark, real)
    assert got == want


def test_kinematics_stream_edges(spark, tmp_path):
    """Zero-move fix (speed 0, sector NULL) and axis/diagonal sectors match
    batch; first fix emits NULL derivatives."""
    rows = [
        _fix(1, 0, 10.0, 20.0),
        _fix(1, 1, 10.0, 20.0),   # no move
        _fix(1, 2, 11.0, 20.0),   # east -> 0
        _fix(1, 3, 11.0, 21.0),   # north -> 2
        _fix(1, 4, 12.0, 22.0),   # NE diagonal -> 1
    ]
    got = _run_kin_stream(spark, tmp_path, [rows[:2], rows[2:]])
    want = _batch_kin(spark, rows)
    assert got == want
    base_us = int(rows[0][1].timestamp() * 1_000_000)
    assert got[(1, base_us)] == (None, None, None, None, None)
    assert got[(1, base_us + 60_000_000)][4] is None  # zero-move sector
    assert [got[(1, base_us + m * 60_000_000)][4] for m in (2, 3, 4)] == [0, 2, 1]


def test_kinematics_state_expiry_restarts(spark, tmp_path):
    """An entity idle past expire_minutes is GC'd: its next fix restarts with
    NULL derivatives (batch, seeing all history, would compute values — the
    documented divergence); a sentinel advances the watermark past expiry."""
    early = [_fix(1, 0, 10.0, 20.0), _fix(1, 10, 10.1, 20.0)]
    # watermark mover: far-future fix on another entity
    mover = [_fix(99, 10 * 24 * 60, 0.0, 0.0)]
    late = [_fix(1, 10 * 24 * 60 + 30, 10.2, 20.0)]
    got = _run_kin_stream(
        spark, tmp_path, [early, mover, late],
        watermark="0 minutes", expire_minutes=60.0,
    )
    late_us = int(late[0][1].timestamp() * 1_000_000)
    # restarted: NULL derivatives despite the entity's earlier history
    assert got[(1, late_us)] == (None, None, None, None, None)
    # the pre-expiry fixes still produced their parity rows
    early2_us = int(early[1][1].timestamp() * 1_000_000)
    assert got[(1, early2_us)][0] == 10 * 60_000_000
