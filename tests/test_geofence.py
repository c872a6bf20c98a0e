"""Geofence transitions: batch python-oracle parity, DuckDB twin parity,
streaming==batch parity, expiry semantics."""

import datetime as dt
import random

import duckdb
from pyspark.sql import functions as F

from engine import streaming, trajectory

RECTS = [
    (1, 0.0, 0.0, 10.0, 10.0),
    (2, 5.0, 5.0, 15.0, 15.0),   # overlaps zone 1
    (3, 20.0, 0.0, 30.0, 10.0),
]
FIX_SCHEMA = "entity_id long, event_time timestamp, x double, y double"
BASE = dt.datetime(2024, 3, 1)


def _zones_of(x, y):
    return sorted(
        z for z, x0, y0, x1, y1 in RECTS if x0 <= x <= x1 and y0 <= y <= y1
    )


def _py_oracle(fixes):
    """fixes: [(eid, ts_us, x, y)] -> set of (eid, ts_us, zone, event)."""
    out = set()
    by_e = {}
    for eid, t, x, y in sorted(fixes, key=lambda f: (f[0], f[1])):
        by_e.setdefault(eid, []).append((t, set(_zones_of(x, y))))
    for eid, seq in by_e.items():
        cur = set()
        for t, nxt in seq:
            for z in nxt - cur:
                out.add((eid, t, z, "enter"))
            for z in cur - nxt:
                out.add((eid, t, z, "exit"))
            cur = nxt
    return out


def _rand_fixes(rng, n_entities=4, n_fixes=40):
    fixes = []
    for eid in range(1, n_entities + 1):
        t = 0
        for _ in range(n_fixes):
            t += rng.randint(1, 1000) * 1_000_000
            fixes.append(
                (eid, t, round(rng.uniform(-2, 32), 3), round(rng.uniform(-2, 16), 3))
            )
    return fixes


def _labeled_df(spark, fixes):
    df = spark.createDataFrame(fixes, "entity_id long, ts_us long, x double, y double")
    return df.select(
        "entity_id", "ts_us",
        trajectory.rect_zones_expr(RECTS, "x", "y").alias("zones"),
    )


def test_batch_matches_python_oracle(spark):
    rng = random.Random(5)
    fixes = _rand_fixes(rng)
    got = {
        tuple(r)
        for r in trajectory.geofence_transitions(_labeled_df(spark, fixes)).collect()
    }
    assert got == _py_oracle(fixes)
    assert len(got) > 20  # the random walk actually crosses zones


def test_duckdb_twin_parity(spark):
    rng = random.Random(8)
    fixes = _rand_fixes(rng, n_entities=3, n_fixes=30)
    got = {
        tuple(r)
        for r in trajectory.geofence_transitions(_labeled_df(spark, fixes)).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(
        f"({e}, {t}, {list(_zones_of(x, y))})" for e, t, x, y in fixes
    )
    sql = trajectory.geofence_transitions_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(entity_id, ts_us, zones)"
    )
    want = set(con.execute(sql).fetchall())
    assert got == want


def test_null_and_empty_zones(spark):
    df = spark.createDataFrame(
        [(1, 100, None), (1, 200, [2, 1]), (1, 300, None)],
        "entity_id long, ts_us long, zones array<long>",
    )
    got = {tuple(r) for r in trajectory.geofence_transitions(df).collect()}
    assert got == {
        (1, 200, 1, "enter"), (1, 200, 2, "enter"),
        (1, 300, 1, "exit"), (1, 300, 2, "exit"),
    }


def _run_stream(spark, tmp_path, batches, name):
    d = str(tmp_path / "gf_in")
    for rows in batches:
        spark.createDataFrame(rows, FIX_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    stream = (
        spark.readStream.schema(FIX_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ev = streaming.streaming_geofence(stream, RECTS)
    q = streaming.run_to_memory(ev, name, output_mode="append")
    try:
        q.processAllAvailable()
        return {
            tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()


def test_streaming_matches_batch(spark, tmp_path):
    rng = random.Random(13)
    fixes = []
    for eid in (1, 2):
        m = 0.0
        for _ in range(25):
            m += rng.uniform(0.5, 3.0)
            fixes.append(
                (eid, BASE + dt.timedelta(minutes=m),
                 round(rng.uniform(-2, 32), 3), round(rng.uniform(-2, 16), 3))
            )
    fixes.sort(key=lambda r: r[1])
    cut = len(fixes) // 2
    batches = [fixes[:cut], fixes[cut:]]
    got = _run_stream(spark, tmp_path, batches, "t_geofence")
    want = _py_oracle(
        [
            (e, int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6), x, y)
            for e, t, x, y in fixes
        ]
    )
    assert got == want
    assert len(got) > 10


def test_expiry_gc_no_exit_and_reenter(spark, tmp_path):
    # entity 1 enters zone 1 then goes dark past expire; the sentinel
    # advances the watermark; NO exit is fabricated. When it reappears
    # inside zone 1 it re-enters.
    b1 = [(1, BASE, 5.0, 5.0)]                              # in zones 1+2
    # two sentinel batches: the first advances the watermark past entity
    # 1's timeout, the SECOND gives the engine a batch in which the timeout
    # actually fires (timeouts are processed at the batch after the
    # watermark passes them; a key with new data in that batch would be
    # folded as live instead)
    s1 = [(9, BASE + dt.timedelta(hours=13), 100.0, 100.0)]
    s2 = [(9, BASE + dt.timedelta(hours=14), 100.0, 100.0)]
    b3 = [(1, BASE + dt.timedelta(hours=26), 5.0, 2.0)]     # in zone 1 only
    got = _run_stream(spark, tmp_path, [b1, s1, s2, b3], "t_geofence_exp")
    t0 = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    t3 = t0 + 26 * 3600 * 1_000_000
    assert (1, t0, 1, "enter") in got and (1, t0, 2, "enter") in got
    # no exits ever emitted for the dark period
    assert not [e for e in got if e[0] == 1 and e[3] == "exit"]
    # re-enter after GC: zone 1 enters again at t3
    assert (1, t3, 1, "enter") in got


def test_polygon_zone_geofence_matches_rect_semantics(spark):
    # two rectangular POLYGON zones equivalent to rects; an entity walks
    # in -> overlap -> out; the pip-backed path must emit exactly what the
    # python oracle over rect membership says
    from engine import trajectory

    def rect_poly(pid, x0, y0, x1, y1):
        ring = [
            {"lon": x0, "lat": y0}, {"lon": x1, "lat": y0},
            {"lon": x1, "lat": y1}, {"lon": x0, "lat": y1},
        ]
        return (
            pid, ring,
            {"min": {"lon": x0, "lat": y0}, "max": {"lon": x1, "lat": y1}},
        )

    schema = (
        "poly_id long, ring array<struct<lon:double,lat:double>>, "
        "bbox struct<min:struct<lon:double,lat:double>,"
        "max:struct<lon:double,lat:double>>"
    )
    polys = spark.createDataFrame(
        [rect_poly(1, 0.0, 0.0, 10.0, 10.0), rect_poly(2, 5.0, 5.0, 15.0, 15.0)],
        schema,
    )
    walk = [
        (1, 100, -5.0, 2.0),   # outside
        (1, 200, 2.0, 2.0),    # zone 1
        (1, 300, 7.0, 7.0),    # zones 1+2
        (1, 400, 12.0, 12.0),  # zone 2
        (1, 500, 20.0, 20.0),  # outside
    ]
    fixes = spark.createDataFrame(
        walk, "entity_id long, ts_us long, lon double, lat double"
    )
    got = {
        tuple(r)
        for r in trajectory.geofence_transitions_pip(
            fixes, polys, res_min=2, res_max=5
        ).collect()
    }
    assert got == {
        (1, 200, 1, "enter"),
        (1, 300, 2, "enter"),
        (1, 400, 1, "exit"),
        (1, 500, 2, "exit"),
    }
