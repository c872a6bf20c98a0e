"""engine.trajectory: trip segmentation + dwell episodes vs Python oracles."""

import math
import random

import pytest

from engine import trajectory
from tests.conftest import spark  # noqa: F401

MIN = 60_000_000  # one minute in micros


def _hav_m(lon1, lat1, lon2, lat2):
    r = 6371008.8
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def _py_trips(rows, gap_min):
    """rows: (id, ts, lon, lat) -> {(id, trip_idx): (start, end, n, length_mm)}"""
    gap = int(gap_min * MIN)
    by_id = {}
    for eid, ts, lon, lat in rows:
        by_id.setdefault(eid, []).append((ts, lon, lat))
    out = {}
    for eid, pts in by_id.items():
        pts.sort()
        trip, prev = 0, None
        for ts, lon, lat in pts:
            if prev is None or ts - prev[0] > gap:
                trip += 1
                leg = 0
            else:
                leg = math.floor(_hav_m(prev[1], prev[2], lon, lat) * 1000)
            k = (eid, trip)
            s, e, n, ln = out.get(k, (ts, ts, 0, 0))
            out[k] = (min(s, ts), max(e, ts), n + 1, ln + leg)
            prev = (ts, lon, lat)
    return out


def _mk_rows(rng, n_entities=6, n_points=80):
    rows = []
    for eid in range(n_entities):
        ts = rng.randrange(10**9)
        lon, lat = rng.uniform(-170, 170), rng.uniform(-80, 80)
        for _ in range(n_points):
            # mixture of small steps and occasional big time gaps
            ts += rng.choice([MIN, 2 * MIN, 5 * MIN, 90 * MIN])
            lon += rng.uniform(-0.01, 0.01)
            lat += rng.uniform(-0.01, 0.01)
            rows.append((eid, ts, lon, lat))
    return rows


def test_trips_match_python_oracle(spark):
    rng = random.Random(21)
    rows = _mk_rows(rng)
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    got = {
        (r["entity_id"], r["trip_idx"]): (
            r["start_us"], r["end_us"], r["n_points"], r["length_mm"]
        )
        for r in trajectory.trip_segments(df.repartition(5), gap_minutes=30).collect()
    }
    assert got == _py_trips(rows, 30)


def test_trips_duration_and_single_point(spark):
    rows = [
        (1, 0, 0.0, 0.0),
        (1, 10 * MIN, 0.1, 0.0),       # same trip (gap 10 <= 30)
        (1, 100 * MIN, 0.2, 0.0),      # new trip (gap 90 > 30)
    ]
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    out = {r["trip_idx"]: r for r in trajectory.trip_segments(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_points"] == 2 and out[1]["duration_us"] == 10 * MIN
    assert out[1]["length_mm"] == math.floor(_hav_m(0.0, 0.0, 0.1, 0.0) * 1000)
    assert out[2]["n_points"] == 1 and out[2]["length_mm"] == 0
    assert out[2]["duration_us"] == 0


def test_trips_sql_twin_matches(spark):
    import duckdb

    rng = random.Random(22)
    rows = _mk_rows(rng, n_entities=4, n_points=50)
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    got = sorted(
        tuple(r) for r in trajectory.trip_segments(df, gap_minutes=45).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(entity_id BIGINT, ts_us BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            trajectory.trip_segments_sql("t", "entity_id", "ts_us", "lon", "lat", 45)
        ).fetchall()
    )
    assert got == want  # exact, incl. the FLOOR-scaled length_mm


def test_dwell_episode_detected(spark):
    # stay 20 min at one spot (1 m jitter ~ slow), then jump 1 km per min
    deg_1m = 1.0 / 111_320  # ~1 meter of latitude
    rows = [(1, i * MIN, 0.0, i * deg_1m * 0.3) for i in range(21)]
    rows += [(1, (21 + i) * MIN, 0.0, 0.01 * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    eps = trajectory.dwell_episodes(
        df, speed_mps_max=0.5, min_duration_minutes=5
    ).collect()
    assert len(eps) == 1
    ep = eps[0]
    assert ep["start_us"] == 0
    assert ep["end_us"] == 20 * MIN
    assert ep["n_points"] == 21


def test_dwell_short_stops_filtered(spark):
    # 3-minute pause under a 5-minute floor: no episode
    deg_1m = 1.0 / 111_320
    rows = [(1, i * MIN, 0.0, i * deg_1m * 0.2) for i in range(4)]
    rows += [(1, (4 + i) * MIN, 0.0, 0.02 * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    assert trajectory.dwell_episodes(
        df, speed_mps_max=0.5, min_duration_minutes=5
    ).count() == 0


def test_dwell_zero_dt_counts_slow(spark):
    # duplicate timestamps with tiny move: zero-dt legs are slow by definition
    rows = [(1, 0, 0.0, 0.0), (1, 0, 0.0, 1e-9), (1, 10 * MIN, 0.0, 2e-9)]
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, lon double, lat double")
    eps = trajectory.dwell_episodes(
        df, speed_mps_max=0.5, min_duration_minutes=5
    ).collect()
    assert len(eps) == 1 and eps[0]["duration_us"] == 10 * MIN


# ---------------------------------------------------------------------------
# colocation_pairs (spatiotemporal rendezvous join)
# ---------------------------------------------------------------------------
def _py_coloc(fixes, r, gap):
    out = {}
    for i in range(len(fixes)):
        for j in range(i + 1, len(fixes)):
            (ea, ta, xa, ya), (eb, tb, xb, yb) = fixes[i], fixes[j]
            if ea == eb or abs(ta - tb) > gap:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 > r * r:
                continue
            k = (min(ea, eb), max(ea, eb))
            e = out.setdefault(k, [0, 1 << 62, -1, float("inf")])
            e[0] += 1
            e[1] = min(e[1], min(ta, tb))
            e[2] = max(e[2], max(ta, tb))
            e[3] = min(e[3], d2)
    return {k: tuple(v) for k, v in out.items()}


def _run_coloc(spark, fixes, r, gap):
    df = spark.createDataFrame(
        fixes, "entity_id long, ts_us long, x double, y double"
    ).repartition(5)
    return {
        (row["entity_a"], row["entity_b"]): (
            row["n_meetings"], row["first_us"], row["last_us"], row["min_d2"],
        )
        for row in trajectory.colocation_pairs(df, r, gap).collect()
    }


def test_colocation_matches_brute_force(spark):
    rng = random.Random(19)
    fixes = [
        (rng.randint(1, 6), rng.randint(0, 5000),
         round(rng.uniform(0, 20), 3), round(rng.uniform(0, 20), 3))
        for _ in range(300)
    ]
    got = _run_coloc(spark, fixes, 2.5, 700)
    want = _py_coloc(fixes, 2.5, 700)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert got[k][3] == pytest.approx(want[k][3], rel=1e-12)


def test_colocation_boundaries_and_blocks(spark):
    # exactly at radius and exactly at gap both count (<=); one tick over
    # does not; pairs crossing block boundaries are found exactly once
    fixes = [
        (1, 1000, 0.0, 0.0),
        (2, 2000, 3.0, 4.0),   # d = 5.0 exactly, dt = 1000 exactly
        (3, 3001, 0.0, 0.0),   # dt to e1 = 2001 > 2000: excluded
        (4, 1000, -5.0001, 0.0),  # d > 5 from e1 (and far from e2)
    ]
    got = _run_coloc(spark, fixes, 5.0, 1000)
    # only e1-e2 qualifies: e2-e3 dt=1001 and e1-e4 d=5.0001 are one tick over
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == (1, 1000, 2000, 25.0)


def test_colocation_planted_rendezvous(spark):
    # two entities walk together for 5 fixes, a third is far away
    fixes = []
    for i in range(5):
        fixes.append((10, i * 100, float(i), 0.0))
        fixes.append((20, i * 100 + 1, float(i) + 0.1, 0.1))
        fixes.append((30, i * 100, float(i) + 1000.0, 0.0))
    got = _run_coloc(spark, fixes, 1.0, 50)
    assert set(got) == {(10, 20)}
    n, first, last, d2 = got[(10, 20)]
    assert n == 5 and first == 0 and last == 401
    assert d2 == pytest.approx(0.02)


def test_colocation_validation(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "entity_id long, ts_us long, x double, y double"
    )
    with pytest.raises(ValueError):
        trajectory.colocation_pairs(df, 0.0, 10)
    with pytest.raises(ValueError):
        trajectory.colocation_pairs(df, 1.0, 0)


def test_od_matrix_matches_duckdb_twin(spark):
    import duckdb
    import random

    from engine import trajectory

    rng = random.Random(17)
    rows = []
    for eid in range(1, 9):
        t = 0
        for _ in range(30):
            t += rng.choice([60, 120, 40 * 60_000_000])  # some gap breaks
            rows.append(
                (eid, t, round(rng.uniform(0, 100), 3), round(rng.uniform(0, 60), 3))
            )
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, x double, y double")
    got = {
        (r["o_zone"], r["d_zone"]): (r["n_trips"], r["n_entities"], r["sum_duration_us"])
        for r in trajectory.od_matrix(df, cell_size=25.0, gap_minutes=30.0).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({e}, {t}, {x}, {y})" for e, t, x, y in rows)
    want = {
        (o, d): (nt, ne, sd)
        for o, d, nt, ne, sd in con.execute(
            trajectory.od_matrix_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(entity_id, ts_us, x, y)",
                25.0, gap_minutes=30.0,
            )
        ).fetchall()
    }
    assert got == want
    assert len(got) > 3


def test_od_matrix_structure(spark):
    from engine import trajectory

    # one entity, two trips: (0,0) -> (26,0) then after a gap (60,0) -> (0,0)
    rows = [
        (1, 0, 0.0, 0.0), (1, 60_000_000, 26.0, 0.0),
        (1, 10**12, 60.0, 0.0), (1, 10**12 + 60_000_000, 0.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "entity_id long, ts_us long, x double, y double")
    got = {
        (r["o_zone"], r["d_zone"]): r["n_trips"]
        for r in trajectory.od_matrix(df, cell_size=25.0).collect()
    }
    assert got == {("0:0", "1:0"): 1, ("2:0", "0:0"): 1}


def _py_resample(rows, iv, max_gap=None):
    """Oracle: exact integer interpolation with Python floor division.
    rows: (id, ts, lon, lat); returns {(id, t): (lon_e6, lat_e6)}."""
    by_id = {}
    for eid, ts, lon, lat in rows:
        by_id.setdefault(eid, []).append((ts, lon, lat))
    out = {}
    for eid, pts in by_id.items():
        pts.sort()
        prev = None
        for ts, lon, lat in pts:
            e6 = (math.floor(lon * 1e6), math.floor(lat * 1e6))
            if prev is None:
                if ts % iv == 0:
                    out[(eid, ts)] = e6
            else:
                pts0, p_e6 = prev
                if max_gap is None or ts - pts0 <= max_gap:
                    k = pts0 // iv + 1
                    while k * iv <= ts:
                        t = k * iv
                        out[(eid, t)] = tuple(
                            c0 + ((c1 - c0) * (t - pts0)) // (ts - pts0)
                            for c0, c1 in zip(p_e6, e6)
                        )
                        k += 1
            prev = (ts, e6)
    return out


def test_resample_matches_python_oracle(spark):
    rng = random.Random(31)
    rows = _mk_rows(rng, n_entities=5, n_points=60)
    # force an epoch-aligned first fix + duplicate timestamps on one entity
    rows.append((99, 5 * MIN, 10.0, 20.0))
    rows.append((99, 5 * MIN + 90, 10.001, 20.001))
    rows.append((99, 5 * MIN + 90, 10.002, 19.999))
    rows.append((99, 8 * MIN + 7, 10.5, 20.5))
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    got = {
        (r["entity_id"], r["ts_us"]): (r["lon_e6"], r["lat_e6"])
        for r in trajectory.resample_fixes(df, interval_us=MIN).collect()
    }
    assert got == _py_resample(rows, MIN)
    assert (99, 5 * MIN) in got  # aligned first fix emits itself
    assert got[(99, 5 * MIN)] == (10_000_000, 20_000_000)
    # doubles derive from the integers
    out = trajectory.resample_fixes(df, interval_us=MIN).collect()
    assert all(r["lon"] == r["lon_e6"] / 1e6 for r in out)


def test_resample_max_gap_suppression(spark):
    rng = random.Random(32)
    rows = _mk_rows(rng, n_entities=4, n_points=40)
    gap = 10 * MIN
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    got = {
        (r["entity_id"], r["ts_us"]): (r["lon_e6"], r["lat_e6"])
        for r in trajectory.resample_fixes(
            df, interval_us=MIN, max_gap_us=gap
        ).collect()
    }
    want = _py_resample(rows, MIN, max_gap=gap)
    assert got == want
    # the 90-minute gaps in _mk_rows actually suppressed something
    assert len(got) < len(_py_resample(rows, MIN))


def test_resample_sql_twin_matches(spark):
    import duckdb

    rng = random.Random(33)
    rows = _mk_rows(rng, n_entities=4, n_points=50)
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    for kw in ({}, {"max_gap_us": 10 * MIN}):
        got = sorted(
            tuple(r)
            for r in trajectory.resample_fixes(
                df, interval_us=MIN, **kw
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t(entity_id BIGINT, ts_us BIGINT, lon DOUBLE, lat DOUBLE)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in con.execute(
                trajectory.resample_fixes_sql(
                    "t", "entity_id", "ts_us", "lon", "lat",
                    interval_us=MIN, **kw
                )
            ).fetchall()
        )
        assert got == want


def test_resample_validation(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "entity_id long, ts_us long, lon double, lat double"
    )
    with pytest.raises(ValueError):
        trajectory.resample_fixes(df, interval_us=0)


# ---------------------------------------------------------------------------
# kinematics (per-fix speed / acceleration / direction sector)
# ---------------------------------------------------------------------------
def _py_sector(dlon, dlat):
    if dlon > 0 and dlat >= 0 and dlat < dlon:
        return 0
    if dlon > 0 and dlat > 0 and dlat >= dlon:
        return 1
    if dlon <= 0 and dlat > 0 and -dlon < dlat:
        return 2
    if dlon < 0 and dlat > 0 and dlat <= -dlon:
        return 3
    if dlon < 0 and dlat <= 0 and -dlat < -dlon:
        return 4
    if dlon < 0 and dlat < 0 and -dlat >= -dlon:
        return 5
    if dlon >= 0 and dlat < 0 and dlon < -dlat:
        return 6
    if dlon > 0 and dlat < 0 and dlon >= -dlat:
        return 7
    return None  # zero displacement


def _py_kinematics(rows):
    """rows: (id, ts, lon, lat) -> {(id, ts): (dt, leg_mm, speed, accel, sector)}
    (test rows keep (id, ts) unique so the key is unambiguous)."""
    by_id = {}
    for eid, ts, lon, lat in rows:
        by_id.setdefault(eid, []).append((ts, lon, lat))
    out = {}
    for eid, pts in by_id.items():
        pts.sort()
        prev = None
        prev_speed = None
        for ts, lon, lat in pts:
            if prev is None:
                out[(eid, ts)] = (None, None, None, None, None)
                prev, prev_speed = (ts, lon, lat), None
                continue
            dt = ts - prev[0]
            leg = math.floor(_hav_m(prev[1], prev[2], lon, lat) * 1000)
            speed = (leg * 1_000_000) // dt if dt > 0 else None
            accel = (
                ((speed - prev_speed) * 1_000_000) // dt
                if speed is not None and prev_speed is not None and dt > 0
                else None
            )
            sector = _py_sector(lon - prev[1], lat - prev[2])
            out[(eid, ts)] = (dt, leg, speed, accel, sector)
            prev, prev_speed = (ts, lon, lat), speed
    return out


def test_kinematics_matches_python_oracle(spark):
    rng = random.Random(33)
    rows = _mk_rows(rng)
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    ).repartition(7)
    got = {
        (r["entity_id"], r["ts_us"]): (
            r["dt_us"], r["leg_mm"], r["speed_mmps"], r["accel_mmps2"],
            r["sector"],
        )
        for r in trajectory.kinematics(df).collect()
    }
    assert got == _py_kinematics(rows)


def test_kinematics_edges(spark):
    """First fix all-NULL derivatives; zero displacement -> NULL sector with
    speed 0; pure-axis moves hit the documented half-open sectors."""
    rows = [
        (1, 1000, 10.0, 20.0),   # first fix
        (1, 2000, 10.0, 20.0),   # no move: speed 0, sector NULL
        (1, 3000, 11.0, 20.0),   # due east -> sector 0
        (1, 4000, 11.0, 21.0),   # due north -> sector 2
        (1, 5000, 10.0, 21.0),   # due west -> sector 4
        (1, 6000, 10.0, 20.0),   # due south -> sector 6
        (1, 7000, 11.0, 21.0),   # exact NE diagonal -> sector 1
        (1, 8000, 10.0, 20.0),   # exact SW diagonal -> sector 5
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    got = {r["ts_us"]: r for r in trajectory.kinematics(df).collect()}
    assert got[1000]["dt_us"] is None and got[1000]["sector"] is None
    assert got[2000]["leg_mm"] == 0 and got[2000]["speed_mmps"] == 0
    assert got[2000]["sector"] is None
    assert [got[t]["sector"] for t in (3000, 4000, 5000, 6000, 7000, 8000)] \
        == [0, 2, 4, 6, 1, 5]
    # accel defined from the third fix on (needs two speeds)
    assert got[2000]["accel_mmps2"] is None
    assert got[3000]["accel_mmps2"] is not None


def test_kinematics_dup_ts_null_speed(spark):
    """dt = 0 (duplicate timestamp, lon/lat tie-broken order): speed and the
    following accel are NULL, never a division blowup."""
    rows = [
        (1, 1000, 10.0, 20.0),
        (1, 2000, 10.1, 20.0),
        (1, 2000, 10.2, 20.0),  # dup ts
        (1, 3000, 10.3, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    out = trajectory.kinematics(df).orderBy("ts_us", "lon").collect()
    dup = [r for r in out if r["ts_us"] == 2000 and r["dt_us"] == 0]
    assert len(dup) == 1 and dup[0]["speed_mmps"] is None
    assert dup[0]["accel_mmps2"] is None
    # the fix after the dup has a speed but no accel (prev speed is NULL)
    last = [r for r in out if r["ts_us"] == 3000][0]
    assert last["speed_mmps"] is not None and last["accel_mmps2"] is None


def test_kinematics_sql_twin_matches(spark):
    import duckdb

    rng = random.Random(44)
    rows = _mk_rows(rng, n_entities=4, n_points=60)
    # inject dup-ts and zero-move edges into the twin comparison too
    rows += [(99, 1000, 5.0, 5.0), (99, 1000, 5.5, 5.0), (99, 2000, 5.5, 5.0)]
    df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, lon double, lat double"
    )
    got = {
        (r["entity_id"], r["ts_us"], r["leg_mm"]): (
            r["dt_us"], r["speed_mmps"], r["accel_mmps2"], r["sector"]
        )
        for r in trajectory.kinematics(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fixes(entity_id BIGINT, ts_us BIGINT, lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO fixes VALUES (?, ?, ?, ?)", rows)
    want = {
        (r[0], r[1], r[3]): (r[2], r[4], r[5], r[6])
        for r in con.execute(trajectory.kinematics_sql(
            "fixes", "entity_id", "ts_us", "lon", "lat"
        )).fetchall()
    }
    assert got == want
