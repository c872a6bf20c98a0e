"""engine.matching: nearest-segment snap + route compression vs Python."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from engine import matching
from tests.conftest import spark  # noqa: F401


def _py_snap(fix, segs, radius):
    """fix=(x, y); segs=[(line_id, seg_idx, ax, ay, bx, by)] -> best row or
    None, tie-break (dist2, line_id, seg_idx)."""
    px, py = fix
    best = None
    for lid, si, ax, ay, bx, by in segs:
        vx, vy = bx - ax, by - ay
        den = vx * vx + vy * vy
        t = 0.0 if den == 0 else max(0.0, min(1.0, ((px - ax) * vx + (py - ay) * vy) / den))
        qx, qy = ax + t * vx, ay + t * vy
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        if d2 <= radius * radius:
            k = (d2, lid, si)
            if best is None or k < best[0]:
                best = (k, (lid, si, t, qx, qy, d2))
    return None if best is None else best[1]


def _segs_of(lines):
    out = []
    for lid, pts in lines:
        for i in range(len(pts) - 1):
            out.append((lid, i, *pts[i], *pts[i + 1]))
    return out


def _mk_lines(spark, lines):
    return spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in pts]) for lid, pts in lines],
        "line_id long, pts array<struct<x:double,y:double>>",
    )


@pytest.mark.parametrize("plan", ["array", "window"])
def test_snap_matches_python_oracle(spark, plan):
    rng = random.Random(8)
    lines = []
    for lid in range(12):
        x0, y0 = rng.uniform(-40, 40), rng.uniform(-40, 40)
        pts = [(x0, y0)]
        for _ in range(rng.randint(1, 4)):
            x0 += rng.uniform(-15, 15)
            y0 += rng.uniform(-15, 15)
            pts.append((x0, y0))
        lines.append((lid, pts))
    fixes = [
        (i, rng.uniform(-45, 45), rng.uniform(-45, 45)) for i in range(400)
    ]
    radius = 6.0
    got = {
        r["fix_id"]: (
            r["line_id"], r["seg_idx"], r["t"],
            r["snap_x"], r["snap_y"], r["dist2"],
        )
        for r in matching.snap_to_segments(
            spark.createDataFrame(fixes, "fix_id long, x double, y double")
            .repartition(5),
            _mk_lines(spark, lines),
            radius,
            plan=plan,
        ).collect()
    }
    segs = _segs_of(lines)
    for fid, x, y in fixes:
        want = _py_snap((x, y), segs, radius)
        if want is None:
            assert fid not in got
        else:
            g = got[fid]
            assert g[0] == want[0] and g[1] == want[1], fid
            for a, b in zip(g[2:], want[2:]):
                assert a == pytest.approx(b, rel=1e-12, abs=1e-12)


def test_snap_degenerate_and_vertex(spark):
    # zero-length segment (duplicate vertex) + fix exactly on a vertex
    lines = [(1, [(0.0, 0.0), (0.0, 0.0), (10.0, 0.0)])]
    fixes = [(1, 0.0, 1.0), (2, 10.0, 0.0), (3, 5.0, -2.0)]
    got = {
        r["fix_id"]: r
        for r in matching.snap_to_segments(
            spark.createDataFrame(fixes, "fix_id long, x double, y double"),
            _mk_lines(spark, lines),
            3.0,
        ).collect()
    }
    assert got[1]["dist2"] == 1.0 and got[1]["seg_idx"] == 0  # tie-break: seg 0
    assert got[2]["dist2"] == 0.0 and got[2]["t"] == 1.0
    assert got[3]["snap_x"] == 5.0 and got[3]["snap_y"] == 0.0


def test_match_routes_compresses_and_counts(spark):
    # two roads: entity drives along road 10, cuts across (unmatched), then
    # along road 20, then BACK to road 10 -> route [10, 20, 10]
    lines = [
        (10, [(0.0, 0.0), (100.0, 0.0)]),
        (20, [(0.0, 50.0), (100.0, 50.0)]),
    ]
    minute = 60_000_000
    fixes = []
    for i, (x, y) in enumerate(
        [(0, 0.2), (10, 0.1), (20, 0.3),        # road 10
         (25, 25.0),                            # mid-crossing: no match
         (30, 49.8), (40, 50.2),                # road 20
         (50, 0.4)]                             # back on road 10
    ):
        fixes.append((7, (i + 1) * minute, float(x), float(y)))
    # second trip after a >30 min gap: only road 20
    fixes.append((7, 100 * minute, 50.0, 49.9))
    df = spark.createDataFrame(
        fixes, "entity_id long, ts_us long, x double, y double"
    ).repartition(3)
    got = {
        (r["entity_id"], r["trip_idx"]): r
        for r in matching.match_routes(
            df, _mk_lines(spark, lines), radius=2.0, gap_minutes=30.0
        ).collect()
    }
    t1 = got[(7, 1)]
    assert list(t1["route"]) == [10, 20, 10]
    assert t1["n_points"] == 7 and t1["n_matched"] == 6 and t1["steps"] == 3
    t2 = got[(7, 2)]
    assert list(t2["route"]) == [20]
    assert t2["n_points"] == 1 and t2["n_matched"] == 1


def test_match_routes_dropout_does_not_split_run(spark):
    # a radius dropout BETWEEN two fixes on the same road must not produce
    # a duplicate route step
    lines = [(5, [(0.0, 0.0), (100.0, 0.0)])]
    minute = 60_000_000
    fixes = [
        (1, 1 * minute, 10.0, 0.1),
        (1, 2 * minute, 20.0, 30.0),  # off-road blip
        (1, 3 * minute, 30.0, 0.1),
    ]
    df = spark.createDataFrame(
        fixes, "entity_id long, ts_us long, x double, y double"
    )
    (row,) = matching.match_routes(
        df, _mk_lines(spark, lines), radius=2.0
    ).collect()
    assert list(row["route"]) == [5]
    assert row["steps"] == 1 and row["n_matched"] == 2


def test_streaming_snap_equals_batch(spark, tmp_path):
    """plan='array' is stateless (stream-static join + projection, no
    window), so snap_to_segments runs UNCHANGED on a streaming fix source
    and must emit exactly the batch rows."""
    from engine import streaming

    rng = random.Random(15)
    lines = [(7, [(0.0, 0.0), (50.0, 10.0), (100.0, 0.0)]),
             (9, [(0.0, 30.0), (100.0, 30.0)])]
    fixes = [
        (i, rng.uniform(-5, 105), rng.uniform(-5, 40)) for i in range(300)
    ]
    schema = "fix_id long, x double, y double"
    d = str(tmp_path / "fixes_in")
    third = len(fixes) // 3
    for part in (fixes[:third], fixes[third:]):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    snapped = matching.snap_to_segments(
        stream, _mk_lines(spark, lines), radius=6.0
    )
    q = streaming.run_to_memory(snapped, "t_snap", output_mode="append")
    try:
        q.processAllAvailable()
        got = {
            tuple(r) for r in spark.sql("SELECT * FROM t_snap").collect()
        }
    finally:
        q.stop()
    want = {
        tuple(r)
        for r in matching.snap_to_segments(
            spark.createDataFrame(fixes, schema), _mk_lines(spark, lines),
            radius=6.0,
        ).collect()
    }
    assert got == want and len(got) > 50


def test_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "fix_id long, x double, y double")
    with pytest.raises(ValueError):
        matching.snap_to_segments(
            df, _mk_lines(spark, [(1, [(0.0, 0.0), (1.0, 1.0)])]), 0.0
        )
    with pytest.raises(ValueError):
        matching.snap_to_segments(
            df, _mk_lines(spark, [(1, [(0.0, 0.0), (1.0, 1.0)])]), 1.0,
            plan="nope",
        )


# ---------------------------------------------------------------- viterbi


def _py_topk(fix, segs, radius, k):
    """All candidates within radius sorted by (d2, lid, sid), top k — the
    exact float ops of matching._proj (same IEEE order)."""
    px, py = fix
    cands = []
    for lid, si, ax, ay, bx, by in segs:
        vx, vy = bx - ax, by - ay
        den = vx * vx + vy * vy
        t = (
            0.0
            if den == 0
            else max(0.0, min(1.0, ((px - ax) * vx + (py - ay) * vy) / den))
        )
        qx, qy = ax + t * vx, ay + t * vy
        d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        if d2 <= radius * radius:
            cands.append((d2, lid, si, t, qx, qy))
    cands.sort(key=lambda c: (c[0], c[1], c[2]))
    return cands[:k]


def _py_viterbi(trip_fixes, segs, radius, k, sigma, beta):
    """Pure-Python replay of viterbi_match's recurrence over one trip:
    trip_fixes = [(ts, x, y)] time-ordered. Returns [(ts, lid, sid, t, qx,
    qy, d2)] for matched fixes. Bit-identical float order to the numpy
    kernel."""
    import math

    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    inv_b = 1.0 / beta
    cands = [_py_topk((x, y), segs, radius, k) for _, x, y in trip_fixes]
    out = []
    i, n = 0, len(trip_fixes)
    while i < n:
        if not cands[i]:
            i += 1
            continue
        j = i
        while j < n and cands[j]:
            j += 1
        score = [-c[0] * inv2s2 for c in cands[i]]
        bps = []
        for m in range(i + 1, j):
            dxf = trip_fixes[m][1] - trip_fixes[m - 1][1]
            dyf = trip_fixes[m][2] - trip_fixes[m - 1][2]
            dfix = math.sqrt(dxf * dxf + dyf * dyf)
            prev, cur = cands[m - 1], cands[m]
            bp, ns = [], []
            for cj, c in enumerate(cur):
                best_k, best_v = 0, None
                for pk, p in enumerate(prev):
                    dqx = c[4] - p[4]
                    dqy = c[5] - p[5]
                    dsnap = math.sqrt(dqx * dqx + dqy * dqy)
                    v = score[pk] - abs(dsnap - dfix) * inv_b
                    if best_v is None or v > best_v:  # first max wins ties
                        best_k, best_v = pk, v
                bp.append(best_k)
                ns.append(best_v - c[0] * inv2s2)
            bps.append(bp)
            score = ns
        st, best = 0, score[0]
        for si_, v in enumerate(score):
            if v > best:  # first max wins
                st, best = si_, v
        path = [st]
        for bp in reversed(bps):
            st = bp[st]
            path.append(st)
        path.reverse()
        for m, stt in enumerate(path):
            d2, lid, sid, t, qx, qy = cands[i + m][stt]
            out.append((trip_fixes[i + m][0], lid, sid, t, qx, qy, d2))
        i = j
    return out


def test_viterbi_matches_python_dp_oracle(spark):
    rng = random.Random(41)
    lines = []
    for lid in range(10):
        x0, y0 = rng.uniform(-40, 40), rng.uniform(-40, 40)
        pts = [(x0, y0)]
        for _ in range(rng.randint(1, 4)):
            x0 += rng.uniform(-15, 15)
            y0 += rng.uniform(-15, 15)
            pts.append((x0, y0))
        lines.append((lid, pts))
    segs = _segs_of(lines)
    # random walks: 30 entities, 5-25 fixes each, occasional big time gap
    rows, expected = [], []
    radius, k, gap_min = 7.0, 4, 30.0
    sigma, beta = radius / 2.0, radius
    for ent in range(30):
        ts = rng.randint(0, 10**9)
        x, y = rng.uniform(-45, 45), rng.uniform(-45, 45)
        fixes = []
        for _ in range(rng.randint(5, 25)):
            ts += rng.randint(1, 25 * 60) * 1_000_000
            if rng.random() < 0.08:
                ts += 3 * 30 * 60 * 1_000_000  # force a trip split
            x += rng.uniform(-6, 6)
            y += rng.uniform(-6, 6)
            fixes.append((ts, x, y))
            rows.append((ent, ts, x, y))
        # oracle: split into trips by the gap rule, DP each
        fixes.sort()
        gap_us = int(gap_min * 60e6)
        trip, tidx, prev = [], 1, None
        trips = []
        for f in fixes:
            if prev is not None and f[0] - prev > gap_us:
                trips.append((tidx, trip))
                tidx += 1
                trip = []
            trip.append(f)
            prev = f[0]
        trips.append((tidx, trip))
        for tidx, tf in trips:
            for r in _py_viterbi(tf, segs, radius, k, sigma, beta):
                expected.append((ent, tidx, *r))

    fixes_df = spark.createDataFrame(
        rows, "entity_id long, ts_us long, x double, y double"
    )
    got = matching.viterbi_match(
        fixes_df, _mk_lines(spark, lines), radius,
        gap_minutes=gap_min, k=k,
    ).collect()
    got_set = {
        (r.entity_id, r.trip_idx, r.ts_us, r.line_id, r.seg_idx,
         r.t, r.snap_x, r.snap_y, r.dist2)
        for r in got
    }
    exp_set = set(expected)
    assert got_set == exp_set
    assert len(got) == len(expected)


def test_viterbi_continuity_beats_nearest_snap(spark):
    # two parallel roads; one noisy fix is NEARER the other road, but the
    # trajectory is clearly following road 0 — viterbi keeps it there,
    # nearest-snap flips.
    lines = [(0, [(0.0, 0.0), (100.0, 0.0)]), (1, [(0.0, 3.0), (100.0, 3.0)])]
    rows = []
    for i in range(9):
        y = 1.9 if i == 4 else 0.2  # fix 4 is 1.7 from road 0, 1.1 from road 1
        rows.append((1, (i + 1) * 60_000_000, 10.0 * i, y))
    fixes = spark.createDataFrame(
        rows, "entity_id long, ts_us long, x double, y double"
    )
    roads = _mk_lines(spark, lines)
    # beta=1: strict route-discrepancy penalty (default beta=radius is too
    # lax to hold parallel-road continuity — |dsnap-dfix| barely moves when
    # roads run parallel, which is the documented limit of the no-routing
    # transition proxy)
    vit = matching.viterbi_match(fixes, roads, radius=5.0, beta=1.0).collect()
    assert len(vit) == 9
    assert {r.line_id for r in vit} == {0}
    snap = matching.snap_to_segments(
        fixes.withColumn("fid", F.col("ts_us")), roads, radius=5.0,
        fix_id="fid",
    ).collect()
    flip = [r for r in snap if r.line_id == 1]
    assert len(flip) == 1  # nearest-snap does flip on the noisy fix


def test_viterbi_single_fix_equals_snap(spark):
    lines = [(7, [(0.0, 0.0), (10.0, 10.0)]), (3, [(5.0, 0.0), (5.0, 10.0)])]
    fixes = spark.createDataFrame(
        [(1, 1_000_000, 4.0, 3.0)],
        "entity_id long, ts_us long, x double, y double",
    )
    roads = _mk_lines(spark, lines)
    vit = matching.viterbi_match(fixes, roads, radius=6.0).collect()
    snap = _py_snap((4.0, 3.0), _segs_of(lines), 6.0)
    assert len(vit) == 1
    r = vit[0]
    assert (r.line_id, r.seg_idx, r.t, r.snap_x, r.snap_y, r.dist2) == snap
    assert r.trip_idx == 1


def test_viterbi_unmatched_fix_breaks_chain_and_emits_nothing(spark):
    lines = [(0, [(0.0, 0.0), (100.0, 0.0)])]
    rows = [
        (1, 1 * 60_000_000, 10.0, 0.5),
        (1, 2 * 60_000_000, 20.0, 50.0),  # far from any road
        (1, 3 * 60_000_000, 30.0, 0.5),
    ]
    fixes = spark.createDataFrame(
        rows, "entity_id long, ts_us long, x double, y double"
    )
    vit = matching.viterbi_match(
        fixes, _mk_lines(spark, lines), radius=3.0
    ).collect()
    assert sorted(r.ts_us for r in vit) == [60_000_000, 180_000_000]
    assert all(r.trip_idx == 1 for r in vit)  # no-candidate fix splits the
    # DP run but NOT the trip


def test_viterbi_validates_args(spark):
    lines = _mk_lines(spark, [(0, [(0.0, 0.0), (1.0, 0.0)])])
    fixes = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "entity_id long, ts_us long, x double, y double"
    )
    with pytest.raises(ValueError):
        matching.viterbi_match(fixes, lines, radius=0.0)
    with pytest.raises(ValueError):
        matching.viterbi_match(fixes, lines, radius=1.0, k=0)
    with pytest.raises(ValueError):
        matching.viterbi_match(fixes, lines, radius=1.0, sigma=-1.0)
