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
