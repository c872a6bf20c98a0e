"""Trajectory similarity join vs independent pure-Python oracles + the
DuckDB brute-force Hausdorff twin."""

import math
import random

import duckdb
import numpy as np
import pytest

from engine import trajsim


def _py_hausdorff(A, B):
    def directed(X, Y):
        return max(min((x1 - x2) ** 2 + (y1 - y2) ** 2 for x2, y2 in Y) for x1, y1 in X)

    return math.sqrt(max(directed(A, B), directed(B, A)))


def _py_frechet(A, B):
    n, m = len(A), len(B)
    ca = [[-1.0] * m for _ in range(n)]

    def d2(i, j):
        return (A[i][0] - B[j][0]) ** 2 + (A[i][1] - B[j][1]) ** 2

    def rec(i, j):
        if ca[i][j] >= 0:
            return ca[i][j]
        if i == 0 and j == 0:
            ca[i][j] = d2(0, 0)
        elif i == 0:
            ca[i][j] = max(rec(0, j - 1), d2(0, j))
        elif j == 0:
            ca[i][j] = max(rec(i - 1, 0), d2(i, 0))
        else:
            ca[i][j] = max(
                min(rec(i - 1, j), rec(i - 1, j - 1), rec(i, j - 1)), d2(i, j)
            )
        return ca[i][j]

    import sys

    sys.setrecursionlimit(100000)
    return math.sqrt(rec(n - 1, m - 1))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_numpy_kernels_match_python(seed):
    rng = random.Random(seed)
    A = [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(rng.randint(2, 20))]
    B = [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(rng.randint(2, 20))]
    An, Bn = np.array(A), np.array(B)
    assert math.sqrt(trajsim.np_hausdorff2(An, Bn)) == pytest.approx(
        _py_hausdorff(A, B), abs=1e-12
    )
    assert math.sqrt(trajsim.np_frechet2(An, Bn)) == pytest.approx(
        _py_frechet(A, B), abs=1e-12
    )


def test_frechet_diag_exact_parity_with_scalar_dp():
    """The shipped anti-diagonal wavefront kernel must equal the scalar
    Eiter-Mannila DP bit-for-bit (both compute the same max/min over the
    same float64 d2 values — no tolerance needed), including degenerate
    1-point trips."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        n, m = rng.integers(1, 60, 2)
        A = rng.normal(size=(int(n), 2)).cumsum(axis=0)
        B = rng.normal(size=(int(m), 2)).cumsum(axis=0)
        if n >= 2 and m >= 2:
            assert trajsim.np_frechet2(A, B) == trajsim.np_frechet2_dp(A, B)
        else:
            # scalar DP twin assumes >=2 points; check the degenerate
            # running-max closed form against the recursive oracle
            got = math.sqrt(trajsim.np_frechet2(A, B))
            want = _py_frechet([tuple(p) for p in A], [tuple(p) for p in B])
            assert got == pytest.approx(want, abs=1e-12)


def _make_trips(rng, n_trips=14, jitter=0.05):
    """Random-walk trips; every even trip has a jittered near-duplicate at
    id+1 (planted similar pairs) placed in distinct neighborhoods."""
    trips = []  # rows (trip_id, seq, x, y)
    for t in range(0, n_trips, 2):
        ox, oy = (t // 2) * 40.0, 0.0
        x, y = ox, oy
        base = []
        for s in range(rng.randint(5, 12)):
            x += rng.uniform(-2, 2)
            y += rng.uniform(-2, 2)
            base.append((x, y))
        for s, (px, py) in enumerate(base):
            trips.append((t, s, round(px, 4), round(py, 4)))
            trips.append(
                (t + 1, s,
                 round(px + rng.uniform(-jitter, jitter), 4),
                 round(py + rng.uniform(-jitter, jitter), 4))
            )
    return trips


def _brute_pairs(trips, threshold, metric):
    by_t = {}
    for tid, s, x, y in trips:
        by_t.setdefault(tid, []).append((s, x, y))
    pts = {t: [(x, y) for _, x, y in sorted(v)] for t, v in by_t.items()}
    fn = _py_hausdorff if metric == "hausdorff" else _py_frechet
    out = {}
    ids = sorted(pts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = fn(pts[ids[i]], pts[ids[j]])
            if d <= threshold:
                out[(ids[i], ids[j])] = d
    return out


@pytest.mark.parametrize("metric", ["hausdorff", "frechet"])
def test_similar_trips_matches_bruteforce(spark, metric):
    rng = random.Random(7)
    trips = _make_trips(rng)
    df = spark.createDataFrame(trips, "trip_id long, seq long, x double, y double")
    got = {
        (r["trip_a"], r["trip_b"]): r["dist"]
        for r in trajsim.similar_trips(df, threshold=1.0, metric=metric).collect()
    }
    want = _brute_pairs(trips, 1.0, metric)
    assert set(got) == set(want)
    assert len(got) >= 7  # the planted jittered twins all qualify
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_frechet_order_aware_hausdorff_not(spark):
    # a straight path and its REVERSE: Hausdorff 0, Fréchet = path length
    fwd = [(1, s, float(s), 0.0) for s in range(6)]
    rev = [(2, s, float(5 - s), 0.0) for s in range(6)]
    df = spark.createDataFrame(fwd + rev, "trip_id long, seq long, x double, y double")
    h = trajsim.similar_trips(df, threshold=0.5, metric="hausdorff").collect()
    f = trajsim.similar_trips(df, threshold=0.5, metric="frechet").collect()
    assert len(h) == 1 and h[0]["dist"] == 0.0
    assert f == []  # Fréchet distance is 5.0 — order matters


def test_duckdb_twin_parity(spark):
    rng = random.Random(11)
    trips = _make_trips(rng, n_trips=10)
    df = spark.createDataFrame(trips, "trip_id long, seq long, x double, y double")
    got = {
        (r["trip_a"], r["trip_b"]): (r["dist"], r["n_a"], r["n_b"])
        for r in trajsim.similar_trips(df, threshold=1.2).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({t}, {s}, {x}, {y})" for t, s, x, y in trips)
    sql = trajsim.hausdorff_pairs_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(trip_id, seq, x, y)", 1.2
    )
    want = {
        (ta, tb): (d, na, nb)
        for ta, tb, d, na, nb in con.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-9)
        assert got[k][1:] == want[k][1:]


def test_blocking_excludes_far_trips(spark):
    # two trips 1000 apart: no candidate pair survives the bbox blocking
    a = [(1, s, float(s), 0.0) for s in range(5)]
    b = [(2, s, 1000.0 + s, 0.0) for s in range(5)]
    df = spark.createDataFrame(a + b, "trip_id long, seq long, x double, y double")
    assert trajsim.similar_trips(df, threshold=2.0).collect() == []


def test_max_points_guard(spark):
    """r6: the guard is woven into the plan (raise_error on the packed
    frame) instead of an eager driver agg, so it fires on materialization —
    including for an oversized trip that pairs with nothing."""
    rows = [(1, s, float(s), 0.0) for s in range(20)]
    df = spark.createDataFrame(rows, "trip_id long, seq long, x double, y double")
    with pytest.raises(Exception, match="max_points"):
        trajsim.similar_trips(df, threshold=1.0, max_points=10).collect()
