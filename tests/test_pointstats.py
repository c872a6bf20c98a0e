"""engine.pointstats: variogram + Ripley's K vs brute-force Python and
bit-exact DuckDB twins."""

import math
import random

import pytest

from engine import pointstats
from tests.conftest import spark  # noqa: F401


def _rand_points(rng, n, span=40.0, dup_every=0):
    pts = []
    for i in range(n):
        x = rng.uniform(0.0, span)
        y = rng.uniform(0.0, span)
        v = rng.randint(-50, 50)
        pts.append((i, x, y, v))
    if dup_every:
        # plant coincident distinct-id points (d2 == 0 pair path)
        for i in range(0, n, dup_every):
            pts.append((n + i, pts[i][1], pts[i][2], rng.randint(-50, 50)))
    return pts


def _mk_df(spark, pts):
    return spark.createDataFrame(
        pts, "id long, x double, y double, v long"
    )


def _py_variogram(pts, max_lag, n_bins):
    w = max_lag / n_bins
    bins = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            if a[0] > b[0]:
                a, b = b, a
            d2 = (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
            if d2 <= max_lag * max_lag:
                k = min(int(math.floor(math.sqrt(d2) / w)), n_bins - 1)
                c, s = bins.get(k, (0, 0))
                bins[k] = (c + 1, s + (a[3] - b[3]) ** 2)
    return {
        k: (c, s, s / (2.0 * c)) for k, (c, s) in sorted(bins.items())
    }


def test_variogram_matches_python_bruteforce(spark):
    rng = random.Random(71)
    pts = _rand_points(rng, 120, dup_every=17)
    got = pointstats.variogram(
        _mk_df(spark, pts).repartition(5), max_lag=15.0, n_bins=6
    ).collect()
    want = _py_variogram(pts, 15.0, 6)
    assert [r["bin"] for r in got] == list(want)
    for r in got:
        c, s, g = want[r["bin"]]
        assert (r["n_pairs"], r["sum_sq_dv"]) == (c, s)
        assert r["gamma"] == pytest.approx(g, rel=1e-12)
        assert r["lag_hi"] == pytest.approx(r["lag_lo"] + 15.0 / 6, rel=1e-12)


def test_variogram_duckdb_twin_exact(spark):
    import duckdb

    rng = random.Random(73)
    pts = _rand_points(rng, 90, dup_every=11)
    got = [
        tuple(r)
        for r in pointstats.variogram(
            _mk_df(spark, pts), max_lag=12.0, n_bins=5
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts_t(id BIGINT, x DOUBLE, y DOUBLE, v BIGINT)"
    )
    con.executemany("INSERT INTO pts_t VALUES (?, ?, ?, ?)", pts)
    want = con.execute(
        pointstats.variogram_sql("pts_t", 12.0, 5)
    ).fetchall()
    assert got == want  # bit-exact doubles incl. gamma


def test_variogram_exact_max_lag_boundary(spark):
    # a pair at EXACTLY max_lag must land in the last bin, not fall out
    pts = [(0, 0.0, 0.0, 0), (1, 3.0, 4.0, 10)]  # d = 5
    rows = pointstats.variogram(
        _mk_df(spark, pts), max_lag=5.0, n_bins=4
    ).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 3
    assert rows[0]["n_pairs"] == 1 and rows[0]["sum_sq_dv"] == 100
    # and strictly beyond max_lag is excluded
    rows2 = pointstats.variogram(
        _mk_df(spark, pts), max_lag=4.99, n_bins=4
    ).collect()
    assert rows2 == []


def _py_ripley(pts, max_r, n_r, area):
    step = max_r / n_r
    n = len(pts)
    slots = [0] * (n_r + 1)
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            if d2 <= max_r * max_r:
                s = max(int(math.ceil(math.sqrt(d2) / step)), 1)
                if s <= n_r:
                    slots[s] += 1
    out, cum = [], 0
    for k in range(1, n_r + 1):
        cum += slots[k]
        k_hat = area * (2.0 * cum) / (float(n) * (float(n) - 1.0))
        out.append((k * step, cum, k_hat, math.sqrt(k_hat / math.pi)))
    return out


def test_ripleys_k_matches_python_bruteforce(spark):
    rng = random.Random(79)
    pts = _rand_points(rng, 150, span=30.0, dup_every=29)
    got = pointstats.ripleys_k(
        _mk_df(spark, pts).repartition(4), max_r=10.0, n_r=5, area=900.0
    ).collect()
    want = _py_ripley(pts, 10.0, 5, 900.0)
    assert len(got) == 5
    for r, (wr, wc, wk, wl) in zip(got, want):
        assert r["n_pairs_le"] == wc
        assert r["r"] == pytest.approx(wr, rel=1e-12)
        assert r["k_hat"] == pytest.approx(wk, rel=1e-12)
        assert r["l_hat"] == pytest.approx(wl, rel=1e-12)


def test_ripleys_k_duckdb_twin_exact(spark):
    import duckdb

    rng = random.Random(83)
    pts = [(i, x, y) for i, x, y, _ in _rand_points(rng, 100, span=25.0)]
    got = [
        tuple(r)
        for r in pointstats.ripleys_k(
            spark.createDataFrame(pts, "id long, x double, y double"),
            max_r=8.0, n_r=6, area=625.0,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts_t(id BIGINT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO pts_t VALUES (?, ?, ?)", pts)
    want = con.execute(
        pointstats.ripleys_k_sql("pts_t", 8.0, 6, 625.0)
    ).fetchall()
    assert got == want  # bit-exact doubles incl. k_hat / l_hat


def test_ripleys_k_csr_vs_clustered(spark):
    # regular unit lattice: L(r) < r at r just under 1 (inhibition);
    # the same points collapsed into tight clumps: L(r) > r (clustering)
    m = 20
    lattice = [
        (iy * m + ix, float(ix), float(iy))
        for iy in range(m)
        for ix in range(m)
    ]
    df = spark.createDataFrame(lattice, "id long, x double, y double")
    area = float(m * m)
    (row,) = pointstats.ripleys_k(df, max_r=0.9, n_r=1, area=area).collect()
    assert row["n_pairs_le"] == 0 and row["l_hat"] == 0.0
    rng = random.Random(89)
    clumps = [
        (
            i,
            (i % 8) * 10.0 + rng.uniform(0, 0.3),
            (i % 8) * 10.0 + rng.uniform(0, 0.3),
        )
        for i in range(400)
    ]
    dfc = spark.createDataFrame(clumps, "id long, x double, y double")
    (rc,) = pointstats.ripleys_k(dfc, max_r=0.9, n_r=1, area=6400.0).collect()
    assert rc["l_hat"] > 0.9  # way above CSR at this radius


def test_lag_pairs_blocking_complete_across_cells(spark):
    # pairs straddling cell borders (cell size == max_lag) must be found:
    # brute-force count equality on a line of points spaced 0.6 * max_lag
    pts = [(i, 0.6 * 5.0 * i, 0.0, 0) for i in range(30)]
    df = _mk_df(spark, pts)
    got = pointstats.lag_pairs(df, 5.0, value_col="v").count()
    brute = sum(
        1
        for i in range(30)
        for j in range(i + 1, 30)
        if (0.6 * 5.0 * (j - i)) ** 2 <= 25.0
    )
    assert got == brute == 29  # only adjacent points qualify (0.6 < 1)


# ---------------------------------------------------------------------------
# Clark-Evans nearest-neighbor index + quadrat-count dispersion
# ---------------------------------------------------------------------------
def _py_nn_e6_sum(pts):
    tot = 0
    for i, (ida, xa, ya, _v) in enumerate(pts):
        best = None
        for j, (idb, xb, yb, _w) in enumerate(pts):
            if ida == idb:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if best is None or d2 < best:
                best = d2
        tot += math.floor(math.sqrt(best) * 1e6)
    return tot


def test_clark_evans_oracle_and_twin(spark):
    """Blocked NN (+ residue brute force) == python brute force on the int
    sum, and the whole summary row == the DuckDB twin bit for bit —
    including a far-away straggler that exercises the residue path."""
    import duckdb

    rng = random.Random(91)
    pts = _rand_points(rng, 80, span=30.0, dup_every=13)
    pts.append((9000, 500.0, 500.0, 0))  # NN ~666 away >> nn_radius
    df = _mk_df(spark, pts).repartition(5)
    got = pointstats.clark_evans(df, area=900.0, nn_radius=8.0).collect()[0]
    assert got["n"] == len(pts)
    assert got["sum_nnd_e6"] == _py_nn_e6_sum(pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts_t(id BIGINT, x DOUBLE, y DOUBLE, v BIGINT)")
    con.executemany("INSERT INTO pts_t VALUES (?, ?, ?, ?)", pts)
    want = con.execute(
        pointstats.clark_evans_sql("pts_t", 900.0)
    ).fetchall()[0]
    assert tuple(got) == want


def test_clark_evans_lattice_vs_clustered(spark):
    """Square lattice: every NN distance is the spacing -> R = 2 * spacing
    * sqrt(n / area) exactly (up to the e6 floor). All-coincident pairs:
    R = 0 exactly."""
    s = 5.0
    pts = [
        (y * 10 + x, x * s, y * s, 0) for x in range(10) for y in range(10)
    ]
    area = (10 * s) ** 2
    r = pointstats.clark_evans(
        _mk_df(spark, pts), area=area, nn_radius=7.0
    ).collect()[0]
    n = 100
    expect_r = (s) / (0.5 * math.sqrt(area / n))
    assert r["r_index"] == pytest.approx(expect_r, rel=1e-6)
    assert r["z"] > 10  # strongly regular
    dup = [(i, 3.0, 4.0, 0) for i in range(10)]
    r2 = pointstats.clark_evans(
        _mk_df(spark, dup), area=100.0, nn_radius=2.0
    ).collect()[0]
    assert r2["r_index"] == 0.0 and r2["sum_nnd_e6"] == 0


def _py_quadrat(pts, x0, y0, w, h, nx, ny):
    counts = {}
    out = 0
    for _i, x, y, _v in pts:
        if not (x0 <= x < x0 + w and y0 <= y < y0 + h):
            out += 1
            continue
        qx = min(int((x - x0) // (w / nx)), nx - 1)
        qy = min(int((y - y0) // (h / ny)), ny - 1)
        counts[(qx, qy)] = counts.get((qx, qy), 0) + 1
    n = sum(counts.values())
    ssq = sum(c * c for c in counts.values())
    return n, out, ssq


def test_quadrat_counts_oracle_and_twin(spark):
    import duckdb

    rng = random.Random(93)
    pts = _rand_points(rng, 150, span=50.0)  # span > window: outside rows
    df = _mk_df(spark, pts).repartition(4)
    got = pointstats.quadrat_counts(
        df, x0=5.0, y0=5.0, width=40.0, height=35.0, nx=4, ny=5
    ).collect()[0]
    n, out, ssq = _py_quadrat(pts, 5.0, 5.0, 40.0, 35.0, 4, 5)
    assert (got["n_points"], got["n_outside"], got["sum_sq"]) == (n, out, ssq)
    q = 20.0
    mean = n / q
    var = (ssq - n * n / q) / q
    assert got["vmr"] == pytest.approx(var / mean, rel=1e-12)
    assert got["chi2"] == pytest.approx(19.0 * var / mean, rel=1e-12)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts_t(id BIGINT, x DOUBLE, y DOUBLE, v BIGINT)")
    con.executemany("INSERT INTO pts_t VALUES (?, ?, ?, ?)", pts)
    want = con.execute(
        pointstats.quadrat_counts_sql("pts_t", 5.0, 5.0, 40.0, 35.0, 4, 5)
    ).fetchall()[0]
    assert tuple(got) == want


def test_quadrat_uniform_vs_clustered(spark):
    # one point dead center of every quadrat -> variance 0 -> vmr = chi2 = 0
    pts = [
        (y * 4 + x, x + 0.5, y + 0.5, 0) for x in range(4) for y in range(4)
    ]
    r = pointstats.quadrat_counts(
        _mk_df(spark, pts), 0.0, 0.0, 4.0, 4.0, 4, 4
    ).collect()[0]
    assert r["vmr"] == 0.0 and r["chi2"] == 0.0
    # everything in one quadrat -> vmr = Q - 1... with n=16, Q=16:
    # var = (256 - 16)/16 = 15, mean = 1 -> vmr = 15, chi2 = 225
    clus = [(i, 0.1 + 0.01 * i, 0.1, 0) for i in range(16)]
    r2 = pointstats.quadrat_counts(
        _mk_df(spark, clus), 0.0, 0.0, 4.0, 4.0, 4, 4
    ).collect()[0]
    assert r2["vmr"] == pytest.approx(15.0) and r2["chi2"] == pytest.approx(225.0)
    with pytest.raises(ValueError):
        pointstats.quadrat_counts(_mk_df(spark, pts), 0, 0, 4.0, 4.0, 0, 4)


# ---------------------------------------------------------------------------
# 2SFCA accessibility (supply/demand catchment scores)
# ---------------------------------------------------------------------------
def _py_2sfca(sup, dem, radius):
    r2 = radius * radius
    ratios = {}
    for sid, sx, sy, cap in sup:
        pop = sum(
            p for did, dx, dy, p in dem
            if (sx - dx) ** 2 + (sy - dy) ** 2 <= r2
        )
        if pop > 0:
            ratios[sid] = (sx, sy, math.floor(cap * 1e9 / pop))
    out = {}
    for did, dx, dy, _p in dem:
        tot = n = 0
        for sid, (sx, sy, r9) in ratios.items():
            if (sx - dx) ** 2 + (sy - dy) ** 2 <= r2:
                tot += r9
                n += 1
        out[did] = (tot, n)
    return out


def test_2sfca_oracle_and_twin(spark):
    import duckdb

    rng = random.Random(97)
    sup = [
        (i, rng.uniform(0, 40), rng.uniform(0, 40), rng.randint(1, 50))
        for i in range(15)
    ]
    sup.append((99, 200.0, 200.0, 10))  # isolated site: empty catchment
    dem = [
        (i, rng.uniform(0, 40), rng.uniform(0, 40), rng.randint(1, 30))
        for i in range(60)
    ]
    dem.append((999, -100.0, -100.0, 5))  # demand with no reachable site
    sdf = spark.createDataFrame(
        sup, "id long, x double, y double, capacity long"
    ).repartition(3)
    ddf = spark.createDataFrame(
        dem, "id long, x double, y double, population long"
    ).repartition(4)
    got = {
        r["id"]: (r["access_e9"], r["n_sites"])
        for r in pointstats.accessibility_2sfca(sdf, ddf, 9.0).collect()
    }
    assert got == _py_2sfca(sup, dem, 9.0)
    assert got[999] == (0, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE sup(id BIGINT, x DOUBLE, y DOUBLE, capacity BIGINT)")
    con.execute("CREATE TABLE dem(id BIGINT, x DOUBLE, y DOUBLE, population BIGINT)")
    con.executemany("INSERT INTO sup VALUES (?, ?, ?, ?)", sup)
    con.executemany("INSERT INTO dem VALUES (?, ?, ?, ?)", dem)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            pointstats.accessibility_2sfca_sql("sup", "dem", 9.0)
        ).fetchall()
    }
    assert got == want


def test_2sfca_closed_form(spark):
    """One site capacity 30, three demand points population 10 each inside
    the radius: ratio = 30/30 = 1.0 -> every demand scores 1e9 with
    n_sites=1. A second far site reaches only its own demand pair."""
    sup = [(1, 0.0, 0.0, 30), (2, 100.0, 0.0, 7)]
    dem = [
        (1, 1.0, 0.0, 10), (2, 0.0, 2.0, 10), (3, -2.0, -1.0, 10),
        (4, 101.0, 0.0, 2),
    ]
    sdf = spark.createDataFrame(sup, "id long, x double, y double, capacity long")
    ddf = spark.createDataFrame(dem, "id long, x double, y double, population long")
    got = {
        r["id"]: (r["access_e9"], r["n_sites"])
        for r in pointstats.accessibility_2sfca(sdf, ddf, 5.0).collect()
    }
    for i in (1, 2, 3):
        assert got[i] == (10 ** 9, 1)
    assert got[4] == (math.floor(7e9 / 2), 1)
    with pytest.raises(ValueError):
        pointstats.accessibility_2sfca(sdf, ddf, 0.0)


def test_radius_join_blocking_complete(spark):
    """Two-frame radius join: exact parity with a brute-force filter
    across cell boundaries (the blocking-completeness property)."""
    rng = random.Random(98)
    a = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(50)]
    b = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(70)]
    adf = spark.createDataFrame(a, "id long, x double, y double")
    bdf = spark.createDataFrame(b, "id long, x double, y double")
    got = {
        (r["a_id"], r["b_id"])
        for r in pointstats.radius_join(adf, bdf, 4.0).collect()
    }
    want = {
        (ia, ib)
        for ia, xa, ya in a
        for ib, xb, yb in b
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= 16.0
    }
    assert got == want
