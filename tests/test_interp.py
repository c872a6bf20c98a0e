"""IDW grid interpolation: DuckDB-twin hash parity + structural checks."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from engine import interp


def _spark_rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["x", "y", "value"])
    out = interp.idw_grid(df, **kw).collect()
    return {
        (r["cx"], r["cy"]): (r["n_samples"], r["num_e9"], r["den_e9"], r["value"])
        for r in out
    }


def _duck_rows(rows, cell_size, radius, min_samples=1):
    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y}, {v})" for x, y, v in rows)
    sql = interp.idw_grid_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(x, y, value)",
        cell_size,
        radius,
        min_samples=min_samples,
    )
    return {
        (cx, cy): (n, num, den, val)
        for cx, cy, n, num, den, val in con.execute(sql).fetchall()
    }


@pytest.mark.parametrize("seed,n,cell,rad", [(1, 80, 1.0, 2.5), (2, 200, 2.0, 3.0), (3, 50, 0.5, 0.75)])
def test_duckdb_twin_parity(spark, seed, n, cell, rad):
    rng = random.Random(seed)
    rows = [
        (
            round(rng.uniform(0, 20), 6),
            round(rng.uniform(0, 20), 6),
            round(rng.uniform(-5, 5), 6),
        )
        for _ in range(n)
    ]
    got = _spark_rows(spark, rows, cell_size=cell, radius=rad)
    want = _duck_rows(rows, cell, rad)
    assert set(got) == set(want)
    for k in want:
        # integer sums identical; the double ratio identical too
        assert got[k][:3] == want[k][:3], (k, got[k], want[k])
        assert got[k][3] == want[k][3], (k, got[k], want[k])


def test_single_sample_surface(spark):
    # one sample: every covered cell's value is v to within floor-scale
    # rounding (num/den = floor(1e9*v*w)/floor(1e9*w))
    got = _spark_rows(spark, [(5.0, 5.0, 3.7)], cell_size=1.0, radius=2.0)
    # fan-out bound: centers within radius 2.0 of (5,5)
    assert 0 < len(got) <= 25
    for (_, _), (n, _, _, val) in got.items():
        assert n == 1
        assert abs(val - 3.7) < 1e-6


def test_exact_hit_dominates(spark):
    # a sample AT a cell center (clamped weight 1e4) vs a far sample with
    # tiny weight: the center cell's value lands near the coincident sample
    rows = [(0.5, 0.5, 10.0), (1.4, 0.5, 0.0)]
    got = _spark_rows(spark, rows, cell_size=1.0, radius=1.0)
    n, _, _, val = got[(0, 0)]
    assert n == 2
    assert val > 9.9  # w_hit/w_far = 1e4 / (1/0.81) ~ 8100


def test_min_samples_filter(spark):
    rows = [(0.5, 0.5, 1.0), (0.6, 0.5, 2.0), (10.5, 10.5, 3.0)]
    got = _spark_rows(spark, rows, cell_size=1.0, radius=0.4, min_samples=2)
    assert set(got) == {(0, 0)}
    assert got[(0, 0)][0] == 2


def test_power_generalization(spark):
    # power=4 runs and weights fall off faster: the far sample's influence
    # on the midpoint cell shrinks vs power=2
    rows = [(0.5, 0.5, 0.0), (3.5, 0.5, 10.0)]
    p2 = _spark_rows(spark, rows, cell_size=1.0, radius=3.5, power=2.0)
    p4 = _spark_rows(spark, rows, cell_size=1.0, radius=3.5, power=4.0)
    # cell (1,0): center (1.5,0.5) — nearer the 0.0 sample
    assert p4[(1, 0)][3] < p2[(1, 0)][3]


def test_invalid_args(spark):
    df = None
    with pytest.raises(ValueError):
        interp.idw_grid(df, cell_size=0.0, radius=1.0)


# ------------------------------------------------------------------ kriging


def _mk_vg():
    return {"model": "spherical", "nugget": 0.0, "sill": 4.0, "range": 10.0}


def _sample_df(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double, value double")


def _target_df(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_kriging_exact_interpolation_at_samples(spark):
    # nugget=0 kriging reproduces sample values exactly at sample locations
    rng = random.Random(5)
    samples = [
        (i, rng.uniform(0, 20), rng.uniform(0, 20), rng.uniform(-5, 5))
        for i in range(25)
    ]
    # dedupe coincident coords defensively (random doubles: none expected)
    targets = [(i, x, y) for i, x, y, _ in samples]
    out = interp.ordinary_kriging(
        _sample_df(spark, samples), _target_df(spark, targets),
        _mk_vg(), radius=30.0, k=8,
    ).collect()
    assert len(out) == len(samples)
    vals = {s[0]: s[3] for s in samples}
    for r in out:
        assert abs(r.est - vals[r.id]) < 1e-8
        assert abs(r.krig_var) < 1e-8


def test_kriging_constant_field(spark):
    # constant samples -> constant prediction everywhere (weights sum to 1)
    rng = random.Random(6)
    samples = [
        (i, rng.uniform(0, 20), rng.uniform(0, 20), 7.25) for i in range(30)
    ]
    targets = [(j, rng.uniform(0, 20), rng.uniform(0, 20)) for j in range(40)]
    out = interp.ordinary_kriging(
        _sample_df(spark, samples), _target_df(spark, targets),
        _mk_vg(), radius=30.0, k=6,
    ).collect()
    assert len(out) == 40
    for r in out:
        assert abs(r.est - 7.25) < 1e-9
        assert r.krig_var >= -1e-12


def test_kriging_matches_numpy_oracle(spark):
    import numpy as np

    rng = random.Random(7)
    vg = {"model": "exponential", "nugget": 0.3, "sill": 3.0, "range": 8.0}
    samples = [
        (i, rng.uniform(0, 15), rng.uniform(0, 15), rng.uniform(0, 10))
        for i in range(40)
    ]
    targets = [(j, rng.uniform(0, 15), rng.uniform(0, 15)) for j in range(25)]
    radius, k = 6.0, 5
    out = {
        r.id: r
        for r in interp.ordinary_kriging(
            _sample_df(spark, samples), _target_df(spark, targets),
            vg, radius=radius, k=k,
        ).collect()
    }
    nug, sill, a = vg["nugget"], vg["sill"], vg["range"]

    def gam(h):
        return interp._gamma_np(h, "exponential", nug, sill, a)

    n_expected = 0
    for tid, tx, ty in targets:
        cands = sorted(
            (
                ((sx - tx) ** 2 + (sy - ty) ** 2, sid, sx, sy, sv)
                for sid, sx, sy, sv in samples
                if (sx - tx) ** 2 + (sy - ty) ** 2 <= radius * radius
            ),
        )[:k]
        if not cands:
            assert tid not in out
            continue
        n_expected += 1
        m = len(cands)
        sx = np.array([c[2] for c in cands])
        sy = np.array([c[3] for c in cands])
        sv = np.array([c[4] for c in cands])
        d_ss = np.sqrt(
            (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
        )
        A = np.zeros((m + 1, m + 1))
        A[:m, :m] = gam(d_ss)
        A[m, :m] = 1.0
        A[:m, m] = 1.0
        b = np.zeros(m + 1)
        b[:m] = gam(np.sqrt(np.array([c[0] for c in cands])))
        b[m] = 1.0
        wgt = np.linalg.solve(A, b)
        est = float((wgt[:m] * sv).sum())
        kvar = float((wgt[:m] * b[:m]).sum() + wgt[m])
        r = out[tid]
        assert r.n_neighbors == m
        assert abs(r.est - est) < 1e-9
        assert abs(r.krig_var - kvar) < 1e-9
    assert len(out) == n_expected


def test_kriging_no_neighbors_dropped_and_validation(spark):
    samples = _sample_df(spark, [(1, 0.0, 0.0, 5.0)])
    targets = _target_df(spark, [(1, 0.5, 0.0), (2, 100.0, 100.0)])
    out = interp.ordinary_kriging(
        samples, targets, _mk_vg(), radius=2.0, k=4
    ).collect()
    assert [r.id for r in out] == [1]
    assert abs(out[0].est - 5.0) < 1e-12  # single neighbor -> its value
    with pytest.raises(ValueError):
        interp.ordinary_kriging(samples, targets, _mk_vg(), radius=0.0)
    bad = dict(_mk_vg(), sill=0.0)
    with pytest.raises(ValueError):
        interp.ordinary_kriging(samples, targets, bad, radius=1.0)
    with pytest.raises(ValueError):
        interp.ordinary_kriging(
            samples, targets, dict(_mk_vg(), model="cubic"), radius=1.0
        )


def test_fit_variogram_recovers_model():
    import numpy as np

    # exact spherical gamma at bin mids -> the fitter should land close
    true = {"model": "spherical", "nugget": 0.5, "sill": 3.5, "range": 12.0}
    rows = []
    for b in range(12):
        lo, hi = b * 1.5, (b + 1) * 1.5
        mid = 0.5 * (lo + hi)
        g = float(
            interp._gamma_np(
                np.array([mid]), "spherical", true["nugget"], true["sill"],
                true["range"],
            )[0]
        )
        rows.append((lo, hi, 100, g))
    fit = interp.fit_variogram(rows, "spherical")
    assert abs(fit["nugget"] - true["nugget"]) < 0.15
    assert abs(fit["sill"] - true["sill"]) < 0.15
    assert abs(fit["range"] - true["range"]) / true["range"] < 0.15
    # sse is n_pairs-weighted: normalize to a per-pair rms residual
    assert (fit["sse"] / (100 * len(rows))) ** 0.5 < 0.02
    with pytest.raises(ValueError):
        interp.fit_variogram(rows, "cubic")
    with pytest.raises(ValueError):
        interp.fit_variogram([], "spherical")


def test_fit_then_krige_end_to_end(spark):
    # the intended composition: empirical variogram (pointstats) -> fit ->
    # kriging surface; smoke correctness = predictions stay inside the
    # sample value envelope for an interpolation-dominated layout
    from engine import pointstats

    rng = random.Random(11)
    pts = []
    for i in range(60):
        x, y = rng.uniform(0, 30), rng.uniform(0, 30)
        v = int(10 * (x + y) / 6)  # smooth integer trend
        pts.append((i, x, y, v))
    pdf = spark.createDataFrame(pts, "id long, x double, y double, v long")
    vg_rows = [
        (r.lag_lo, r.lag_hi, r.n_pairs, r.gamma)
        for r in pointstats.variogram(pdf, max_lag=15.0, n_bins=8).collect()
    ]
    fit = interp.fit_variogram(vg_rows, "spherical")
    assert fit["sill"] > fit["nugget"] >= 0.0
    targets = _target_df(
        spark, [(j, rng.uniform(2, 28), rng.uniform(2, 28)) for j in range(15)]
    )
    out = interp.ordinary_kriging(
        pdf.withColumn("value", F.col("v").cast("double")),
        targets, fit, radius=10.0, k=8,
    ).collect()
    assert len(out) == 15
    lo = min(p[3] for p in pts) - 3
    hi = max(p[3] for p in pts) + 3
    for r in out:
        assert lo <= r.est <= hi


# ---------------------------------------------------------------------------
# GWR (geographically weighted regression)
# ---------------------------------------------------------------------------
def _gwr_spark_rows(spark, rows, cell_size, radius, min_samples=3):
    df = spark.createDataFrame(rows, "x double, y double, a double, value double")
    out = interp.gwr_grid(df, cell_size, radius, min_samples=min_samples)
    return {
        (r.cx, r.cy): (
            r.n_samples, r.sw_e9, r.swa_e9, r.swv_e9, r.swaa_e9, r.swav_e9,
            r.beta1, r.beta0,
        )
        for r in out.collect()
    }


def _gwr_duck_rows(rows, cell_size, radius, min_samples=3):
    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y}, {a}, {v})" for x, y, a, v in rows)
    sql = interp.gwr_grid_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(x, y, a, value)",
        cell_size, radius, min_samples=min_samples,
    )
    return {
        (cx, cy): tuple(rest)
        for cx, cy, *rest in con.execute(sql).fetchall()
    }


def _gwr_py_oracle(rows, cell_size, radius, min_samples=3):
    """Independent python replay: per cell, bisquare-weighted floor-scaled
    moments with the engines' left-associated multiply order, then the
    closed-form simple-WLS coefficients."""
    import math

    s = float(cell_size)
    r = int(-(-radius // s))
    h2 = radius * radius
    cells = {}
    for x, y, a, v in rows:
        bx, by = math.floor(x / s), math.floor(y / s)
        for cx in range(bx - r, bx + r + 1):
            for cy in range(by - r, by + r + 1):
                dx = (cx + 0.5) * s - x
                dy = (cy + 0.5) * s - y
                d2 = dx * dx + dy * dy
                if d2 >= h2:
                    continue
                t = (h2 - d2) / h2
                ew = 1e9 * (t * t)
                m = cells.setdefault((cx, cy), [0, 0, 0, 0, 0, 0])
                m[0] += 1
                m[1] += math.floor(ew)
                m[2] += math.floor(ew * a)
                m[3] += math.floor(ew * v)
                m[4] += math.floor(ew * a * a)
                m[5] += math.floor(ew * a * v)
    out = {}
    for k, (n, sw, sa, sv, saa, sav) in cells.items():
        if n < min_samples:
            continue
        den = float(sw) * float(saa) - float(sa) * float(sa)
        if den != 0.0:
            b1 = (float(sw) * float(sav) - float(sa) * float(sv)) / den
            b0 = (float(sv) - b1 * float(sa)) / float(sw)
        else:
            b1 = b0 = None
        out[k] = (n, sw, sa, sv, saa, sav, b1, b0)
    return out


@pytest.mark.parametrize("seed,n,cell,rad", [(11, 120, 1.0, 2.5), (12, 60, 2.0, 5.0)])
def test_gwr_twin_and_oracle_parity(spark, seed, n, cell, rad):
    """Spark == DuckDB twin (int64 moments AND double betas bit-equal) ==
    the independent python floor replay."""
    rng = random.Random(seed)
    rows = [
        (
            round(rng.uniform(0, 15), 6),
            round(rng.uniform(0, 15), 6),
            round(rng.uniform(-3, 3), 6),
            round(rng.uniform(-5, 5), 6),
        )
        for _ in range(n)
    ]
    got = _gwr_spark_rows(spark, rows, cell, rad)
    want = _gwr_duck_rows(rows, cell, rad)
    py = _gwr_py_oracle(rows, cell, rad)
    assert set(got) == set(want) == set(py)
    for k in want:
        assert got[k][:6] == want[k][:6] == py[k][:6], (k, got[k], want[k])
        assert got[k][6] == want[k][6], (k, got[k][6], want[k][6])
        assert got[k][7] == want[k][7]


def test_gwr_recovers_linear_field(spark):
    """v = 2a + 3 exactly everywhere -> every cell's local fit recovers
    beta1 ~= 2, beta0 ~= 3 (floor-scale granularity only)."""
    rng = random.Random(13)
    rows = []
    for _ in range(200):
        a = round(rng.uniform(-4, 4), 6)
        rows.append((
            round(rng.uniform(0, 10), 6), round(rng.uniform(0, 10), 6),
            a, 2.0 * a + 3.0,
        ))
    got = _gwr_spark_rows(spark, rows, 1.0, 3.0)
    assert got
    for k, r in got.items():
        assert r[6] is not None, k
        assert abs(r[6] - 2.0) < 1e-5, (k, r[6])
        assert abs(r[7] - 3.0) < 1e-4, (k, r[7])


def test_gwr_singular_design_null_betas(spark):
    """Constant attr in every window -> singular normal equations -> NULL
    coefficients, moments still emitted."""
    rows = [(float(i), 0.0, 1.5, float(i % 3)) for i in range(10)]
    got = _gwr_spark_rows(spark, rows, 1.0, 2.0, min_samples=1)
    assert got
    for k, r in got.items():
        assert r[6] is None and r[7] is None, (k, r)
        assert r[1] > 0


def test_gwr_min_samples_and_guard(spark):
    rows = [(0.5, 0.5, 1.0, 2.0), (0.6, 0.5, 2.0, 4.0)]
    got = _gwr_spark_rows(spark, rows, 1.0, 1.0, min_samples=3)
    assert got == {}
    with pytest.raises(ValueError):
        interp.gwr_grid(
            spark.createDataFrame(rows, "x double, y double, a double, value double"),
            0.0, 1.0,
        )
