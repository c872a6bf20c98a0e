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
