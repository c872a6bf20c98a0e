"""engine.spacetime: emerging hotspots vs a pure-Python space-time oracle."""

import math
import random

import pytest

from engine import spacetime
from tests.conftest import spark  # noqa: F401

EV_SCHEMA = "ts_us long, x double, y double"


def _py_emerging(events, s, bin_us, radius=1, z_hot=1.645):
    counts = {}
    for ts, x, y in events:
        k = (math.floor(ts / bin_us), math.floor(x / s), math.floor(y / s))
        counts[k] = counts.get(k, 0) + 1
    area = sorted({(gx, gy) for (_, gx, gy) in counts})
    bins = sorted({b for (b, _, _) in counts})
    n = len(area)
    offs = [
        (dx, dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]
    w = {
        c: sum((c[0] + dx, c[1] + dy) in set(area) for dx, dy in offs)
        for c in area
    }
    series = {c: [] for c in area}
    nev = {c: 0 for c in area}
    for b in bins:
        xs = {c: counts.get((b, c[0], c[1]), 0) for c in area}
        tot = sum(xs.values())
        ssq = sum(v * v for v in xs.values())
        mean = tot / n
        sd = math.sqrt(max(ssq / n - mean * mean, 0.0))
        for c in area:
            fs = sum(xs.get((c[0] + dx, c[1] + dy), 0) for dx, dy in offs)
            denom = sd * math.sqrt((n * w[c] - w[c] * w[c]) / (n - 1))
            z = None if denom <= 0 else (fs - mean * w[c]) / denom
            series[c].append(z)
            nev[c] += xs[c]
    out = {}
    for c in area:
        zs = series[c]
        t = len(zs)
        mk_s = 0
        for i in range(t - 1):
            for j in range(i + 1, t):
                if zs[i] is None or zs[j] is None:
                    continue
                d = zs[j] - zs[i]
                mk_s += (d > 0) - (d < 0)
        szs = sorted(zs, key=lambda v: (v is not None, v))  # nulls first? no:
        szs = sorted(zs, key=lambda v: (v is None, v if v is not None else 0))
        # runs of equal values (None == None is a tie)
        ties = 0
        run = 1
        for i in range(1, t):
            if szs[i] == szs[i - 1] or (szs[i] is None and szs[i - 1] is None):
                run += 1
            else:
                ties += run * (run - 1) * (2 * run + 5)
                run = 1
        ties += run * (run - 1) * (2 * run + 5)
        var = (t * (t - 1) * (2 * t + 5) - ties) / 18.0
        if mk_s > 0 and var > 0:
            mk_z = (mk_s - 1) / math.sqrt(var)
        elif mk_s < 0 and var > 0:
            mk_z = (mk_s + 1) / math.sqrt(var)
        else:
            mk_z = 0.0
        hot = [z is not None and z >= z_hot for z in zs]
        hot_bins = sum(hot)
        last_hot = hot[-1]
        half = hot_bins * 2 >= t
        if hot_bins == 0:
            cat = "none"
        elif last_hot and hot_bins == 1:
            cat = "new"
        elif half and mk_z >= 1.96:
            cat = "intensifying"
        elif half and mk_z <= -1.96:
            cat = "diminishing"
        elif hot_bins * 10 >= t * 9:
            cat = "persistent"
        else:
            cat = "sporadic"
        out[c] = (t, nev[c], hot_bins, last_hot, mk_s, mk_z, cat)
    return out


def _run(spark, events, s=1.0, bin_us=1000, radius=1):
    df = spark.createDataFrame([(t, x, y) for t, x, y in events], EV_SCHEMA)
    return {
        (r["gx"], r["gy"]): (
            r["n_bins"], r["n_events"], r["hot_bins"], r["last_hot"],
            r["mk_s"], r["mk_z"], r["category"],
        )
        for r in spacetime.emerging_hotspots(
            df.repartition(4), s, bin_us, radius=radius
        ).collect()
    }


def test_matches_python_oracle(spark):
    rng = random.Random(11)
    events = []
    for _ in range(600):
        events.append(
            (rng.randint(0, 4999), rng.uniform(-4, 4), rng.uniform(-4, 4))
        )
    got = _run(spark, events, s=2.0, bin_us=1000)
    want = _py_emerging(events, 2.0, 1000)
    assert set(got) == set(want)
    for c in want:
        g, w = got[c], want[c]
        assert g[:5] == w[:5], c  # ints exact: bins, events, hot, last, mk_s
        assert g[5] == pytest.approx(w[5], rel=1e-12, abs=1e-12), c
        assert g[6] == w[6], c


def test_planted_trends(spark):
    # 7x7 flat background of 1 event per cell per bin, 10 bins; a 3x3 BLOCK
    # around (1,1) ramps up, one around (5,5) ramps down (Gi* detects
    # neighborhoods — a lone ramping cell dilutes across the window); the
    # block centers must come out intensifying / diminishing
    events = []
    bins = 10
    for b in range(bins):
        for gx in range(7):
            for gy in range(7):
                events.append((b * 1000 + 5, gx + 0.5, gy + 0.5))
        k = 0
        for _ in range(b * 12):  # rising block around (1, 1)
            dx, dy = k % 3 - 1, (k // 3) % 3 - 1
            k += 1
            events.append((b * 1000 + 5, 1.5 + dx, 1.5 + dy))
        k = 0
        for _ in range((bins - 1 - b) * 12):  # fading block around (5, 5)
            dx, dy = k % 3 - 1, (k // 3) % 3 - 1
            k += 1
            events.append((b * 1000 + 5, 5.5 + dx, 5.5 + dy))
    got = _run(spark, events, s=1.0, bin_us=1000)
    want = _py_emerging(events, 1.0, 1000)
    assert got == pytest.approx(want)  # full-field parity incl. floats
    assert got[(1, 1)][6] == "intensifying" and got[(1, 1)][4] > 0
    assert got[(5, 5)][6] == "diminishing" and got[(5, 5)][4] < 0
    # far corner never hot
    assert got[(0, 6)][6] == "none"


def test_mk_rising_riser_with_variance_floor(spark):
    # Gi* z of a lone outlier is scale-invariant (z -> const as it grows),
    # so a monotone-z riser needs a background that FIXES the field's sd:
    # 24 cells alternating 5/15 events per bin, riser 10,25,40,55
    events = []
    for b in range(4):
        i = 0
        for gx in range(5):
            for gy in range(5):
                if (gx, gy) == (2, 2):
                    continue
                for _ in range(5 if i % 2 == 0 else 15):
                    events.append((b * 100 + 1, gx + 0.5, gy + 0.5))
                i += 1
        for _ in range(10 + 15 * b):
            events.append((b * 100 + 1, 2.5, 2.5))
    got = _run(spark, events, s=1.0, bin_us=100)
    want = _py_emerging(events, 1.0, 100)
    assert got == pytest.approx(want)
    assert got[(2, 2)][0] == 4  # n_bins
    assert got[(2, 2)][1] == 10 + 25 + 40 + 55  # n_events conserved
    assert got[(2, 2)][4] == 6  # strictly rising z: S = 4*3/2


def test_null_z_bins(spark):
    """A bin whose raster is CONSTANT over the study area has sd == 0 ->
    null z for every cell that bin; null pairs contribute no MK trend and
    nulls form one tie group."""
    events = []
    # bins 0 and 2 constant (1 event/cell over the 3x3 area), bins 1, 3 varied
    for b in (0, 2):
        for gx in range(3):
            for gy in range(3):
                events.append((b * 100 + 1, gx + 0.5, gy + 0.5))
    for b in (1, 3):
        for gx in range(3):
            for gy in range(3):
                for _ in range(1 + (gx + gy + b) % 3):
                    events.append((b * 100 + 1, gx + 0.5, gy + 0.5))
    got = _run(spark, events, s=1.0, bin_us=100)
    want = _py_emerging(events, 1.0, 100)
    assert set(got) == set(want)
    for c in want:
        assert got[c][:5] == want[c][:5], c
        assert got[c][5] == pytest.approx(want[c][5], abs=1e-12), c
        assert got[c][6] == want[c][6], c


def test_single_bin_and_validation(spark):
    events = [(5, 0.5, 0.5), (7, 1.5, 0.5)]
    got = _run(spark, events, s=1.0, bin_us=1000)
    assert all(v[4] == 0 and v[5] == 0.0 for v in got.values())  # T=1: no MK
    df = spark.createDataFrame(events, EV_SCHEMA)
    with pytest.raises(ValueError):
        spacetime.spacetime_cube(df, 0.0, 1000)
    with pytest.raises(ValueError):
        spacetime.spacetime_cube(df, 1.0, 0)
