"""engine.sampling: spatial block split with buffer exclusion + balanced
cell subsampling — deterministic md5 assignment, python replays, leakage
guarantees."""

import hashlib
import math
import random

import pytest

from engine import sampling
from tests.conftest import spark  # noqa: F401


def _mk(spark, pts):
    return spark.createDataFrame(pts, "id long, x double, y double")


def _cell(x, y, s):
    return (math.floor(x / s), math.floor(y / s))


def _is_test_cell(cx, cy, salt, frac):
    h = int(hashlib.md5(f"{cx},{cy},{salt}".encode()).hexdigest()[:15], 16)
    return h / float(1 << 60) < frac


def test_spatial_split_replay_and_leakage(spark):
    rng = random.Random(51)
    pts = [
        (i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(400)
    ]
    out = sampling.spatial_split(
        _mk(spark, pts), cell_size=10.0, test_frac=0.3, buffer_cells=1
    ).collect()
    got = {r["id"]: r["split"] for r in out}
    coords = {i: (x, y) for i, x, y in pts}
    # python replay of the assignment
    test_cells = set()
    for i, x, y in pts:
        c = _cell(x, y, 10.0)
        if _is_test_cell(*c, 17, 0.3):
            test_cells.add(c)
    for i, x, y in pts:
        c = _cell(x, y, 10.0)
        if c in test_cells:
            want = "test"
        elif any(
            (c[0] + dx, c[1] + dy) in test_cells
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ):
            want = "buffer"
        else:
            want = "train"
        assert got[i] == want, i
    # all three classes appear at this size, and the leakage guarantee
    # holds: no train point's cell touches a test cell
    assert {"train", "test", "buffer"} <= set(got.values())
    for i, s in got.items():
        if s != "train":
            continue
        ci = _cell(*coords[i], 10.0)
        for j, t in got.items():
            if t == "test":
                cj = _cell(*coords[j], 10.0)
                assert max(abs(ci[0] - cj[0]), abs(ci[1] - cj[1])) > 1
    # buffer_cells=0: no buffer class, pure block split
    out0 = sampling.spatial_split(
        _mk(spark, pts), cell_size=10.0, test_frac=0.3, buffer_cells=0
    ).collect()
    assert {r["split"] for r in out0} == {"train", "test"}
    # determinism + salt re-roll
    again = {
        r["id"]: r["split"]
        for r in sampling.spatial_split(
            _mk(spark, pts), 10.0, 0.3, 1
        ).collect()
    }
    assert again == got
    resalt = {
        r["id"]: r["split"]
        for r in sampling.spatial_split(
            _mk(spark, pts), 10.0, 0.3, 1, salt=99
        ).collect()
    }
    assert resalt != got
    with pytest.raises(ValueError):
        sampling.spatial_split(_mk(spark, pts), 10.0, 1.5)


def test_stratified_cell_sample(spark):
    rng = random.Random(52)
    # a dense megacity cell + sparse countryside
    pts = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(300)]
    pts += [(1000 + i, 55.0 + rng.uniform(0, 1), 55.0, ) for i in range(3)]
    df = _mk(spark, pts)
    out = sampling.stratified_cell_sample(
        df, cell_size=10.0, per_cell=20
    ).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(_cell(r["x"], r["y"], 10.0), []).append(r["id"])
    for c, ids in by_cell.items():
        assert len(ids) <= 20
    # sparse cells keep everything
    assert len(by_cell[(5, 5)]) == 3
    # deterministic: md5-rank replay picks the identical survivor set
    kept = sorted(r["id"] for r in out)
    def rank(i):
        return (hashlib.md5(f"{i},23".encode()).hexdigest(), i)
    dense_ids = [i for i, x, y in pts if _cell(x, y, 10.0) == (0, 0)]
    want_dense = sorted(sorted(dense_ids, key=rank)[:20])
    got_dense = sorted(by_cell.get((0, 0), []))
    assert got_dense == want_dense
    again = sorted(
        r["id"] for r in sampling.stratified_cell_sample(
            df, cell_size=10.0, per_cell=20
        ).collect()
    )
    assert again == kept
    with pytest.raises(ValueError):
        sampling.stratified_cell_sample(df, 10.0, 0)


def test_spatial_folds(spark):
    rng = random.Random(53)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(500)]
    out = sampling.spatial_folds(_mk(spark, pts), 10.0, k=4).collect()
    folds = {r["id"]: r["fold"] for r in out}
    # replay: fold = floor(md5_unit * k), same cell -> same fold
    by_cell = {}
    for i, x, y in pts:
        c = _cell(x, y, 10.0)
        h = int(
            hashlib.md5(f"{c[0]},{c[1]},17".encode()).hexdigest()[:15], 16
        ) / float(1 << 60)
        want = min(int(h * 4), 3)
        assert folds[i] == want, i
        by_cell.setdefault(c, set()).add(folds[i])
    assert all(len(s) == 1 for s in by_cell.values())
    assert set(folds.values()) == {0, 1, 2, 3}
    with pytest.raises(ValueError):
        sampling.spatial_folds(_mk(spark, pts), 10.0, k=1)
