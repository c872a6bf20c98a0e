"""Douglas-Peucker simplification: numpy-kernel vs plain-Python oracle,
the within-tol guarantee, structure invariants, Spark plumbing."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import simplify


def _rand_walk(rng, n, step=1.0):
    x, y = rng.uniform(-100, 100), rng.uniform(-100, 100)
    pts = [(x, y)]
    for _ in range(n - 1):
        x += rng.uniform(-step, step)
        y += rng.uniform(-step, step)
        pts.append((x, y))
    return pts


def _min_dist_to_chain(p, chain):
    best = math.inf
    for a, b in zip(chain, chain[1:]):
        ax, ay = a
        bx, by = b
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d = math.hypot(p[0] - ax, p[1] - ay)
        else:
            t = max(0.0, min(1.0, ((p[0] - ax) * dx + (p[1] - ay) * dy) / seg2))
            d = math.hypot(p[0] - (ax + t * dx), p[1] - (ay + t * dy))
        best = min(best, d)
    return best


def test_kernel_matches_reference_oracle():
    rng = random.Random(7)
    for trial in range(40):
        n = rng.randint(2, 60)
        tol = rng.choice([0.05, 0.3, 1.0, 5.0])
        pts = _rand_walk(rng, n)
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        mask = simplify.dp_keep_mask(xs, ys, tol)
        got = [(x, y) for x, y in zip(xs[mask], ys[mask])]
        want = simplify.dp_reference(pts, tol)
        assert got == want, f"trial {trial} n={n} tol={tol}"


def test_within_tol_guarantee_fuzz():
    rng = random.Random(13)
    for _ in range(60):
        n = rng.randint(3, 120)
        tol = rng.choice([0.1, 0.5, 2.0])
        pts = _rand_walk(rng, n, step=rng.choice([0.2, 1.0, 4.0]))
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        mask = simplify.dp_keep_mask(xs, ys, tol)
        chain = [(x, y) for x, y in zip(xs[mask], ys[mask])]
        assert mask[0] and mask[-1]
        for p in pts:
            assert _min_dist_to_chain(p, chain) <= tol + 1e-9


def test_collinear_and_degenerate():
    # straight line -> endpoints only, at tol=0 (strict > comparison)
    xs = np.arange(10, dtype=float)
    ys = np.zeros(10)
    mask = simplify.dp_keep_mask(xs, ys, 0.0)
    assert mask.sum() == 2 and mask[0] and mask[-1]
    # all-identical points (zero-length anchor segment)
    xs = np.ones(5)
    ys = np.ones(5)
    mask = simplify.dp_keep_mask(xs, ys, 0.5)
    assert mask.sum() == 2
    # n <= 2 passthrough
    assert simplify.dp_keep_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() == [True]
    assert simplify.dp_keep_mask(np.array([]), np.array([]), 1.0).tolist() == []


def test_huge_tol_keeps_endpoints_only():
    rng = random.Random(3)
    pts = _rand_walk(rng, 50)
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    mask = simplify.dp_keep_mask(xs, ys, 1e9)
    assert mask.sum() == 2


def test_closed_ring_stays_closed():
    # square ring with noisy edge midpoints
    ring = [(0, 0), (5, 0.01), (10, 0), (10.01, 5), (10, 10), (5, 9.99),
            (0, 10), (-0.01, 5), (0, 0)]
    xs = np.array([p[0] for p in ring], dtype=float)
    ys = np.array([p[1] for p in ring], dtype=float)
    mask = simplify.dp_keep_mask(xs, ys, 0.1)
    kept = [(x, y) for x, y in zip(xs[mask], ys[mask])]
    assert kept[0] == kept[-1] == (0.0, 0.0)
    assert (10.0, 0.0) in kept and (10.0, 10.0) in kept  # corners survive
    assert (5.0, 0.01) not in kept  # sub-tol noise dropped


def test_spark_simplify_lines(spark):
    rng = random.Random(21)
    rows = []
    for lid in range(30):
        pts = _rand_walk(rng, rng.randint(2, 80))
        rows.append((lid, f"tag{lid % 3}", [{"x": x, "y": y} for x, y in pts]))
    df = spark.createDataFrame(rows, "line_id: long, tag: string, pts: array<struct<x:double,y:double>>")
    out = simplify.simplify_lines(df.repartition(7), tol=0.8).collect()
    assert len(out) == 30
    by_id = {r["line_id"]: r for r in out}
    for lid, tag, pts in rows:
        r = by_id[lid]
        assert r["tag"] == tag  # passthrough column survives
        assert r["n_orig"] == len(pts)
        assert r["n_kept"] == len(r["pts"]) <= len(pts)
        xs = np.array([p["x"] for p in pts])
        ys = np.array([p["y"] for p in pts])
        want = simplify.dp_reference(list(zip(xs, ys)), 0.8)
        got = [(p["x"], p["y"]) for p in r["pts"]]
        assert got == [(float(x), float(y)) for x, y in want]


def test_spark_partition_invariance(spark):
    rng = random.Random(5)
    rows = [(i, [{"x": x, "y": y} for x, y in _rand_walk(rng, 40)]) for i in range(12)]
    df = spark.createDataFrame(rows, "line_id: long, pts: array<struct<x:double,y:double>>")
    a = {r["line_id"]: r["pts"] for r in simplify.simplify_lines(df.coalesce(1), 1.0).collect()}
    b = {r["line_id"]: r["pts"] for r in simplify.simplify_lines(df.repartition(11), 1.0).collect()}
    assert a == b
