"""Z-order clustering: Column/numpy parity, quadtree-block contiguity, and
file pruning through iceberg_lite manifests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from engine import cells, iceberg_lite


def test_grid_morton_matches_numpy(spark):
    rng = np.random.default_rng(11)
    res = 9
    n = 2**res
    ix = rng.integers(0, n, 500)
    iy = rng.integers(0, n, 500)
    cell = res * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy
    df = spark.createDataFrame([(int(c),) for c in cell], "cell long")
    got = [r["m"] for r in
           df.select(cells.grid_morton(F.col("cell")).alias("m")).collect()]
    want = cells.np_grid_morton(cell.astype(np.int64)).tolist()
    assert got == want


def test_morton_block_contiguity(spark):
    """Every res-9 descendant of a res-6 block falls inside the block's single
    morton range, and NO outside cell does."""
    res_block, res_fine = 6, 9
    block = res_block * cells._RES_SHIFT + 13 * cells._IX_SHIFT + 37
    lo, hi = cells.morton_block_range(block, res_fine)
    assert hi - lo + 1 == 4 ** (res_fine - res_block)
    # descendants: ix in [13*8, 14*8), iy in [37*8, 38*8)
    inside, outside = [], []
    n = 2**res_fine
    for ix in range(13 * 8 - 2, 14 * 8 + 2):
        for iy in range(37 * 8 - 2, 38 * 8 + 2):
            if not (0 <= ix < n and 0 <= iy < n):
                continue
            c = res_fine * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy
            m = int(cells.np_grid_morton(np.array([c], dtype=np.int64))[0])
            if 13 * 8 <= ix < 14 * 8 and 37 * 8 <= iy < 38 * 8:
                inside.append(m)
            else:
                outside.append(m)
    assert all(lo <= m <= hi for m in inside)
    assert all(m < lo or m > hi for m in outside)


def test_morton_clustered_write_prunes_files(spark, tmp_path):
    """Write a morton-range-partitioned table; a quadtree-block query reads a
    strict subset of files via manifest ranges alone."""
    res = 8
    n = 2**res
    rows = [(res * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy,)
            for ix in range(0, n, 3) for iy in range(0, n, 3)]
    df = spark.createDataFrame(rows, "cell long").withColumn(
        "morton", cells.grid_morton(F.col("cell"))
    )
    t = iceberg_lite.Table(str(tmp_path / "zt"))
    t.append(df.repartitionByRange(8, "morton"), range_cols=["morton"])

    snap = t.snapshot()
    assert len(snap["files"]) == 8
    # query one res-4 block (1/256 of the world)
    block = 4 * cells._RES_SHIFT + 5 * cells._IX_SHIFT + 9
    lo, hi = cells.morton_block_range(block, res)
    pruned = t.read(spark, prune={"morton": (lo, hi)})
    full = t.read(spark)
    # correctness: pruned read contains exactly the block's cells
    want = full.filter(
        (F.col("morton") >= lo) & (F.col("morton") <= hi)
    ).count()
    got = pruned.filter((F.col("morton") >= lo) & (F.col("morton") <= hi)).count()
    assert got == want and want > 0
    # pruning: strictly fewer files were read
    n_pruned_files = len([
        f for f in snap["files"]
        if not (f["partition_ranges"]["morton"][1] < lo
                or f["partition_ranges"]["morton"][0] > hi)
    ])
    assert n_pruned_files < len(snap["files"])


# ---------------------------------------------------------------- hilbert


def test_grid_hilbert_matches_numpy(spark):
    rng = np.random.default_rng(12)
    res = 9
    n = 2**res
    ix = rng.integers(0, n, 500)
    iy = rng.integers(0, n, 500)
    cell = res * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy
    df = spark.createDataFrame([(int(c),) for c in cell], "cell long")
    got = [
        r["h"]
        for r in df.select(
            cells.grid_hilbert(F.col("cell"), res).alias("h")
        ).collect()
    ]
    want = cells.np_grid_hilbert(cell.astype(np.int64), res).tolist()
    assert got == want


def test_hilbert_is_a_bijection_and_continuous():
    res = 4
    n = 2**res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = cells.np_hilbert_xy2d(xs.ravel(), ys.ravel(), res)
    assert sorted(d.tolist()) == list(range(n * n))  # bijection
    pos = {
        int(dd): (int(xx), int(yy))
        for dd, xx, yy in zip(d, xs.ravel(), ys.ravel())
    }
    for i in range(n * n - 1):  # consecutive keys are 4-neighbors
        (x1, y1), (x2, y2) = pos[i], pos[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_block_contiguity():
    res_block, res_fine = 6, 9
    block = res_block * cells._RES_SHIFT + 13 * cells._IX_SHIFT + 37
    lo, hi = cells.hilbert_block_range(block, res_fine)
    assert hi - lo + 1 == 4 ** (res_fine - res_block)
    n = 2**res_fine
    inside, outside = [], []
    for ix in range(13 * 8 - 2, 14 * 8 + 2):
        for iy in range(37 * 8 - 2, 38 * 8 + 2):
            if not (0 <= ix < n and 0 <= iy < n):
                continue
            c = res_fine * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy
            h = int(
                cells.np_grid_hilbert(np.array([c], dtype=np.int64), res_fine)[0]
            )
            if 13 * 8 <= ix < 14 * 8 and 37 * 8 <= iy < 38 * 8:
                inside.append(h)
            else:
                outside.append(h)
    assert all(lo <= h <= hi for h in inside)
    assert all(h < lo or h > hi for h in outside)
    # and the range is exactly filled: descendants are a permutation of it
    assert sorted(inside) == list(range(lo, hi + 1))


def test_hilbert_beats_morton_locality():
    """The layout claim, measured the way it actually matters: range-
    partition the key line into B contiguous chunks (files), compute each
    chunk's bbox, count chunks a random 16x16 bbox query must touch.
    Hilbert chunks have tighter extents (every consecutive key pair is a
    4-neighbor; Z-order has seam jumps), so queries touch fewer files.
    Note mean |key delta| over neighbor pairs is NOT the right metric — it
    is provably ~n/2 larger for Hilbert (reflections stretch a few pairs
    across the whole curve) while the median is 1.0 vs morton's 1.5; only
    at power-of-4-aligned chunk counts do the two curves tie, so B values
    here are deliberately non-aligned (48/77/100)."""
    res = 7
    n = 2**res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    fx, fy = xs.ravel(), ys.ravel()
    cell = res * cells._RES_SHIFT + fx * cells._IX_SHIFT + fy
    h = cells.np_grid_hilbert(cell, res)
    m = cells.np_grid_morton(cell)

    def files_touched(keys, n_chunks, trials=200, seed=7):
        order = np.argsort(keys)
        X, Y = fx[order], fy[order]
        chunks = np.array_split(np.arange(n * n), n_chunks)
        boxes = [
            (X[c].min(), X[c].max(), Y[c].min(), Y[c].max()) for c in chunks
        ]
        rng = np.random.default_rng(seed)
        tot = 0
        for _ in range(trials):
            qx = rng.integers(0, n - 16)
            qy = rng.integers(0, n - 16)
            qx2, qy2 = qx + 15, qy + 15
            tot += sum(
                1
                for (x1, x2, y1, y2) in boxes
                if not (x2 < qx or x1 > qx2 or y2 < qy or y1 > qy2)
            )
        return tot / trials

    for n_chunks in (48, 77, 100):
        th, tm = files_touched(h, n_chunks), files_touched(m, n_chunks)
        assert th < tm, (n_chunks, th, tm)


def test_hilbert_clustered_write_prunes_files(spark, tmp_path):
    res = 8
    n = 2**res
    rows = [
        (res * cells._RES_SHIFT + ix * cells._IX_SHIFT + iy,)
        for ix in range(0, n, 3)
        for iy in range(0, n, 3)
    ]
    df = spark.createDataFrame(rows, "cell long").withColumn(
        "hilbert", cells.grid_hilbert(F.col("cell"), res)
    )
    t = iceberg_lite.Table(str(tmp_path / "ht"))
    t.append(df.repartitionByRange(8, "hilbert"), range_cols=["hilbert"])
    snap = t.snapshot()
    assert len(snap["files"]) == 8
    block = 4 * cells._RES_SHIFT + 5 * cells._IX_SHIFT + 9
    lo, hi = cells.hilbert_block_range(block, res)
    pruned = t.read(spark, prune={"hilbert": (lo, hi)})
    full = t.read(spark)
    want = full.filter(
        (F.col("hilbert") >= lo) & (F.col("hilbert") <= hi)
    ).count()
    got = pruned.filter(
        (F.col("hilbert") >= lo) & (F.col("hilbert") <= hi)
    ).count()
    assert got == want and want > 0
    n_pruned_files = len(
        [
            f
            for f in snap["files"]
            if not (
                f["partition_ranges"]["hilbert"][1] < lo
                or f["partition_ranges"]["hilbert"][0] > hi
            )
        ]
    )
    assert n_pruned_files < len(snap["files"])


def test_hilbert_validation():
    import pytest

    with pytest.raises(ValueError):
        cells.grid_hilbert(F.lit(0), 0)
    with pytest.raises(ValueError):
        cells.grid_hilbert(F.lit(0), 29)
    with pytest.raises(ValueError):
        cells.hilbert_block_range(9 * cells._RES_SHIFT, 8)
