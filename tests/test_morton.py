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
