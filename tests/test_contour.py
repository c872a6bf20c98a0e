"""Marching-squares contour extraction (engine/contour.py) vs a dense numpy
brute-force oracle with the identical case table and rational-crossing
semantics, plus planted-structure and line-linking checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.contour import (
    CASE_SEGMENTS,
    contour_lines,
    contour_segments,
    contour_segments_sql,
    segment_xy,
)


def _py_contour(grid: np.ndarray, level: int):
    """Dense oracle: grid[y][x] = z (0 outside), returns the set of segment
    tuples exactly as contour_segments emits them."""
    H, W = grid.shape

    def z(x, y):
        return int(grid[y, x]) if 0 <= x < W and 0 <= y < H else 0

    def endpoint(bx, by, e):
        z0, z1 = z(bx, by), z(bx + 1, by)
        z2, z3 = z(bx, by + 1), z(bx + 1, by + 1)
        if e == 0:
            ex, ey, hz, num, den = bx, by, 1, level - z0, z1 - z0
        elif e == 1:
            ex, ey, hz, num, den = bx + 1, by, 0, level - z1, z3 - z1
        elif e == 2:
            ex, ey, hz, num, den = bx, by + 1, 1, level - z2, z3 - z2
        else:
            ex, ey, hz, num, den = bx, by, 0, level - z0, z2 - z0
        if den < 0:
            num, den = -num, -den
        return (ex, ey, hz, num, den)

    out = set()
    for by in range(-1, H):
        for bx in range(-1, W):
            zs = [z(bx, by), z(bx + 1, by), z(bx, by + 1), z(bx + 1, by + 1)]
            kase = (
                (zs[0] > level)
                + 2 * (zs[1] > level)
                + 4 * (zs[3] > level)
                + 8 * (zs[2] > level)
            )
            for ea, eb in CASE_SEGMENTS[kase]:
                out.add(
                    (bx, by, kase, ea)
                    + endpoint(bx, by, ea)
                    + (eb,)
                    + endpoint(bx, by, eb)
                )
    return out


def _cells_df(spark, grid: np.ndarray):
    rows = [
        (int(x), int(y), int(grid[y, x]))
        for y in range(grid.shape[0])
        for x in range(grid.shape[1])
        if grid[y, x] != 0
    ]
    return spark.createDataFrame(rows, "gx long, gy long, z long")


def _collect_set(df):
    return {tuple(int(v) for v in r) for r in df.collect()}


@pytest.mark.parametrize("seed,level", [(0, 1), (1, 2), (2, 3), (3, 0)])
def test_random_grids_match_oracle(spark, seed, level):
    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 5, size=(9, 11))
    segs = contour_segments(_cells_df(spark, grid), level)
    assert _collect_set(segs) == _py_contour(grid, level)


def test_sql_twin_matches():
    import duckdb

    rng = np.random.default_rng(7)
    grid = rng.integers(0, 4, size=(8, 8))
    rows = [
        (x, y, int(grid[y, x]))
        for y in range(8)
        for x in range(8)
        if grid[y, x] != 0
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE ctr(gx BIGINT, gy BIGINT, z BIGINT)")
    con.executemany("INSERT INTO ctr VALUES (?, ?, ?)", rows)
    got = {
        tuple(int(v) for v in r)
        for r in con.execute(
            contour_segments_sql("SELECT * FROM ctr", 1)
        ).fetchall()
    }
    assert got == _py_contour(grid, 1)


def test_planted_ramp(spark):
    """z = 2*gx on a W x H grid, level 3 (odd): exactly one case-6 segment
    per block row in the crossing column, crossing at t = 1/2."""
    W, H = 6, 5
    grid = np.tile(2 * np.arange(W), (H, 1))
    segs = contour_segments(_cells_df(spark, grid), 3).collect()
    # blocks (bx=1, by) have z(SW)=2 <= 3 < z(SE)=4 -> case 6 for interior
    # rows; boundary rows (by = -1 and H-1) see zero padding above/below.
    interior = [r for r in segs if r["kase"] == 6]
    assert len(interior) == H - 1
    for r in interior:
        assert r["bx"] == 1
        assert (r["a_num"], r["a_den"]) == (1, 2)
        assert (r["b_num"], r["b_den"]) == (1, 2)


def test_crossing_keys_shared_between_adjacent_blocks(spark):
    """Every interior crossing point key must appear an EVEN number of times
    across segment endpoints (iso-lines of a bounded field are closed, so
    each crossing joins exactly two segments)."""
    rng = np.random.default_rng(11)
    grid = rng.integers(0, 6, size=(10, 10))
    segs = contour_segments(_cells_df(spark, grid), 2)
    key = lambda p: F.concat_ws(
        ":",
        *[F.col(f"{p}_{c}").cast("string")
          for c in ("ex", "ey", "horiz", "num", "den")],
    )
    pts = segs.select(key("a").alias("k")).unionAll(
        segs.select(key("b").alias("k"))
    )
    odd = pts.groupBy("k").count().filter(F.col("count") % 2 != 0)
    assert odd.count() == 0


def test_contour_lines_ramp_single_line(spark):
    """The planted ramp's iso-line is one connected vertical polyline ->
    contour_lines assigns a single line_id to every segment."""
    W, H = 4, 6
    grid = np.tile(2 * np.arange(W), (H, 1))
    segs = contour_segments(_cells_df(spark, grid), 3)
    lines = contour_lines(segs)
    assert lines.count() == segs.count()
    assert lines.select("line_id").distinct().count() == 1


def test_contour_lines_two_blobs(spark):
    """Two well-separated square plateaus -> exactly two closed lines, and
    segment counts per line match the dense oracle's component sizes."""
    grid = np.zeros((12, 12), dtype=np.int64)
    grid[2:5, 2:5] = 3
    grid[8:11, 7:11] = 4
    segs = contour_segments(_cells_df(spark, grid), 1)
    lines = contour_lines(segs)
    per = dict(
        (r["line_id"], r["n"])
        for r in lines.groupBy("line_id").agg(F.count("*").alias("n")).collect()
    )
    assert len(per) == 2
    assert sum(per.values()) == len(_py_contour(grid, 1))


def test_segment_xy_consistency(spark):
    """Double view: endpoints land inside the block's unit square and on the
    claimed edge coordinate."""
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 5, size=(7, 7))
    xy = segment_xy(contour_segments(_cells_df(spark, grid), 2)).collect()
    assert xy
    for r in xy:
        for x, y in ((r["ax"], r["ay"]), (r["bx2"], r["by2"])):
            assert r["bx"] <= x <= r["bx"] + 1
            assert r["by"] <= y <= r["by"] + 1


def test_level_zero_is_support_boundary(spark):
    """level=0 on a positive field contours the support: a single filled
    square -> one rectangle of 8 corner+edge segments around it."""
    grid = np.zeros((6, 6), dtype=np.int64)
    grid[2:4, 2:4] = 5
    segs = contour_segments(_cells_df(spark, grid), 0)
    assert _collect_set(segs) == _py_contour(grid, 0)


def test_negative_level_rejected(spark):
    with pytest.raises(ValueError):
        contour_segments(
            _cells_df(spark, np.ones((2, 2), dtype=np.int64)), -1
        )
