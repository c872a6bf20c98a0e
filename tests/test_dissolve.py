"""rect_union_area / rect_union_area_slabs: exact dissolve union area.

Three independent implementations must agree exactly: the grid-partitioned
numpy sweep kernel, the Column-only slab twin, and a dumb rasterizing
python oracle (paint booleans on a compressed grid)."""

import numpy as np
import pytest

from engine.dissolve import (
    np_rect_union_area,
    rect_union_area,
    rect_union_area_slabs,
)


def brute_union_area(rects):
    """Coordinate-compressed boolean paint — the dumbest possible oracle."""
    rects = [(x0, y0, x1, y1) for x0, y0, x1, y1 in rects if x1 > x0 and y1 > y0]
    if not rects:
        return 0
    xs = sorted({v for r in rects for v in (r[0], r[2])})
    ys = sorted({v for r in rects for v in (r[1], r[3])})
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    grid = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    for x0, y0, x1, y1 in rects:
        grid[xi[x0]:xi[x1], yi[y0]:yi[y1]] = True
    wx = np.diff(np.array(xs, dtype=np.int64))
    wy = np.diff(np.array(ys, dtype=np.int64))
    return int((wx[:, None] * wy[None, :] * grid).sum())


def mk_df(spark, rows):
    """rows: list of (g, x0, y0, x1, y1)."""
    return spark.createDataFrame(
        rows, "group_id long, x0 long, y0 long, x1 long, y1 long"
    )


def collect_map(df):
    return {
        r["g"]: (r["n_rects"], r["union_area"], r["minx"], r["miny"],
                 r["maxx"], r["maxy"])
        for r in df.collect()
    }


class TestNumpyKernel:
    def test_hand_cases(self):
        # disjoint
        assert np_rect_union_area([0, 10], [0, 0], [2, 12], [2, 2]) == 8
        # identical duplicates count once
        assert np_rect_union_area([0, 0, 0], [0, 0, 0], [4, 4, 4], [4, 4, 4]) == 16
        # nested
        assert np_rect_union_area([0, 1], [0, 1], [10, 3], [10, 3]) == 100
        # cross overlap: two 4x4 overlapping in a 2x2 corner
        assert np_rect_union_area([0, 2], [0, 2], [4, 6], [4, 6]) == 28
        # degenerate excluded
        assert np_rect_union_area([0, 5], [0, 5], [2, 5], [2, 9]) == 4
        # empty
        assert np_rect_union_area([], [], [], []) == 0

    def test_fuzz_vs_brute(self):
        rng = np.random.default_rng(7)
        for trial in range(30):
            n = int(rng.integers(1, 40))
            x0 = rng.integers(-50, 50, n)
            y0 = rng.integers(-50, 50, n)
            x1 = x0 + rng.integers(0, 30, n)  # includes degenerates
            y1 = y0 + rng.integers(0, 30, n)
            got = np_rect_union_area(x0, y0, x1, y1)
            want = brute_union_area(list(zip(x0, y0, x1, y1)))
            assert got == want, f"trial {trial}"

    def test_large_coords_exact(self):
        # near the 2^31 coordinate bound: two overlapping big rects
        B = 2**30
        got = np_rect_union_area([-B, 0], [-B, 0], [1, B], [1, B])
        # (B+1)^2 + B^2 - 1: overlap is the single unit cell [0,1)^2
        assert got == (B + 1) * (B + 1) + B * B - 1


class TestSparkPaths:
    def _rand_rows(self, seed, n_groups=5, n=120):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            g = int(rng.integers(0, n_groups))
            x0 = int(rng.integers(-100, 100))
            y0 = int(rng.integers(-100, 100))
            rows.append((g, x0, y0, x0 + int(rng.integers(0, 60)),
                         y0 + int(rng.integers(0, 60))))
        return rows

    def test_kernel_vs_slabs_vs_brute(self, spark):
        rows = self._rand_rows(11)
        df = mk_df(spark, rows)
        got_k = collect_map(rect_union_area(df, cell=37))
        got_s = collect_map(rect_union_area_slabs(df))
        assert got_k == got_s
        for g in got_k:
            mine = [(x0, y0, x1, y1) for gg, x0, y0, x1, y1 in rows if gg == g]
            valid = [r for r in mine if r[2] > r[0] and r[3] > r[1]]
            n, area, minx, miny, maxx, maxy = got_k[g]
            assert n == len(valid)
            assert area == brute_union_area(mine)
            assert minx == min(r[0] for r in valid)
            assert maxy == max(r[3] for r in valid)

    @pytest.mark.parametrize("cell", [1, 3, 16, 1000, 10**9])
    def test_cell_size_invariance(self, spark, cell):
        df = mk_df(spark, self._rand_rows(23, n_groups=3, n=60))
        got = {r["g"]: r["union_area"]
               for r in rect_union_area(df, cell=cell).collect()}
        want = {r["g"]: r["union_area"]
                for r in rect_union_area_slabs(df).collect()}
        assert got == want

    def test_degenerate_only_group_emits_nothing(self, spark):
        df = mk_df(spark, [(1, 0, 0, 0, 5), (2, 0, 0, 3, 3)])
        got = collect_map(rect_union_area(df, cell=8))
        assert set(got) == {2}
        assert got[2] == (1, 9, 0, 0, 3, 3)

    def test_negative_coords_cross_cell_origin(self, spark):
        # one rect straddling the cell origin both axes
        df = mk_df(spark, [(7, -5, -3, 6, 4)])
        got = collect_map(rect_union_area(df, cell=4))
        assert got[7] == (1, 77, -5, -3, 6, 4)

    def test_group_isolation(self, spark):
        # same geometry in two groups must not merge
        rows = [(1, 0, 0, 4, 4), (2, 0, 0, 4, 4), (2, 2, 2, 6, 6)]
        got = collect_map(rect_union_area(df := mk_df(spark, rows), cell=5))
        assert got[1][1] == 16
        assert got[2][1] == 28
        assert collect_map(rect_union_area_slabs(df)) == got

    def test_bad_cell_raises(self, spark):
        with pytest.raises(ValueError, match="cell"):
            rect_union_area(mk_df(spark, [(1, 0, 0, 1, 1)]), cell=0)
