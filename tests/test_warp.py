"""engine.warp: rational-affine raster resample — Python oracle parity,
linear-reproduction and identity/shift/zoom closed forms, DuckDB twin."""

import random
from fractions import Fraction

import pytest

from engine import warp
from tests.conftest import spark  # noqa: F401


def _rand_tiles(rng, res, n_tiles, span=3, density=0.5):
    keys = set()
    while len(keys) < n_tiles:
        keys.add((rng.randint(-span, span), rng.randint(-span, span)))
    tiles = {}
    for k in keys:
        tiles[k] = [
            rng.randint(1, 999) if rng.random() < density else 0
            for _ in range(res * res)
        ]
    return tiles


def _mk_df(spark, tiles):
    return spark.createDataFrame(
        [(tx, ty, grid) for (tx, ty), grid in tiles.items()],
        "tx long, ty long, counts array<long>",
    )


def _collect(df):
    return {(r["tx"], r["ty"]): list(r["val_num"]) for r in df.collect()}


def _py_warp(tiles, res, coeffs, den, out_keys, method):
    """Brute-force oracle with Fraction arithmetic (then exactness checked
    by integer equality of the den^2-scaled result)."""
    a, b, c, d, e, f = coeffs
    cells = {}
    for (tx, ty), grid in tiles.items():
        for pix, n in enumerate(grid):
            if n:
                cells[(tx * res + pix % res, ty * res + pix // res)] = n
    out = {}
    for (tx, ty) in out_keys:
        g = [0] * (res * res)
        for pix in range(res * res):
            X, Y = tx * res + pix % res, ty * res + pix // res
            sxn = a * X + b * Y + c
            syn = d * X + e * Y + f
            if method == "nearest":
                gx = (2 * sxn + den) // (2 * den)
                gy = (2 * syn + den) // (2 * den)
                g[pix] = cells.get((gx, gy), 0)
            else:
                gx0, fx = sxn // den, sxn % den
                gy0, fy = syn // den, syn % den
                v = 0
                for dx in (0, 1):
                    for dy in (0, 1):
                        w = (fx if dx else den - fx) * (fy if dy else den - fy)
                        v += w * cells.get((gx0 + dx, gy0 + dy), 0)
                g[pix] = v
        out[(tx, ty)] = g
    return out


IDENT = (1, 0, 0, 0, 1, 0)


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
@pytest.mark.parametrize(
    "coeffs,den",
    [
        (IDENT, 1),                       # identity
        ((1, 0, 3, 0, 1, -2), 1),         # integer shift
        ((2, 0, 1, 0, 2, 1), 2),          # half-pixel shift
        ((2, 0, 0, 0, 2, 0), 1),          # 2x downscale
        ((1, 0, 0, 0, 1, 0), 3),          # 3x upscale (sx = X/3)
        ((0, -1, 0, 1, 0, 0), 1),         # 90-degree rotation
        ((3, 1, -2, -1, 2, 5), 4),        # general rational affine w/ shear
    ],
)
def test_matches_python_oracle(spark, method, coeffs, den):
    rng = random.Random(hash((coeffs, den, method)) & 0xFFFF)
    res = 8
    tiles = _rand_tiles(rng, res, 8)
    df = _mk_df(spark, tiles).repartition(5)
    got = _collect(
        warp.affine_resample(df, res, coeffs, den=den, method=method)
    )
    want = _py_warp(tiles, res, coeffs, den, set(tiles), method)
    assert got == want


def test_identity_reproduces_input(spark):
    rng = random.Random(77)
    res = 8
    tiles = _rand_tiles(rng, res, 6)
    df = _mk_df(spark, tiles)
    for method in ("bilinear", "nearest"):
        got = _collect(warp.affine_resample(df, res, IDENT, method=method))
        assert got == tiles


def test_bilinear_reproduces_linear_ramp(spark):
    """Bilinear interpolation is exact on linear fields: warping z = 3x + 5y
    by a half-pixel shift gives den^2 * z(sx, sy) wherever all 4 source
    neighbors exist."""
    res = 8
    tiles = {
        (tx, ty): [
            3 * (tx * res + pix % res) + 5 * (ty * res + pix // res)
            for pix in range(res * res)
        ]
        for tx in (0, 1, 2)
        for ty in (0, 1, 2)
    }
    df = _mk_df(spark, tiles)
    den = 2
    got = _collect(
        warp.affine_resample(df, res, (2, 0, 1, 0, 2, 1), den=den)
    )
    g = got[(1, 1)]
    for pix in range(res * res):
        X, Y = res + pix % res, res + pix // res
        sx = Fraction(2 * X + 1, den)
        sy = Fraction(2 * Y + 1, den)
        want = den * den * (3 * sx + 5 * sy)
        assert want.denominator == 1
        # interior of the 3x3 block: all four neighbors exist (z=0 cells of
        # the ramp at the origin corner are absent from the sparse set, so
        # skip the two lattice lines that touch (0, y)/(x, 0) zeros)
        assert g[pix] == int(want)


def test_out_tiles_extent(spark):
    """An explicit target tile set is honored, absent sources read 0."""
    res = 4
    tiles = {(0, 0): list(range(1, res * res + 1))}
    df = _mk_df(spark, tiles)
    out = spark.createDataFrame([(5, 5)], "tx long, ty long")
    got = _collect(
        warp.affine_resample(df, res, IDENT, out_tiles=out)
    )
    assert got == {(5, 5): [0] * (res * res)}


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(78)
    res = 8
    tiles = _rand_tiles(rng, res, 8)
    df = _mk_df(spark, tiles)
    con = duckdb.connect()
    con.execute("CREATE TABLE tiles(tx BIGINT, ty BIGINT, counts BIGINT[])")
    con.executemany(
        "INSERT INTO tiles VALUES (?, ?, ?)",
        [(tx, ty, grid) for (tx, ty), grid in tiles.items()],
    )
    for method in ("bilinear", "nearest"):
        for coeffs, den in ((IDENT, 1), ((3, 1, -2, -1, 2, 5), 4)):
            got = _collect(
                warp.affine_resample(df, res, coeffs, den=den, method=method)
            )
            want = {
                (r[0], r[1]): list(r[2])
                for r in con.execute(
                    warp.warp_sql("tiles", res, coeffs, den=den, method=method)
                ).fetchall()
            }
            assert got == want, (method, coeffs, den)


# ---------------------------------------------------------------------------
# sample_at_points (raster value extraction at vector points)
# ---------------------------------------------------------------------------
def _py_sample(tiles, res, pts, den, method):
    """Brute-force oracle: exact integer probe/weight algebra per point."""
    cells = {}
    for (tx, ty), grid in tiles.items():
        for pix, n in enumerate(grid):
            if n:
                cells[(tx * res + pix % res, ty * res + pix // res)] = n
    out = {}
    for pid, xn, yn in pts:
        if method == "nearest":
            gx = (2 * xn + den) // (2 * den)
            gy = (2 * yn + den) // (2 * den)
            out[pid] = cells.get((gx, gy), 0)
        else:
            gx0, fx = xn // den, xn % den
            gy0, fy = yn // den, yn % den
            v = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    w = (fx if dx else den - fx) * (fy if dy else den - fy)
                    v += w * cells.get((gx0 + dx, gy0 + dy), 0)
            out[pid] = v
    return out


def _mk_pts_df(spark, pts):
    return spark.createDataFrame(pts, "pid long, xn long, yn long")


@pytest.mark.parametrize("method", ["bilinear", "nearest"])
@pytest.mark.parametrize("den", [1, 2, 7])
def test_sample_matches_python_oracle(spark, method, den):
    rng = random.Random(hash((method, den)) & 0xFFFF)
    res = 8
    tiles = _rand_tiles(rng, res, 6)
    # points spanning inside, on-lattice, tile seams, negatives and far
    # outside the raster (must sample 0, one row each)
    pts = [
        (i, rng.randint(-4 * res * den, 4 * res * den),
         rng.randint(-4 * res * den, 4 * res * den))
        for i in range(200)
    ]
    pts += [(200, 10**7 * den, 10**7 * den), (201, 0, 0)]
    got = {
        r["pid"]: r["val_num"]
        for r in warp.sample_at_points(
            _mk_pts_df(spark, pts).repartition(5), _mk_df(spark, tiles),
            res, den=den, method=method,
        ).collect()
    }
    want = _py_sample(tiles, res, pts, den, method)
    assert got == want


def test_sample_bilinear_on_lattice_equals_nearest(spark):
    """Integer pixel coordinates: bilinear degenerates to the cell value
    scaled by den^2, and only ONE probe survives the zero-weight filter."""
    rng = random.Random(4)
    res = 4
    tiles = _rand_tiles(rng, res, 4, density=1.0)
    den = 5
    pts = [(i, den * rng.randint(-2, 2 * res), den * rng.randint(-2, 2 * res))
           for i in range(50)]
    pdf = _mk_pts_df(spark, pts)
    tdf = _mk_df(spark, tiles)
    bil = {r["pid"]: r["val_num"] for r in warp.sample_at_points(
        pdf, tdf, res, den=den, method="bilinear").collect()}
    near = {r["pid"]: r["val_num"] for r in warp.sample_at_points(
        pdf, tdf, res, den=den, method="nearest").collect()}
    assert bil == {pid: v * den * den for pid, v in near.items()}


def test_sample_bilinear_reproduces_linear_ramp(spark):
    """Exactness on a ramp z = 2x + 3y + 7: the den^2-scaled bilinear value
    at (xn/den, yn/den) equals den*(2*xn + 3*yn) + 7*den^2 wherever all four
    neighbors exist."""
    res = 8
    grid = {}
    for tx in range(2):
        for ty in range(2):
            grid[(tx, ty)] = [
                2 * (tx * res + pix % res) + 3 * (ty * res + pix // res) + 7
                for pix in range(res * res)
            ]
    den = 4
    rng = random.Random(9)
    pts = [
        (i, rng.randint(0, (2 * res - 2) * den), rng.randint(0, (2 * res - 2) * den))
        for i in range(100)
    ]
    got = {r["pid"]: r["val_num"] for r in warp.sample_at_points(
        _mk_pts_df(spark, pts), _mk_df(spark, grid), res, den=den).collect()}
    for pid, xn, yn in pts:
        assert got[pid] == den * (2 * xn + 3 * yn) + 7 * den * den, pid


def test_sample_duckdb_twin(spark):
    import duckdb

    rng = random.Random(11)
    res = 8
    tiles = _rand_tiles(rng, res, 6)
    den = 3
    pts = [
        (i, rng.randint(-2 * res * den, 4 * res * den),
         rng.randint(-2 * res * den, 4 * res * den))
        for i in range(150)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE tiles(tx BIGINT, ty BIGINT, counts BIGINT[])")
    con.executemany(
        "INSERT INTO tiles VALUES (?, ?, ?)",
        [(tx, ty, grid) for (tx, ty), grid in tiles.items()],
    )
    con.execute("CREATE TABLE pts(pid BIGINT, xn BIGINT, yn BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", pts)
    for method in ("bilinear", "nearest"):
        got = {r["pid"]: r["val_num"] for r in warp.sample_at_points(
            _mk_pts_df(spark, pts), _mk_df(spark, tiles), res,
            den=den, method=method,
        ).collect()}
        want = dict(con.execute(warp.sample_at_points_sql(
            "SELECT pid, xn, yn FROM pts", "tiles", res,
            den=den, method=method,
        )).fetchall())
        assert got == want, method


# ---------------------------------------------------------------------------
# elevation profile along polylines
# ---------------------------------------------------------------------------
def test_elevation_profile_ramp_closed_form(spark):
    """Raster z = 3*gx (cell centers... lattice nodes): along a horizontal
    line the bilinear value at station xn/den is EXACTLY 3*xn/den ->
    val_num = 3*xn*den; station count/spacing and exact cumulative
    distances verified; segment joints emit once."""
    from pyspark.sql import functions as F

    from engine import warp

    res = 8
    counts = [3 * (tx * res + i % res) for tx in (0,) for i in range(res * res)]
    tiles = spark.createDataFrame(
        [(tx, ty, [3 * (tx * res + i % res) for i in range(res * res)])
         for tx in (0, 1) for ty in (0,)],
        "tx long, ty long, counts array<long>",
    )
    _ = counts
    lines = spark.createDataFrame(
        [(1, [{"x": 1.0, "y": 2.0}, {"x": 7.0, "y": 2.0},
              {"x": 7.0, "y": 5.0}])],
        "line_id long, pts array<struct<x double, y double>>",
    )
    out = warp.elevation_profile(
        lines, tiles, res, spacing=2.0, den=4
    ).collect()
    # segment 1: len 6 -> ns 3 (stations j=0..3); segment 2: len 3 -> ns 2
    # (j=1..2): 6 stations total, stations 0..5
    assert [r["station"] for r in out] == list(range(6))
    den = 4
    for r in out[:4]:  # horizontal part: x = 1 + 2*j, y = 2
        j = r["station"]
        assert r["xn"] == (1 + 2 * j) * den and r["yn"] == 2 * den
        assert r["val_num"] == 3 * r["xn"] * den  # exact ramp bilinear
    # cumulative distance: 2.0 per station on seg 1, then 1.5 per station
    assert [r["dist_e6"] for r in out] == [
        0, 2000000, 4000000, 6000000, 7500000, 9000000
    ]
    # vertical part keeps x = 7
    for r in out[4:]:
        assert r["xn"] == 7 * den
    # nearest method returns the verbatim cell value at the rounded node
    near = warp.elevation_profile(
        lines, tiles, res, spacing=2.0, den=4, method="nearest"
    ).collect()
    for r in near[:4]:
        assert r["val_num"] == 3 * (r["xn"] // den)
    import pytest as _pt

    with _pt.raises(ValueError):
        warp.elevation_profile(lines, tiles, res, spacing=0.0)
