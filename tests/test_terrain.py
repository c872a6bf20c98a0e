"""engine.terrain: Horn gradients (halo fused vs scatter twin vs Python
oracle, exact int64) + slope/aspect/hillshade float view (numpy parity,
closed forms on ramps and flats)."""

import math
import random

import numpy as np
import pytest

from engine import terrain
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
    tiles[next(iter(tiles))] = [0] * (res * res)
    return tiles


def _mk_df(spark, tiles):
    return spark.createDataFrame(
        [(tx, ty, grid) for (tx, ty), grid in tiles.items()],
        "tx long, ty long, counts array<long>",
    )


def _py_gradients(tiles, res):
    """Python oracle: Horn numerators with zero padding outside the tile
    union, y up."""
    cells = {}
    for (tx, ty), grid in tiles.items():
        for pix, n in enumerate(grid):
            cells[(tx * res + pix % res, ty * res + pix // res)] = n
    out = {}
    for (tx, ty), _grid in tiles.items():
        gxs = [0] * (res * res)
        gys = [0] * (res * res)
        for py in range(res):
            for px in range(res):
                x, y = tx * res + px, ty * res + py

                def z(dx, dy):
                    return cells.get((x + dx, y + dy), 0)

                gxs[py * res + px] = (
                    z(1, -1) + 2 * z(1, 0) + z(1, 1)
                    - z(-1, -1) - 2 * z(-1, 0) - z(-1, 1)
                )
                gys[py * res + px] = (
                    z(-1, 1) + 2 * z(0, 1) + z(1, 1)
                    - z(-1, -1) - 2 * z(0, -1) - z(1, -1)
                )
        out[(tx, ty)] = (gxs, gys)
    return out


def _collect_grads(df):
    return {
        (r["tx"], r["ty"]): (list(r["dzdx8"]), list(r["dzdy8"]))
        for r in df.collect()
    }


@pytest.mark.parametrize("kernel", ["halo", "scatter"])
def test_gradients_match_python_oracle(spark, kernel):
    rng = random.Random(411)
    res = 8
    tiles = _rand_tiles(rng, res, 10)
    df = _mk_df(spark, tiles).repartition(5)
    got = _collect_grads(terrain.terrain_gradients(df, res, kernel=kernel))
    want = _py_gradients(tiles, res)
    assert got == want


def test_halo_equals_scatter(spark):
    rng = random.Random(412)
    res = 16
    tiles = _rand_tiles(rng, res, 14, span=5, density=0.4)
    df = _mk_df(spark, tiles).repartition(7)
    halo = _collect_grads(terrain.terrain_gradients(df, res, kernel="halo"))
    scat = _collect_grads(terrain.terrain_gradients(df, res, kernel="scatter"))
    assert halo == scat


def test_ramp_closed_form(spark):
    """z = 7x on a 3x3 block of tiles: interior pixels have dzdx8 = 8*7 = 56,
    dzdy8 = 0 -> slope = atan(7), aspect = west (descent toward -x: 3 pi/2
    clockwise from north), hillshade = closed form."""
    res = 8
    tiles = {
        (tx, ty): [
            7 * (tx * res + pix % res + 100) for pix in range(res * res)
        ]
        for tx in (0, 1, 2)
        for ty in (0, 1, 2)
    }
    df = _mk_df(spark, tiles)
    grads = terrain.terrain_gradients(df, res)
    out = terrain.slope_aspect_hillshade(grads)
    rows = {(r["tx"], r["ty"]): r for r in out.collect()}
    r = rows[(1, 1)]  # fully interior tile
    assert all(v == 56 for v in r["dzdx8"])
    assert all(v == 0 for v in r["dzdy8"])
    p = 56 / 8.0
    slope = math.atan(math.hypot(p, 0.0))
    az, alt = math.radians(315.0), math.radians(45.0)
    shade = 255.0 * max(
        0.0,
        (math.sin(alt) - math.cos(alt) * p * math.sin(az))
        / math.sqrt(1.0 + p * p),
    )
    assert all(abs(v - slope) < 1e-12 for v in r["slope_rad"])
    assert all(abs(v - (3 * math.pi / 2)) < 1e-12 for v in r["aspect_rad"])
    assert all(abs(v - shade) < 1e-9 for v in r["hillshade"])


def test_flat_field(spark):
    """Constant elevation: interior gradients 0, slope 0, aspect -1 flag,
    hillshade = 255 sin(alt)."""
    res = 8
    tiles = {
        (tx, ty): [500] * (res * res) for tx in (0, 1, 2) for ty in (0, 1, 2)
    }
    df = _mk_df(spark, tiles)
    out = terrain.slope_aspect_hillshade(
        terrain.terrain_gradients(df, res), altitude_deg=60.0
    )
    r = {(row["tx"], row["ty"]): row for row in out.collect()}[(1, 1)]
    assert all(v == 0 for v in r["dzdx8"]) and all(v == 0 for v in r["dzdy8"])
    assert all(v == 0.0 for v in r["slope_rad"])
    assert all(v == -1.0 for v in r["aspect_rad"])
    want = 255.0 * math.sin(math.radians(60.0))
    assert all(abs(v - want) < 1e-9 for v in r["hillshade"])


def test_float_view_matches_numpy(spark):
    """slope/aspect/hillshade vs a straight numpy evaluation of the same
    formulas over the exact integer gradients, incl. z_factor/cellsize."""
    rng = random.Random(413)
    res = 8
    tiles = _rand_tiles(rng, res, 6, density=0.7)
    df = _mk_df(spark, tiles)
    cellsize, zf, azd, altd = 30.0, 2.0, 200.0, 35.0
    out = terrain.slope_aspect_hillshade(
        terrain.terrain_gradients(df, res),
        cellsize=cellsize, z_factor=zf, azimuth_deg=azd, altitude_deg=altd,
    )
    for r in out.collect():
        a8 = np.array(r["dzdx8"], dtype=np.float64)
        b8 = np.array(r["dzdy8"], dtype=np.float64)
        p = a8 * (zf / (8.0 * cellsize))
        q = b8 * (zf / (8.0 * cellsize))
        az, alt = math.radians(azd), math.radians(altd)
        slope = np.arctan(np.sqrt(p * p + q * q))
        aspect = np.where(
            (a8 == 0) & (b8 == 0),
            -1.0,
            np.mod(np.arctan2(-p, -q), 2.0 * math.pi),
        )
        cang = (math.sin(alt) - math.cos(alt) * (
            p * math.sin(az) + q * math.cos(az)
        )) / np.sqrt(1.0 + p * p + q * q)
        shade = 255.0 * np.maximum(cang, 0.0)
        assert np.allclose(r["slope_rad"], slope, atol=1e-12)
        assert np.allclose(r["aspect_rad"], aspect, atol=1e-12)
        assert np.allclose(r["hillshade"], shade, atol=1e-9)


def test_hillshade_range_and_sun_direction(spark):
    """Hillshade stays in [0, 255]; a slope FACING the sun (descending
    toward the azimuth) shades brighter than flat, the opposite slope
    darker."""
    res = 8
    # z = -5x: descends toward +x (east). Sun from the east (az=90) should
    # brighten it; sun from the west (az=270) should darken it vs flat.
    tiles = {
        (tx, 0): [
            -5 * (tx * res + pix % res) for pix in range(res * res)
        ]
        for tx in (0, 1, 2)
    }
    df = _mk_df(spark, tiles)
    grads = terrain.terrain_gradients(df, res)
    flat = 255.0 * math.sin(math.radians(45.0))
    east = terrain.slope_aspect_hillshade(grads, azimuth_deg=90.0)
    west = terrain.slope_aspect_hillshade(grads, azimuth_deg=270.0)
    r_e = {(r["tx"], r["ty"]): r for r in east.collect()}[(1, 0)]
    r_w = {(r["tx"], r["ty"]): r for r in west.collect()}[(1, 0)]
    # interior rows of the middle tile (tile edges in y see the 0 padding)
    mid = [py * res + px for py in (2, 3, 4, 5) for px in range(res)]
    assert all(0.0 <= v <= 255.0 for v in r_e["hillshade"])
    assert all(r_e["hillshade"][i] > flat for i in mid)
    assert all(r_w["hillshade"][i] < flat for i in mid)
