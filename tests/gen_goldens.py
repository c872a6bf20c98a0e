"""Regenerate the committed golden fixtures under tests/golden/ from the NUMPY
oracles (never from the engine — FIXTURES.md §5: "the engine is never its own
oracle").

Usage: python -m tests.gen_goldens
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).parent / "golden"

N_IMAGES = 5000
N_POLYS = 15
KNN_K = 3
TILE_Z = 8
SEED = 42


def _phash(keys: np.ndarray) -> np.ndarray:
    x = (keys * 1103515245 + 12345) % 2**32
    y = (keys * 134775813 + 1) % 2**31
    return y * 2**32 + x


def _anchor(ph: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = ph % 2**32
    y = ph // 2**32
    return x / 2**32 * 360.0 - 180.0, y / 2**31 * 180.0 - 90.0


def _polygons():
    polys = []
    for i in range(N_POLYS):
        rng = np.random.default_rng([SEED, 7, i])
        hot = rng.random() < 0.3
        if hot:
            clon = 2.25 + rng.random() * 0.5
            clat = 48.75 + rng.random() * 0.5
            rlon, rlat = 0.05 + rng.random() * 0.3, 0.05 + rng.random() * 0.3
        else:
            clon, clat = rng.uniform(-170, 170), rng.uniform(-80, 80)
            rlon, rlat = 0.5 + rng.random() * 8.0, 0.5 + rng.random() * 6.0
        nv = int(rng.integers(5, 13))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        polys.append((i, clon + rlon * np.cos(ang), clat + rlat * np.sin(ang)))
    return polys


def _pip_inside(px, py, xs, ys):
    inside = np.zeros(px.shape, dtype=bool)
    j = len(xs) - 1
    for i in range(len(xs)):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        crosses = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= crosses & (px < x_int)
        j = i
    return inside


def main() -> None:
    GOLDEN_DIR.mkdir(exist_ok=True)
    keys = np.arange(N_IMAGES, dtype=np.int64)
    ph = _phash(keys)
    lon, lat = _anchor(ph)
    x = ph % 2**32
    y = ph // 2**32

    # golden_pip_join: (key, poly_id) containment pairs
    pip_pairs = []
    for pid, xs, ys in _polygons():
        hit = _pip_inside(lon, lat, xs, ys)
        pip_pairs += [[int(k), pid] for k in keys[hit]]
    (GOLDEN_DIR / "golden_pip_join.json").write_text(
        json.dumps(sorted(pip_pairs))
    )

    # golden_knn: (query_key, neighbor_key, rank) for every 40th image, k=3
    knn = []
    qkeys = keys[keys % 40 == 0]
    for q in qkeys:
        dx = (x - x[q]).astype(np.float64)
        dy = (y - y[q]).astype(np.float64)
        d = dx * dx + dy * dy
        order = sorted(range(N_IMAGES), key=lambda i: (d[i], i))[:KNN_K]
        knn += [[int(q), int(i), r + 1] for r, i in enumerate(order)]
    (GOLDEN_DIR / "golden_knn.json").write_text(json.dumps(sorted(knn)))

    # golden_tile_assign: (key, tile_id) at z=8 via pure integer arithmetic
    tx = (x >> (32 - TILE_Z)).astype(np.int64)
    ty = (y >> (31 - TILE_Z)).astype(np.int64)
    tiles = [[int(k), int(TILE_Z * 2**50 + a * 2**25 + b)]
             for k, a, b in zip(keys, tx, ty)]
    (GOLDEN_DIR / "golden_tile_assign.json").write_text(json.dumps(tiles))

    # golden_rollup: per-cell counts at res 7 (rolled up from 11 must equal this)
    ix7 = (x >> (32 - 7)).astype(np.int64)
    iy7 = (y >> (31 - 7)).astype(np.int64)
    cell7 = 7 * 2**58 + ix7 * 2**29 + iy7
    vals, counts = np.unique(cell7, return_counts=True)
    (GOLDEN_DIR / "golden_rollup.json").write_text(
        json.dumps(sorted([[int(c), int(n)] for c, n in zip(vals, counts)]))
    )
    # golden_digests.image_pipeline mosaic rows — independent numpy rebuild of
    # the tile_mosaic digest (spec: synth.images_df(n=200) pixels are
    # default_rng([42, key]) uint8; w = [16,32,64][k%3], h = [16,32,64][(k//3)%3];
    # tiles = grid cells at res 2; cap = 3x3 thumbs of 8x8, nearest-neighbor,
    # members in image_id (== key) order; codecs are lossless so fmt is moot)
    M_N, M_RES, M_GRID, M_THUMB = 200, 2, 3, 8
    mk = np.arange(M_N, dtype=np.int64)
    mph = _phash(mk)
    mx, my = mph % 2**32, mph // 2**32
    mcell = M_RES * 2**58 + (mx >> (32 - M_RES)) * 2**29 + (my >> (31 - M_RES))
    sizes = np.array([16, 32, 64])
    mw, mh = sizes[mk % 3], sizes[(mk // 3) % 3]
    by_tile: dict[int, list[int]] = {}
    for k in mk:
        by_tile.setdefault(int(mcell[k]), []).append(int(k))
    n_members = 0
    pixel_sum = 0
    for ks in by_tile.values():
        for k in sorted(ks)[: M_GRID * M_GRID]:
            n_members += 1
            rng = np.random.default_rng([SEED, k])
            px = rng.integers(0, 256, size=(int(mh[k]), int(mw[k]), 3), dtype=np.uint8)
            yi = (np.arange(M_THUMB) * int(mh[k]) // M_THUMB).clip(0, int(mh[k]) - 1)
            xi = (np.arange(M_THUMB) * int(mw[k]) // M_THUMB).clip(0, int(mw[k]) - 1)
            pixel_sum += int(px[yi][:, xi].sum(dtype=np.int64))
    # golden_digests.image_pipeline lossy_* rows — numpy rebuild of the lossy
    # block-DCT leg (spec: engine.synth.lossy_images_df(n=160, quality=95);
    # smooth-pixel math duplicated here verbatim from the FIXTURES spec; the
    # codec itself is the artifact under pin so encode/decode come from
    # engine.image_codec — same stance the mosaic golden takes on the
    # lossless codecs).
    from engine.image_codec import bdct_quality, decode_bdct, encode_bdct

    L_N, L_Q = 160, 95
    lsizes = np.array([24, 40, 64])
    l_lossy = l_4050 = 0
    l_min_e2, l_max_e2 = 1 << 62, -(1 << 62)
    l_v_pix = l_v_p40 = 0
    for k in range(L_N):
        w, h = int(lsizes[k % 3]), int(lsizes[(k // 3) % 3])
        if k % 4 == 3:
            w, h = w - 3, h - 5
        rng = np.random.default_rng([SEED, 7, k])
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        fx, fy = rng.uniform(0.5, 3.0, 2)
        phs = rng.uniform(0, 2 * np.pi, 3)
        base = rng.uniform(60, 180, 3)
        amp = rng.uniform(20, 60, 3)
        px = np.empty((h, w, 3))
        for c in range(3):
            px[:, :, c] = (
                base[c]
                + amp[c] * np.sin(2 * np.pi * fx * xx / w + phs[c])
                + 0.5 * amp[c] * np.cos(2 * np.pi * fy * yy / h + phs[c])
            )
        px += rng.normal(0, 2.0, (h, w, 3))
        px = np.clip(np.floor(px + 0.5), 0, 255).astype(np.uint8)
        blob = encode_bdct(px, L_Q)
        dec = decode_bdct(blob)
        mse = np.mean((px.astype(np.float64) - dec.astype(np.float64)) ** 2)
        p = float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
        e2 = int(np.floor(p * 100.0)) if np.isfinite(p) else -1
        l_lossy += int(not np.array_equal(px, dec))
        l_4050 += int(4000 <= e2 < 5000)
        l_min_e2, l_max_e2 = min(l_min_e2, e2), max(l_max_e2, e2)
        # verify-gate twin: decode -> re-encode at the stream quality -> decode
        dec2 = decode_bdct(encode_bdct(dec, bdct_quality(blob)))
        mse2 = np.mean((dec.astype(np.float64) - dec2.astype(np.float64)) ** 2)
        p2 = float("inf") if mse2 == 0 else 10.0 * np.log10(255.0**2 / mse2)
        l_v_pix += int(p2 >= 40.0 or p2 == float("inf"))
        l_v_p40 += int(p2 >= 40.0)

    dig_path = GOLDEN_DIR / "golden_digests.json"
    dig = json.loads(dig_path.read_text())
    dig["image_pipeline"].update(
        {
            "lossy_verify_n_images": L_N,
            "lossy_verify_n_pixels_ok": l_v_pix,
            "lossy_verify_n_psnr40": l_v_p40,
            "lossy_n_lossy": l_lossy,
            "lossy_n_psnr_40_50": l_4050,
            "lossy_min_psnr_e2": l_min_e2,
            "lossy_max_psnr_e2": l_max_e2,
        }
    )
    dig["image_pipeline"].update(
        {
            "mosaic_n_tiles": len(by_tile),
            "mosaic_n_members": n_members,
            "mosaic_n_errors": 0,
            "mosaic_pixel_sum": pixel_sum,
        }
    )
    dig_path.write_text(json.dumps(dig, indent=1, sort_keys=True) + "\n")

    print(f"goldens written to {GOLDEN_DIR}: pip={len(pip_pairs)} knn={len(knn)} "
          f"tiles={len(tiles)} rollup_cells={len(vals)} "
          f"mosaic_tiles={len(by_tile)} mosaic_pixel_sum={pixel_sum}")


if __name__ == "__main__":
    main()
