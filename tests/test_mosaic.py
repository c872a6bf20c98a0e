"""tile_mosaic: numpy-oracle byte equality, skew cap, error isolation,
partition invariance."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import cells, image_codec, multimodal, synth

GRID, THUMB = 3, 8
RES = 2  # coarse tiles -> several images per tile at n=200


def _tiles(df):
    return df.withColumn("tile_id", cells.grid_encode_phash(F.col("phash"), RES))


@pytest.fixture(scope="module")
def imgs(spark):
    df = _tiles(synth.images_df(spark, 200, with_bytes=True)).persist()
    df.count()
    yield df
    df.unpersist()


def _np_mosaic(rows):
    """Pure-numpy reference: rows = [(image_id, bytes, w, h, fmt)] in rank order."""
    side = GRID * THUMB
    canvas = np.zeros((side, side, 3), dtype=np.uint8)
    n_err = 0
    for slot, (iid, blob, w, h, fmt) in enumerate(rows[: GRID * GRID]):
        try:
            px = image_codec.decode_image(blob, fmt, w, h)
        except Exception:
            n_err += 1
            continue
        h0, w0, _ = px.shape
        yi = (np.arange(THUMB) * h0 // THUMB).clip(0, h0 - 1)
        xi = (np.arange(THUMB) * w0 // THUMB).clip(0, w0 - 1)
        r, c = divmod(slot, GRID)
        canvas[r * THUMB : (r + 1) * THUMB, c * THUMB : (c + 1) * THUMB] = px[yi][:, xi]
    return image_codec.encode_raw(canvas), n_err


def test_mosaic_matches_numpy_oracle(imgs):
    got = {
        r["tile_id"]: r
        for r in multimodal.tile_mosaic(imgs, grid=GRID, thumb=THUMB).collect()
    }
    raw = sorted(
        imgs.select("tile_id", "image_id", "bytes", "w", "h", "fmt").collect(),
        key=lambda r: (r["tile_id"], r["image_id"]),
    )
    by_tile = {}
    for r in raw:
        by_tile.setdefault(r["tile_id"], []).append(
            (r["image_id"], bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        )
    assert set(got) == set(by_tile)
    for tid, rows in by_tile.items():
        want_bytes, want_err = _np_mosaic(rows)
        g = got[tid]
        assert bytes(g["mosaic"]) == want_bytes, tid
        assert g["n_errors"] == want_err
        assert g["n_images"] == min(len(rows), GRID * GRID)
        assert g["ids_csv"] == ",".join(i for i, *_ in rows[: GRID * GRID])
        assert g["w"] == g["h"] == GRID * THUMB


def test_hot_tile_capped(spark):
    # hot_frac routes a chunk of images to one hot phash -> one dense tile
    df = _tiles(synth.images_df(spark, 400, with_bytes=True, hot_frac=0.5))
    out = multimodal.tile_mosaic(df, grid=GRID, thumb=THUMB).collect()
    assert max(r["n_images"] for r in out) == GRID * GRID  # never exceeds cap
    # and the mosaic payload stays fixed-size even for the hot tile
    assert all(len(bytes(r["mosaic"])) == (GRID * THUMB) ** 2 * 3 for r in out)


def test_unsupported_format_isolated(spark):
    df = _tiles(synth.images_df(spark, 60, with_bytes=True))
    df = df.withColumn(
        "fmt", F.when(F.col("image_id").endswith("0"), F.lit("jpeg")).otherwise(F.col("fmt"))
    )
    out = multimodal.tile_mosaic(df, grid=GRID, thumb=THUMB)
    agg = out.agg(F.sum("n_errors").alias("e"), F.sum("n_images").alias("n")).collect()[0]
    n_jpeg = df.filter(F.col("fmt") == "jpeg").count()
    assert agg["e"] > 0 and agg["e"] <= n_jpeg  # only capped jpeg members error
    assert agg["n"] >= agg["e"]


def test_partition_invariance(imgs):
    def digest(df):
        return sorted(
            (r["tile_id"], hashlib.md5(bytes(r["mosaic"])).hexdigest(), r["ids_csv"])
            for r in df.collect()
        )

    a = digest(multimodal.tile_mosaic(imgs.coalesce(1), grid=GRID, thumb=THUMB))
    b = digest(multimodal.tile_mosaic(imgs.repartition(13), grid=GRID, thumb=THUMB))
    assert a == b
