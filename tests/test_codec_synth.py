"""Image codec round-trips + synth determinism + the Spark-side verify kernel
(BASELINE.json per-row invariant: decoded-pixel allclose / PSNR>=40dB + caption)."""

import numpy as np
from pyspark.sql import functions as F

from engine import cells, image_codec, synth


def test_png_roundtrip():
    rng = np.random.default_rng(42)
    for w, h in [(16, 16), (32, 64), (5, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        enc = image_codec.encode_png(px)
        dec = image_codec.decode_png(enc)
        assert (dec == px).all()


def test_raw_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(32, 16, 3), dtype=np.uint8)
    assert (image_codec.decode_raw(image_codec.encode_raw(px), 16, 32) == px).all()


def test_psnr():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert image_codec.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 255
    assert 0 < image_codec.psnr(a, b) < 100


def test_images_df_deterministic_and_verified(spark):
    df1 = synth.images_df(spark, 60, with_bytes=True).toPandas().sort_values("image_id")
    df2 = synth.images_df(spark, 60, with_bytes=True, partitions=3).toPandas().sort_values(
        "image_id"
    )
    assert (df1["phash"].to_numpy() == df2["phash"].to_numpy()).all()
    assert all(a == b for a, b in zip(df1["bytes"], df2["bytes"]))
    assert set(df1["fmt"]) == {"raw", "png"}
    # Spark-side verification kernel (mapInPandas, Arrow batches)
    ver = (
        synth.images_df(spark, 60, with_bytes=True)
        .mapInPandas(image_codec.verify_images_batches(), schema=image_codec.VERIFY_SCHEMA)
        .toPandas()
    )
    assert ver["pixels_ok"].all()
    assert ver["caption_ok"].all()
    assert len(ver) == 60


def test_images_hot_frac_skews_anchors(spark):
    df = synth.images_df(spark, 1000, hot_frac=0.8).select(
        cells.anchor_lon(F.col("phash")).alias("lon"),
        cells.anchor_lat(F.col("phash")).alias("lat"),
    ).toPandas()
    in_box = (
        (df["lon"] >= synth.HOT_LON_MIN)
        & (df["lon"] <= synth.HOT_LON_MIN + synth.HOT_BOX_DEG)
        & (df["lat"] >= synth.HOT_LAT_MIN)
        & (df["lat"] <= synth.HOT_LAT_MIN + synth.HOT_BOX_DEG)
    ).mean()
    assert in_box > 0.75


def test_object_versions_fixture_shape(spark):
    df = synth.object_versions_df(spark, n_entities=80)
    pdf = df.toPandas()
    assert set(pdf["type"]) == {"node", "way", "relation"}
    assert (pdf.groupby("id")["version"].apply(lambda s: sorted(s) == list(range(1, len(s) + 1)))).all()
    nodes = pdf[pdf["type"] == "node"]
    assert nodes["lon"].notna().all()
    ways = pdf[pdf["type"] == "way"]
    assert ways["children"].map(lambda c: c is not None and len(c) >= 1).all()


def test_image_pipeline_digest_golden(spark):
    """The merged binary-image query's digest rows are pinned by a committed
    golden: the driver's check for it is rows-only (no SQL twin for binary
    payloads), so this is the value gate (VERDICT r2 item 7)."""
    import json
    from pathlib import Path

    import __spark_entry__ as entry

    golden = json.loads(
        (Path(__file__).parent / "golden" / "golden_digests.json").read_text()
    )["image_pipeline"]
    rows = entry.q_image_pipeline(spark, "/root/testdata/sf0.001").collect()
    got = {r["metric"]: r["value"] for r in rows}
    assert got == golden
