"""engine.multimodal.image_blobs: exact per-image connected-component
labeling (run-length union-find) vs a brute BFS oracle, connectivity
semantics, deterministic ordering/cap, per-row error isolation."""

import random
from collections import deque

import numpy as np
import pytest

from engine import image_codec
from engine.multimodal import image_blobs, np_blob_label
from tests.conftest import spark  # noqa: F401


def _bfs_blobs(mask, connectivity):
    """Brute-force oracle: label = min flat idx, plus (area, bbox) stats."""
    h, w = mask.shape
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    seen = np.zeros_like(mask, dtype=bool)
    labels = np.full((h, w), -1, dtype=np.int64)
    stats = {}
    for y in range(h):
        for x in range(w):
            if not mask[y, x] or seen[y, x]:
                continue
            q = deque([(y, x)])
            seen[y, x] = True
            pix = []
            while q:
                cy, cx = q.popleft()
                pix.append((cy, cx))
                for dy, dx in offs:
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] \
                            and not seen[ny, nx]:
                        seen[ny, nx] = True
                        q.append((ny, nx))
            lab = min(py * w + px for py, px in pix)
            for py, px in pix:
                labels[py, px] = lab
            ys = [p[0] for p in pix]
            xs = [p[1] for p in pix]
            stats[lab] = (len(pix), min(xs), min(ys), max(xs), max(ys))
    return labels, stats


@pytest.mark.parametrize("connectivity", [4, 8])
def test_blob_label_random_oracle(connectivity):
    rng = np.random.default_rng(61)
    for density in (0.2, 0.5, 0.8):
        mask = rng.random((23, 31)) < density
        got = np_blob_label(mask, connectivity)
        want, _ = _bfs_blobs(mask, connectivity)
        assert np.array_equal(got, want), (connectivity, density)


def test_blob_label_diagonal_touch():
    """Two squares touching only at a corner: 2 blobs at 4-conn, 1 at 8."""
    mask = np.zeros((6, 6), dtype=bool)
    mask[0:3, 0:3] = True
    mask[3:6, 3:6] = True
    l4 = np_blob_label(mask, 4)
    l8 = np_blob_label(mask, 8)
    assert len(np.unique(l4[mask])) == 2
    assert len(np.unique(l8[mask])) == 1
    assert np.unique(l8[mask])[0] == 0  # min flat idx of the union
    with pytest.raises(ValueError):
        np_blob_label(mask, 6)


def _img_rows(spark, imgs):
    """imgs: list of (image_id, (h, w, 3) uint8 array or None-for-corrupt)."""
    rows = []
    for iid, px in imgs:
        if px is None:
            rows.append((iid, b"xx", 2, 1, "tiff"))
        else:
            h, w, _ = px.shape
            rows.append((iid, image_codec.encode_raw(px), w, h, "raw"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_blobs_planted_and_errors(spark):
    """Planted bright rectangles on dark ground: exact count/area/bbox,
    area-desc ordering, cap visibility, unsupported-format isolation."""
    px = np.zeros((20, 30, 3), dtype=np.uint8)
    px[2:5, 3:9] = 200      # blob A: 3x6 = 18
    px[10:18, 20:24] = 255  # blob B: 8x4 = 32
    rng = random.Random(7)
    df = _img_rows(spark, [("ok", px), ("bad", None)])
    rows = {r["image_id"]: r for r in image_blobs(df, threshold=128).collect()}
    ok = rows["ok"]
    assert ok["n_blobs"] == 2 and ok["error"] is None
    b0, b1 = ok["blobs"]
    assert (b0["area"], b0["xmin"], b0["ymin"], b0["xmax"], b0["ymax"]) == \
        (32, 20, 10, 23, 17)
    assert (b1["area"], b1["xmin"], b1["ymin"], b1["xmax"], b1["ymax"]) == \
        (18, 3, 2, 8, 4)
    assert b1["label"] == 2 * 30 + 3
    bad = rows["bad"]
    assert bad["error"] is not None and bad["n_blobs"] is None
    # cap: max_blobs=1 keeps the largest but reports the uncapped count
    capped = {r["image_id"]: r
              for r in image_blobs(df, threshold=128, max_blobs=1).collect()}
    assert capped["ok"]["n_blobs"] == 2 and len(capped["ok"]["blobs"]) == 1
    assert capped["ok"]["blobs"][0]["area"] == 32
    _ = rng  # determinism of the planted case needs no rng draws


def test_image_blobs_random_vs_oracle(spark):
    """Random noise image: spark blob stats == the BFS oracle's, both
    connectivities."""
    rng = np.random.default_rng(62)
    gray = (rng.random((17, 13)) < 0.45).astype(np.uint8) * 255
    px = np.repeat(gray[:, :, None], 3, axis=2)
    df = _img_rows(spark, [("n", px)])
    for conn in (4, 8):
        row = image_blobs(
            df, threshold=128, connectivity=conn, max_blobs=1000
        ).collect()[0]
        _, stats = _bfs_blobs(gray >= 128, conn)
        got = {
            b["label"]: (b["area"], b["xmin"], b["ymin"],
                         b["xmax"], b["ymax"])
            for b in row["blobs"]
        }
        assert row["n_blobs"] == len(stats)
        assert got == stats


def test_blobs_to_nms_detection_pipeline(spark):
    """Composition: image_blobs -> boxes -> per-image NMS. Two overlapping
    bright patches merge into one blob (one box survives trivially); two
    disjoint blobs yield two surviving boxes — the segmentation->suppression
    hand-off uses only public operator surfaces."""
    from pyspark.sql import functions as F

    from engine.nms import nms_boxes

    px = np.zeros((24, 24, 3), dtype=np.uint8)
    px[2:8, 2:8] = 255     # blob 1
    px[14:22, 10:20] = 255  # blob 2 (disjoint)
    df = _img_rows(spark, [("img", px)])
    boxes = (
        image_blobs(df, threshold=128)
        .select("image_id", F.posexplode("blobs").alias("i", "b"))
        .select(
            "image_id",
            F.col("b.label").alias("box_id"),
            F.col("b.xmin").cast("double").alias("x0"),
            F.col("b.ymin").cast("double").alias("y0"),
            (F.col("b.xmax") + 1).cast("double").alias("x1"),
            (F.col("b.ymax") + 1).cast("double").alias("y1"),
            F.col("b.area").cast("double").alias("score"),
            F.lit(0).alias("cls"),
        )
    )
    kept = nms_boxes(boxes, iou_threshold=0.3).collect()
    assert sorted(r["box_id"] for r in kept) == [2 * 24 + 2, 14 * 24 + 10]
