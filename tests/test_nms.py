"""Detection-box NMS vs an independent pure-Python greedy oracle; the global
variant must equal whole-layer greedy exactly (component factoring)."""

import random

import pytest
from pyspark.sql import functions as F

from engine import nms


def _py_greedy(rows, iou_t):
    """Independent oracle: plain-Python greedy NMS. rows = [(box_id, x0,
    y0, x1, y1, score)]; returns kept box_id set."""
    order = sorted(rows, key=lambda r: (-r[5], r[0]))
    kept, out = [], set()
    for r in order:
        ok = True
        for k in kept:
            ix0, iy0 = max(r[1], k[1]), max(r[2], k[2])
            ix1, iy1 = min(r[3], k[3]), min(r[4], k[4])
            inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
            a1 = max(r[3] - r[1], 0.0) * max(r[4] - r[2], 0.0)
            a2 = max(k[3] - k[1], 0.0) * max(k[4] - k[2], 0.0)
            union = a1 + a2 - inter
            if union > 0 and inter / union >= iou_t:
                ok = False
                break
        if ok:
            kept.append(r)
            out.add(r[0])
    return out


def _random_boxes(rng, n, span=100.0, size=8.0):
    rows = []
    for i in range(n):
        x0 = rng.uniform(0, span)
        y0 = rng.uniform(0, span)
        w = rng.uniform(1.0, size)
        h = rng.uniform(1.0, size)
        rows.append((i, x0, y0, x0 + w, y0 + h, rng.uniform(0, 1)))
    return rows


@pytest.mark.parametrize("seed,n", [(1, 60), (2, 150), (3, 300)])
def test_per_image_nms_matches_oracle(spark, seed, n):
    rng = random.Random(seed)
    rows = _random_boxes(rng, n, span=40.0)  # dense -> many suppressions
    df = spark.createDataFrame(
        [(f"img{i % 3}", bid, x0, y0, x1, y1, s, 0)
         for i, (bid, x0, y0, x1, y1, s) in enumerate(rows)],
        ["image_id", "box_id", "x0", "y0", "x1", "y1", "score", "cls"],
    )
    got = {
        (r["image_id"], r["box_id"])
        for r in nms.nms_boxes(df, iou_threshold=0.3).collect()
    }
    want = set()
    for img in ("img0", "img1", "img2"):
        grp = [
            rows[i] for i in range(n) if f"img{i % 3}" == img
        ]
        for bid in _py_greedy(grp, 0.3):
            want.add((img, bid))
    assert got == want


def test_per_class_grouping(spark):
    # identical overlapping boxes in two classes: per_class keeps one of
    # each, per_class=False keeps only the best overall
    df = spark.createDataFrame(
        [("a", 1, 0.0, 0.0, 10.0, 10.0, 0.9, 0),
         ("a", 2, 1.0, 1.0, 11.0, 11.0, 0.8, 1),
         ("a", 3, 0.5, 0.5, 10.5, 10.5, 0.7, 0)],
        ["image_id", "box_id", "x0", "y0", "x1", "y1", "score", "cls"],
    )
    by_cls = {r["box_id"] for r in nms.nms_boxes(df, 0.3).collect()}
    merged = {r["box_id"] for r in nms.nms_boxes(df, 0.3, per_class=False).collect()}
    assert by_cls == {1, 2}
    assert merged == {1}


def test_min_score_and_cap(spark):
    rows = [("a", i, float(i), 0.0, float(i) + 1.0, 1.0, i / 10.0, 0)
            for i in range(10)]  # disjoint boxes, scores 0.0..0.9
    df = spark.createDataFrame(
        rows, ["image_id", "box_id", "x0", "y0", "x1", "y1", "score", "cls"]
    )
    out = nms.nms_boxes(df, 0.5, min_score=0.45).collect()
    assert {r["box_id"] for r in out} == {5, 6, 7, 8, 9}
    capped = nms.nms_boxes(df, 0.5, max_boxes=3).collect()
    # cap keeps the top-3 scores before the kernel
    assert {r["box_id"] for r in capped} == {7, 8, 9}


def test_overlap_pairs_exact_vs_bruteforce(spark):
    rng = random.Random(9)
    rows = _random_boxes(rng, 120, span=60.0)
    df = spark.createDataFrame(
        [(bid, x0, y0, x1, y1, s) for bid, x0, y0, x1, y1, s in rows],
        ["box_id", "x0", "y0", "x1", "y1", "score"],
    )
    got = {
        (r["box_a"], r["box_b"])
        for r in nms.overlap_pairs(df, 0.2, cell_size=7.0).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ix0, iy0 = max(a[1], b[1]), max(a[2], b[2])
            ix1, iy1 = min(a[3], b[3]), min(a[4], b[4])
            inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
            a1 = (a[3] - a[1]) * (a[4] - a[2])
            a2 = (b[3] - b[1]) * (b[4] - b[2])
            if inter / (a1 + a2 - inter) >= 0.2:
                want.add((min(a[0], b[0]), max(a[0], b[0])))
    assert got == want


@pytest.mark.parametrize("seed,n,cell", [(4, 120, 8.0), (5, 250, 16.0)])
def test_global_nms_equals_whole_layer_greedy(spark, seed, n, cell):
    rng = random.Random(seed)
    rows = _random_boxes(rng, n, span=50.0)  # dense map layer
    df = spark.createDataFrame(
        [(bid, x0, y0, x1, y1, s) for bid, x0, y0, x1, y1, s in rows],
        ["box_id", "x0", "y0", "x1", "y1", "score"],
    )
    got = {
        r["box_id"]
        for r in nms.nms_global(df, 0.3, cell_size=cell).collect()
    }
    assert got == _py_greedy(rows, 0.3)


def test_global_nms_planted_clusters(spark):
    # 20 clusters of 5 near-identical boxes far apart: exactly the best of
    # each cluster survives
    rows = []
    for c in range(20):
        bx = c * 1000.0
        for j in range(5):
            rows.append(
                (c * 5 + j, bx + j * 0.5, j * 0.5, bx + 20.0 + j * 0.5,
                 20.0 + j * 0.5, 0.5 + 0.01 * j)
            )
    df = spark.createDataFrame(
        rows, ["box_id", "x0", "y0", "x1", "y1", "score"]
    )
    got = {r["box_id"] for r in nms.nms_global(df, 0.5, cell_size=30.0).collect()}
    assert got == {c * 5 + 4 for c in range(20)}  # j=4 has the top score


def test_global_component_guard(spark):
    rows = [(i, 0.0 + i * 0.1, 0.0, 100.0 + i * 0.1, 100.0, 0.5)
            for i in range(30)]  # one giant overlap component
    df = spark.createDataFrame(
        rows, ["box_id", "x0", "y0", "x1", "y1", "score"]
    )
    with pytest.raises(RuntimeError, match="component"):
        nms.nms_global(df, 0.3, cell_size=64.0, max_component=10)
