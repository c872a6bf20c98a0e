"""Non-maximum suppression over detection-box frames — the image-detection
spatial operator (object detections over the 10^12-image table are boxes;
keeping the best non-overlapping ones is a spatial self-join problem).

Two exact operators:

- `nms_boxes`: classic per-group greedy NMS (group = image, or image x
  class). Groups are detector-output sized (10^1-10^3 boxes), so the greedy
  kernel runs as vectorized numpy inside ONE applyInPandas shuffle on the
  group key; a window pre-cap (same WindowGroupLimit trick as
  engine/multimodal.tile_mosaic) bounds every group at `max_boxes` rows
  BEFORE any Python sees it — a pathological million-box image cannot stall
  an executor.

- `nms_global`: greedy NMS across ONE georeferenced layer (boxes in map
  coordinates from many images — duplicate detections of the same physical
  object from overlapping acquisitions). Greedy suppression is sequential in
  global score order, which does NOT block-decompose; but suppression only
  propagates along IoU >= threshold OVERLAPS, so the exact result factors
  over connected components of the overlap graph. The plan is pure existing
  machinery: cell-cover self-join (each box keyed to the grid cells its
  rect touches; pairs meet in a shared cell, deduped by requiring the
  meet-cell to be the pair's min shared cell) -> IoU filter in Column
  algebra -> engine.graph.connected_components -> per-component greedy
  kernel. Component sizes track physical crowding (how many boxes overlap
  transitively), not dataset size — the same honest density bound as
  trajectory.colocation_pairs.

Determinism: greedy order is (-score, box_id) everywhere — ties resolve
identically in the Spark kernels and the tests' driver oracle (both numpy
float64, identical IoU expression shape).

The reference has no detection operator; this serves the brief's image axis
(multimodal detections are a first-class training-data signal). No DuckDB
registry row: greedy NMS needs recursion-with-state that SQL can't express
reasonably (same rationale as engine/quantize.py) — correctness is pinned by
driver-oracle parity + planted-structure pytest instead.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NMS_SCHEMA = (
    "group_key string, box_id long, x0 double, y0 double, "
    "x1 double, y1 double, score double, cls long"
)


def np_greedy_nms(
    boxes: np.ndarray, scores: np.ndarray, ids: np.ndarray, iou: float
) -> np.ndarray:
    """Greedy NMS over one group: boxes (n,4) [x0,y0,x1,y1], returns the
    positional indices KEPT, in greedy order. Vectorized suppression per
    accepted box (O(kept * n) numpy, no Python inner loop). Order:
    (-score, id) — deterministic under score ties."""
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ids, -scores))
    b = boxes[order]
    areas = np.maximum(b[:, 2] - b[:, 0], 0.0) * np.maximum(
        b[:, 3] - b[:, 1], 0.0
    )
    alive = np.ones(n, dtype=bool)
    kept = []
    for i in range(n):
        if not alive[i]:
            continue
        kept.append(order[i])
        # vectorized IoU of box i against every later alive box
        rest = np.nonzero(alive[i + 1 :])[0] + i + 1
        if len(rest) == 0:
            break
        xx0 = np.maximum(b[i, 0], b[rest, 0])
        yy0 = np.maximum(b[i, 1], b[rest, 1])
        xx1 = np.minimum(b[i, 2], b[rest, 2])
        yy1 = np.minimum(b[i, 3], b[rest, 3])
        inter = np.maximum(xx1 - xx0, 0.0) * np.maximum(yy1 - yy0, 0.0)
        union = areas[i] + areas[rest] - inter
        ious = np.where(union > 0.0, inter / union, 0.0)
        alive[rest[ious >= iou]] = False
    return np.asarray(kept, dtype=np.int64)


def _kernel(iou: float):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = np_greedy_nms(
            pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64),
            pdf["score"].to_numpy(dtype=np.float64),
            pdf["box_id"].to_numpy(dtype=np.int64),
            iou,
        )
        return pdf.iloc[np.sort(keep)]

    return run


def nms_boxes(
    dets: DataFrame,
    iou_threshold: float = 0.5,
    group_cols: tuple[str, ...] = ("image_id",),
    per_class: bool = True,
    box_id: str = "box_id",
    score_col: str = "score",
    cls_col: str = "cls",
    min_score: float | None = None,
    max_boxes: int = 4096,
) -> DataFrame:
    """Per-group greedy NMS. dets needs (group_cols..., box_id, x0, y0, x1,
    y1, score, cls). per_class=True adds cls to the group key (standard
    detector post-processing). min_score pre-filters JVM-side; max_boxes
    caps every group at the top-scoring rows via a window BEFORE the Python
    kernel. When max_boxes < spark.sql.window.group.limit.threshold
    (default 1000) Spark compiles the cap to a map-side WindowGroupLimit
    (partial top-k before the exchange); above it the cap is a plain
    post-shuffle filter — still bounds the kernel, without the map-side
    collapse (PLANS.md section 17 asserts the tight-cap shape). Output:
    the surviving rows, original columns."""
    keys = list(group_cols) + ([cls_col] if per_class else [])
    d = dets.select(
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys]).alias(
            "group_key"
        ),
        F.col(box_id).cast("long").alias("box_id"),
        F.col("x0").cast("double"),
        F.col("y0").cast("double"),
        F.col("x1").cast("double"),
        F.col("y1").cast("double"),
        F.col(score_col).cast("double").alias("score"),
        F.col(cls_col).cast("long").alias("cls"),
        *[F.col(k).alias(f"_k_{k}") for k in group_cols],
    )
    if min_score is not None:
        d = d.filter(F.col("score") >= min_score)
    w = Window.partitionBy("group_key").orderBy(
        F.col("score").desc(), F.col("box_id")
    )
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_boxes)
        .drop("_rn")
    )
    extra = ", ".join(
        f"_k_{k} {d.schema[f'_k_{k}'].dataType.simpleString()}"
        for k in group_cols
    )
    out = d.groupBy("group_key").applyInPandas(
        _kernel(iou_threshold), schema=NMS_SCHEMA + ", " + extra
    )
    return out.select(
        *[F.col(f"_k_{k}").alias(k) for k in group_cols],
        "box_id", "x0", "y0", "x1", "y1", "score", "cls",
    )


def _rect_cells(s: float):
    """All grid cells a rect touches, as an array Column (same floor-grid
    cell keying as engine.lines._cell)."""
    cx0 = F.floor(F.col("x0") / s).cast("long")
    cx1 = F.floor(F.col("x1") / s).cast("long")
    cy0 = F.floor(F.col("y0") / s).cast("long")
    cy1 = F.floor(F.col("y1") / s).cast("long")
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cy0, cy1),
                lambda cy: F.concat_ws(":", cx, cy),
            ),
        )
    )


def overlap_pairs(
    dets: DataFrame,
    iou_threshold: float,
    cell_size: float,
    box_id: str = "box_id",
) -> DataFrame:
    """(box_a, box_b, iou) for every pair with IoU >= threshold, each pair
    exactly once: rects expand to their touched-cell sets, pairs meet in
    shared cells, and the row survives only in the pair's MINIMUM shared
    cell (same dedup-free-by-construction idea as colocation's forward
    blocking — no distinct over the pair set). cell_size should be ~ the
    typical box diagonal: too small fans each rect out, too large crowds
    cells."""
    d = dets.select(
        F.col(box_id).cast("long").alias("box_id"),
        F.col("x0").cast("double"), F.col("y0").cast("double"),
        F.col("x1").cast("double"), F.col("y1").cast("double"),
    )
    e = d.select(
        "box_id", "x0", "y0", "x1", "y1",
        F.explode(_rect_cells(cell_size)).alias("cell"),
    )
    a = e.select(
        F.col("cell"),
        F.col("box_id").alias("box_a"),
        F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
    )
    b = e.select(
        F.col("cell"),
        F.col("box_id").alias("box_b"),
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    )
    ix0 = F.greatest("ax0", "bx0")
    iy0 = F.greatest("ay0", "by0")
    ix1 = F.least("ax1", "bx1")
    iy1 = F.least("ay1", "by1")
    inter = F.greatest(ix1 - ix0, F.lit(0.0)) * F.greatest(
        iy1 - iy0, F.lit(0.0)
    )
    area = lambda x0, y0, x1, y1: (  # noqa: E731
        F.greatest(F.col(x1) - F.col(x0), F.lit(0.0))
        * F.greatest(F.col(y1) - F.col(y0), F.lit(0.0))
    )
    union = area("ax0", "ay0", "ax1", "ay1") + area("bx0", "by0", "bx1", "by1") - inter
    iou = F.when(union > 0.0, inter / union).otherwise(F.lit(0.0))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("box_a") < F.col("box_b"))
        .withColumn("_iou", iou)
        .filter(F.col("_iou") >= iou_threshold)
    )
    # min-shared-cell ownership: recompute the intersection rect's min cell
    # (the pair overlaps, so the intersection is non-empty and its min
    # touched cell is shared by both rects)
    own = F.concat_ws(
        ":",
        F.floor(ix0 / cell_size).cast("long"),
        F.floor(iy0 / cell_size).cast("long"),
    )
    return pairs.filter(F.col("cell") == own).select(
        "box_a", "box_b", F.col("_iou").alias("iou")
    )


def nms_global(
    dets: DataFrame,
    iou_threshold: float = 0.5,
    cell_size: float = 64.0,
    box_id: str = "box_id",
    score_col: str = "score",
    max_component: int = 100_000,
) -> DataFrame:
    """Exact greedy NMS across one map-space layer: overlap-pair graph ->
    connected components (engine.graph) -> per-component greedy kernel.
    Identical output to running np_greedy_nms over the ENTIRE layer at once
    (suppression cannot cross a component boundary: greedy only removes
    boxes overlapping an accepted box, and acceptance order within a
    component is independent of other components). Boxes in no pair skip the
    kernel entirely (they always survive). max_component guards the
    pathological everything-overlaps-everything layer with a clear error
    instead of a stalled executor."""
    from .graph import connected_components

    d = dets.select(
        F.col(box_id).cast("long").alias("box_id"),
        F.col("x0").cast("double"), F.col("y0").cast("double"),
        F.col("x1").cast("double"), F.col("y1").cast("double"),
        F.col(score_col).cast("double").alias("score"),
    )
    pairs = overlap_pairs(d, iou_threshold, cell_size)
    comp = connected_components(pairs, src="box_a", dst="box_b")
    contested = d.join(
        comp.select(F.col("id").alias("box_id"), "comp"), "box_id"
    )
    biggest = (
        contested.groupBy("comp").count().agg(F.max("count")).collect()[0][0]
    )
    if biggest is not None and biggest > max_component:
        raise RuntimeError(
            f"nms_global: overlap component of {biggest} boxes exceeds "
            f"max_component={max_component} — raise the threshold or cap"
        )
    kept_schema = (
        "comp long, box_id long, x0 double, y0 double, x1 double, "
        "y1 double, score double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = np_greedy_nms(
            pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64),
            pdf["score"].to_numpy(dtype=np.float64),
            pdf["box_id"].to_numpy(dtype=np.int64),
            iou_threshold,
        )
        return pdf.iloc[np.sort(keep)]

    survivors = (
        contested.groupBy("comp")
        .applyInPandas(run, schema=kept_schema)
        .drop("comp")
    )
    solo = d.join(comp.select(F.col("id").alias("box_id")), "box_id", "left_anti")
    return survivors.unionByName(solo)
