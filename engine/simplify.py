"""Polyline / ring simplification (Douglas-Peucker) over Arrow batches.

A tiling engine ships simplified geometries per zoom level (the reference
keeps full-resolution way geometries only because its outputs are diffs, not
tiles; this engine's raster<->vector assignment and tile bundling make
per-zoom simplification a first-class need). Douglas-Peucker is inherently
iterative per geometry, so it runs as a numpy kernel inside `mapInPandas`
(Arrow-batched, never per-row Python over Spark rows) — the same discipline
as engine/overlay.py's exact refine.

Semantics (segment-clamped DP):

- distance of an interior point to the CLOSED anchor segment (not the
  infinite line) decides splits, with strict `> tol`;
- therefore every dropped point lies within `tol` of the simplified
  polyline (each pruned interval's anchor segment is an edge of the
  result) — the guarantee `tests/test_simplify.py` fuzzes;
- first and last vertices are always kept; ties on the split pick
  (max distance, lowest index) so output is deterministic and
  partition-invariant;
- closed rings (first == last vertex) keep their closure.

Scale: embarrassingly parallel — one geometry never crosses a batch row, no
shuffle, no state; 100x more lines is 100x more partitions. Degenerate and
short (< 3 vertex) inputs pass through unchanged.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one polyline. Iterative stack form (no Python
    recursion limit); distances are squared segment-clamped. O(n^2) worst
    case, O(n log n) typical — all inner work is vectorized numpy."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        px = xs[i + 1 : j]
        py = ys[i + 1 : j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            # clamp the projection parameter to [0,1]: distance to the
            # segment, so the <= tol guarantee holds against the output edge
            t = ((px - ax) * dx + (py - ay) * dy) / seg2
            t = np.clip(t, 0.0, 1.0)
            d2 = (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
        k = int(np.argmax(d2))  # first max -> deterministic tie-break
        if d2[k] > tol2:
            split = i + 1 + k
            keep[split] = True
            stack.append((split, j))
            stack.append((i, split))
    return keep


def dp_reference(pts: list[tuple[float, float]], tol: float) -> list[tuple[float, float]]:
    """Plain-Python recursive Douglas-Peucker — the independent oracle the
    tests compare the numpy kernel against. Not used by the engine."""
    if len(pts) <= 2:
        return list(pts)

    def seg_dist(p, a, b):
        ax, ay = a
        bx, by = b
        px, py = p
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            return math.hypot(px - ax, py - ay)
        t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / seg2))
        return math.hypot(px - (ax + t * dx), py - (ay + t * dy))

    best_d, best_i = -1.0, -1
    for i in range(1, len(pts) - 1):
        d = seg_dist(pts[i], pts[0], pts[-1])
        if d > best_d + 1e-18 and d > best_d:  # strict first-max
            best_d, best_i = d, i
    if best_d > tol:
        left = dp_reference(pts[: best_i + 1], tol)
        right = dp_reference(pts[best_i:], tol)
        return left[:-1] + right
    return [pts[0], pts[-1]]


def simplify_lines(
    lines: DataFrame,
    tol: float,
    id_col: str = "line_id",
    pts_col: str = "pts",
) -> DataFrame:
    """(id, pts: array<struct<x,y>>) -> (id, pts simplified, n_orig, n_kept).

    Extra columns pass through untouched. Closed rings stay closed (the
    shared first/last vertex is always kept)."""
    tol = float(tol)
    others = [f for f in lines.schema.fields if f.name != pts_col]
    out_schema = T.StructType(
        others
        + [
            T.StructField(
                pts_col,
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("x", T.DoubleType()),
                            T.StructField("y", T.DoubleType()),
                        ]
                    )
                ),
            ),
            T.StructField("n_orig", T.IntegerType()),
            T.StructField("n_kept", T.IntegerType()),
        ]
    )
    other_names = [f.name for f in others]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_pts, n_orig, n_kept = [], [], []
            for pts in pdf[pts_col]:
                # Arrow hands array<struct> back as a sequence of dicts
                xs = np.fromiter((p["x"] for p in pts), dtype=np.float64, count=len(pts))
                ys = np.fromiter((p["y"] for p in pts), dtype=np.float64, count=len(pts))
                mask = dp_keep_mask(xs, ys, tol)
                out_pts.append(
                    [{"x": float(x), "y": float(y)} for x, y in zip(xs[mask], ys[mask])]
                )
                n_orig.append(len(pts))
                n_kept.append(int(mask.sum()))
            res = pdf[other_names].copy()
            res[pts_col] = out_pts
            res["n_orig"] = np.asarray(n_orig, dtype=np.int32)
            res["n_kept"] = np.asarray(n_kept, dtype=np.int32)
            yield res

    return lines.mapInPandas(run, schema=out_schema)
