"""Clip polylines and polygons to tile rectangles — tile-local geometry.

A vector-tile encoder stores each tile's geometry CLIPPED to the tile bounds
(plus the per-tile feature cap engine.tiles.tile_bundle provides and the
per-zoom simplification engine.simplify provides — together these three are
the tile cut). The reference never clips (its outputs are global diffs);
this engine adds the missing serving-side step.

Polylines use the Liang-Barsky parametric clip (four boundary tests, two
divisions); polygons use Sutherland-Hodgman against the four tile boundaries.
Both are pure Column arithmetic / array HOFs — whole-stage codegen, no UDF,
no Python. Polyline candidate (segment, tile) pairs come from the same
Column-only sample-and-dilate cover discipline as engine.lines.line_cover
(step <= tile_size makes the 3x3 dilation a superset of the tiles a segment
crosses); polygon candidates come from the ring's bbox tile range. The clip
itself is the exact filter, so covers only affect work, not answers.

Scale: segments explode once (rows x ~tiles-crossed), then one groupBy
(line_id, tile) reassembles tile-local pieces; polygon rings explode to
(ring, tile) pairs and clip in place with NO shuffle at all (the bbox
explode is a generate, the clip a projection). Vertex arrays never travel
through a shuffle — polylines shuffle clipped scalar endpoints only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import lines as _lines


def clip_segment(
    ax: Column, ay: Column, bx: Column, by: Column,
    rx0: Column, ry0: Column, rx1: Column, ry1: Column,
) -> Column:
    """Liang-Barsky clip of segment A->B against rect [rx0,rx1]x[ry0,ry1].
    Returns struct(keep boolean, cx0, cy0, cx1, cy1 double) — the clipped
    sub-segment when keep is true. Degenerate (point) segments keep iff
    inside the rect. Closed rect: boundary touches are kept."""
    dx, dy = bx - ax, by - ay

    def lo_hi(p: Column, q: Column, t0: Column, t1: Column) -> tuple[Column, Column]:
        # p == 0: parallel to this boundary — t-range unchanged (the
        # parallel-and-outside case is handled by the kill switch below)
        t = q / p
        new_t0 = F.when((p < 0) & (t > t0), t).otherwise(t0)
        new_t1 = F.when((p > 0) & (t < t1), t).otherwise(t1)
        return (
            F.when(p == 0, t0).otherwise(new_t0),
            F.when(p == 0, t1).otherwise(new_t1),
        )

    kill = (
        ((dx == 0) & ((ax < rx0) | (ax > rx1)))
        | ((dy == 0) & ((ay < ry0) | (ay > ry1)))
    )
    t0, t1 = F.lit(0.0), F.lit(1.0)
    t0, t1 = lo_hi(-dx, ax - rx0, t0, t1)  # left:   x >= rx0
    t0, t1 = lo_hi(dx, rx1 - ax, t0, t1)   # right:  x <= rx1
    t0, t1 = lo_hi(-dy, ay - ry0, t0, t1)  # bottom: y >= ry0
    t0, t1 = lo_hi(dy, ry1 - ay, t0, t1)   # top:    y <= ry1
    keep = ~kill & (t0 <= t1)
    return F.struct(
        keep.alias("keep"),
        (ax + t0 * dx).alias("cx0"),
        (ay + t0 * dy).alias("cy0"),
        (ax + t1 * dx).alias("cx1"),
        (ay + t1 * dy).alias("cy1"),
    )


def line_clip_to_tiles(
    lines: DataFrame,
    tile_size: float,
    id_col: str = "line_id",
    pts_col: str = "pts",
) -> DataFrame:
    """(line_id, pts: array<struct<x,y>>) -> one row per (line, tile) the line
    actually crosses: (line_id, tx, ty, n_segs, segs) where segs are the
    tile-clipped sub-segments in original vertex order and (tx, ty) indexes
    the regular tile_size lattice (tile rect = [tx*s,(tx+1)*s] x [ty*s,...])."""
    s = float(tile_size)
    if s <= 0:
        raise ValueError("tile_size must be > 0")
    segs = _lines.line_segments(lines, id_col=id_col, pts_col=pts_col)

    # Column-only candidate cover: sample every <= s along the segment, take
    # each sample's 3x3 tile neighborhood (soundness as in lines.line_cover:
    # any crossed tile is Chebyshev-1 from some sample's tile)
    n_steps = F.greatest(
        F.lit(1),
        F.ceil(
            F.greatest(F.abs(F.col("bx") - F.col("ax")),
                       F.abs(F.col("by") - F.col("ay"))) / F.lit(s)
        ).cast("int"),
    )
    t = F.col("_i").cast("double") / F.col("_n").cast("double")
    cand = (
        segs.withColumn("_n", n_steps)
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_n"))))
        .withColumn("_sx", F.col("ax") + t * (F.col("bx") - F.col("ax")))
        .withColumn("_sy", F.col("ay") + t * (F.col("by") - F.col("ay")))
        .withColumn("_dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "line_id", "seg_idx", "ax", "ay", "bx", "by",
            (F.floor(F.col("_sx") / F.lit(s)).cast("long") + F.col("_dx")).alias("tx"),
            (F.floor(F.col("_sy") / F.lit(s)).cast("long") + F.col("_dy")).alias("ty"),
        )
        .distinct()
    )
    rx0, ry0 = F.col("tx") * F.lit(s), F.col("ty") * F.lit(s)
    c = clip_segment(
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
        rx0, ry0, rx0 + F.lit(s), ry0 + F.lit(s),
    )
    clipped = (
        cand.withColumn("_c", c)
        .filter(F.col("_c.keep"))
        .select(
            "line_id", "tx", "ty", "seg_idx",
            F.col("_c.cx0").alias("cx0"),
            F.col("_c.cy0").alias("cy0"),
            F.col("_c.cx1").alias("cx1"),
            F.col("_c.cy1").alias("cy1"),
        )
    )
    return clipped.groupBy("line_id", "tx", "ty").agg(
        F.count("*").cast("long").alias("n_segs"),
        F.sort_array(
            F.collect_list(F.struct("seg_idx", "cx0", "cy0", "cx1", "cy1"))
        ).alias("segs"),
    )


# ---------------------------------------------------------------------------
# Polygons: Sutherland-Hodgman against the four tile boundaries
# ---------------------------------------------------------------------------
def _pt(x: Column, y: Column) -> Column:
    return F.struct(x.alias("x"), y.alias("y"))


def _sh_stage(ring: Column, axis: str, bound: Column, keep_ge: bool) -> Column:
    """One Sutherland-Hodgman pass: clip `ring` (array<struct<x,y>>, open —
    no repeated last vertex) against the half-plane  pt[axis] >= bound  (when
    keep_ge) or  pt[axis] <= bound. Emits the standard 0-2 points per cyclic
    edge (cur -> nxt): nxt if both inside; the boundary intersection on an
    exit; intersection then nxt on an entry. Closed half-planes (boundary
    points are inside), matching Liang-Barsky's closed-rect convention."""
    other = "y" if axis == "x" else "x"

    def inside(p: Column) -> Column:
        return p[axis] >= bound if keep_ge else p[axis] <= bound

    def isect(cur: Column, nxt: Column) -> Column:
        # crossing edges have nxt[axis] != cur[axis]; / never sees a true 0
        t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
        o = cur[other] + t * (nxt[other] - cur[other])
        return _pt(bound, o) if axis == "x" else _pt(o, bound)

    n = F.size(ring)

    def edge_emit(i: Column) -> Column:
        cur = F.element_at(ring, i + 1)
        nxt = F.element_at(
            ring, F.when(i == n - 1, F.lit(1)).otherwise(i + 2)
        )
        none = F.slice(F.array(cur), 1, 0)  # typed empty array<struct<x,y>>
        return (
            F.when(inside(cur) & inside(nxt), F.array(nxt))
            .when(inside(cur) & ~inside(nxt), F.array(isect(cur, nxt)))
            .when(~inside(cur) & inside(nxt), F.array(isect(cur, nxt), nxt))
            .otherwise(none)
        )

    out = F.flatten(F.transform(F.sequence(F.lit(0), n - 1), edge_emit))
    # empty input: sequence(0,-1) would count DOWN — guard first
    return F.when(n == 0, ring).otherwise(out)


def _bind(col: Column, fn) -> Column:
    """let-binding for Column expressions: evaluate `col` ONCE, make it
    available to `fn` as a higher-order-function lambda variable. Every
    reference `fn` makes to its argument is a LambdaVariable (zero-size leaf),
    so chaining n stages stays LINEAR in total expression size. Chaining the
    stages as plain compositions instead is exponential: each S-H stage
    references its input ring ~8 times (size + two element_at per edge +
    guards), and Catalyst's CollapseProject inlines chained projections, so
    4 stages self-multiply into an ~8^3-subtree plan — a single 4-vertex
    polygon hung the optimizer for minutes (measured before this fix)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def clip_ring(ring: Column, rx0: Column, ry0: Column,
              rx1: Column, ry1: Column) -> Column:
    """Sutherland-Hodgman clip of a simple polygon ring (array<struct<x,y>>,
    open) to rect [rx0,rx1]x[ry0,ry1]. Returns the clipped ring (open; may
    include degenerate boundary bridges for concave inputs crossing the rect
    — the standard S-H artifact; signed area is still exact). Size < 3 means
    no interior intersection."""
    r = _bind(ring, lambda rg: _sh_stage(rg, "x", rx0, keep_ge=True))
    r = _bind(r, lambda rg: _sh_stage(rg, "x", rx1, keep_ge=False))
    r = _bind(r, lambda rg: _sh_stage(rg, "y", ry0, keep_ge=True))
    r = _bind(r, lambda rg: _sh_stage(rg, "y", ry1, keep_ge=False))
    return r


def polygon_clip_to_tiles(
    polys: DataFrame,
    tile_size: float,
    id_col: str = "poly_id",
    ring_col: str = "ring",
) -> DataFrame:
    """(poly_id, ring: array<struct<x,y>> open simple ring) -> one row per
    (polygon, tile) with nonempty intersection: (poly_id, tx, ty, ring,
    n_verts, area) where ring is tile-clipped (Sutherland-Hodgman) and area
    is its |shoelace| area. Candidates are the ring's bbox tile range —
    exact for polygons (any tile the interior touches intersects the bbox);
    the clip discards bbox-only tiles (empty or degenerate output).

    Plan shape: explode (generate) x2 -> projection. No shuffle, no UDF."""
    from . import geomfns

    s = float(tile_size)
    if s <= 0:
        raise ValueError("tile_size must be > 0")
    xs = F.transform(F.col(ring_col), lambda p: p["x"].cast("double"))
    ys = F.transform(F.col(ring_col), lambda p: p["y"].cast("double"))
    cand = (
        polys.select(
            F.col(id_col).alias("poly_id"),
            F.zip_with(xs, ys, lambda x, y: _pt(x, y)).alias("_ring"),
            F.floor(F.array_min(xs) / F.lit(s)).cast("long").alias("_tx0"),
            F.floor(F.array_max(xs) / F.lit(s)).cast("long").alias("_tx1"),
            F.floor(F.array_min(ys) / F.lit(s)).cast("long").alias("_ty0"),
            F.floor(F.array_max(ys) / F.lit(s)).cast("long").alias("_ty1"),
        )
        .withColumn("tx", F.explode(F.sequence(F.col("_tx0"), F.col("_tx1"))))
        .withColumn("ty", F.explode(F.sequence(F.col("_ty0"), F.col("_ty1"))))
    )
    rx0, ry0 = F.col("tx") * F.lit(s), F.col("ty") * F.lit(s)
    # clip_ring's _bind let-chain keeps the 4-stage expression linear — see
    # _bind's docstring for why plain composition is exponential here
    clipped = (
        cand.withColumn(
            "ring",
            clip_ring(F.col("_ring"), rx0, ry0, rx0 + F.lit(s), ry0 + F.lit(s)),
        )
        .select("poly_id", "tx", "ty", "ring")
        .filter(F.size("ring") >= 3)
    )
    out = clipped.select(
        "poly_id", "tx", "ty", "ring",
        F.size("ring").cast("long").alias("n_verts"),
        geomfns.polygon_area(
            F.transform(F.col("ring"), lambda p: p["x"]),
            F.transform(F.col("ring"), lambda p: p["y"]),
        ).alias("area"),
    )
    # S-H can emit all-degenerate rings (boundary-only touch): area == 0
    return out.filter(F.col("area") > 0.0)
