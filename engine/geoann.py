"""Geo-constrained similarity search: exact cosine top-k within a haversine
radius — the operator that ties the engine's two families together ("the k
most similar images within R km of here").

The reference has no embedding surface (reference core is the OSM change
pipeline, SparkJobs.scala); this extends the SURVEY.md §2 join additions
(+kNN/+kNN-geo) the same way the ANN family does, and is the natural query
over the graft's geotagged-image corpus (every image carries a phash-derived
anchor point plus an embedding).

Plan shape (exact, radius-bounded — one cover round, no iteration):

  queries --(per-row rect cover: grid_disk_var)--> (qid, qlon, qlat, qvec, cell)
  corpus  --(pure-int cell encode, fused into the scan)--> (cid, ..., cell)
  cover JOIN corpus ON cell          -- the only wide op; query side is the
                                     -- small one and is broadcast by default
  WHERE haversine_m(q, c) <= radius  -- exact geodesic gate
  RANK BY cosine DESC, cid           -- exact similarity, window top-k

Cover soundness (every corpus point within R of a query shares a covered
cell): latitude degrees are uniform on the sphere, so |dlat_deg| <=
R / (EARTH_RADIUS_M * pi/180) =: dlat_max and the cell-INDEX offset is at
most floor(dlat_max / cell_lat_deg) + 1 (floor difference bound). For
longitude, from the haversine identity sin^2(t/2) >= cos(lat_q) *
cos(lat_p) * sin^2(dlon/2) with cos(lat_p) >= cos_band := cos(min(90deg,
|lat_q| + dlat_max)) (cos is unimodal, band minimum at an endpoint):
sin^2(dlon/2) <= sin^2(R/2Re) / (cos(lat_q) * cos_band). When the RHS >= 1
(query or band touches a pole) the lon extent is unbounded and the cover
falls back to the full wrap, which grid_disk_var clamps to one pass around
the grid — correct, and cheap exactly when the lat band has collapsed the
candidate count anyway. Fuzz-tested against brute force in
tests/test_geoann.py (incl. polar and antimeridian configurations).

At 100 TB: the corpus side is touched once (cell encode is pure int Column
math in the scan's codegen stage) and, with the default broadcast query
side, never shuffles; per-query work is bounded by the points inside the
covered rect, i.e. O(corpus density x radius^2). kernel='hof' keeps every
similarity a double-cast JVM expression (bit-identical to the DuckDB twin);
kernel='gemm' swaps the rerank similarity for the Arrow pair kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import cells
from .embedops import _pair_cosine_gemm, cosine_double
from .joins import EARTH_RADIUS_M, haversine_m

_MPD_LAT = EARTH_RADIUS_M * math.pi / 180.0  # meters per degree of latitude


def default_res(radius_m: float) -> int:
    """Resolution where the lat cell height ~ the radius (so ky ~ 1-2):
    2^res ~ 180 * meters-per-degree-lat / radius, clamped to the grid."""
    target = 180.0 * _MPD_LAT / max(radius_m, 1e-3)
    return max(0, min(cells.GRID_MAX_RES, int(math.log2(target))))


def _explode_radius_cover(q: DataFrame, res: int, radius_m: float) -> DataFrame:
    """Explode a frame carrying `_qlon`/`_qlat` over every res-`res` cell that
    can contain a point within haversine radius_m of the row's location (the
    sound rect cover derived in the module docstring: uniform lat bound +
    cos-band lon bound with polar/antimeridian fallback)."""
    n = 2**res
    cell_lon_deg = 360.0 / n
    cell_lat_deg = 180.0 / n
    dlat_max_deg = radius_m / _MPD_LAT
    ky = int(dlat_max_deg / cell_lat_deg) + 1
    # sin^2(R / 2Re): the lon bound's numerator, a scalar
    s2 = math.sin(min(radius_m / (2.0 * EARTH_RADIUS_M), math.pi / 2.0)) ** 2

    qlat = F.col("_qlat")
    denom = F.cos(F.radians(qlat)) * F.cos(
        F.radians(F.least(F.lit(90.0), F.abs(qlat) + F.lit(dlat_max_deg)))
    )
    kx = F.when(denom <= F.lit(s2), F.lit(n // 2)).otherwise(
        F.floor(
            F.degrees(2.0 * F.asin(F.sqrt(F.lit(s2) / denom)))
            / F.lit(cell_lon_deg)
        ).cast("int")
        + F.lit(1)
    )
    qcell = cells.grid_encode_lonlat(F.col("_qlon"), F.col("_qlat"), res)
    return q.withColumn(
        "_cell", F.explode(cells.grid_disk_var(qcell, kx, F.lit(ky), res))
    )


def geo_ann_brute_force(
    queries: DataFrame,
    corpus: DataFrame,
    radius_m: float,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Quarantined O(|Q| x |C|) oracle twin of geo_ann_topk: broadcast cross
    join + haversine gate + cosine window. Same output contract; only for
    broadcastable query sets (tests and DuckDB parity)."""
    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(lon_col).cast("double").alias("_qlon"),
        F.col(lat_col).cast("double").alias("_qlat"),
        F.col(vec_col).alias("_qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"),
        F.col(lon_col).cast("double").alias("_clon"),
        F.col(lat_col).cast("double").alias("_clat"),
        F.col(vec_col).alias("_cv"),
    )
    cand = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "_dist",
            haversine_m(
                F.col("_qlon"), F.col("_qlat"), F.col("_clon"), F.col("_clat")
            ),
        )
        .filter(F.col("_dist") <= F.lit(float(radius_m)))
        .withColumn("_sim", cosine_double(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "rank",
            F.col("_sim").alias("sim"),
            F.col("_dist").alias("dist_m"),
        )
    )


def geo_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    radius_m: float,
    k: int = 5,
    res: int | None = None,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    lon_col: str = "lon",
    lat_col: str = "lat",
    kernel: str = "hof",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k by cosine among corpus rows within haversine radius_m of
    each query. Both frames need (id, lon, lat, vec_col). Returns (query_id,
    corpus_id, rank, sim, dist_m); rank ties break by ascending corpus id.
    Queries with no in-radius neighbor produce no rows (inner join).

    broadcast_queries=True (default) broadcasts the exploded query-cover
    frame — right whenever queries x cover cells is dimension-table sized,
    which is the operating point of this operator; pass False to let the
    planner shuffle both sides on the cell key instead."""
    if radius_m <= 0:
        raise ValueError("radius_m must be > 0")
    if res is None:
        res = default_res(radius_m)

    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(lon_col).cast("double").alias("_qlon"),
        F.col(lat_col).cast("double").alias("_qlat"),
        F.col(vec_col).alias("_qv"),
    )
    cover = _explode_radius_cover(q, res, radius_m)
    if broadcast_queries:
        cover = F.broadcast(cover)

    c = corpus.select(
        F.col(corpus_id).alias("_cid"),
        F.col(lon_col).cast("double").alias("_clon"),
        F.col(lat_col).cast("double").alias("_clat"),
        F.col(vec_col).alias("_cv"),
        cells.grid_encode_lonlat(
            F.col(lon_col).cast("double"), F.col(lat_col).cast("double"), res
        ).alias("_cell"),
    )

    dist = haversine_m(
        F.col("_qlon"), F.col("_qlat"), F.col("_clon"), F.col("_clat")
    )
    if kernel == "gemm":
        sim = _pair_cosine_gemm(F.col("_qv"), F.col("_cv"))
    elif kernel == "hof":
        sim = cosine_double(F.col("_qv"), F.col("_cv"))
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    cand = (
        cover.join(c, "_cell")
        .withColumn("_dist", dist)
        .filter(F.col("_dist") <= F.lit(float(radius_m)))
        .withColumn("_sim", sim)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "rank",
            F.col("_sim").alias("sim"),
            F.col("_dist").alias("dist_m"),
        )
    )


def geo_radius_join(
    points_a: DataFrame,
    points_b: DataFrame,
    radius_m: float,
    res: int | None = None,
    id_a: str = "a_id",
    id_b: str = "b_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_a: bool = True,
) -> DataFrame:
    """All (a_id, b_id, dist_m) pairs with haversine distance <= radius_m —
    the plain point-point within-distance (DWithin) join, i.e. geo_ann_topk
    without the embedding rank (same sound radius cover, same plan shape).

    A is the exploded/broadcast side by convention (put the smaller set
    there); B is scanned once with a fused cell encode and, with the default
    broadcast, never shuffles. broadcast_a=False switches to a shuffled cell
    equi-join for two large sides — candidate volume stays bounded by
    O(B-density x radius^2) per A row either way."""
    if radius_m <= 0:
        raise ValueError("radius_m must be > 0")
    if res is None:
        res = default_res(radius_m)

    a = points_a.select(
        F.col(id_a).alias("_qid"),
        F.col(lon_col).cast("double").alias("_qlon"),
        F.col(lat_col).cast("double").alias("_qlat"),
    )
    cover = _explode_radius_cover(a, res, radius_m)
    if broadcast_a:
        cover = F.broadcast(cover)
    b = points_b.select(
        F.col(id_b).alias("_bid"),
        F.col(lon_col).cast("double").alias("_blon"),
        F.col(lat_col).cast("double").alias("_blat"),
        cells.grid_encode_lonlat(
            F.col(lon_col).cast("double"), F.col(lat_col).cast("double"), res
        ).alias("_cell"),
    )
    dist = haversine_m(
        F.col("_qlon"), F.col("_qlat"), F.col("_blon"), F.col("_blat")
    )
    return (
        cover.join(b, "_cell")
        .withColumn("_dist", dist)
        .filter(F.col("_dist") <= F.lit(float(radius_m)))
        .select(
            F.col("_qid").alias(id_a),
            F.col("_bid").alias(id_b),
            F.col("_dist").alias("dist_m"),
        )
    )
