"""Terrain derivatives over the tile raster — slope / aspect / hillshade
(Horn's method), the classic DEM trio, built on the focal family's halo
exchange.

Input is the engine's dense tile shape (tx, ty, counts) with integer pixel
values read as elevations (the same int64 discipline as focal/pyramid: a
real DEM quantizes to cm/mm fixed-point on ingest). Two layers:

1. `terrain_gradients` — the exact-integer core. Horn's 3x3 weighted
   central differences, kept as INTEGER NUMERATORS so nothing floats:

     dzdx8[p] = (z[E-ne] + 2 z[e] + z[se]) - (z[nw] + 2 z[w] + z[sw])
     dzdy8[p] = (z[nw] + 2 z[n] + z[ne]) - (z[sw] + 2 z[s] + z[se])

   (y up: gy increases northward; the /(8*cellsize) denominator is deferred
   to the float layer). Both gradients ride ONE fused halo pass — the same
   strip-exchange machinery and fusion pattern as focal.gi_star: shuffle
   O(perimeter) per tile, numpy slice arithmetic in the Arrow kernel, zero
   padding outside the input tile set (edge pixels see 0-elevation
   neighbors — consistent with every focal operator here; mask-aware
   clamping is a finish-kernel swap if a consumer needs gdal-style edges).
   kernel='scatter' is the Column-only twin: two focal_stencil scatter
   passes (HORN_DZDX / HORN_DZDY are plain stencil weight maps) joined on
   the tile key — exact-equal by construction, and it transliterates to
   DuckDB via focal.focal_stencil_sql (the registry's `raster_field`
   'ter' rows are hash-checked that way).

2. `slope_aspect_hillshade` — the float view, pure Column HOFs over the
   integer gradient arrays (no UDF):

     p = z_factor * dzdx8 / (8 * cellsize)      q = likewise for dzdy8
     slope_rad  = atan(sqrt(p^2 + q^2))
     aspect_rad = pmod(atan2(-p, -q), 2 pi)   # azimuth of steepest DESCENT,
                                  # clockwise from north in [0, 2 pi);
                                  # flat pixels emit -1.0
     hillshade  = 255 * max(0, (sin(alt) - cos(alt) * (p sin(az) + q cos(az)))
                               / sqrt(1 + p^2 + q^2))

   The hillshade line is n.l for unit normal n = (-p, -q, 1)/|.| and light
   l = (sin az cos alt, cos az cos alt, sin alt) — algebraically the
   standard Horn/gdaldem shading, written in the form that needs no aspect
   branch. Defaults az=315, alt=45 (the cartographic NW sun).

Reference provenance: the reference (osm-history-analysis) has no raster
surface; this extends the focal family (engine/focal.py — SURVEY.md §2
additions) with the terrain derivatives a DEM/elevation pipeline publishes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Horn stencils as focal_stencil weight maps ((dx, dy) -> weight, y up).
HORN_DZDX = {
    (1, -1): 1, (1, 0): 2, (1, 1): 1,
    (-1, -1): -1, (-1, 0): -2, (-1, 1): -1,
}
HORN_DZDY = {
    (-1, 1): 1, (0, 1): 2, (1, 1): 1,
    (-1, -1): -1, (0, -1): -2, (1, -1): -1,
}


def terrain_gradients(
    tiles: DataFrame, res: int, kernel: str = "halo"
) -> DataFrame:
    """(tx, ty, counts) -> (tx, ty, dzdx8, dzdy8): Horn gradient NUMERATORS
    per pixel, exact int64 arrays. kernel='halo' fuses both stencils into
    one strip-exchange pass; kernel='scatter' joins two Column-only
    focal_stencil passes (the oracle-twin shape)."""
    from engine.focal import _halo_apply, focal_stencil

    if kernel == "scatter":
        gx = focal_stencil(tiles, res, HORN_DZDX, kernel="scatter").select(
            "tx", "ty", F.col("focal").alias("dzdx8")
        )
        gy = focal_stencil(tiles, res, HORN_DZDY, kernel="scatter").select(
            "tx", "ty", F.col("focal").alias("dzdy8")
        )
        return gx.join(gy, ["tx", "ty"])
    if kernel != "halo":
        raise ValueError(f"kernel must be 'halo' or 'scatter', got {kernel!r}")

    r = 1

    def finish(halo: np.ndarray, _mask: np.ndarray) -> dict:
        # halo rows are y (gy up), cols are x; slice offsets mirror
        # focal_stencil's halo[r+dy : r+dy+res, r+dx : r+dx+res] reads
        def sh(dx: int, dy: int) -> np.ndarray:
            return halo[r + dy : r + dy + res, r + dx : r + dx + res]

        east = sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
        west = sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)
        north = sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
        south = sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)
        return {
            "dzdx8": (east - west).reshape(-1).tolist(),
            "dzdy8": (north - south).reshape(-1).tolist(),
        }

    return _halo_apply(
        tiles, res, r, finish,
        fields=[
            ("dzdx8", T.ArrayType(T.LongType())),
            ("dzdy8", T.ArrayType(T.LongType())),
        ],
    )


def _shade_exprs(
    dzdx8: Column,
    dzdy8: Column,
    cellsize: float,
    z_factor: float,
    azimuth_deg: float,
    altitude_deg: float,
) -> tuple[Column, Column, Column]:
    """Per-pixel (slope_rad, aspect_rad, hillshade) Columns from the two
    int64 gradient-numerator Columns — scalar form, zip_with-able."""
    s = float(z_factor) / (8.0 * float(cellsize))
    p = dzdx8.cast("double") * F.lit(s)
    q = dzdy8.cast("double") * F.lit(s)
    az = math.radians(float(azimuth_deg))
    alt = math.radians(float(altitude_deg))
    slope = F.atan(F.sqrt(p * p + q * q))
    # pmod to [0, 2*pi) does double duty: GIS-conventional clockwise-from-
    # north range AND signed-zero safety — at p = +-0.0 the atan2 branch cut
    # returns +-pi depending on how the engine negates zero (measured: Spark
    # +pi, numpy -pi at dzdx8=0, dzdy8>0); both fold to +pi under pmod
    aspect = F.when(
        (dzdx8 == 0) & (dzdy8 == 0), F.lit(-1.0)
    ).otherwise(F.pmod(F.atan2(-p, -q), F.lit(2.0 * math.pi)))
    cang = (
        F.lit(math.sin(alt))
        - F.lit(math.cos(alt)) * (p * F.lit(math.sin(az)) + q * F.lit(math.cos(az)))
    ) / F.sqrt(F.lit(1.0) + p * p + q * q)
    shade = F.lit(255.0) * F.greatest(cang, F.lit(0.0))
    return slope, aspect, shade


def d8_flow(tiles: DataFrame, res: int) -> DataFrame:
    """D8 flow direction over the tile raster, exact int64: for every pixel,
    the steepest-DESCENT neighbor among the 8 (standard drop/distance
    steepness, compared exactly: slope_orth = drop/1 vs slope_diag =
    drop/sqrt(2) <=> 2*drop_orth^2 vs drop_diag^2 on positive drops — no
    float enters the comparison; |z| < 2^31 keeps drop^2 in int64).
    Neighbors OUTSIDE the input tile union never receive flow (the halo
    presence mask gates them — zero padding would otherwise read as a cliff
    off the raster edge). Ties break by fixed compass priority
    E, NE, N, NW, W, S, SW, SE, encoded dir = 0..7 in that order; a pixel
    with no strictly positive drop is a SINK / plateau member, dir = -1.

    Output per pixel (flat arrays per tile, like every halo op): `d8_dir`
    and `d8_key` (the winning 2*drop^2-scaled steepness key, 0 for sinks) —
    the key rides along so the DuckDB twin can hash-check the argmax
    itself, not just the chosen arm.

    `flow_edges` turns this into the (cell -> downhill cell) pointer forest;
    basins are its connected components (z strictly decreases along flow, so
    the forest is acyclic and every undirected component contains exactly
    one sink): `basin_label` = engine.graph.connected_components min-id —
    the same deterministic labeling contract as DBSCAN/dedup clusters."""
    from engine.focal import _halo_apply

    r = 1
    # (dx, dy, orth) in priority order; dir index = position
    nbrs = [
        (1, 0, True), (1, 1, False), (0, 1, True), (-1, 1, False),
        (-1, 0, True), (0, -1, True), (-1, -1, False), (1, -1, False),
    ]

    def finish(halo: np.ndarray, mask: np.ndarray) -> dict:
        c = halo[r : r + res, r : r + res]
        best_key = np.zeros((res, res), dtype=np.int64)
        best_dir = np.full((res, res), -1, dtype=np.int64)
        for i, (dx, dy, orth) in enumerate(nbrs):
            nz = halo[r + dy : r + dy + res, r + dx : r + dx + res]
            nm = mask[r + dy : r + dy + res, r + dx : r + dx + res]
            drop = c - nz
            key = drop * drop * (2 if orth else 1)
            better = (drop > 0) & (nm > 0) & (key > best_key)
            best_key[better] = key[better]
            best_dir[better] = i
        return {
            "d8_dir": best_dir.reshape(-1).tolist(),
            "d8_key": best_key.reshape(-1).tolist(),
        }

    return _halo_apply(
        tiles, res, r, finish,
        fields=[
            ("d8_dir", T.ArrayType(T.LongType())),
            ("d8_key", T.ArrayType(T.LongType())),
        ],
    )


_D8_OFFSETS = [
    (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (0, -1), (-1, -1), (1, -1),
]


def flow_edges(flow: DataFrame, res: int) -> DataFrame:
    """d8_flow frame -> (gx, gy, d8_dir, src, dst): one row per pixel with
    cell ids packed as src = gx * 2^32 + gy on SHIFTED coords (gx+2^20,
    gy+2^20 — keeps ids positive for tile coords within +-2^20); dst is
    null for sinks."""
    cells = flow.select(
        "tx", "ty",
        F.posexplode(F.arrays_zip("d8_dir", "d8_key")).alias("pix", "g"),
    ).select(
        (F.col("tx") * res + F.pmod(F.col("pix"), res)).alias("gx"),
        (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long").alias("gy"),
        F.col("g.d8_dir").alias("d8_dir"),
        F.col("g.d8_key").alias("d8_key"),
    )
    off = F.lit(1 << 20)
    dir_col = F.col("d8_dir")
    dx = F.element_at(
        F.array(*[F.lit(d[0]) for d in _D8_OFFSETS]), dir_col.cast("int") + 1
    )
    dy = F.element_at(
        F.array(*[F.lit(d[1]) for d in _D8_OFFSETS]), dir_col.cast("int") + 1
    )
    pack = lambda x, y: (x + off) * F.lit(1 << 32) + (y + off)  # noqa: E731
    return cells.select(
        "gx", "gy", "d8_dir", "d8_key",
        pack(F.col("gx"), F.col("gy")).alias("src"),
        F.when(dir_col >= 0, pack(F.col("gx") + dx, F.col("gy") + dy)).alias(
            "dst"
        ),
    )


def basins(
    flow: DataFrame, res: int, method: str = "cc", max_iters: int = 40
) -> DataFrame:
    """d8_flow frame -> (gx, gy, basin): drainage basins of the flow pointer
    forest. Two kernels, identical PARTITION into basins, different label
    conventions:

    method='cc' (default; the registry twin's shape): connected components
    via engine.graph (alternating star rounds), basin = MINIMUM packed cell
    id in the component — the engine-wide deterministic CC label contract.

    method='jump': pointer jumping (path doubling) — parent <- parent's
    parent per round, so convergence takes ceil(log2(flow diameter)) rounds
    instead of the star rounds' slower contraction on long chains (a 4096-
    diameter drainage network is ~12 jump rounds). Each round is ONE
    self-equi-join on the parent key + a reliable checkpoint (same lineage
    discipline as CC). basin = the packed id of the component's SINK (its
    flow outlet) — hydrologically the more meaningful key; exact-identical
    basin MEMBERSHIP to method='cc' (asserted in tests), only the label
    differs. A forest cannot cycle (z strictly decreases along flow), so
    the iteration always converges; max_iters is a safety rail."""
    ed = flow_edges(flow, res)
    if method == "cc":
        from engine.graph import connected_components

        comp = connected_components(
            ed.filter(F.col("dst").isNotNull()).select("src", "dst"),
            src="src", dst="dst",
            nodes=ed.select("src"), id_col="src",
        )
        return (
            ed.select("gx", "gy", "src")
            .join(comp, ed["src"] == comp["id"])
            .select("gx", "gy", F.col("comp").alias("basin"))
        )
    if method != "jump":
        raise ValueError(f"method must be 'cc' or 'jump', got {method!r}")

    def _truncate(df: DataFrame) -> DataFrame:
        if df.sparkSession.sparkContext.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def _digest(df: DataFrame):
        # order-independent fixpoint check, one agg scan per round (the
        # engine.graph convergence idiom) — pointer doubling is monotone
        # toward the root, so an unchanged (src, parent) set IS the fixpoint
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("src", "parent")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # parent pointer: sinks point at themselves (fixpoints of the doubling)
    p = _truncate(
        ed.select(
            "src", F.coalesce(F.col("dst"), F.col("src")).alias("parent")
        )
    )
    prev = _digest(p)
    for _ in range(max_iters):
        nxt = _truncate(
            p.alias("a")
            .join(
                p.select(
                    F.col("src").alias("_ps"), F.col("parent").alias("_pp")
                ).alias("b"),
                F.col("a.parent") == F.col("_ps"),
            )
            .select("src", F.col("_pp").alias("parent"))
        )
        cur = _digest(nxt)
        p = nxt
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"basins(jump): no convergence in {max_iters} rounds")
    return ed.select("gx", "gy", "src").join(p, "src").select(
        "gx", "gy", F.col("parent").alias("basin")
    )


def slope_aspect_hillshade(
    grads: DataFrame,
    cellsize: float = 1.0,
    z_factor: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> DataFrame:
    """Attach per-pixel double arrays (slope_rad, aspect_rad, hillshade) to a
    terrain_gradients frame — Column HOFs over the exact int arrays, no
    Python. aspect_rad = -1.0 on flat pixels; hillshade in [0, 255]."""

    def arr(which: int) -> Column:
        return F.zip_with(
            F.col("dzdx8"),
            F.col("dzdy8"),
            lambda a, b: _shade_exprs(
                a, b, cellsize, z_factor, azimuth_deg, altitude_deg
            )[which],
        )

    return grads.select(
        "*",
        arr(0).alias("slope_rad"),
        arr(1).alias("aspect_rad"),
        arr(2).alias("hillshade"),
    )
