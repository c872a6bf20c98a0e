"""Raster warp / resample over the tile grid — the gdalwarp analog for the
image x geo axis, exact-integer end to end.

The transform is given in the standard INVERSE form (target pixel -> source
coordinate) as a RATIONAL affine: integer coefficients (a, b, c, d, e, f)
over one positive integer denominator `den`:

    sx = (a*X + b*Y + c) / den        sy = (d*X + e*Y + f) / den

for target GLOBAL pixel (X, Y). Rational coefficients cover every practical
warp — integer shifts, p/q zooms, 90-degree rotations, shears, half-pixel
grid registration — and make the kernel EXACT: with fx = sx_num mod den in
[0, den), the bilinear weights

    w00 = (den-fx)(den-fy)   w10 = fx(den-fy)
    w01 = (den-fx)fy         w11 = fx*fy

are integers summing to den^2, so the resampled value is emitted as the
int64 numerator `val_num` = sum(w_i * z_i) of the exact rational
val_num / den^2 — no float crosses the operator, and the DuckDB twin
(warp_sql) hash-matches bit for bit. method='nearest' rounds half-up
exactly (floor((2*sx_num + den) / (2*den))) and emits the source value
verbatim (scale 1).

Absent source cells read as 0 — the same zero padding as the whole focal/
raster family. Output is dense per target tile (val_num[res*res], row-major
like `counts`), one row per tile of `out_tiles` (default: the source tile
keys, the common same-grid case).

Plan shape at scale: target pixels are generated (no scan), the ONE wide op
is the (gx, gy) equi-join of <= 4 target-pixel probes per output pixel
against the sparse nonzero source cells, then one map-side-combined hash
agg and the bounded res^2 dense assembly (the heatmap_tiles pattern). Zero
UDFs; everything is whole-stage-codegen Column math. Probes with weight 0
(fx or fy = 0 — on-lattice hits) are filtered before the join, so an
integer shift costs exactly one probe per pixel.

Reference provenance: the reference has no raster surface; this extends the
raster family (SURVEY.md section 2 additions) with the resampling step every
multi-source tile pipeline needs (sensor grid -> map grid registration,
pyramid alignment, datum shifts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(num: Column, den: int) -> Column:
    """Exact integer floor division for any-sign numerators (pmod is the
    nonnegative remainder, so (num - pmod) / den is the floor)."""
    return ((num - F.pmod(num, F.lit(den))) / F.lit(den)).cast("long")


def _sparse_cells(tiles: DataFrame, res: int) -> DataFrame:
    return (
        tiles.select("tx", "ty", F.posexplode("counts").alias("pix", "z"))
        .filter(F.col("z") != 0)
        .select(
            (F.col("tx") * res + F.pmod(F.col("pix"), res)).alias("sgx"),
            (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long")
            .alias("sgy"),
            F.col("z").cast("long").alias("z"),
        )
    )


def affine_resample(
    tiles: DataFrame,
    res: int,
    coeffs: tuple[int, int, int, int, int, int],
    den: int = 1,
    out_tiles: DataFrame | None = None,
    method: str = "bilinear",
) -> DataFrame:
    """Warp the tile raster through the inverse rational affine — returns
    (tx, ty, val_num: array<long>) dense per target tile; true values are
    val_num / den^2 (bilinear) or val_num (nearest)."""
    a, b, c, d, e, f = (int(v) for v in coeffs)
    den = int(den)
    if den <= 0:
        raise ValueError("den must be a positive integer")
    if method not in ("bilinear", "nearest"):
        raise ValueError(f"method must be 'bilinear' or 'nearest', got {method!r}")

    if out_tiles is None:
        out_tiles = tiles.select("tx", "ty")
    tgt = out_tiles.select(
        F.col("tx").cast("long").alias("tx"),
        F.col("ty").cast("long").alias("ty"),
        F.explode(F.sequence(F.lit(0), F.lit(res * res - 1))).alias("pix"),
    ).select(
        "tx", "ty", "pix",
        (F.col("tx") * res + F.pmod(F.col("pix"), res)).alias("X"),
        (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long")
        .alias("Y"),
    )
    sxn = a * F.col("X") + b * F.col("Y") + F.lit(c)
    syn = d * F.col("X") + e * F.col("Y") + F.lit(f)

    if method == "nearest":
        probes = tgt.select(
            "tx", "ty", "pix",
            _floor_div(2 * sxn + den, 2 * den).alias("sgx"),
            _floor_div(2 * syn + den, 2 * den).alias("sgy"),
            F.lit(1).cast("long").alias("w"),
        )
    else:
        gx0 = _floor_div(sxn, den)
        gy0 = _floor_div(syn, den)
        fx = F.pmod(sxn, F.lit(den))
        fy = F.pmod(syn, F.lit(den))
        quad = F.array(
            *[
                F.struct(
                    F.lit(dx).alias("dx"),
                    F.lit(dy).alias("dy"),
                    (
                        (fx if dx else (den - fx)) * (fy if dy else (den - fy))
                    ).cast("long").alias("w"),
                )
                for dx in (0, 1)
                for dy in (0, 1)
            ]
        )
        probes = (
            tgt.select(
                "tx", "ty", "pix", gx0.alias("gx0"), gy0.alias("gy0"),
                F.explode(quad).alias("q"),
            )
            .filter(F.col("q.w") != 0)
            .select(
                "tx", "ty", "pix",
                (F.col("gx0") + F.col("q.dx")).alias("sgx"),
                (F.col("gy0") + F.col("q.dy")).alias("sgy"),
                F.col("q.w").alias("w"),
            )
        )

    src = _sparse_cells(tiles, res)
    hits = probes.join(src, ["sgx", "sgy"]).groupBy("tx", "ty", "pix").agg(
        F.sum(F.col("w") * F.col("z")).alias("v")
    )
    # dense assembly: complete the pixel set (left join against the dense
    # target frame), then ONE sorted-struct fold — array_sort orders by the
    # leading pix field, so the transform is O(res^2 log res^2) per tile.
    # (The map_from_entries + per-slot element_at idiom heatmap_tiles uses
    # is right for SPARSE maps but O(res^4) here, where warp output is
    # dense: element_at linearly scans the 4096-key map per slot — measured
    # 42-92 s at a mere 1M cells before this assembly; 3.8-7.4 s after.)
    full = tgt.select("tx", "ty", "pix").join(
        hits, ["tx", "ty", "pix"], "left"
    ).select(
        "tx", "ty", "pix", F.coalesce(F.col("v"), F.lit(0)).alias("v")
    )
    dense = F.transform(
        F.array_sort(F.collect_list(F.struct("pix", "v"))), lambda s: s["v"]
    )
    return full.groupBy("tx", "ty").agg(dense.alias("val_num"))


def warp_sql(
    tiles_table: str,
    res: int,
    coeffs: tuple[int, int, int, int, int, int],
    den: int = 1,
    out_tiles_sql: str | None = None,
    method: str = "bilinear",
) -> str:
    """DuckDB twin of affine_resample — identical probe/weight algebra, so
    (tx, ty, val_num) rows hash-match the Spark operator exactly."""
    a, b, c, d, e, f = (int(v) for v in coeffs)
    den = int(den)
    if den <= 0:
        raise ValueError("den must be a positive integer")
    if method not in ("bilinear", "nearest"):
        raise ValueError(f"method must be 'bilinear' or 'nearest', got {method!r}")
    out_sql = out_tiles_sql or f"SELECT tx, ty FROM {tiles_table}"
    # DuckDB's % is truncated, not floored: (x % d + d) % d is the pmod
    pm = "((({x}) % {d} + {d}) % {d})"

    def fdiv(x: str, dd: int) -> str:
        rem = pm.format(x=x, d=dd)
        return f"CAST((({x}) - {rem}) / {dd} AS BIGINT)"

    sxn = f"({a} * X + {b} * Y + {c})"
    syn = f"({d} * X + {e} * Y + {f})"
    if method == "nearest":
        probes = f"""
          SELECT tx, ty, pix,
                 {fdiv(f'2 * {sxn} + {den}', 2 * den)} AS sgx,
                 {fdiv(f'2 * {syn} + {den}', 2 * den)} AS sgy,
                 CAST(1 AS BIGINT) AS w
          FROM w_tgt
        """
    else:
        fx = pm.format(x=sxn, d=den)
        fy = pm.format(x=syn, d=den)
        probes = f"""
          SELECT tx, ty, pix,
                 {fdiv(sxn, den)} + o.dx AS sgx,
                 {fdiv(syn, den)} + o.dy AS sgy,
                 CAST((CASE WHEN o.dx = 1 THEN {fx} ELSE {den} - {fx} END)
                    * (CASE WHEN o.dy = 1 THEN {fy} ELSE {den} - {fy} END)
                      AS BIGINT) AS w
          FROM w_tgt, (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) o(dx, dy)
        """
    return f"""
        WITH w_out AS MATERIALIZED (
          SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty
          FROM ({out_sql})
        ), w_tgt AS (
          SELECT tx, ty, i AS pix,
                 tx * {res} + i % {res} AS X,
                 ty * {res} + i // {res} AS Y
          FROM w_out, range(0, {res * res}) t(i)
        ), w_src AS MATERIALIZED (
          SELECT tx * {res} + i % {res} AS sgx,
                 ty * {res} + i // {res} AS sgy,
                 counts[i + 1] AS z
          FROM {tiles_table}, range(0, {res * res}) t(i)
          WHERE counts[i + 1] <> 0
        ), w_probes AS (
          SELECT * FROM ({probes}) WHERE w <> 0
        ), w_hits AS (
          SELECT p.tx, p.ty, p.pix, SUM(p.w * s.z)::BIGINT AS v
          FROM w_probes p JOIN w_src s
            ON s.sgx = p.sgx AND s.sgy = p.sgy
          GROUP BY 1, 2, 3
        ), w_dense AS (
          SELECT tx, ty, MAP(list(pix), list(v)) AS m
          FROM w_hits GROUP BY 1, 2
        )
        SELECT o.tx, o.ty,
               COALESCE(
                 list_transform(range(0, {res * res}),
                                i -> COALESCE(m[i][1], 0)::BIGINT),
                 list_transform(range(0, {res * res}), i -> 0::BIGINT)
               ) AS val_num
        FROM w_out o LEFT JOIN w_dense d USING (tx, ty)
    """
