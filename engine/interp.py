"""Inverse-distance-weighted (IDW) spatial interpolation onto the tile grid.

The scattered-samples -> continuous-surface operator (sensor readings, spot
measurements, per-image quality scores at anchor points -> a raster layer),
complementing engine/raster.py's density grids (which count points) and
tile_areal_interp (which spreads polygon values): IDW estimates a VALUE
field, value(q) = sum(w_i * v_i) / sum(w_i) over samples within `radius` of
q, with w_i = 1 / d_i^power.

Plan (idw_grid): pure scatter — each sample emits the bounded set of grid
cells whose CENTER lies within radius (<= (2*ceil(radius/cell)+1)^2 cells,
enumerated with sequence/transform Column HOFs), then ONE groupBy(cell)
aggregation. No join, no second shuffle; sample fan-out is a constant set by
radius/cell_size, and the map-side combine collapses each partition to at
most |touched cells| rows before the exchange — the same bounded-scatter
argument as raster.heatmap_tiles. At 100 TB the sample table is scanned
once; skewed dense regions combine map-side like any hash agg.

Exactness (the oracle float rule, BENCH/BASELINE.md): weighted sums of
doubles are order-dependent, so the aggregation sums FLOOR-scaled int64
contributions instead — num_e9 = sum floor(1e9 * v_i * w_i), den_e9 =
sum floor(1e9 * w_i) — and the estimate is a deterministic double ratio of
two exact integers. The default power=2 weight is computed from the SQUARED
distance directly (no sqrt/pow in the checked path) in UNIT-FREE form,
w = s^2 / max(d2, 1e-4 * s^2) with s = cell_size: invariant to coordinate
units, and the clamp (a standard IDW regularization — a sample within s/100
of a center counts as "at" it) bounds w <= 1e4 so a floor-scaled row is
<= 1e13 * |v| and int64 sums stay exact up to ~10^5 near-center samples
per cell. Exactly-coincident d2 == 0 samples fall under the same clamp (no
separate branch, no infinity). DuckDB twin: idw_grid_sql — identical
expression graph, hash-exact.

power != 2 generalizes via pow(d2, power/2) (double pow; kept out of the
twin-checked default for cross-engine reproducibility).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E9 = 1_000_000_000


def idw_grid(
    samples: DataFrame,
    cell_size: float,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
    power: float = 2.0,
    min_samples: int = 1,
) -> DataFrame:
    """IDW surface on the grid of cell_size-square cells: one output row per
    cell whose center is within `radius` of >= min_samples samples —
    (cx, cy, n_samples, num_e9, den_e9, value). num/den are the exact int64
    weighted sums (the hash-checkable columns); value = num_e9/den_e9 as a
    deterministic double ratio."""
    if radius <= 0 or cell_size <= 0:
        raise ValueError("radius and cell_size must be > 0")
    s = float(cell_size)
    r = int(-(-radius // s))  # ceil(radius/cell_size) in cell units
    p = samples.select(
        F.col(x_col).cast("double").alias("_sx"),
        F.col(y_col).cast("double").alias("_sy"),
        F.col(value_col).cast("double").alias("_v"),
    )
    base_cx = F.floor(F.col("_sx") / s).cast("long")
    base_cy = F.floor(F.col("_sy") / s).cast("long")
    # candidate cells: the (2r+1)^2 block around the sample's own cell
    # (a center within radius has cell index within r of the sample's cell)
    cand = p.select(
        "_sx", "_sy", "_v",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(base_cx - r, base_cx + r),
                    lambda cx: F.transform(
                        F.sequence(base_cy - r, base_cy + r),
                        lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                    ),
                )
            )
        ).alias("_c"),
    ).select(
        "_sx", "_sy", "_v",
        F.col("_c.cx").alias("cx"), F.col("_c.cy").alias("cy"),
    )
    ctr_x = (F.col("cx") + 0.5) * s
    ctr_y = (F.col("cy") + 0.5) * s
    d2 = (ctr_x - F.col("_sx")) * (ctr_x - F.col("_sx")) + (
        ctr_y - F.col("_sy")
    ) * (ctr_y - F.col("_sy"))
    cand = cand.withColumn("_d2", d2).filter(
        F.col("_d2") <= F.lit(float(radius) * float(radius))
    )
    eps = 1e-4 * s * s
    if power == 2.0:
        w = F.lit(s * s) / F.greatest(F.col("_d2"), F.lit(eps))
    else:
        w = F.lit(s**power) / F.pow(
            F.greatest(F.col("_d2"), F.lit(eps)), F.lit(power / 2.0)
        )
    agg = (
        cand.groupBy("cx", "cy")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum(F.floor(F.lit(float(E9)) * F.col("_v") * w)).alias("num_e9"),
            F.sum(F.floor(F.lit(float(E9)) * w)).alias("den_e9"),
        )
        .filter(F.col("n_samples") >= min_samples)
    )
    return agg.select(
        "cx", "cy", "n_samples", "num_e9", "den_e9",
        (F.col("num_e9") / F.col("den_e9")).alias("value"),
    )


def idw_grid_sql(
    samples_sql: str,
    cell_size: float,
    radius: float,
    min_samples: int = 1,
) -> str:
    """DuckDB twin of idw_grid(power=2): identical scatter + clamp +
    FLOOR-scaled integer sums (samples_sql -> (x, y, value))."""
    s = float(cell_size)
    r = int(-(-radius // s))
    r2 = float(radius) * float(radius)
    eps = 1e-4 * s * s
    w = f"({s * s} / GREATEST(d2, {eps}))"
    return f"""
        WITH sm AS ({samples_sql}),
        cand AS (
          SELECT
            CAST(x AS DOUBLE) AS sx, CAST(y AS DOUBLE) AS sy,
            CAST(value AS DOUBLE) AS v,
            CAST(FLOOR(x / {s}) AS BIGINT) + dx.g AS cx,
            CAST(FLOOR(y / {s}) AS BIGINT) + dy.g AS cy
          FROM sm,
               (SELECT UNNEST(generate_series(-{r}, {r})) AS g) dx,
               (SELECT UNNEST(generate_series(-{r}, {r})) AS g) dy
        ),
        scored AS (
          SELECT cx, cy, v,
            ((cx + 0.5) * {s} - sx) * ((cx + 0.5) * {s} - sx)
            + ((cy + 0.5) * {s} - sy) * ((cy + 0.5) * {s} - sy) AS d2
          FROM cand
        )
        SELECT cx, cy,
          COUNT(*) AS n_samples,
          CAST(SUM(CAST(FLOOR({float(E9)} * v * {w}) AS BIGINT)) AS BIGINT)
            AS num_e9,
          CAST(SUM(CAST(FLOOR({float(E9)} * {w}) AS BIGINT)) AS BIGINT)
            AS den_e9,
          CAST(SUM(CAST(FLOOR({float(E9)} * v * {w}) AS BIGINT)) AS DOUBLE)
            / SUM(CAST(FLOOR({float(E9)} * {w}) AS BIGINT)) AS value
        FROM scored
        WHERE d2 <= {r2}
        GROUP BY cx, cy
        HAVING COUNT(*) >= {min_samples}
    """
