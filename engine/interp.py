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

from pyspark.sql import DataFrame, Window
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


def gwr_grid(
    samples: DataFrame,
    cell_size: float,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
    attr_col: str = "a",
    value_col: str = "value",
    min_samples: int = 3,
) -> DataFrame:
    """Geographically weighted regression (GWR, Fotheringham et al.) of
    value ~ beta0 + beta1*attr, fitted LOCALLY at every grid-cell center
    with bisquare kernel weights over samples within `radius` (the
    bandwidth): the local-regression step above IDW (which is GWR's
    intercept-only special case) — per-cell coefficient surfaces for
    spatially varying relationships (e.g. caption-quality ~ image-entropy
    slope by region).

    Plan: the idw_grid bounded scatter verbatim — each sample emits the
    <= (2*ceil(radius/cell)+1)^2 candidate cells, ONE groupBy(cell)
    aggregation, no join — so the 100 TB argument carries over unchanged
    (one scan, constant fan-out, map-side combine).

    Exactness: the bisquare weight w = ((h2-d2)/h2)^2 (h2 = radius^2,
    support d2 < h2) and the five WLS moments are per-row double
    expressions FLOOR-scaled to int64 BEFORE the sum — sw = sum floor(1e9*
    w), swa = sum floor(1e9*w*a), swv, swaa, swav likewise — so the
    aggregation is order-independent and hash-exact (the oracle float
    rule). The closed-form simple-WLS coefficients are then ONE fixed
    double expression over the exact sums:
        beta1 = (sw*swav - swa*swv) / (sw*swaa - swa*swa)
        beta0 = (swv - beta1*swa) / sw
    (sums cast to double first — products can exceed int64; double ops are
    IEEE-deterministic so both engines agree bit for bit). beta1/beta0 are
    NULL where the local design matrix is singular (denominator == 0:
    constant attr in the window). DuckDB twin: gwr_grid_sql."""
    if radius <= 0 or cell_size <= 0:
        raise ValueError("radius and cell_size must be > 0")
    s = float(cell_size)
    r = int(-(-radius // s))
    h2 = float(radius) * float(radius)
    p = samples.select(
        F.col(x_col).cast("double").alias("_sx"),
        F.col(y_col).cast("double").alias("_sy"),
        F.col(attr_col).cast("double").alias("_a"),
        F.col(value_col).cast("double").alias("_v"),
    )
    base_cx = F.floor(F.col("_sx") / s).cast("long")
    base_cy = F.floor(F.col("_sy") / s).cast("long")
    cand = p.select(
        "_sx", "_sy", "_a", "_v",
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
        "_sx", "_sy", "_a", "_v",
        F.col("_c.cx").alias("cx"), F.col("_c.cy").alias("cy"),
    )
    ctr_x = (F.col("cx") + 0.5) * s
    ctr_y = (F.col("cy") + 0.5) * s
    d2 = (ctr_x - F.col("_sx")) * (ctr_x - F.col("_sx")) + (
        ctr_y - F.col("_sy")
    ) * (ctr_y - F.col("_sy"))
    cand = cand.withColumn("_d2", d2).filter(F.col("_d2") < F.lit(h2))
    t = (F.lit(h2) - F.col("_d2")) / F.lit(h2)
    w = t * t
    # ew = (1e9 * w) FIRST, then left-associated products — the twin's SQL
    # `FLOOR(1e9 * w * a * v)` parses left to right, and double multiply is
    # NOT associative: matching the association order is what keeps the
    # floor-scaled rows bit-equal across engines (the idw_grid discipline).
    ew = F.lit(float(E9)) * w
    a_, v_ = F.col("_a"), F.col("_v")

    def fs(expr):
        return F.sum(F.floor(expr).cast("long"))

    agg = (
        cand.groupBy("cx", "cy")
        .agg(
            F.count("*").alias("n_samples"),
            fs(ew).alias("sw_e9"),
            fs(ew * a_).alias("swa_e9"),
            fs(ew * v_).alias("swv_e9"),
            fs(ew * a_ * a_).alias("swaa_e9"),
            fs(ew * a_ * v_).alias("swav_e9"),
        )
        .filter(F.col("n_samples") >= min_samples)
    )
    dsw = F.col("sw_e9").cast("double")
    dsa = F.col("swa_e9").cast("double")
    dsv = F.col("swv_e9").cast("double")
    dsaa = F.col("swaa_e9").cast("double")
    dsav = F.col("swav_e9").cast("double")
    den = dsw * dsaa - dsa * dsa
    b1 = F.when(den != F.lit(0.0), (dsw * dsav - dsa * dsv) / den)
    b0 = F.when(den != F.lit(0.0), (dsv - ((dsw * dsav - dsa * dsv) / den) * dsa) / dsw)
    return agg.select(
        "cx", "cy", "n_samples",
        "sw_e9", "swa_e9", "swv_e9", "swaa_e9", "swav_e9",
        b1.alias("beta1"), b0.alias("beta0"),
    )


def gwr_grid_sql(
    samples_sql: str,
    cell_size: float,
    radius: float,
    min_samples: int = 3,
) -> str:
    """DuckDB twin of gwr_grid: identical scatter, bisquare weight, per-row
    FLOOR-scaled int64 moments and the identical double coefficient graph
    (samples_sql -> (x, y, a, value))."""
    s = float(cell_size)
    r = int(-(-radius // s))
    h2 = float(radius) * float(radius)
    w = f"((({h2} - d2) / {h2}) * (({h2} - d2) / {h2}))"
    e9 = float(E9)

    def fs(expr: str) -> str:
        return f"CAST(SUM(CAST(FLOOR({e9} * {expr}) AS BIGINT)) AS BIGINT)"

    return f"""
        WITH gsm AS ({samples_sql}),
        gcand AS (
          SELECT
            CAST(x AS DOUBLE) AS sx, CAST(y AS DOUBLE) AS sy,
            CAST(a AS DOUBLE) AS a, CAST(value AS DOUBLE) AS v,
            CAST(FLOOR(x / {s}) AS BIGINT) + dx.g AS cx,
            CAST(FLOOR(y / {s}) AS BIGINT) + dy.g AS cy
          FROM gsm,
               (SELECT UNNEST(generate_series(-{r}, {r})) AS g) dx,
               (SELECT UNNEST(generate_series(-{r}, {r})) AS g) dy
        ),
        gscored AS (
          SELECT cx, cy, a, v,
            ((cx + 0.5) * {s} - sx) * ((cx + 0.5) * {s} - sx)
            + ((cy + 0.5) * {s} - sy) * ((cy + 0.5) * {s} - sy) AS d2
          FROM gcand
        ),
        gagg AS (
          SELECT cx, cy,
            COUNT(*) AS n_samples,
            {fs(w)} AS sw_e9,
            {fs(f"{w} * a")} AS swa_e9,
            {fs(f"{w} * v")} AS swv_e9,
            {fs(f"{w} * a * a")} AS swaa_e9,
            {fs(f"{w} * a * v")} AS swav_e9
          FROM gscored
          WHERE d2 < {h2}
          GROUP BY cx, cy
          HAVING COUNT(*) >= {min_samples}
        )
        SELECT cx, cy, n_samples,
          sw_e9, swa_e9, swv_e9, swaa_e9, swav_e9,
          CASE WHEN CAST(sw_e9 AS DOUBLE) * CAST(swaa_e9 AS DOUBLE)
                    - CAST(swa_e9 AS DOUBLE) * CAST(swa_e9 AS DOUBLE) <> 0.0
               THEN (CAST(sw_e9 AS DOUBLE) * CAST(swav_e9 AS DOUBLE)
                     - CAST(swa_e9 AS DOUBLE) * CAST(swv_e9 AS DOUBLE))
                    / (CAST(sw_e9 AS DOUBLE) * CAST(swaa_e9 AS DOUBLE)
                       - CAST(swa_e9 AS DOUBLE) * CAST(swa_e9 AS DOUBLE))
          END AS beta1,
          CASE WHEN CAST(sw_e9 AS DOUBLE) * CAST(swaa_e9 AS DOUBLE)
                    - CAST(swa_e9 AS DOUBLE) * CAST(swa_e9 AS DOUBLE) <> 0.0
               THEN (CAST(swv_e9 AS DOUBLE)
                     - ((CAST(sw_e9 AS DOUBLE) * CAST(swav_e9 AS DOUBLE)
                         - CAST(swa_e9 AS DOUBLE) * CAST(swv_e9 AS DOUBLE))
                        / (CAST(sw_e9 AS DOUBLE) * CAST(swaa_e9 AS DOUBLE)
                           - CAST(swa_e9 AS DOUBLE) * CAST(swa_e9 AS DOUBLE)))
                       * CAST(swa_e9 AS DOUBLE))
                    / CAST(sw_e9 AS DOUBLE)
          END AS beta0
        FROM gagg
    """


# ---------------------------------------------------------------------------
# Ordinary kriging — the geostatistics step above IDW: weights come from a
# fitted variogram model and a per-target linear solve, not a fixed kernel.
# ---------------------------------------------------------------------------

_VG_MODELS = ("spherical", "exponential", "gaussian")


def _gamma_np(h, model: str, nugget: float, sill: float, rng: float):
    """Variogram gamma(h) for numpy arrays h >= 0. gamma(0) = 0 by
    definition (the nugget is a jump AT zero, not at h=0 itself)."""
    import numpy as np

    h = np.asarray(h, dtype=np.float64)
    psill = sill - nugget
    if model == "spherical":
        hr = np.minimum(h / rng, 1.0)
        g = nugget + psill * (1.5 * hr - 0.5 * hr * hr * hr)
    elif model == "exponential":
        g = nugget + psill * (1.0 - np.exp(-3.0 * h / rng))
    elif model == "gaussian":
        g = nugget + psill * (1.0 - np.exp(-3.0 * (h * h) / (rng * rng)))
    else:
        raise ValueError(f"unknown variogram model {model!r}")
    return np.where(h == 0.0, 0.0, g)


def fit_variogram(
    vg_rows,
    model: str = "spherical",
    n_range_steps: int = 64,
) -> dict:
    """Weighted-least-squares fit of (nugget, sill, range) to an EMPIRICAL
    semivariogram — the <= n_bins summary rows of engine.pointstats.variogram
    (pass df.collect() or any [(lag_lo, lag_hi, n_pairs, gamma)] iterable;
    driver-side on purpose: the input is a bounded per-bin summary, never
    point data).

    For a candidate range a the model is LINEAR in (nugget, sill - nugget):
    gamma = b0 + b1 * f(h; a) with f the unit-sill shape — so each a gets a
    closed-form n_pairs-weighted 2x2 normal-equation solve (clamped to
    b0 >= 0, b1 >= 0), and a scans a deterministic ladder of n_range_steps
    values up to 1.5x the last bin edge. Returns {"model", "nugget",
    "sill", "range", "sse"} for the best a (ties -> smaller a)."""
    import numpy as np

    if model not in _VG_MODELS:
        raise ValueError(f"model must be one of {_VG_MODELS}")
    rows = list(vg_rows)
    if not rows:
        raise ValueError("empty variogram")
    h = np.array(
        [0.5 * (float(r[0]) + float(r[1])) for r in rows], dtype=np.float64
    )
    w = np.array([float(r[2]) for r in rows], dtype=np.float64)
    g = np.array([float(r[3]) for r in rows], dtype=np.float64)
    hmax = max(float(r[1]) for r in rows)
    best = None
    for step in range(1, n_range_steps + 1):
        a = 1.5 * hmax * step / n_range_steps
        f = _gamma_np(h, model, 0.0, 1.0, a)
        # weighted normal equations for gamma ~ b0 + b1 * f
        sw, swf = w.sum(), (w * f).sum()
        swff, swg, swfg = (w * f * f).sum(), (w * g).sum(), (w * f * g).sum()
        det = sw * swff - swf * swf
        if det > 1e-12:
            b0 = (swg * swff - swfg * swf) / det
            b1 = (sw * swfg - swf * swg) / det
        else:
            b0, b1 = 0.0, (swfg / swff if swff > 0 else 0.0)
        b0 = max(b0, 0.0)
        b1 = max(b1, 1e-12)  # psill > 0 keeps the kriging system nonsingular
        resid = g - (b0 + b1 * f)
        sse = float((w * resid * resid).sum())
        if best is None or sse < best[0] - 1e-15:
            best = (sse, b0, b0 + b1, a)
    sse, nugget, sill, a = best
    return {
        "model": model, "nugget": float(nugget), "sill": float(sill),
        "range": float(a), "sse": sse,
    }


def ordinary_kriging(
    samples: DataFrame,
    targets: DataFrame,
    variogram: dict,
    radius: float,
    k: int = 16,
    sample_id: str = "id",
    target_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Ordinary kriging of scattered samples onto target points: for each
    target, the k nearest samples within `radius` (blocked cell join, same
    discipline as idw_grid / pointstats.lag_pairs) feed the OK system

        [ Gamma  1 ] [w ]   [ gamma(d(s_i, t)) ]
        [ 1^T    0 ] [mu] = [ 1                ]

    with Gamma_ij = gamma(d(s_i, s_j)) under the fitted `variogram` dict
    (fit_variogram output or hand {"model","nugget","sill","range"}).
    Estimate = sum w_i v_i; kriging variance = sum w_i gamma_i + mu (the
    statistically-correct uncertainty IDW cannot give).

    Output: (target_id, x, y, n_neighbors, est, krig_var). Targets with no
    sample within radius are dropped (inner join semantics, as idw_grid).

    Plan/scale: samples scatter into their 3x3 cell neighborhood at cell =
    radius (bounded x9 fan-out); targets join by home cell (ONE equi-join,
    broadcast-able when the sample side is a dim); per-target top-k is a
    window WindowGroupLimit collapses map-side; then one groupBy(target)
    collect of <= k neighbor structs and a mapInPandas batched numpy solve
    — (B, k+1, k+1) np.linalg.solve per equal-size group, never a
    per-row Python loop. The solve is LAPACK-deterministic within an
    engine; there is NO DuckDB twin (matrix solves are out of SQL reach) —
    correctness is pytest-gated on the exact-interpolation and
    constant-field invariants plus a same-library numpy oracle.

    Duplicate sample locations make the system singular at nugget=0 —
    dedup sample coordinates upstream (the exact-dedup operator exists);
    a singular batch falls back to per-row lstsq, which minimizes the same
    residual, so est and krig_var stay defined and finite.
    """
    import numpy as np
    import pandas as pd

    if radius <= 0:
        raise ValueError("radius must be > 0")
    if k < 1:
        raise ValueError("k must be >= 1")
    model = variogram["model"]
    if model not in _VG_MODELS:
        raise ValueError(f"model must be one of {_VG_MODELS}")
    nug, sill, rng = (
        float(variogram["nugget"]),
        float(variogram["sill"]),
        float(variogram["range"]),
    )
    if sill <= nug:
        raise ValueError("sill must exceed nugget")
    if rng <= 0:
        raise ValueError("range must be > 0")
    e = float(radius)

    sm = samples.select(
        F.col(sample_id).cast("long").alias("_sid"),
        F.col(x_col).cast("double").alias("_sx"),
        F.col(y_col).cast("double").alias("_sy"),
        F.col(value_col).cast("double").alias("_sv"),
    )
    tg = targets.select(
        F.col(target_id).cast("long").alias("_tid"),
        F.col(x_col).cast("double").alias("_tx"),
        F.col(y_col).cast("double").alias("_ty"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    scx = F.floor(F.col("_sx") / e).cast("long")
    scy = F.floor(F.col("_sy") / e).cast("long")
    sm_x = (
        sm.withColumn("_o", F.explode(offsets))
        .withColumn("_cx", scx + F.col("_o.dx"))
        .withColumn("_cy", scy + F.col("_o.dy"))
        .drop("_o")
    )
    tg_c = tg.withColumn(
        "_cx", F.floor(F.col("_tx") / e).cast("long")
    ).withColumn("_cy", F.floor(F.col("_ty") / e).cast("long"))
    dx = F.col("_sx") - F.col("_tx")
    dy = F.col("_sy") - F.col("_ty")
    d2 = dx * dx + dy * dy
    cand = (
        tg_c.join(sm_x, ["_cx", "_cy"])
        .withColumn("_d2", d2)
        .filter(F.col("_d2") <= F.lit(e * e))
    )
    w = Window.partitionBy("_tid").orderBy("_d2", "_sid")
    nb = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("_tid", "_tx", "_ty")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_d2").alias("d2"),
                        F.col("_sid").alias("sid"),
                        F.col("_sx").alias("sx"),
                        F.col("_sy").alias("sy"),
                        F.col("_sv").alias("sv"),
                    )
                )
            ).alias("_nb")
        )
    )

    out_schema = (
        f"{target_id} long, x double, y double, n_neighbors int, "
        "est double, krig_var double"
    )

    def solve_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            recs = []
            for tid, tx, ty, nbrs in zip(
                pdf["_tid"], pdf["_tx"], pdf["_ty"], pdf["_nb"]
            ):
                m = len(nbrs)
                recs.append((int(tid), float(tx), float(ty), m, nbrs))
            # batch targets by neighbor count for one vectorized solve each
            by_m: dict[int, list] = {}
            for r in recs:
                by_m.setdefault(r[3], []).append(r)
            rows = []
            for m, grp in sorted(by_m.items()):
                B = len(grp)
                sx = np.array(
                    [[c["sx"] for c in g[4]] for g in grp], dtype=np.float64
                )
                sy = np.array(
                    [[c["sy"] for c in g[4]] for g in grp], dtype=np.float64
                )
                sv = np.array(
                    [[c["sv"] for c in g[4]] for g in grp], dtype=np.float64
                )
                td2 = np.array(
                    [[c["d2"] for c in g[4]] for g in grp], dtype=np.float64
                )
                dsx = sx[:, :, None] - sx[:, None, :]
                dsy = sy[:, :, None] - sy[:, None, :]
                dist_ss = np.sqrt(dsx * dsx + dsy * dsy)
                A = np.zeros((B, m + 1, m + 1), dtype=np.float64)
                A[:, :m, :m] = _gamma_np(dist_ss, model, nug, sill, rng)
                A[:, m, :m] = 1.0
                A[:, :m, m] = 1.0
                b = np.zeros((B, m + 1), dtype=np.float64)
                b[:, :m] = _gamma_np(np.sqrt(td2), model, nug, sill, rng)
                b[:, m] = 1.0
                try:
                    wgt = np.linalg.solve(A, b[..., None])[..., 0]
                except np.linalg.LinAlgError:
                    wgt = np.stack(
                        [
                            np.linalg.lstsq(A[i], b[i], rcond=None)[0]
                            for i in range(B)
                        ]
                    )
                est = (wgt[:, :m] * sv).sum(axis=1)
                kvar = (wgt[:, :m] * b[:, :m]).sum(axis=1) + wgt[:, m]
                for i, g in enumerate(grp):
                    rows.append(
                        (g[0], g[1], g[2], m, float(est[i]), float(kvar[i]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[target_id, "x", "y", "n_neighbors", "est",
                         "krig_var"],
            )

    return nb.mapInPandas(solve_batches, out_schema)
