"""Point-pattern statistics: empirical semivariogram + Ripley's K / L.

The two classic second-order summaries of a spatial point set, both reduced
to ONE grid-blocked pair self-join (the dbscan/colocation blocking
discipline) plus a tiny bounded aggregate:

- `variogram`: Matheron's empirical semivariogram gamma(h) — for point
  pairs binned by separation distance, half the mean squared value
  difference per lag bin. The geostatistics primitive (fit a model to it
  and you have kriging weights); over an image-anchor table it answers
  "over what distance do caption/quality/embedding scalars stay
  correlated?".
- `ripleys_k`: Ripley's K(r) (naive/no-edge-correction estimator) and the
  variance-stabilized L(r) = sqrt(K/pi) — for a ladder of radii, the
  expected number of further points within r of a typical point, scaled by
  intensity. K(r) above pi*r^2 (L above r) = clustering at that scale;
  below = inhibition/regularity.

Scale story: the only wide op is the (cx, cy) cell equi-join of the blocked
pair frame at cell size = max lag (3x3 cover, each unordered pair exactly
once via the home-cell + id< trick) — O(n * lambda * max_lag^2) pair rows
stream through map-side-combined per-bin aggregates; nothing is collected
until the <= n_bins summary rows. Dense megacity cells skew the equi-join
exactly like dbscan's — AQE skew handling applies unchanged. Both the
squared-difference sums (when the value column is integer) and the per-bin
pair counts are EXACT int64; the final gamma / K doubles follow one fixed
expression graph shared with the DuckDB twins (variogram_sql /
ripleys_k_sql replay the same binning on a brute-force O(n^2) join), so
pytest asserts bit equality, not approx.

Reference provenance: the reference (osm-history-analysis) has no spatial
statistics; this extends the brief's hotspot/screening family (gi_star,
morans_i, join_counts, local_morans are the raster side; variogram/K are
the point-set side) — SURVEY.md §2 additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_pairs(
    points: DataFrame,
    max_lag: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str | None = None,
) -> DataFrame:
    """All unordered point pairs at euclidean distance <= max_lag, each
    exactly once: grid-blocked self-join at cell size max_lag (A explodes
    into its 3x3 cell neighborhood, B keeps its unique home cell, so every
    qualifying pair meets in exactly one cell), ordered by id to halve.
    Returns (_ida, _idb, d2[, dv]) with d2 the squared distance double and
    dv = value_a - value_b when value_col is given (exact int64 for
    integer inputs). Self pairs (same id) are excluded; coincident distinct
    points are kept (d2 = 0)."""
    if max_lag <= 0:
        raise ValueError("max_lag must be > 0")
    e = float(max_lag)
    cols = [
        F.col(id_col).cast("long").alias("_id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    ]
    if value_col is not None:
        cols.append(F.col(value_col).cast("long").alias("_v"))
    pts = points.select(*cols)
    cx = F.floor(F.col("_px") / e).cast("long")
    cy = F.floor(F.col("_py") / e).cast("long")
    b_cols = [
        F.col("_id").alias("_idb"),
        F.col("_px").alias("_bx"),
        F.col("_py").alias("_by"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    ]
    a_cols = [
        F.col("_id").alias("_ida"),
        F.col("_px").alias("_ax"),
        F.col("_py").alias("_ay"),
        cx.alias("_acx"),
        cy.alias("_acy"),
    ]
    if value_col is not None:
        b_cols.append(F.col("_v").alias("_vb"))
        a_cols.append(F.col("_v").alias("_va"))
    b = pts.select(*b_cols)
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    a = (
        pts.select(*a_cols)
        .withColumn("_o", F.explode(offsets))
        .withColumn("_cx", F.col("_acx") + F.col("_o.dx"))
        .withColumn("_cy", F.col("_acy") + F.col("_o.dy"))
        .drop("_acx", "_acy", "_o")
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    out = [F.col("_ida"), F.col("_idb"), d2.alias("d2")]
    if value_col is not None:
        out.append((F.col("_va") - F.col("_vb")).alias("dv"))
    return (
        a.join(b, ["_cx", "_cy"])
        .filter((F.col("_ida") < F.col("_idb")) & (d2 <= F.lit(e * e)))
        .select(*out)
    )


def variogram(
    points: DataFrame,
    max_lag: float,
    n_bins: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "v",
) -> DataFrame:
    """Matheron empirical semivariogram: unordered pairs within max_lag are
    binned by bin = min(floor(sqrt(d2)/w), n_bins-1), w = max_lag/n_bins
    (the min() folds the single d == max_lag boundary point into the last
    bin), and each bin reports

        gamma(h) = sum (v_a - v_b)^2 / (2 * n_pairs)

    Returns one row per NON-EMPTY bin: (bin, lag_lo, lag_hi, n_pairs,
    sum_sq_dv, gamma), bin ascending. sum_sq_dv and n_pairs are exact
    int64 (integer value column); gamma's double graph matches
    variogram_sql bit-for-bit. Values must be integral (cast to long) —
    floor-scale float attributes before calling, the house oracle rule."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    w = float(max_lag) / n_bins
    pairs = lag_pairs(
        points, max_lag, id_col=id_col, x_col=x_col, y_col=y_col,
        value_col=value_col,
    )
    bin_ = F.least(
        F.floor(F.sqrt(F.col("d2")) / F.lit(w)).cast("int"),
        F.lit(n_bins - 1),
    )
    g = (
        pairs.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("dv") * F.col("dv")).alias("sum_sq_dv"),
        )
        .select(
            "bin",
            (F.col("bin").cast("double") * F.lit(w)).alias("lag_lo"),
            ((F.col("bin") + 1).cast("double") * F.lit(w)).alias("lag_hi"),
            "n_pairs",
            "sum_sq_dv",
            (
                F.col("sum_sq_dv").cast("double")
                / (F.lit(2.0) * F.col("n_pairs").cast("double"))
            ).alias("gamma"),
        )
    )
    return g.orderBy("bin")


def variogram_sql(
    points_table: str,
    max_lag: float,
    n_bins: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "v",
) -> str:
    """DuckDB twin of variogram: brute-force O(n^2) id<-ordered self-join,
    the identical binning and double expression graph."""
    e = repr(float(max_lag))
    w = repr(float(max_lag) / n_bins)
    return f"""
        WITH p AS (
          SELECT CAST({id_col} AS BIGINT) AS id,
                 CAST({x_col} AS DOUBLE) AS x,
                 CAST({y_col} AS DOUBLE) AS y,
                 CAST({value_col} AS BIGINT) AS v
          FROM {points_table}
        ), pr AS (
          SELECT (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS d2,
                 a.v - b.v AS dv
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) <= {e} * {e}
        ), binned AS (
          SELECT LEAST(CAST(FLOOR(SQRT(d2) / {w}) AS INT), {n_bins - 1})
                   AS bin,
                 COUNT(*)::BIGINT AS n_pairs,
                 SUM(dv * dv)::BIGINT AS sum_sq_dv
          FROM pr GROUP BY 1
        )
        SELECT bin, CAST(bin AS DOUBLE) * {w} AS lag_lo,
               CAST(bin + 1 AS DOUBLE) * {w} AS lag_hi,
               n_pairs, sum_sq_dv,
               CAST(sum_sq_dv AS DOUBLE)
                 / (2.0 * CAST(n_pairs AS DOUBLE)) AS gamma
        FROM binned ORDER BY bin
    """


def ripleys_k(
    points: DataFrame,
    max_r: float,
    n_r: int,
    area: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Ripley's K / L functions at the radius ladder r_k = k * max_r / n_r,
    k = 1..n_r, naive (no edge correction) estimator over a study window of
    the given area:

        K(r) = area * 2 * #{unordered pairs with d <= r} / (n * (n - 1))
        L(r) = sqrt(K(r) / pi)

    A pair lands in ladder slot ceil(sqrt(d2)/step) (coincident pairs clamp
    to slot 1) and counts toward every r_k at or above it — one groupBy of
    the pair frame + a cumulative window over the <= n_r summary rows.
    Every slot is emitted (empty slots carry the running cumulative), so
    the output is exactly n_r rows: (r, n_pairs_le, k_hat, l_hat) with
    n_pairs_le exact int64 and k_hat/l_hat on the fixed double graph shared
    with ripleys_k_sql. `n` (the point count) is one bounded driver
    count(). Under complete spatial randomness K(r) ~= pi r^2, so l_hat >
    r flags clustering at scale r and l_hat < r regularity."""
    if n_r < 1:
        raise ValueError("n_r must be >= 1")
    if area <= 0:
        raise ValueError("area must be > 0")
    step = float(max_r) / n_r
    n = points.count()
    if n < 2:
        raise ValueError("ripleys_k needs >= 2 points")
    pairs = lag_pairs(points, max_r, id_col=id_col, x_col=x_col, y_col=y_col)
    slot = F.greatest(
        F.ceil(F.sqrt(F.col("d2")) / F.lit(step)).cast("int"), F.lit(1)
    )
    per_slot = pairs.groupBy(slot.alias("slot")).agg(
        F.count("*").alias("c")
    )
    ladder = points.sparkSession.range(1, n_r + 1).select(
        F.col("id").cast("int").alias("slot")
    )
    cum = (
        ladder.join(per_slot, "slot", "left")
        .select(
            "slot", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
        .withColumn(
            "n_pairs_le",
            F.sum("c").over(
                Window.orderBy("slot").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    denom = float(n) * (float(n) - 1.0)
    k_hat = (
        F.lit(float(area))
        * (F.lit(2.0) * F.col("n_pairs_le").cast("double"))
        / F.lit(denom)
    )
    return cum.select(
        (F.col("slot").cast("double") * F.lit(step)).alias("r"),
        "n_pairs_le",
        k_hat.alias("k_hat"),
        F.sqrt(k_hat / F.lit(math.pi)).alias("l_hat"),
    ).orderBy("r")


def ripleys_k_sql(
    points_table: str,
    max_r: float,
    n_r: int,
    area: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB twin of ripleys_k: brute-force pair join, the identical slot
    ladder, cumulative window and double graph. The point count n is
    inlined by the SAME double arithmetic (a scalar subquery)."""
    e = repr(float(max_r))
    step = repr(float(max_r) / n_r)
    return f"""
        WITH p AS (
          SELECT CAST({id_col} AS BIGINT) AS id,
                 CAST({x_col} AS DOUBLE) AS x,
                 CAST({y_col} AS DOUBLE) AS y
          FROM {points_table}
        ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM p),
        pr AS (
          SELECT (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS d2
          FROM p a JOIN p b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) <= {e} * {e}
        ), slotted AS (
          SELECT GREATEST(CAST(CEIL(SQRT(d2) / {step}) AS INT), 1) AS slot,
                 COUNT(*)::BIGINT AS c
          FROM pr GROUP BY 1
        ), ladder AS (
          SELECT CAST(r.s AS INT) AS slot FROM range(1, {n_r + 1}) r(s)
        ), cum AS (
          SELECT l.slot,
                 SUM(COALESCE(s.c, 0))
                   OVER (ORDER BY l.slot
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS n_pairs_le
          FROM ladder l LEFT JOIN slotted s USING (slot)
        )
        SELECT CAST(slot AS DOUBLE) * {step} AS r, n_pairs_le,
               {repr(float(area))}
                 * (2.0 * CAST(n_pairs_le AS DOUBLE))
                 / (nn.n * (nn.n - 1.0)) AS k_hat,
               SQRT(({repr(float(area))}
                 * (2.0 * CAST(n_pairs_le AS DOUBLE))
                 / (nn.n * (nn.n - 1.0))) / {repr(math.pi)}) AS l_hat
        FROM cum, nn ORDER BY r
    """


def nn_distances(
    points: DataFrame,
    nn_radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-point nearest-neighbor SQUARED distance (id, nn_d2), exact for
    every point: the blocked lag_pairs self-join at cell = nn_radius finds
    each point's NN when it lies within nn_radius (the overwhelmingly
    common case at any sane radius — a few expected NN spacings); the
    RESIDUE (points whose nearest neighbor is farther than nn_radius) is
    resolved by a quarantined brute-force join against the full point set
    — bounded because it IS the residue, the knn_join straggler
    discipline. Coincident distinct points give nn_d2 = 0."""
    pts = points.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    )
    pairs = lag_pairs(points, nn_radius, id_col=id_col, x_col=x_col, y_col=y_col)
    sym = pairs.select(F.col("_ida").alias("_id"), "d2").unionByName(
        pairs.select(F.col("_idb").alias("_id"), "d2")
    )
    near = sym.groupBy("_id").agg(F.min("d2").alias("nn_d2"))
    residue = pts.join(near, "_id", "left_anti")
    # the residue is the bounded side — broadcast it so the full point set
    # streams through the nested-loop min without shuffling
    res_nn = (
        F.broadcast(
            residue.select(
                F.col("_id").alias("_rid"),
                F.col("_px").alias("_rx"), F.col("_py").alias("_ry"),
            )
        )
        .crossJoin(pts)
        .filter(F.col("_id") != F.col("_rid"))
        .groupBy(F.col("_rid").alias("_id"))
        .agg(
            F.min(
                (F.col("_rx") - F.col("_px")) * (F.col("_rx") - F.col("_px"))
                + (F.col("_ry") - F.col("_py")) * (F.col("_ry") - F.col("_py"))
            ).alias("nn_d2")
        )
    )
    return near.unionByName(res_nn).select(F.col("_id").alias("id"), "nn_d2")


def clark_evans(
    points: DataFrame,
    area: float,
    nn_radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Clark-Evans nearest-neighbor index over a study window of the given
    area — ONE summary row:

        n, sum_nnd_e6 = sum over points of floor(1e6 * sqrt(nn_d2))
        r_index = mean_nn / (0.5 * sqrt(area / n))      1 = CSR,
                                  -> 0 clustered, -> 2.149 lattice-regular
        z = (mean_nn - expected) / (0.26136 * sqrt(area) / n)

    The observed mean rides the house float discipline: per-point FLOOR-
    scaled int64 NN distances summed exactly, the mean and the index one
    fixed double graph on top (bit-equal with clark_evans_sql's brute-force
    twin in pytest). The naive (no edge-correction) estimator, like
    ripleys_k; nn_radius bounds the blocked join, the residue brute-forces
    (nn_distances)."""
    if area <= 0:
        raise ValueError("area must be > 0")
    nn = nn_distances(
        points, nn_radius, id_col=id_col, x_col=x_col, y_col=y_col
    )
    agg = nn.agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.sqrt(F.col("nn_d2")) * F.lit(1000000.0)).cast("long")
        ).alias("sum_nnd_e6"),
    )
    n_d = F.col("n").cast("double")
    mean_nn = F.col("sum_nnd_e6").cast("double") / F.lit(1e6) / n_d
    expected = F.lit(0.5) * F.sqrt(F.lit(float(area)) / n_d)
    se = F.lit(0.26136) * F.sqrt(F.lit(float(area))) / n_d
    return agg.select(
        "n", "sum_nnd_e6",
        (mean_nn / expected).alias("r_index"),
        ((mean_nn - expected) / se).alias("z"),
    )


def clark_evans_sql(
    points_table: str,
    area: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB twin of clark_evans: per-point NN via a brute-force O(n^2)
    min (no radius, no blocking — an independent derivation), then the
    identical e6 floors and double graph."""
    a = repr(float(area))
    return f"""
        WITH p AS (
          SELECT CAST({id_col} AS BIGINT) AS id,
                 CAST({x_col} AS DOUBLE) AS x,
                 CAST({y_col} AS DOUBLE) AS y
          FROM {points_table}
        ), nnd AS (
          SELECT a.id,
                 MIN((a.x - b.x) * (a.x - b.x)
                     + (a.y - b.y) * (a.y - b.y)) AS nn_d2
          FROM p a JOIN p b ON a.id <> b.id
          GROUP BY a.id
        ), s AS (
          SELECT COUNT(*)::BIGINT AS n,
                 SUM(CAST(FLOOR(SQRT(nn_d2) * 1000000.0) AS BIGINT))::BIGINT
                   AS sum_nnd_e6
          FROM nnd
        )
        SELECT n, sum_nnd_e6,
               (CAST(sum_nnd_e6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
                 / (0.5 * SQRT({a} / CAST(n AS DOUBLE))) AS r_index,
               ((CAST(sum_nnd_e6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
                  - 0.5 * SQRT({a} / CAST(n AS DOUBLE)))
                 / (0.26136 * SQRT({a}) / CAST(n AS DOUBLE)) AS z
        FROM s
    """


def quadrat_counts(
    points: DataFrame,
    x0: float,
    y0: float,
    width: float,
    height: float,
    nx: int,
    ny: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Quadrat-count dispersion test: the [x0, x0+width) x [y0, y0+height)
    study window split into nx * ny equal quadrats (half-open cells; points
    outside the window are DROPPED and reported), each point binned by pure
    Column floor math, one map-side-combined hash agg — then ONE summary
    row of exact integer moments plus the classic statistics on a fixed
    double graph:

        n_quadrats, n_points, n_outside, sum_sq (= sum of c_q^2 over the
        nx*ny quadrats, empties included — derived exactly from the
        nonempty counts), vmr = s^2 / mean (index of dispersion; 1 = CSR,
        > 1 clustered, < 1 regular), chi2 = (Q - 1) * vmr.

    s^2 is the POPULATION variance over all Q quadrats: (sum_sq - n^2/Q)/Q
    — everything before the final division is integer-exact, so the twin
    (quadrat_counts_sql) matches bit for bit."""
    if nx < 1 or ny < 1:
        raise ValueError("need nx, ny >= 1")
    if width <= 0 or height <= 0:
        raise ValueError("window must have positive extent")
    wx = float(width) / nx
    wy = float(height) / ny
    px = F.col(x_col).cast("double")
    py = F.col(y_col).cast("double")
    inside = (
        (px >= x0) & (px < x0 + width) & (py >= y0) & (py < y0 + height)
    )
    qx = F.floor((px - F.lit(float(x0))) / F.lit(wx)).cast("long")
    qy = F.floor((py - F.lit(float(y0))) / F.lit(wy)).cast("long")
    tagged = points.select(
        inside.alias("_in"),
        F.when(inside, F.least(qx, F.lit(nx - 1))).alias("_qx"),
        F.when(inside, F.least(qy, F.lit(ny - 1))).alias("_qy"),
    )
    per_q = (
        tagged.filter("_in")
        .groupBy("_qx", "_qy")
        .agg(F.count("*").alias("c"))
    )
    outside = tagged.filter(~F.col("_in")).agg(
        F.count("*").alias("n_outside")
    )
    q_tot = nx * ny
    s = per_q.agg(
        F.sum("c").alias("n_points"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    n_d = F.col("n_points").cast("double")
    mean = n_d / F.lit(float(q_tot))
    var = (
        F.col("sum_sq").cast("double") - n_d * n_d / F.lit(float(q_tot))
    ) / F.lit(float(q_tot))
    return s.crossJoin(outside).select(
        F.lit(q_tot).cast("long").alias("n_quadrats"),
        F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
        F.col("n_outside").cast("long").alias("n_outside"),
        F.coalesce(F.col("sum_sq"), F.lit(0)).alias("sum_sq"),
        (var / mean).alias("vmr"),
        (F.lit(float(q_tot - 1)) * var / mean).alias("chi2"),
    )


def quadrat_counts_sql(
    points_table: str,
    x0: float,
    y0: float,
    width: float,
    height: float,
    nx: int,
    ny: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB twin of quadrat_counts: identical half-open binning, floors
    and double graph."""
    wx = repr(float(width) / nx)
    wy = repr(float(height) / ny)
    x0r, y0r = repr(float(x0)), repr(float(y0))
    q = nx * ny
    return f"""
        WITH p AS (
          SELECT CAST({x_col} AS DOUBLE) AS x, CAST({y_col} AS DOUBLE) AS y
          FROM {points_table}
        ), tagged AS (
          SELECT (x >= {x0r} AND x < {x0r} + {repr(float(width))}
                  AND y >= {y0r} AND y < {y0r} + {repr(float(height))})
                   AS inp,
                 LEAST(CAST(FLOOR((x - {x0r}) / {wx}) AS BIGINT),
                       {nx - 1}) AS qx,
                 LEAST(CAST(FLOOR((y - {y0r}) / {wy}) AS BIGINT),
                       {ny - 1}) AS qy
          FROM p
        ), per_q AS (
          SELECT qx, qy, COUNT(*)::BIGINT AS c FROM tagged
          WHERE inp GROUP BY qx, qy
        ), s AS (
          SELECT COALESCE(SUM(c), 0)::BIGINT AS n_points,
                 COALESCE(SUM(c * c), 0)::BIGINT AS sum_sq
          FROM per_q
        ), o AS (
          SELECT COUNT(*)::BIGINT AS n_outside FROM tagged WHERE NOT inp
        )
        SELECT CAST({q} AS BIGINT) AS n_quadrats, n_points, n_outside,
               sum_sq,
               ((CAST(sum_sq AS DOUBLE)
                 - CAST(n_points AS DOUBLE) * CAST(n_points AS DOUBLE)
                   / {repr(float(q))}) / {repr(float(q))})
                 / (CAST(n_points AS DOUBLE) / {repr(float(q))}) AS vmr,
               {repr(float(q - 1))}
                 * ((CAST(sum_sq AS DOUBLE)
                     - CAST(n_points AS DOUBLE) * CAST(n_points AS DOUBLE)
                       / {repr(float(q))}) / {repr(float(q))})
                 / (CAST(n_points AS DOUBLE) / {repr(float(q))}) AS chi2
        FROM s, o
    """


def radius_join(
    a: DataFrame,
    b: DataFrame,
    radius: float,
    a_cols: tuple = ("id", "x", "y"),
    b_cols: tuple = ("id", "x", "y"),
) -> DataFrame:
    """Two-frame planar radius join: all (a, b) pairs at euclidean distance
    <= radius — lag_pairs' grid-blocked discipline for DIFFERENT frames
    (cell size = radius; a explodes into its 3x3 cell neighborhood, b
    keeps its home cell, so every qualifying pair meets exactly once; no
    id< halving — the pair is ordered by construction). Returns
    (a_id, b_id, d2)."""
    if radius <= 0:
        raise ValueError("radius must be > 0")
    e = float(radius)
    ai, ax, ay = a_cols
    bi, bx, by = b_cols
    pa = a.select(
        F.col(ai).alias("_aid"),
        F.col(ax).cast("double").alias("_ax"),
        F.col(ay).cast("double").alias("_ay"),
    )
    pb = b.select(
        F.col(bi).alias("_bid"),
        F.col(bx).cast("double").alias("_bx"),
        F.col(by).cast("double").alias("_by"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
            for i in (-1, 0, 1) for j in (-1, 0, 1)
        ]
    )
    ae = (
        pa.withColumn("_o", F.explode(offsets))
        .select(
            "_aid", "_ax", "_ay",
            (F.floor(F.col("_ax") / e).cast("long") + F.col("_o.dx"))
            .alias("_cx"),
            (F.floor(F.col("_ay") / e).cast("long") + F.col("_o.dy"))
            .alias("_cy"),
        )
    )
    be = pb.select(
        "_bid", "_bx", "_by",
        F.floor(F.col("_bx") / e).cast("long").alias("_cx"),
        F.floor(F.col("_by") / e).cast("long").alias("_cy"),
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    return (
        ae.join(be, ["_cx", "_cy"])
        .filter(d2 <= F.lit(e * e))
        .select(
            F.col("_aid").alias("a_id"), F.col("_bid").alias("b_id"),
            d2.alias("d2"),
        )
    )


def accessibility_2sfca(
    supply: DataFrame,
    demand: DataFrame,
    radius: float,
    supply_cols: tuple = ("id", "x", "y", "capacity"),
    demand_cols: tuple = ("id", "x", "y", "population"),
) -> DataFrame:
    """Two-step floating catchment area accessibility (Luo & Wang 2003) —
    the classic supply/demand spatial-access score, both steps blocked
    radius joins (never quadratic):

      step 1 (per supply site j): ratio_j = capacity_j / sum of population
              over demand within radius of j — kept EXACT as the int64
              pair (capacity_j, pop_j); sites with zero catchment
              population are dropped (no one to serve, standard 2SFCA).
      step 2 (per demand point i): access_e9 = sum over supply within
              radius of i of floor(1e9 * capacity_j / pop_j) — each term
              floor-scaled to int64 BEFORE the sum, so the aggregate is
              exact and order-independent (the house float discipline),
              bit-reproducible against the brute-force SQL twin.

    Returns one row per demand point: (id, access_e9, n_sites) —
    n_sites = reachable supply sites; demand with no site in radius gets
    access_e9 = 0, n_sites = 0 (kept: 'no access' is the signal). Capacity
    and population must be integral (cast to long)."""
    si, sx, sy, sc = supply_cols
    di, dx_, dy_, dp = demand_cols
    sup = supply.select(
        F.col(si).alias("sid"),
        F.col(sx).cast("double").alias("x"),
        F.col(sy).cast("double").alias("y"),
        F.col(sc).cast("long").alias("cap"),
    )
    dem = demand.select(
        F.col(di).alias("did"),
        F.col(dx_).cast("double").alias("x"),
        F.col(dy_).cast("double").alias("y"),
        F.col(dp).cast("long").alias("pop"),
    )
    # step 1: catchment population per supply site
    p1 = radius_join(
        sup, dem, radius, a_cols=("sid", "x", "y"), b_cols=("did", "x", "y")
    )
    pop_j = (
        p1.join(dem.select("did", "pop"), F.col("b_id") == F.col("did"))
        .groupBy(F.col("a_id").alias("sid"))
        .agg(F.sum("pop").alias("pop_sum"))
        .filter(F.col("pop_sum") > 0)
    )
    ratios = sup.join(pop_j, "sid").select(
        "sid", "x", "y",
        F.floor(
            F.col("cap").cast("double") * F.lit(1e9)
            / F.col("pop_sum").cast("double")
        ).cast("long").alias("ratio_e9"),
    )
    # step 2: sum reachable ratios per demand point
    p2 = radius_join(
        dem, ratios, radius, a_cols=("did", "x", "y"), b_cols=("sid", "x", "y")
    )
    acc = (
        p2.join(ratios.select("sid", "ratio_e9"), F.col("b_id") == F.col("sid"))
        .groupBy(F.col("a_id").alias("did"))
        .agg(
            F.sum("ratio_e9").alias("access_e9"),
            F.count("*").alias("n_sites"),
        )
    )
    return (
        dem.select("did")
        .join(acc, "did", "left")
        .select(
            F.col("did").alias("id"),
            F.coalesce(F.col("access_e9"), F.lit(0)).alias("access_e9"),
            F.coalesce(F.col("n_sites"), F.lit(0)).alias("n_sites"),
        )
    )


def accessibility_2sfca_sql(
    supply_table: str,
    demand_table: str,
    radius: float,
    supply_cols: tuple = ("id", "x", "y", "capacity"),
    demand_cols: tuple = ("id", "x", "y", "population"),
) -> str:
    """DuckDB twin of accessibility_2sfca: brute-force O(n*m) distance
    joins (no blocking — an independent derivation), the identical floors
    and integer sums."""
    e = repr(float(radius))
    si, sx, sy, sc = supply_cols
    di, dx_, dy_, dp = demand_cols
    return f"""
        WITH fca_sup AS (
          SELECT {si} AS sid, CAST({sx} AS DOUBLE) AS x,
                 CAST({sy} AS DOUBLE) AS y, CAST({sc} AS BIGINT) AS cap
          FROM {supply_table}
        ), fca_dem AS (
          SELECT {di} AS did, CAST({dx_} AS DOUBLE) AS x,
                 CAST({dy_} AS DOUBLE) AS y, CAST({dp} AS BIGINT) AS pop
          FROM {demand_table}
        ), fca_popj AS (
          SELECT s.sid, SUM(d.pop)::BIGINT AS pop_sum
          FROM fca_sup s JOIN fca_dem d
            ON (s.x - d.x) * (s.x - d.x) + (s.y - d.y) * (s.y - d.y)
               <= {e} * {e}
          GROUP BY s.sid
          HAVING SUM(d.pop) > 0
        ), fca_ratios AS (
          SELECT s.sid, s.x, s.y,
                 CAST(FLOOR(CAST(s.cap AS DOUBLE) * 1e9
                            / CAST(p.pop_sum AS DOUBLE)) AS BIGINT)
                   AS ratio_e9
          FROM fca_sup s JOIN fca_popj p USING (sid)
        ), fca_acc AS (
          SELECT d.did, SUM(r.ratio_e9)::BIGINT AS access_e9,
                 COUNT(*)::BIGINT AS n_sites
          FROM fca_dem d JOIN fca_ratios r
            ON (d.x - r.x) * (d.x - r.x) + (d.y - r.y) * (d.y - r.y)
               <= {e} * {e}
          GROUP BY d.did
        )
        SELECT d.did AS id,
               COALESCE(a.access_e9, 0)::BIGINT AS access_e9,
               COALESCE(a.n_sites, 0)::BIGINT AS n_sites
        FROM fca_dem d LEFT JOIN fca_acc a USING (did)
    """
