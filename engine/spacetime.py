"""Space-time cube analytics: emerging hotspot analysis over event streams.

The classic geo-temporal screening workflow (popularized by ArcGIS's
"Emerging Hot Spot Analysis" on the space-time cube; the method itself is
Getis-Ord 1992 + Mann-Kendall 1945): bin events into (cell, time-bin)
counts, score every bin's raster with Gi* hotspot z-scores against that
bin's global moments, then test each CELL's z time series for monotone
trend with the Mann-Kendall S statistic — "is this place becoming a
hotspot, fading, or persistently hot?".

Everything is long-format DataFrame algebra (no tiles, no driver loop over
bins — a naive implementation collects per-bin moments T times; here the
per-bin moments are one groupBy and ride a broadcast join). The only
driver-side scalar is |study area| (one count). The Mann-Kendall fold is an
in-row nested HOF over each cell's T-element series — T (the bin count) is
the small dimension of a space-time cube by construction, so O(T^2) per
cell is the right trade against a pairwise self-join's T^2 row blowup.

Exactness: counts, focal sums, in-area window sizes and the MK S statistic
(a sum of signs) are int64; z is double from exact-int inputs with a fixed
expression graph (the same IEEE-reproducibility contract as
engine.focal.gi_star — asserted cross-engine by the `emerging_hotspots`
registry row's DuckDB twin).

Scale: the dense cube is |area| x T rows — the honest materialization every
space-time method needs; all joins are keyed (bin / cell) or broadcast
(per-bin moments: T rows). The per-bin focal sum scatters only NONZERO
cells (sparse events stay sparse until the cube densification).

Classification (documented simplification of the ArcGIS taxonomy, driven by
two signals — the per-bin hot flags and the tie-corrected MK trend z):
    new           last bin hot, no earlier bin hot
    intensifying  hot in >= half the bins, MK trend z >= +1.96
    diminishing   hot in >= half the bins, MK trend z <= -1.96
    persistent    hot in >= 90% of bins, |trend| < 1.96
    sporadic      hot somewhere, none of the above
    none          never hot

The reference has no temporal-statistics operator; this composes the
engine's rasterize + focal + window machinery along the brief's
geo-temporal axis (nearest reference analog: the temporal parent tree's
per-timestamp replay, SURVEY.md section 2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _neighbor_offsets(radius: int):
    return [
        (dx, dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]


def spacetime_cube(
    events: DataFrame,
    cell_size: float,
    bin_micros: int,
    x_col: str = "x",
    y_col: str = "y",
    ts_col: str = "ts_us",
) -> DataFrame:
    """events -> sparse (bin, gx, gy, n) int64 counts. Half-open cells via
    floor division; ts is epoch microseconds."""
    s = float(cell_size)
    if s <= 0:
        raise ValueError("cell_size must be > 0")
    if bin_micros <= 0:
        raise ValueError("bin_micros must be > 0")
    return (
        events.select(
            F.floor(F.col(ts_col).cast("long") / F.lit(int(bin_micros)))
            .alias("bin"),
            F.floor(F.col(x_col).cast("double") / F.lit(s)).alias("gx"),
            F.floor(F.col(y_col).cast("double") / F.lit(s)).alias("gy"),
        )
        .groupBy("bin", "gx", "gy")
        .agg(F.count("*").alias("n"))
    )


def binned_gi_star(
    counts: DataFrame,
    n_area: int | None,
    radius: int = 1,
) -> DataFrame:
    """Per-bin Gi* over a sparse (bin, gx, gy, n) cube whose study area is
    the distinct (gx, gy) set of `counts` (all bins pooled — the fixed
    spatial extent every space-time cube shares). Returns the DENSE cube
    (bin, gx, gy, n, z): one row per area cell per bin, zeros densified —
    z is meaningful (negative) for silent cells, which is what the trend
    test needs. `n_area` must equal the distinct-cell count (the caller
    usually has it from building the area; explicit so the oracle twin can
    embed the same scalar path), or None (r6) to derive it INSIDE the plan
    as a broadcast 1-row aggregate — zero driver actions, identical double
    arithmetic (the scalar literal becomes a same-valued column). No
    driver loop: per-bin moments are one groupBy riding a broadcast join."""
    if n_area is not None and n_area < 2:
        raise ValueError("study area needs >= 2 cells")
    area = counts.select("gx", "gy").distinct()
    bins = counts.select("bin").distinct()
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in _neighbor_offsets(radius)
            ]
        )
    )
    # in-area window size per cell: bin-independent, from the area alone
    w = (
        area.select("gx", "gy", offs.alias("o"))
        .select(
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("w"))
        .join(area, ["gx", "gy"])  # clip to the study area
    )
    # per-bin focal sums from nonzero cells only
    fs = (
        counts.select("bin", "gx", "gy", "n", offs.alias("o"))
        .groupBy(
            "bin",
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
        .agg(F.sum("n").alias("fs"))
    )
    # per-bin global moments over the FULL area (zero cells contribute 0 to
    # both sums; n_area supplies the denominator)
    mo = counts.groupBy("bin").agg(
        F.sum("n").alias("_s"), F.sum(F.col("n") * F.col("n")).alias("_ss")
    )
    if n_area is not None:
        nn = F.lit(float(n_area))
    else:
        # in-plan scalar: one broadcast 1-row count over the area frame —
        # same double value the eager count() produced
        na = area.agg(F.count(F.lit(1)).alias("_na"))
        mo = mo.crossJoin(F.broadcast(na))
        nn = F.col("_na").cast("double")
    mean = F.col("_s") / nn
    msq = F.col("_ss") / nn
    mo = mo.select(
        "bin",
        nn.alias("_nn"),
        mean.alias("mean"),
        F.sqrt(F.greatest(msq - mean * mean, F.lit(0.0))).alias("sd"),
    )
    dense = (
        area.crossJoin(F.broadcast(bins))
        .join(counts, ["bin", "gx", "gy"], "left")
        .join(fs, ["bin", "gx", "gy"], "left")
        .join(w, ["gx", "gy"])
        .join(F.broadcast(mo), "bin")
        .select(
            "bin", "gx", "gy",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
            F.coalesce(F.col("fs"), F.lit(0).cast("long")).alias("fs"),
            "w", "_nn", "mean", "sd",
        )
    )
    wn = F.col("w")
    nnc = F.col("_nn")
    denom = F.col("sd") * F.sqrt(
        (nnc * wn - wn * wn) / (nnc - F.lit(1.0))
    )
    z = F.when(denom > 0.0, (F.col("fs") - F.col("mean") * wn) / denom)
    return dense.select("bin", "gx", "gy", "n", z.alias("z"))


def emerging_hotspots(
    events: DataFrame,
    cell_size: float,
    bin_micros: int,
    x_col: str = "x",
    y_col: str = "y",
    ts_col: str = "ts_us",
    radius: int = 1,
    z_hot: float = 1.645,
) -> DataFrame:
    """Full emerging-hotspot pipeline: cube -> per-bin Gi* -> per-cell
    Mann-Kendall trend + classification. Output one row per study-area
    cell: (gx, gy, n_bins, n_events, hot_bins, last_hot, mk_s, mk_z,
    category). mk_s is the exact-int MK S statistic over the z series in
    bin order; mk_z applies the tie-corrected normal approximation with
    continuity correction."""
    counts = spacetime_cube(
        events, cell_size, bin_micros, x_col=x_col, y_col=y_col, ts_col=ts_col
    ).persist()
    # r6: n_area rides the plan as a broadcast 1-row agg (n_area=None) —
    # the old eager distinct().count() was one full driver action per call
    # whose only purpose was baking the same number into the expressions;
    # the lazy persist above fills on first use inside the one final job.
    zs = binned_gi_star(counts, None, radius=radius)
    per_cell = zs.groupBy("gx", "gy").agg(
        F.array_sort(
            F.collect_list(F.struct("bin", "z", "n"))
        ).alias("_series"),
    )
    series_z = F.transform(F.col("_series"), lambda s: s["z"])
    t_cnt = F.size("_series")
    zero = F.lit(0).cast("long")

    def sign(d: Column) -> Column:
        return (
            F.when(d > 0, F.lit(1)).when(d < 0, F.lit(-1)).otherwise(F.lit(0))
        ).cast("long")

    # MK S = sum over i<j of sign(z_j - z_i); null z (degenerate bins)
    # contributes no trend via the null-coalesced sign. T==1 guard: Spark's
    # sequence(0, -1) DESCENDS instead of being empty.
    zarr = F.col("_z")
    mk_s = F.when(
        t_cnt >= 2,
        F.aggregate(
            F.sequence(F.lit(0), t_cnt - 2),
            zero,
            lambda acc, i: acc
            + F.aggregate(
                F.sequence(i + 1, t_cnt - 1),
                zero,
                lambda a2, j: a2
                + sign(
                    F.coalesce(
                        F.element_at(zarr, j + 1) - F.element_at(zarr, i + 1),
                        F.lit(0.0),
                    )
                ),
            ),
        ),
    ).otherwise(zero)
    # tie correction: group the SORTED z values into runs of equal value;
    # fold accumulates (ties_term, run_len) and flushes runs on change
    sorted_z = F.array_sort(zarr)

    def tie_term(t: Column) -> Column:
        return t * (t - 1) * (2 * t + 5)

    tie_fold_body = F.aggregate(
        F.sequence(F.lit(1), t_cnt - 1),
        F.struct(zero.alias("acc"), F.lit(1).cast("long").alias("run")),
        lambda st, i: F.struct(
            F.when(
                F.element_at(sorted_z, i + 1).eqNullSafe(
                    F.element_at(sorted_z, i)
                ),
                st["acc"],
            )
            .otherwise(st["acc"] + tie_term(st["run"]))
            .alias("acc"),
            F.when(
                F.element_at(sorted_z, i + 1).eqNullSafe(
                    F.element_at(sorted_z, i)
                ),
                st["run"] + 1,
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
        ),
        lambda st: st["acc"] + tie_term(st["run"]),
    )
    tie_fold = F.when(t_cnt >= 2, tie_fold_body).otherwise(
        tie_term(F.lit(1).cast("long"))
    )
    tt = t_cnt.cast("long")
    var_s = (tie_term(tt) - F.col("_ties")).cast("double") / F.lit(18.0)
    mk_z = (
        F.when(
            (F.col("mk_s") > 0) & (var_s > 0.0),
            (F.col("mk_s") - 1) / F.sqrt(var_s),
        )
        .when(
            (F.col("mk_s") < 0) & (var_s > 0.0),
            (F.col("mk_s") + 1) / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    hot_flags = F.transform(
        F.col("_series"),
        lambda s: (s["z"].isNotNull() & (s["z"] >= F.lit(float(z_hot))))
        .cast("long"),
    )
    scored = (
        per_cell.withColumn("_z", series_z)
        .withColumn("mk_s", mk_s)
        .withColumn("_ties", tie_fold)
        .withColumn("mk_z", mk_z)
        .withColumn("n_bins", t_cnt.cast("long"))
        .withColumn(
            "n_events",
            F.aggregate(
                F.col("_series"), zero, lambda acc, s: acc + s["n"]
            ),
        )
        .withColumn(
            "hot_bins",
            F.aggregate(hot_flags, zero, lambda acc, h: acc + h),
        )
        .withColumn("last_hot", F.element_at(hot_flags, -1) == 1)
    )
    half = F.col("hot_bins") * 2 >= F.col("n_bins")
    category = (
        F.when(F.col("hot_bins") == 0, "none")
        .when(
            F.col("last_hot") & (F.col("hot_bins") == 1), "new"
        )
        .when(half & (F.col("mk_z") >= 1.96), "intensifying")
        .when(half & (F.col("mk_z") <= -1.96), "diminishing")
        .when(F.col("hot_bins") * 10 >= F.col("n_bins") * 9, "persistent")
        .otherwise("sporadic")
    )
    # counts stays persisted: the n_area count already materialized it and
    # every downstream branch (area, bins, fs, moments) reads the cache;
    # release is the session's (bench/driver clearCache between queries)
    return scored.select(
        "gx", "gy", "n_bins", "n_events", "hot_bins", "last_hot",
        "mk_s", "mk_z", category.alias("category"),
    )
