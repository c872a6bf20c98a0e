"""Choropleth / raster classification: natural breaks (Fisher-Jenks),
quantile and equal-interval break derivation over an integer value column,
plus the distributed classify step.

Shape: break PICKING is a bounded-histogram problem — the distinct-value
histogram is one map-side-combined hash agg, collected under an explicit
cap (the GEMM-guard discipline: a 100 TB raster has bounded distinct
int-values after fixed-point quantization, and if it doesn't, the operator
refuses loudly rather than OOMing the driver). The Fisher-Jenks DP then
runs driver-side on exact int64 prefix moments (N, sum v, sum v^2) with
the class cost S2 - S1^2/N evaluated in float64 — the classic O(k m^2)
dynamic program, vectorized in numpy, deterministic for a given histogram
(ties resolved to the SMALLEST split index by argmax-on-reversed). The
classify step is pure Column algebra against the <= k broadcast break
literals, so the big side never shuffles and a DuckDB CASE twin replays it
bit for bit.

Reference provenance: the reference (osm-history-analysis) has no
classification surface; this serves the map-styling step every choropleth/
raster renderer needs (SURVEY.md §2 additions).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame, col: str, max_distinct: int = 65536
) -> list[tuple[int, int]]:
    """Driver-collected (value, count) histogram of an integer column,
    value-ascending, NULLs dropped. Guarded: counts distinct first and
    raises if the histogram would exceed max_distinct rows (quantize /
    floor-scale the column first — the house fixed-point rule)."""
    vals = df.select(F.col(col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    n_distinct = vals.distinct().count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"value_histogram: {n_distinct} distinct values exceed the "
            f"max_distinct={max_distinct} driver guard — quantize the "
            f"column (e.g. floor-scale) before classifying"
        )
    rows = (
        vals.groupBy("v").agg(F.count("*").alias("n")).orderBy("v").collect()
    )
    return [(r["v"], r["n"]) for r in rows]


def jenks_breaks(
    df: DataFrame,
    col: str,
    k: int,
    max_distinct: int = 4096,
) -> list[int]:
    """Fisher-Jenks natural breaks: the EXACT-optimal partition of the
    value histogram into k classes minimizing total within-class sum of
    squared deviations (the real Fisher DP, not the greedy Jenks
    iteration). Returns the k-1 UPPER-bound values of classes 1..k-1,
    ascending — class(x) = #{b in breaks : x > b}. Degenerate inputs
    (fewer distinct values than k) return the distinct values themselves
    as breaks. O(k m^2) numpy DP; prefix moments (counts, sums, sums of
    squares) accumulated in EXACT int64 — guarded so sum(n*v*v) < 2^62,
    the |v| domain limit — with float64 entering only in the final
    cost ratio s2 - s1^2/nn (IEEE-deterministic; smallest split index on
    cost ties). max_distinct defaults TIGHTER
    than value_histogram's (4096, ~67M vectorized flops at k=4) because
    the DP is quadratic in the histogram — requantize coarser rather than
    raising it past ~16k."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hist = value_histogram(df, col, max_distinct)
    if not hist:
        return []
    vi = [int(x) for x, _ in hist]
    ni = [int(c) for _, c in hist]
    m = len(vi)
    if m <= k:
        return vi[: max(m - 1, 0)]
    # exact-int64 domain guard: the largest prefix moment is sum(n*v^2);
    # computed in python ints so the check itself cannot overflow
    tot2 = sum(c * x * x for x, c in zip(vi, ni))
    if tot2 >= 2**62:
        raise ValueError(
            f"jenks_breaks int64 moment guard: sum(n*v^2) = {tot2:.3e} >= "
            f"2^62 — rescale the fixed-point values (divide by a power of "
            f"10) before classifying"
        )
    v = np.array(vi, dtype=np.int64)
    n = np.array(ni, dtype=np.int64)
    # prefix moments (index 0 = empty), EXACT in int64 under the guard
    cn = np.concatenate([[0], np.cumsum(n)])
    c1 = np.concatenate([[0], np.cumsum(n * v)])
    c2 = np.concatenate([[0], np.cumsum(n * v * v)])

    def seg_cost(i: np.ndarray, j: int) -> np.ndarray:
        """cost of one class covering histogram slots i..j-1 (vectorized
        over i): S2 - S1^2 / N — int64 differences are exact; float64
        enters only here, in the ratio."""
        nn = (cn[j] - cn[i]).astype(np.float64)
        s1 = (c1[j] - c1[i]).astype(np.float64)
        s2 = (c2[j] - c2[i]).astype(np.float64)
        return s2 - s1 * s1 / nn

    # dp[c, j] = min cost of splitting slots 0..j-1 into c classes
    inf = np.inf
    dp = np.full((k + 1, m + 1), inf)
    arg = np.zeros((k + 1, m + 1), dtype=np.int64)
    idx = np.arange(m + 1)
    _c1f = c1[1:].astype(np.float64)
    dp[1, 1:] = c2[1:].astype(np.float64) - _c1f * _c1f / cn[1:].astype(np.float64)
    for c in range(2, k + 1):
        for j in range(c, m + 1):
            i = idx[c - 1 : j]  # last class starts at slot i
            costs = dp[c - 1, i] + seg_cost(i, j)
            best = int(np.argmin(costs))  # first minimum = smallest split
            dp[c, j] = costs[best]
            arg[c, j] = i[best]
    # walk back: upper bound of class c is v[start_of_next - 1]
    breaks = []
    j = m
    for c in range(k, 1, -1):
        i = int(arg[c, j])
        breaks.append(int(v[i - 1]))
        j = i
    return sorted(breaks)


def quantile_breaks(
    df: DataFrame, col: str, k: int, max_distinct: int = 65536
) -> list[int]:
    """Quantile classification: k-1 upper bounds at the exact type-1
    (ceil) quantiles of the value multiset — break c = the smallest value
    whose cumulative count reaches ceil(c * N / k). Duplicate bounds are
    collapsed (heavy ties can merge classes — standard quantile-breaks
    behavior)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hist = value_histogram(df, col, max_distinct)
    if not hist:
        return []
    total = sum(n for _, n in hist)
    bounds = []
    cum = 0
    targets = [(c * total + k - 1) // k for c in range(1, k)]
    ti = 0
    for v, n in hist:
        cum += n
        while ti < len(targets) and cum >= targets[ti]:
            bounds.append(v)
            ti += 1
    out = []
    for b in bounds:
        if not out or b != out[-1]:
            out.append(b)
    return out


def equal_interval_breaks(
    df: DataFrame, col: str, k: int
) -> list[int]:
    """Equal-interval classification: k-1 integer upper bounds splitting
    [min, max] into k equal spans (bound c = min + floor(c*(max-min)/k));
    one min/max agg, no histogram needed."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    r = df.agg(
        F.min(F.col(col).cast("long")).alias("lo"),
        F.max(F.col(col).cast("long")).alias("hi"),
    ).collect()[0]
    if r["lo"] is None:
        return []
    lo, hi = int(r["lo"]), int(r["hi"])
    return sorted({lo + (c * (hi - lo)) // k for c in range(1, k)})


def classify_expr(col: Column, breaks: list[int]) -> Column:
    """class(x) = #{b in breaks : x > b}, 0-indexed — pure Column algebra
    over the broadcast break literals (a when-chain would work too; the
    sum form keeps the expression linear and twin-trivial)."""
    out = F.lit(0)
    for b in breaks:
        out = out + (col > F.lit(b)).cast("long")
    return out.cast("long")


def classify(
    df: DataFrame, col: str, breaks: list[int], out_col: str = "class"
) -> DataFrame:
    """Attach the class index column; NULL values stay NULL (comparisons
    propagate)."""
    return df.withColumn(
        out_col, classify_expr(F.col(col).cast("long"), breaks)
    )


def classify_sql(col: str, breaks: list[int]) -> str:
    """DuckDB twin of classify_expr — the identical count-of-exceeded-
    bounds sum."""
    if not breaks:
        return "CAST(0 AS BIGINT)"
    terms = " + ".join(
        f"(CASE WHEN {col} > {b} THEN 1 ELSE 0 END)" for b in breaks
    )
    return f"CAST({terms} AS BIGINT)"
