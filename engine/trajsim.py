"""Trajectory similarity join: all trip pairs within a Hausdorff / discrete-
Fréchet distance threshold.

The trajectory-mining counterpart of the near-dup family (engine/textops,
engine/embedops find similar DOCUMENTS/VECTORS; this finds similar PATHS —
commute mining, convoy/route-dedup, map-inference from repeated traces).

Plan (three stages, the slim-pair discipline from the LSH restructure —
BENCH/BASELINE.md "LSH candidate-path restructure"):

1. pack: one shuffle groups fixes into per-trip sorted point arrays +
   bboxes (same entity-key layout as engine/trajectory.py).
2. block: candidate trip PAIRS from a cell join over bboxes expanded by
   threshold/2 — two trips within Hausdorff (or Fréchet, which dominates
   Hausdorff) distance t must have bboxes within t, so expanded-bbox
   overlap is a SOUND blocking relation; each pair is generated exactly
   once via the min-shared-cell ownership rule (engine/nms.overlap_pairs'
   trick — no dedup shuffle). Only (trip_id, bbox) rows ride this join;
   point arrays do NOT.
3. refine: point arrays attach to the surviving id pairs by two equi-joins,
   then a vectorized numpy kernel (mapInPandas) computes the exact metric —
   Hausdorff as max-of-min over the pairwise d2 matrix, discrete Fréchet as
   the classic DP over the same matrix (row-sequential, vectorized across
   columns via running minima).

Cost honesty: the kernel is O(nA x nB) per candidate pair (vectorized);
blocking bounds WHICH pairs pay it, density bounds how many (the same
argument as colocation_pairs). Trips longer than max_points raise — the cap
is a guard against a degenerate mega-trip stalling an executor, not a
silent truncation.

Exactness: distances compare as SQUARED planar doubles (the cross-engine
currency used everywhere); the returned dist is sqrt at the end. The pytest
oracle is an independent pure-Python implementation; a DuckDB twin covers
the Hausdorff metric (max-of-min is plain SQL aggregation over the
brute-force point join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def np_hausdorff2(A: np.ndarray, B: np.ndarray) -> float:
    """Squared symmetric discrete Hausdorff distance between point arrays
    (n,2) and (m,2): max(directed(A,B), directed(B,A)),
    directed(X,Y) = max over x of min over y of |x-y|^2."""
    d2 = (
        (A[:, 0:1] - B[None, :, 0]) ** 2 + (A[:, 1:2] - B[None, :, 1]) ** 2
    )
    return float(max(d2.min(axis=1).max(), d2.min(axis=0).max()))


def np_frechet2_dp(A: np.ndarray, B: np.ndarray) -> float:
    """Squared discrete Fréchet distance (coupling distance): the classic
    Eiter-Mannila DP over the pairwise d2 matrix — the REFERENCE kernel
    (per-row Python scan; O(n*m) scalar iterations). np_frechet2 below is
    the shipped anti-diagonal vectorization; this stays as its parity
    twin (exact-equality asserted over 300 random trip pairs in tests)."""
    d2 = (
        (A[:, 0:1] - B[None, :, 0]) ** 2 + (A[:, 1:2] - B[None, :, 1]) ** 2
    )
    n, m = d2.shape
    prev = np.empty(m, dtype=np.float64)
    # first row: ca(0,j) = max(d(0,j), ca(0,j-1)) = running max
    np.maximum.accumulate(d2[0], out=prev)
    cur = np.empty(m, dtype=np.float64)
    for i in range(1, n):
        # cur[0] = max(prev[0], d2[i,0]); cur[j] = max(d2[i,j],
        # min(prev[j], prev[j-1], cur[j-1])) — cur[j-1] forces the scalar
        # scan; the shipped kernel replaces it with run-propagation
        cur[0] = max(prev[0], d2[i, 0])
        pmin = np.minimum(prev[1:], prev[:-1])
        row = d2[i]
        for j in range(1, m):
            c = pmin[j - 1]
            if cur[j - 1] < c:
                c = cur[j - 1]
            cur[j] = row[j] if row[j] > c else c
        prev, cur = cur, prev
    return float(prev[m - 1])


def np_frechet2(A: np.ndarray, B: np.ndarray) -> float:
    """Squared discrete Fréchet distance — anti-diagonal wavefront DP.

    F[i,j] = max(d2[i,j], min(F[i-1,j], F[i-1,j-1], F[i,j-1])): all three
    dependencies of a cell on anti-diagonal s = i+j live on diagonals s-1
    and s-2, so each diagonal is ONE vectorized numpy step (n+m-1 steps of
    O(diag) slicing ops) instead of n*m scalar Python iterations. Buffers
    are left-padded by one inf slot so the i-1 shift is a plain slice, and
    the diagonal of d2 is read as a strided slice of d2.ravel() (stride
    m-1) — no gathers, no per-step allocation.

    Measured vs the scalar DP twin (np_frechet2_dp) on random-walk trips:
    2.4x at 40 points, 6.2x at 160, 10.2x at 400, 1.6-2.3x at 1000-4000
    (the d2 matrix falls out of cache and the strided diagonal reads pay
    for it — still never slower). A binary-search-over-threshold decision
    variant was prototyped and REJECTED on measurement: 0.1-0.55x the
    scalar DP at every size (log(n*m) reachability passes each re-scan the
    full mask row-sequentially, losing to one DP sweep). Exact-equality
    parity with the DP is asserted in tests."""
    d2 = (
        (A[:, 0:1] - B[None, :, 0]) ** 2 + (A[:, 1:2] - B[None, :, 1]) ** 2
    )
    n, m = d2.shape
    if n == 1 or m == 1:
        # degenerate single-row/column coupling: running max along the line
        return float(np.maximum.accumulate(d2.ravel())[-1])
    flat = d2.ravel()
    inf = np.inf
    # buffers padded by 1 on the left: slot i+1 holds the value for row i,
    # slot 0 stays inf so the i-1 access at i=0 reads the pad, not wrap
    prev2 = np.full(n + 1, inf)
    prev1 = np.full(n + 1, inf)
    cur = np.full(n + 1, inf)
    step = m - 1  # flat index of (i, s-i) is i*m + s - i = s + i*(m-1)
    for s in range(n + m - 1):
        lo = max(0, s - m + 1)
        hi = min(n - 1, s)
        dvals = flat[s + lo * step : s + hi * step + 1 : step]
        if s == 0:
            cur[1:].fill(inf)
            cur[1] = flat[0]
        else:
            seg = cur[lo + 1 : hi + 2]
            # min(F[i-1, s-1-(i-1)], F[i, s-1-i]) = min(prev1 shifted, prev1)
            np.minimum(prev1[lo + 1 : hi + 2], prev1[lo : hi + 1], out=seg)
            # ... and F[i-1, s-2-(i-1)] from two diagonals back
            np.minimum(seg, prev2[lo : hi + 1], out=seg)
            np.maximum(seg, dvals, out=seg)
            # cells outside [lo, hi] are off-matrix on this diagonal
            if lo + 1 > 1:
                cur[1 : lo + 1].fill(inf)
            if hi + 2 <= n:
                cur[hi + 2 :].fill(inf)
        prev2, prev1, cur = prev1, cur, prev2
    return float(prev1[n])


def _pack_trips(
    trips: DataFrame, id_col: str, seq_col: str, x_col: str, y_col: str
) -> DataFrame:
    """(trip_id, pts sorted by seq, bbox)."""
    return (
        trips.select(
            F.col(id_col).cast("long").alias("trip_id"),
            F.col(seq_col).cast("long").alias("_seq"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
        )
        .groupBy("trip_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_seq", "_x", "_y"))
            ).alias("_raw"),
            F.min("_x").alias("x0"), F.min("_y").alias("y0"),
            F.max("_x").alias("x1"), F.max("_y").alias("y1"),
            F.count("*").alias("n_pts"),
        )
        .select(
            "trip_id", "x0", "y0", "x1", "y1", "n_pts",
            F.transform(
                F.col("_raw"), lambda p: F.struct(p["_x"].alias("x"), p["_y"].alias("y"))
            ).alias("pts"),
        )
    )


def similar_trips(
    trips: DataFrame,
    threshold: float,
    metric: str = "hausdorff",
    id_col: str = "trip_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    cell_size: float | None = None,
    max_points: int = 100_000,
) -> DataFrame:
    """All unordered trip pairs with metric distance <= threshold:
    (trip_a < trip_b, dist, n_a, n_b). metric: 'hausdorff' (symmetric
    discrete Hausdorff) or 'frechet' (discrete Fréchet — order-aware:
    a route and its reverse are Hausdorff-identical but Fréchet-far).
    Input is one row per fix; seq_col orders the trip (ties broken by the
    (seq, x, y) struct sort). cell_size defaults to the threshold."""
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    if metric not in ("hausdorff", "frechet"):
        raise ValueError(f"metric must be 'hausdorff' or 'frechet', got {metric!r}")
    s = float(cell_size) if cell_size is not None else max(float(threshold), 1e-12)
    packed = _pack_trips(trips, id_col, seq_col, x_col, y_col)
    # r6: the max_points guard is WOVEN into the packed frame (the
    # dissolve_segments raise_error discipline) — any materialization of an
    # oversized trip fails loudly before quadratic work, and the eager
    # max("n_pts") driver action the old call-time guard cost is gone; the
    # lazy persist fills on first use inside the one final job.
    packed = packed.select(
        "trip_id", "x0", "y0", "x1", "y1", "pts",
        F.when(
            F.col("n_pts") <= F.lit(int(max_points)), F.col("n_pts")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("similar_trips: a trip has "),
                    F.col("n_pts").cast("string"),
                    F.lit(
                        f" points > max_points={int(max_points)}; split "
                        "trips or raise the cap"
                    ),
                )
            )
        )
        .alias("n_pts"),
    ).persist()
    # blocking: expanded-bbox overlap via shared cells, pair owned by its
    # min shared cell (same dedup-free rule as nms.overlap_pairs). Expand
    # each bbox by threshold/2: two bboxes within `threshold` of each other
    # then overlap after expansion.
    h = float(threshold) / 2.0
    e = packed.select(
        "trip_id",
        (F.col("x0") - h).alias("ex0"), (F.col("y0") - h).alias("ey0"),
        (F.col("x1") + h).alias("ex1"), (F.col("y1") + h).alias("ey1"),
    )
    cx0 = F.floor(F.col("ex0") / s).cast("long")
    cx1 = F.floor(F.col("ex1") / s).cast("long")
    cy0 = F.floor(F.col("ey0") / s).cast("long")
    cy1 = F.floor(F.col("ey1") / s).cast("long")
    cells = e.select(
        "trip_id", "ex0", "ey0", "ex1", "ey1",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cx0, cx1),
                    lambda cx: F.transform(
                        F.sequence(cy0, cy1),
                        lambda cy: F.concat_ws(":", cx, cy),
                    ),
                )
            )
        ).alias("cell"),
    )
    a = cells.select(
        "cell", F.col("trip_id").alias("trip_a"),
        F.col("ex0").alias("ax0"), F.col("ey0").alias("ay0"),
        F.col("ex1").alias("ax1"), F.col("ey1").alias("ay1"),
    )
    b = cells.select(
        "cell", F.col("trip_id").alias("trip_b"),
        F.col("ex0").alias("bx0"), F.col("ey0").alias("by0"),
        F.col("ex1").alias("bx1"), F.col("ey1").alias("by1"),
    )
    ix0 = F.greatest("ax0", "bx0")
    iy0 = F.greatest("ay0", "by0")
    own = F.concat_ws(
        ":", F.floor(ix0 / s).cast("long"), F.floor(iy0 / s).cast("long")
    )
    cand = (
        a.join(b, "cell")
        .filter(F.col("trip_a") < F.col("trip_b"))
        .filter(
            (F.col("ax0") <= F.col("bx1")) & (F.col("bx0") <= F.col("ax1"))
            & (F.col("ay0") <= F.col("by1")) & (F.col("by0") <= F.col("ay1"))
        )
        .filter(F.col("cell") == own)
        .select("trip_a", "trip_b")
    )
    # attach point arrays to the slim pairs
    pa = packed.select(
        F.col("trip_id").alias("trip_a"), F.col("pts").alias("_pa"),
        F.col("n_pts").alias("n_a"),
    )
    pb = packed.select(
        F.col("trip_id").alias("trip_b"), F.col("pts").alias("_pb"),
        F.col("n_pts").alias("n_b"),
    )
    pairs = cand.join(pa, "trip_a").join(pb, "trip_b")
    # AQE sizes the attach-join output partitions for shuffle BYTES, not the
    # O(nA*nB) Python metric downstream — measured on the ssim_pairs twin of
    # this shape, it coalesced the kernel stage near-serial. An explicit
    # repartition is exempt from AQE coalescing.
    pairs = pairs.repartition(
        pairs.sparkSession.sparkContext.defaultParallelism
    )
    t2 = float(threshold) * float(threshold)
    fn2 = np_hausdorff2 if metric == "hausdorff" else np_frechet2

    def kernel(batches):
        for pdf in batches:
            outs = []
            for ta, tb, na, nb, A, Bv in zip(
                pdf["trip_a"], pdf["trip_b"], pdf["n_a"], pdf["n_b"],
                pdf["_pa"], pdf["_pb"],
            ):
                Am = np.array([(p["x"], p["y"]) for p in A], dtype=np.float64)
                Bm = np.array([(p["x"], p["y"]) for p in Bv], dtype=np.float64)
                d2 = fn2(Am, Bm)
                if d2 <= t2:
                    outs.append((int(ta), int(tb), float(np.sqrt(d2)), int(na), int(nb)))
            yield pd.DataFrame(
                outs, columns=["trip_a", "trip_b", "dist", "n_a", "n_b"]
            )

    out = pairs.mapInPandas(
        kernel,
        "trip_a long, trip_b long, dist double, n_a long, n_b long",
    )
    return out


def hausdorff_pairs_sql(trips_sql: str, threshold: float) -> str:
    """DuckDB twin of similar_trips(metric='hausdorff'): brute-force all
    pairs, directed max-of-min both ways as plain aggregation. trips_sql ->
    (trip_id, seq, x, y). Emits the same (trip_a, trip_b, dist, n_a, n_b)."""
    t2 = float(threshold) * float(threshold)
    return f"""
        WITH pts AS (
          SELECT CAST(trip_id AS BIGINT) AS trip_id,
                 CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
          FROM ({trips_sql})
        ),
        sizes AS (
          SELECT trip_id, COUNT(*) AS n FROM pts GROUP BY trip_id
        ),
        ids AS (
          SELECT s1.trip_id AS ta, s2.trip_id AS tb, s1.n AS n_a, s2.n AS n_b
          FROM sizes s1 JOIN sizes s2 ON s1.trip_id < s2.trip_id
        ),
        mins AS (
          SELECT i.ta, i.tb, p1.x, p1.y,
                 MIN((p1.x - p2.x) * (p1.x - p2.x)
                     + (p1.y - p2.y) * (p1.y - p2.y)) AS md2
          FROM ids i
          JOIN pts p1 ON p1.trip_id = i.ta
          JOIN pts p2 ON p2.trip_id = i.tb
          GROUP BY i.ta, i.tb, p1.x, p1.y
        ),
        minsr AS (
          SELECT i.ta, i.tb, p2.x, p2.y,
                 MIN((p1.x - p2.x) * (p1.x - p2.x)
                     + (p1.y - p2.y) * (p1.y - p2.y)) AS md2
          FROM ids i
          JOIN pts p1 ON p1.trip_id = i.ta
          JOIN pts p2 ON p2.trip_id = i.tb
          GROUP BY i.ta, i.tb, p2.x, p2.y
        ),
        h AS (
          SELECT ta, tb, MAX(md2) AS h2 FROM (
            SELECT ta, tb, md2 FROM mins
            UNION ALL
            SELECT ta, tb, md2 FROM minsr
          ) GROUP BY ta, tb
        )
        SELECT h.ta AS trip_a, h.tb AS trip_b, SQRT(h.h2) AS dist,
               i.n_a, i.n_b
        FROM h JOIN ids i ON i.ta = h.ta AND i.tb = h.tb
        WHERE h.h2 <= {t2}
    """
