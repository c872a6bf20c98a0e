"""Map matching: snap GPS fixes to the nearest road segment, compress routes.

The trajectory x road-network composition: geotagged fix streams
(engine/trajectory.py) meet the polyline machinery (engine/lines.py). Two
operators, all Column algebra (the only Python is in tests):

- snap_to_segments: for every fix, the nearest polyline segment within
  `radius` (planar), plus the perpendicular foot point and distance. The
  candidate set comes from the same broadcast cell cover line_radius_join
  uses (the fix table is the 100 TB side and is scanned once); the argmin
  is a fix-keyed window (batch default — WindowGroupLimit collapses it
  map-side) or an in-row array fold (the streaming plan; see the
  snap_to_segments docstring for the measured A/B). Deterministic
  tie-break: (dist2, line_id, seg_idx) — equidistant segments resolve the
  same way in every engine.

- match_routes: trips (engine.trajectory.trip_segments semantics) with each
  fix snapped, compressed to the ordered sequence of DISTINCT consecutive
  line ids (a route), plus match quality (share of fixes that snapped).
  Unsnapped fixes (no segment within radius) keep the trip alive but
  contribute no route step.

snap_to_segments is nearest-feature matching; viterbi_match is the HMM
layer on top of the SAME candidate machinery (the emission set per fix IS
the per-fix candidate list before the argmin), adding a transition model so
a noisy fix near a parallel road stays on the road the trajectory is
actually following (Newson & Krummen 2009, with straight-line snap-point
distance as the route-distance proxy — no network routing pass).

Scale: candidates = fixes x (covered cells' segments) via one broadcast
join; the argmin window shuffles candidate rows by fix id once. Road
networks (10^7 segments) broadcast at ~100 MB; beyond that, the cover join
falls back to a shuffled equi-join — same plan shape as
engine.joins.pip_join's fallback.

The reference has no matching operator (SURVEY.md section 2 nearest analog:
the propagation equi-join J1); this extends the brief's trajectory axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lines import _cell, line_cover, line_segments


def _proj(px, py, ax, ay, bx, by):
    """Clamped projection of p onto segment ab: (t, qx, qy, dist2) Columns.
    Degenerate (a==b) segments project to a."""
    vx, vy = bx - ax, by - ay
    den = vx * vx + vy * vy
    t_raw = F.when(den > 0.0, ((px - ax) * vx + (py - ay) * vy) / den).otherwise(
        F.lit(0.0)
    )
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    qx = ax + t * vx
    qy = ay + t * vy
    d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
    return t, qx, qy, d2


def snap_to_segments(
    fixes: DataFrame,
    lines: DataFrame,
    radius: float,
    fix_id: str = "fix_id",
    x_col: str = "x",
    y_col: str = "y",
    line_id: str = "line_id",
    pts_col: str = "pts",
    cell_size: float | None = None,
    broadcast_cover: bool = True,
    plan: str = "auto",
) -> DataFrame:
    """(fix_id, x, y) x (line_id, pts) -> one row per fix that has at least
    one segment within `radius`: (fix_id, line_id, seg_idx, t, snap_x,
    snap_y, dist2). dist2 is the squared planar distance (exact argmin
    currency — taking sqrt only weakens cross-engine reproducibility).

    plan='window' (batch default): one candidate row per (fix, segment) +
    a fix-keyed row_number window. Spark's WindowGroupLimit pushes the rn=1
    filter map-side (partial top-1 BEFORE the exchange), so the argmin
    shuffle moves <= 1 row per fix per input partition — measured 5x FASTER
    than the array plan at 16M fixes (2.7 vs 14.1 s, BENCH/BASELINE.md: the
    whole-stage-codegen'd projection beats the interpreted HOF lambdas,
    and the "avoided" shuffle was already tiny after the partial limit).
    plan='array': the cover packed ONE ROW PER CELL with a segment array;
    a fix joins exactly one broadcast row and the argmin is an in-row
    filter + array_sort + head. Slower per core, but the only STREAMING-
    legal shape (stateless stream-static join + projection — windows are
    illegal on streams), and the fix table genuinely never shuffles.
    plan='auto': window for batch inputs, array when `fixes.isStreaming`.
    Identical output either way, including the (dist2, line_id, seg_idx)
    tie-break: array_sort on the struct sorts by fields left to right."""
    if radius <= 0:
        raise ValueError("radius must be > 0")
    if plan == "auto":
        plan = "array" if fixes.isStreaming else "window"
    if plan not in ("array", "window"):
        raise ValueError(f"plan must be 'array', 'window' or 'auto', got {plan!r}")
    s = float(cell_size) if cell_size is not None else max(1.0, float(radius))
    segs = line_segments(lines, id_col=line_id, pts_col=pts_col)
    cover = line_cover(segs, radius, cell_size=s, keep_segments=True)
    p = fixes.select(
        F.col(fix_id).alias("fix_id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    ).withColumn("cell", _cell(F.col("_px"), F.col("_py"), s))
    r2 = float(radius) * float(radius)

    if plan == "array":
        packed = cover.groupBy("cell").agg(
            F.collect_list(
                F.struct("line_id", "seg_idx", "ax", "ay", "bx", "by")
            ).alias("_segs")
        )
        if broadcast_cover:
            packed = F.broadcast(packed)

        def cand(seg):
            t, qx, qy, d2 = _proj(
                F.col("_px"), F.col("_py"),
                seg["ax"], seg["ay"], seg["bx"], seg["by"],
            )
            return F.struct(
                d2.alias("dist2"),
                seg["line_id"].alias("line_id"),
                seg["seg_idx"].alias("seg_idx"),
                t.alias("t"),
                qx.alias("snap_x"),
                qy.alias("snap_y"),
            )

        # in-row argmin: keep candidates within radius, sort by the struct
        # (field order IS the tie-break), take the head — order-invariant in
        # the collect_list ordering, so the result is deterministic
        best = F.get(
            F.array_sort(
                F.filter(
                    F.transform(F.col("_segs"), cand),
                    lambda c: c["dist2"] <= F.lit(r2),
                )
            ),
            0,
        )
        return (
            p.join(packed, "cell")
            .select("fix_id", best.alias("_b"))
            .filter(F.col("_b").isNotNull())
            .select(
                "fix_id",
                F.col("_b.line_id").alias("line_id"),
                F.col("_b.seg_idx").alias("seg_idx"),
                F.col("_b.t").alias("t"),
                F.col("_b.snap_x").alias("snap_x"),
                F.col("_b.snap_y").alias("snap_y"),
                F.col("_b.dist2").alias("dist2"),
            )
        )

    if broadcast_cover:
        cover = F.broadcast(cover)
    t, qx, qy, d2 = _proj(
        F.col("_px"), F.col("_py"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
    )
    cand = (
        p.join(cover, "cell")
        .select(
            "fix_id", "line_id", "seg_idx",
            t.alias("t"), qx.alias("snap_x"), qy.alias("snap_y"),
            d2.alias("dist2"),
        )
        .filter(F.col("dist2") <= r2)
    )
    w = Window.partitionBy("fix_id").orderBy("dist2", "line_id", "seg_idx")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def match_routes(
    fixes: DataFrame,
    lines: DataFrame,
    radius: float,
    id_col: str = "entity_id",
    ts_col: str = "ts_us",
    x_col: str = "x",
    y_col: str = "y",
    gap_minutes: float = 30.0,
    line_id: str = "line_id",
    pts_col: str = "pts",
) -> DataFrame:
    """Per (entity, trip): the matched route. Fixes split into trips with
    the exact trip_segments gap rule (same lag window), each fix snapped via
    snap_to_segments; the route is the time-ordered line-id sequence with
    consecutive duplicates collapsed (unsnapped fixes emit no step). Output:
    (entity_id, trip_idx, route array<long-or-string>, n_points, n_matched,
    steps). Deterministic: in-trip order is (ts, x, y)."""
    gap_us = int(gap_minutes * 60_000_000)
    pts = fixes.select(
        F.col(id_col).alias("_id"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    ow = Window.partitionBy("_id").orderBy("_ts", "_x", "_y")
    run = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # deterministic fix key (mid() would not survive recomputation of the
    # two plan branches that join back together below)
    pts = pts.withColumn(
        "_fid", F.struct(F.col("_id"), F.row_number().over(ow))
    ).withColumn(
        "trip_idx",
        F.sum(
            (
                F.lag("_ts").over(ow).isNull()
                | ((F.col("_ts") - F.lag("_ts").over(ow)) > gap_us)
            ).cast("long")
        ).over(run),
    )
    snapped = snap_to_segments(
        pts,
        lines,
        radius,
        fix_id="_fid",
        x_col="_x",
        y_col="_y",
        line_id=line_id,
        pts_col=pts_col,
    ).select(F.col("fix_id").alias("_fid"), F.col("line_id").alias("_line"))
    j = pts.join(snapped, "_fid", "left")
    # collapse consecutive duplicate line ids within the trip (nulls emit
    # nothing and do NOT break a run: a brief radius dropout on the same
    # road is not a new route step)
    tw = Window.partitionBy("_id", "trip_idx").orderBy("_ts", "_x", "_y")
    lastline = F.last("_line", ignorenulls=True).over(
        tw.rowsBetween(Window.unboundedPreceding, -1)
    )
    step = (
        F.col("_line").isNotNull()
        & (lastline.isNull() | (F.col("_line") != lastline))
    ).cast("long")
    stepped = j.withColumn("_step", step)
    return (
        stepped.groupBy(F.col("_id").alias(id_col), "trip_idx")
        .agg(
            F.array_compact(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_step") == 1,
                                F.struct("_ts", "_x", "_y", "_line"),
                            )
                        )
                    ),
                    lambda st: st["_line"],
                )
            ).alias("route"),
            F.count("*").alias("n_points"),
            F.count("_line").alias("n_matched"),
            F.sum("_step").alias("steps"),
        )
    )


def viterbi_match(
    fixes: DataFrame,
    lines: DataFrame,
    radius: float,
    id_col: str = "entity_id",
    ts_col: str = "ts_us",
    x_col: str = "x",
    y_col: str = "y",
    gap_minutes: float = 30.0,
    k: int = 8,
    sigma: float | None = None,
    beta: float | None = None,
    line_id: str = "line_id",
    pts_col: str = "pts",
    cell_size: float | None = None,
    broadcast_cover: bool = True,
) -> DataFrame:
    """HMM (Viterbi) map matching: per (entity, trip), the globally most
    likely segment sequence instead of per-fix independent argmins.

    Model (Newson & Krummen 2009, simplified to need no routing pass):
    - states per fix = the top-`k` segments within `radius`, ranked by
      (dist2, line_id, seg_idx) — the same broadcast cell-cover candidate
      join snap_to_segments uses, so the fix table is scanned once and
      never shuffled for candidate generation;
    - emission log-score  = -dist2 / (2*sigma^2)            (Gaussian);
    - transition log-score = -|d(snap_i, snap_j) - d(fix_i, fix_j)| / beta
      (exponential on the route-vs-straight discrepancy; straight-line
      snap-point distance stands in for network route distance, the
      standard simplification when no routing graph pass is affordable).
    Defaults: sigma = radius / 2, beta = radius.

    Trips split at >gap_minutes exactly like match_routes. Within a trip,
    fixes with NO candidate within radius break the chain: each maximal run
    of matched fixes gets an independent Viterbi pass and unmatched fixes
    emit no row (same semantics as snap's radius dropout).

    Plan shape / scale: ONE broadcast cover join + a per-fix top-k window
    (WindowGroupLimit collapses it map-side, <=k rows per fix cross the
    exchange) + ONE groupBy-(entity, trip) applyInPandas for the DP. The
    DP state is trip-sized (n_fixes x k), never corpus-sized; per-trip work
    is O(n * k^2) fully numpy-vectorized across candidate pairs. Grouping
    by trip is the minimum shuffle any sequential decoder needs.

    Determinism: candidates enter the DP sorted by (dist2, line_id,
    seg_idx); np.argmax takes the FIRST maximizer, so score ties resolve
    toward the nearer/lower-id candidate at every step, and the final state
    ties the same way. All float math is float64 in a fixed evaluation
    order — the pytest oracle replays the identical recurrence in pure
    Python and matches bit-for-bit.

    Output: one row per matched fix — (id_col, trip_idx, ts_us, line_id,
    seg_idx, t, snap_x, snap_y, dist2). The reference has no matching
    operator (nearest analog: the propagation equi-join, SURVEY.md §2 J1);
    this extends the brief's trajectory axis beyond nearest-snap.
    """
    import numpy as np
    import pandas as pd

    if radius <= 0:
        raise ValueError("radius must be > 0")
    if k < 1:
        raise ValueError("k must be >= 1")
    sig = float(sigma) if sigma is not None else float(radius) / 2.0
    bet = float(beta) if beta is not None else float(radius)
    if sig <= 0 or bet <= 0:
        raise ValueError("sigma and beta must be > 0")
    inv2s2 = 1.0 / (2.0 * sig * sig)
    inv_b = 1.0 / bet
    gap_us = int(gap_minutes * 60_000_000)
    s = float(cell_size) if cell_size is not None else max(1.0, float(radius))
    r2 = float(radius) * float(radius)

    id_type = fixes.schema[id_col].dataType

    pts = fixes.select(
        F.col(id_col).alias("_id"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    )
    ow = Window.partitionBy("_id").orderBy("_ts", "_px", "_py")
    run = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts = pts.withColumn("_seq", F.row_number().over(ow)).withColumn(
        "trip_idx",
        F.sum(
            (
                F.lag("_ts").over(ow).isNull()
                | ((F.col("_ts") - F.lag("_ts").over(ow)) > gap_us)
            ).cast("long")
        ).over(run),
    ).withColumn("cell", _cell(F.col("_px"), F.col("_py"), s))

    segs = line_segments(lines, id_col=line_id, pts_col=pts_col)
    cover = line_cover(segs, radius, cell_size=s, keep_segments=True)
    if broadcast_cover:
        cover = F.broadcast(cover)
    t, qx, qy, d2 = _proj(
        F.col("_px"), F.col("_py"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
    )
    cand = (
        pts.join(cover, "cell")
        .select(
            "_id", "_seq", "line_id", "seg_idx",
            t.alias("_t"), qx.alias("_qx"), qy.alias("_qy"),
            d2.alias("_d2"),
        )
        .filter(F.col("_d2") <= r2)
    )
    cw = Window.partitionBy("_id", "_seq").orderBy("_d2", "line_id", "seg_idx")
    topk = (
        cand.withColumn("_rn", F.row_number().over(cw))
        .filter(F.col("_rn") <= k)
        .groupBy("_id", "_seq")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_d2").alias("d2"),
                        F.col("line_id").alias("lid"),
                        F.col("seg_idx").alias("sid"),
                        F.col("_t").alias("t"),
                        F.col("_qx").alias("qx"),
                        F.col("_qy").alias("qy"),
                    )
                )
            ).alias("_cands")
        )
    )
    rows = pts.join(topk, ["_id", "_seq"], "left")

    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("trip_idx", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("line_id", segs.schema["line_id"].dataType),
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("t", T.DoubleType()),
            T.StructField("snap_x", T.DoubleType()),
            T.StructField("snap_y", T.DoubleType()),
            T.StructField("dist2", T.DoubleType()),
        ]
    )

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ts", "_px", "_py"], kind="mergesort")
        ent = pdf["_id"].iloc[0]
        trip = int(pdf["trip_idx"].iloc[0])
        cands = pdf["_cands"].tolist()
        px = pdf["_px"].to_numpy()
        py = pdf["_py"].to_numpy()
        ts = pdf["_ts"].to_numpy()
        n = len(pdf)
        out = []

        i = 0
        while i < n:
            if cands[i] is None or len(cands[i]) == 0:
                i += 1
                continue
            j = i
            while j < n and cands[j] is not None and len(cands[j]) > 0:
                j += 1
            # Viterbi over run [i, j)
            C = [
                (
                    np.array([c["qx"] for c in cands[m]], dtype=np.float64),
                    np.array([c["qy"] for c in cands[m]], dtype=np.float64),
                    np.array([c["d2"] for c in cands[m]], dtype=np.float64),
                )
                for m in range(i, j)
            ]
            score = -C[0][2] * inv2s2
            bps = []
            for m in range(1, j - i):
                dxf = px[i + m] - px[i + m - 1]
                dyf = py[i + m] - py[i + m - 1]
                dfix = np.sqrt(dxf * dxf + dyf * dyf)
                dqx = C[m][0][None, :] - C[m - 1][0][:, None]
                dqy = C[m][1][None, :] - C[m - 1][1][:, None]
                dsnap = np.sqrt(dqx * dqx + dqy * dqy)
                tot = score[:, None] - np.abs(dsnap - dfix) * inv_b
                bp = np.argmax(tot, axis=0)
                bps.append(bp)
                score = tot[bp, np.arange(tot.shape[1])] - C[m][2] * inv2s2
            state = int(np.argmax(score))
            path = [state]
            for bp in reversed(bps):
                state = int(bp[state])
                path.append(state)
            path.reverse()
            for m, st in enumerate(path):
                c = cands[i + m][st]
                out.append(
                    (
                        ent, trip, int(ts[i + m]),
                        c["lid"], int(c["sid"]), float(c["t"]),
                        float(c["qx"]), float(c["qy"]), float(c["d2"]),
                    )
                )
            i = j

        return pd.DataFrame(
            out,
            columns=[
                id_col, "trip_idx", "ts_us", "line_id", "seg_idx",
                "t", "snap_x", "snap_y", "dist2",
            ],
        )

    return rows.groupBy("_id", "trip_idx").applyInPandas(_decode, out_schema)
