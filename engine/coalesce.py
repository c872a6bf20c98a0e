"""Change coalescing — rebuild of ChangeUtils.coalesceChanges
(/root/reference/.../changes/ChangeUtils.scala:93-104) as a hash aggregation.

Reference behavior: per feature, fold changes into a map keyed by
`(changeset, changeType).hashCode` — sum counts, union bboxes, max timestamp; the
first-encountered change's tagsBefore/tagChanges/depth survive.

Documented deviations (SURVEY.md §2.9 Q3 + determinism):
- key on the REAL (featureID, changeset, changeType) triple, not an Int hashCode
  (the reference can merge distinct pairs on hash collision);
- the surviving tagsBefore/tagChanges/depth come from the change with the MINIMUM
  (timestamp, count, depth) instead of "first encountered" (which is
  partition-order dependent in the reference) — deterministic under any input
  order (tag payloads can still tie across genuinely distinct same-key changes;
  the hash-gated projections carry only the integer columns).

Spark shape: a single groupBy -> partial+final hash aggregate (map-side combine for
free); bbox union (Bbox.scala:5-8) is 4 min/max aggregates over the nullable struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_changes(changes: DataFrame) -> DataFrame:
    """changes: CHANGES-shaped rows -> one row per (featureID, changeset, changeType)."""
    # depth rides in the ORDER key too: the same change can reach a feature at
    # two depths with identical (timestamp, count) — e.g. via a direct
    # membership and via an intermediate way — and the surviving depth must
    # not be partition-order dependent (min depth wins on ties)
    pick = F.min_by(
        F.struct("tagsBefore", "tagChanges", "depth"),
        F.struct("timestamp", "count", "depth"),
    )
    return (
        changes.groupBy("featureID", "changeset", "changeType")
        .agg(
            F.sum("count").cast("int").alias("count"),
            F.when(
                F.count("bbox.min.lon") > 0,
                F.struct(
                    F.struct(
                        F.min("bbox.min.lon").alias("lon"),
                        F.min("bbox.min.lat").alias("lat"),
                    ).alias("min"),
                    F.struct(
                        F.max("bbox.max.lon").alias("lon"),
                        F.max("bbox.max.lat").alias("lat"),
                    ).alias("max"),
                ),
            ).alias("bbox"),
            F.max("timestamp").alias("timestamp"),
            pick.alias("_first"),
        )
        .select(
            "featureID",
            "changeType",
            "count",
            F.col("_first.tagsBefore").alias("tagsBefore"),
            F.col("_first.tagChanges").alias("tagChanges"),
            "bbox",
            "timestamp",
            "changeset",
            F.col("_first.depth").alias("depth"),
        )
    )


# ---------------------------------------------------------------------------
# Dateline-aware bbox union — the reference declares these cases and leaves
# them unimplemented (Bbox.scala:3 "TODO: Handle meridian"; the three ignored
# specs at BboxTest.scala:14-24 are empty placeholders). The engine DEFINES the
# semantics and promotes the specs to real tests (SURVEY.md §5 item 1):
#
#   A bbox whose lon interval crosses the dateline is represented with
#   min.lon > max.lon (the interval runs east from min.lon through +/-180 to
#   max.lon). Union picks the MINIMAL-width covering interval on the lon
#   circle; latitude unions component-wise as before. Ties between equal-width
#   candidates resolve to the one starting at the first box's min.lon.
# ---------------------------------------------------------------------------
def _lon_width(lo, hi):
    """Width of the circle interval running east from lo to hi (Column math).
    An interval whose endpoints differ but whose width is ≡ 0 (mod 360) — e.g.
    the full [-180, 180] box, including bbox_union_wrap's own 'full' output —
    is the WHOLE circle (width 360), not a point; without the special case a
    full-range box fed back into the union collapses to -180."""
    w = F.pmod(hi - lo, F.lit(360.0))
    return F.when((w == 0.0) & (hi != lo), F.lit(360.0)).otherwise(w)


def bbox_union_wrap(b1, b2):
    """Column: dateline-aware union of two bbox structs
    (struct<min:struct<lon,lat>, max:struct<lon,lat>>, wrapped iff
    min.lon > max.lon). Minimal covering interval of the two lon arcs:
    candidate A extends b1's arc east to cover b2; candidate B extends b2's arc
    east to cover b1; the narrower wins. Width >= 360 degenerates to the full
    [-180, 180] range."""
    a1, h1 = b1.getField("min").getField("lon"), b1.getField("max").getField("lon")
    a2, h2 = b2.getField("min").getField("lon"), b2.getField("max").getField("lon")
    w1, w2 = _lon_width(a1, h1), _lon_width(a2, h2)
    wa = F.greatest(w1, _lon_width(a1, a2) + w2)  # start a1, cover through b2
    wb = F.greatest(w2, _lon_width(a2, a1) + w1)  # start a2, cover through b1
    full = (wa >= 360.0) & (wb >= 360.0)
    start = F.when(wa <= wb, a1).otherwise(a2)
    width = F.least(wa, wb)
    # normalize end into [-180, 180] (ending exactly at +180 stays +180)
    end_raw = start + width
    end = F.when(end_raw > 180.0, end_raw - 360.0).otherwise(end_raw)
    lo_lat = F.least(
        b1.getField("min").getField("lat"), b2.getField("min").getField("lat")
    )
    hi_lat = F.greatest(
        b1.getField("max").getField("lat"), b2.getField("max").getField("lat")
    )
    return F.struct(
        F.struct(
            F.when(full, F.lit(-180.0)).otherwise(start).alias("lon"),
            lo_lat.alias("lat"),
        ).alias("min"),
        F.struct(
            F.when(full, F.lit(180.0)).otherwise(end).alias("lon"),
            hi_lat.alias("lat"),
        ).alias("max"),
    )


def wrap_bbox_agg(df: DataFrame, group_cols: list[str], lon_col: str = "lon",
                  lat_col: str = "lat") -> DataFrame:
    """Dateline-aware bbox aggregate over POINTS per group: the minimal covering
    lon arc is 360 minus the largest gap between circularly-consecutive
    longitudes — computed with sort_array + an adjacent-diff HOF, no Python.
    Groups are per-feature (bounded), so the collect_list is bounded too.
    Returns group_cols + bbox struct (wrapped iff min.lon > max.lon)."""
    lons = F.sort_array(F.collect_list(lon_col))
    agg = df.groupBy(*group_cols).agg(
        lons.alias("_lons"),
        F.min(lat_col).alias("_lo_lat"),
        F.max(lat_col).alias("_hi_lat"),
    )
    n = F.size(F.col("_lons"))
    # gaps between consecutive sorted lons + the wrap-around gap last->first
    gaps = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i < n,
            F.element_at(F.col("_lons"), i + 1) - F.element_at(F.col("_lons"), i),
        ).otherwise(
            F.element_at(F.col("_lons"), 1) - F.element_at(F.col("_lons"), n) + 360.0
        ),
    )
    max_gap = F.array_max(gaps)
    # the covering arc starts at the lon AFTER the max gap
    gap_idx = F.array_position(gaps, max_gap)
    start = F.when(gap_idx == n.cast("bigint"), F.element_at(F.col("_lons"), 1)).otherwise(
        F.element_at(F.col("_lons"), gap_idx.cast("int") + 1)
    )
    end = F.when(gap_idx == n.cast("bigint"), F.element_at(F.col("_lons"), n)).otherwise(
        F.element_at(F.col("_lons"), gap_idx.cast("int"))
    )
    single = n == 1
    return agg.select(
        *group_cols,
        F.struct(
            F.struct(
                F.when(single, F.element_at(F.col("_lons"), 1)).otherwise(start).alias("lon"),
                F.col("_lo_lat").alias("lat"),
            ).alias("min"),
            F.struct(
                F.when(single, F.element_at(F.col("_lons"), 1)).otherwise(end).alias("lon"),
                F.col("_hi_lat").alias("lat"),
            ).alias("max"),
        ).alias("bbox"),
    )
