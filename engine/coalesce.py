"""Change coalescing — rebuild of ChangeUtils.coalesceChanges
(/root/reference/.../changes/ChangeUtils.scala:93-104) as a hash aggregation.

Reference behavior: per feature, fold changes into a map keyed by
`(changeset, changeType).hashCode` — sum counts, union bboxes, max timestamp; the
first-encountered change's tagsBefore/tagChanges/depth survive.

Documented deviations (SURVEY.md §2.9 Q3 + determinism):
- key on the REAL (featureID, changeset, changeType) triple, not an Int hashCode
  (the reference can merge distinct pairs on hash collision);
- the surviving tagsBefore/tagChanges/depth come from the change with the MINIMUM
  (timestamp, count) instead of "first encountered" (which is partition-order
  dependent in the reference) — deterministic under any input order.

Spark shape: a single groupBy -> partial+final hash aggregate (map-side combine for
free); bbox union (Bbox.scala:5-8) is 4 min/max aggregates over the nullable struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_changes(changes: DataFrame) -> DataFrame:
    """changes: CHANGES-shaped rows -> one row per (featureID, changeset, changeType)."""
    pick = F.min_by(
        F.struct("tagsBefore", "tagChanges", "depth"), F.struct("timestamp", "count")
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
