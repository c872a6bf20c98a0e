"""Change propagation up the parent tree + the graft's cell-hierarchy rollup.

Faithful rebuild of the reference's iterative propagation
(/root/reference/.../historyanalysis/SparkJobs.scala:43-76 and
changes/ChangeUtils.generateSecondOrderChanges, ChangeUtils.scala:57-91):

- Round i joins the (progressively narrowed) ref tree against the previous round's
  propagation queue on id == parentID (J1).
- Each propagated change is assigned to the tree version in effect at its
  timestamp — the version with the largest timestamp <= change.timestamp, clamped
  to the FIRST version for changes older than the tree (the reference's takeWhile
  walk assigns pre-history changes to version 1; preserved here). Implemented as an
  as-of union+window, not an ordered group walk — so the reference's unsorted-group
  hazard (SURVEY.md §2.9 Q2) cannot occur.
- The change is saved at depth i-1 iff the version has way/relation geometry and
  the round is not propagate-only (round 1 re-propagates self-seeded node/member
  changes that were already saved at depth 0 — SparkJobs.scala:55-57).
- It is forwarded once per parent in the version's parent set.
- Round 2 narrows the tree to ways+relations, rounds 3+ to relations only
  (SparkJobs.scala:34-35,58-62).

Improvements over the reference (SURVEY.md §3/§4): per-round persist + early exit
when the queue drains (the reference builds one 10-deep lazy DAG and cannot exit
early), and localCheckpoint-style lineage truncation via persist.

The graft analog `rollup_cells` propagates per-cell aggregates up the grid
hierarchy (res fine -> coarse) with a single shuffle per level — each level
aggregates the previous level's output (4:1 fan-in), not the raw points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import cells, coalesce, diff, temporal

DEPTH = 10

_CHANGE_COLS = [
    "changeType", "count", "tagsBefore", "tagChanges", "bbox", "timestamp",
    "changeset",
]


def assign_to_versions(tree: DataFrame, queue: DataFrame) -> DataFrame:
    """As-of assignment of queued changes to tree versions (ChangeUtils.scala:57-91
    rebuilt): each queue row (parentID == tree id) gets the tree version in effect
    at its timestamp, falling back to the tree's first version for changes that
    predate it. Returns queue columns + (id, hasGeometry, parents)."""
    t = tree.select(
        F.col("id").alias("_tid"),
        F.col("timestamp").alias("_vts"),
        "hasGeometry",
        "parents",
    )
    q = queue.withColumnRenamed("parentID", "_tid")
    # union + running last(version) per id — one shuffle on _tid
    tv = t.select(
        "_tid", F.col("_vts").alias("_ts"), F.lit(0).alias("_side"),
        F.struct("_vts", "hasGeometry", "parents").alias("_v"),
        *[F.lit(None).cast(q.schema[c].dataType).alias(c) for c in q.columns if c != "_tid"],
    )
    qv = q.select(
        "_tid", F.col("timestamp").alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(tv.schema["_v"].dataType).alias("_v"),
        *[c for c in q.columns if c != "_tid"],
    )
    w = (
        Window.partitionBy("_tid")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the pre-history fallback must deterministically be the EARLIEST tree
    # version: order the full-partition window by (ts, side) — an unordered
    # partition would hand first() an arbitrary version (row-order dependent)
    wfirst = (
        Window.partitionBy("_tid")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    assigned = (
        tv.unionByName(qv)
        .withColumn("_asof", F.last("_v", ignorenulls=True).over(w))
        .withColumn("_first", F.first("_v", ignorenulls=True).over(wfirst))
        .filter(F.col("_side") == 1)
        .withColumn("_ver", F.coalesce(F.col("_asof"), F.col("_first")))
        .filter(F.col("_ver").isNotNull())  # queue rows with no matching tree id
    )
    return assigned.select(
        F.col("_tid").alias("id"),
        *[c for c in q.columns if c != "_tid"],
        F.col("_ver.hasGeometry").alias("hasGeometry"),
        F.col("_ver.parents").alias("parents"),
    )


def propagate_changes(
    objs: DataFrame,
    depth: int = DEPTH,
    do_coalesce: bool = True,
    drop_rootless: bool = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Full pipeline: first-order changes + ref tree + bounded upward propagation +
    coalesce — the rebuild of SparkJobs.generateChanges (SparkJobs.scala:10-82).

    Returns the coalesced CHANGES table (featureID, changeType, count, tagsBefore,
    tagChanges, bbox, timestamp, changeset, depth).
    """
    first = diff.first_order_changes(objs)
    save_frames = [diff.changes_to_save(first)]
    queue = diff.changes_to_propagate(first).persist(storage_level)

    tree = temporal.ref_tree(
        temporal.ref_changes(objs),
        temporal.geometry_statuses(objs),
        drop_rootless=drop_rootless,
    ).persist(storage_level)
    rel_tree = tree.filter(cells.is_relation(F.col("id"))).persist(storage_level)

    for i in range(1, depth):
        if queue.isEmpty():
            break
        side = (
            tree
            if i == 1
            else (
                tree.filter(
                    cells.is_way(F.col("id")) | cells.is_relation(F.col("id"))
                )
                if i == 2
                else rel_tree
            )
        )
        assigned = assign_to_versions(side, queue)
        propagate_only = i == 1
        saved = (
            assigned.filter(F.col("hasGeometry"))
            .select(
                F.col("id").alias("featureID"),
                *_CHANGE_COLS,
                F.lit(i - 1).alias("depth"),
            )
            if not propagate_only
            else None
        )
        if saved is not None:
            save_frames.append(saved)
        new_queue = (
            assigned.select(
                F.explode("parents").alias("parentID"),
                F.col("id").alias("featureID"),
                *_CHANGE_COLS,
                F.lit(i - 1).alias("depth"),
            )
        ).persist(storage_level)
        queue.unpersist()
        queue = new_queue

    from functools import reduce

    all_changes = reduce(DataFrame.unionByName, save_frames)
    out = coalesce.coalesce_changes(all_changes) if do_coalesce else all_changes
    # materialize + truncate lineage, then release every intermediate cache —
    # callers may run in long-lived sessions (the driver's harness) where leaked
    # persists accumulate across invocations
    out = out.localCheckpoint(eager=True)
    queue.unpersist()
    tree.unpersist()
    rel_tree.unpersist()
    return out


def rollup_cells(
    points: DataFrame,
    res_fine: int = 11,
    res_coarse: int = 7,
    cell_col: str = "cell",
    count_col: str = "n",
) -> DataFrame:
    """Graft analog of the propagation loop: per-cell counts rolled up the grid
    hierarchy res_fine -> res_coarse. One aggregation per level, each consuming the
    previous level's (4x smaller) output — total shuffle volume is a geometric
    series dominated by the finest level, exactly the scaling shape the 10^12-row
    table needs. Returns the union of all levels with a `res` column."""
    if res_coarse > res_fine:
        raise ValueError("res_coarse must be <= res_fine")
    level = points.groupBy(cell_col).agg(F.count("*").alias(count_col)).withColumn(
        "res", F.lit(res_fine)
    )
    out = [level]
    for r in range(res_fine - 1, res_coarse - 1, -1):
        level = (
            level.select(
                cells.grid_parent(F.col(cell_col), 1).alias(cell_col), count_col
            )
            .groupBy(cell_col)
            .agg(F.sum(count_col).alias(count_col))
            .withColumn("res", F.lit(r))
        )
        out.append(level)
    from functools import reduce

    return reduce(DataFrame.unionByName, out)
