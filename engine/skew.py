"""Skew handling: hot-key detection, salting, and adaptive cell splitting.

The north_rule requires explicit skew handling on top of AQE (BASELINE.json):
dense H3 cells (megacity hotspots) must not serialize a join or aggregation into
one straggler task. Three tools:

- detect_hot_keys: cheap pre-aggregation that returns keys whose row count exceeds
  a threshold (the reference's analog is the driver-side sizing pre-pass,
  /root/reference/.../App.scala:52-72 — ours is per-key, not global).
- salted_agg: two-stage aggregation — salt the key, partial-agg on (key, salt),
  final-agg on key. Spark's partial/final hash agg already does this for
  algebraic aggregates; salted_agg is for when the first stage is a join or the
  aggregate is collect-like.
- add_salt / explode_salt_right: classic salted join — salt the skewed left side,
  explode the small right side across all salt values.
- split_hot_cells: adaptive cell splitting — re-encode points in hot coarse cells
  at a finer resolution so downstream grouping keys are uniform (the grid is
  hierarchical, so the fine cells remain exact refinements).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cells


def detect_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys with count > threshold. One partial+final agg over the key column only
    (column pruning keeps the scan narrow)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
        .select(key, "n")
    )


def add_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt",
             from_col: str | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts): derived from a stable column when given
    (reproducible runs), else from a per-row hash of all columns."""
    src = F.xxhash64(F.col(from_col)) if from_col else F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(src, F.lit(n_salts)).cast("int"))


def explode_salt_right(small: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate the small join side across every salt value (broadcast-sized
    inflation: |small| * n_salts rows)."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: list[str], n_salts: int = 16,
    how: str = "inner", salt_from: str | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side exploded — bounds any
    single key's rows per task at ~count/n_salts. Use when one join key dwarfs the
    rest and AQE's skew split isn't enough (e.g. the megacity cell)."""
    b = add_salt(big, n_salts, from_col=salt_from)
    s = explode_salt_right(small, n_salts)
    return b.join(s, on + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame, key: str, aggs: dict[str, Column], n_salts: int = 16,
    merge: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: partial agg on (key, salt), final agg
    on key. `aggs` maps output name -> aggregate Column for stage 1; `merge` maps
    the same names to the stage-2 re-aggregation (defaults to SUM for counts/sums)."""
    salted = add_salt(df, n_salts)
    stage1 = salted.groupBy(key, "_salt").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    merge = merge or {n: F.sum(n) for n in aggs}
    return stage1.groupBy(key).agg(*[c.alias(n) for n, c in merge.items()])


def split_hot_cells(
    points: DataFrame,
    cell_col: str,
    res: int,
    hot_threshold: int,
    split_steps: int = 2,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Adaptive cell splitting: points whose cell exceeds hot_threshold are
    re-encoded `split_steps` resolutions finer; cold points keep their cell. The
    output `cell` column is mixed-resolution but hierarchy-consistent (fine cells
    are exact refinements), so downstream per-cell aggregation keys are bounded.
    Broadcast of the (tiny) hot-cell list — no extra shuffle on the point side."""
    hot = detect_hot_keys(points, cell_col, hot_threshold).select(cell_col)
    fine = cells.grid_encode_lonlat(F.col(lon_col), F.col(lat_col), res + split_steps)
    return (
        points.join(
            F.broadcast(hot.withColumn("_hot", F.lit(True))), cell_col, "left"
        )
        .withColumn(
            cell_col,
            F.when(F.col("_hot").isNotNull(), fine).otherwise(F.col(cell_col)),
        )
        .drop("_hot")
    )
