"""Tile bundling: pack the features of each map tile into one bounded row.

A vector-tile pipeline ends with "give me, per tile, the (capped) feature
list plus how much was dropped" — the serving-side contract of every slippy
map stack. The reference stops at per-cell change counts
(SparkJobs.scala:43-76 rollups); this engine adds the tile-cut itself.

Semantics: per tile, keep the first `cap` features in deterministic
(order_col, id) rank order; report n_total / n_kept / n_overflow and the
kept ids in rank order. Deterministic and partition-invariant by
construction.

Scale:
- default plan = ONE shuffle: a row_number window on the tile key, then a
  groupBy on the same key (Catalyst reuses the window's hash partitioning —
  no second exchange);
- dense megacity tiles make that window single-task-hot, so
  `salt_buckets=s` switches to a two-level top-k: per-(tile, salt) pre-cap
  bounds any task's group to ~rows/s, the final window only ever sees
  <= s*cap survivors per tile. Output is IDENTICAL to the unsalted plan
  (tests assert equality) — the salt changes the physical plan only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tile_bundle(
    feats: DataFrame,
    cap: int,
    tile_col: str = "tile_id",
    id_col: str = "id",
    order_col: str | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """(tile, id[, order]) -> one row per tile:
    (tile, n_total, n_kept, n_overflow, ids_csv in rank order)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    ordc = order_col or id_col
    rank_cols = [F.col(ordc).asc(), F.col(id_col).asc()]
    tile, fid = F.col(tile_col), F.col(id_col)

    if salt_buckets and salt_buckets > 1:
        # two-level top-k: the per-bucket pre-cap is sound because the global
        # top-cap of a tile can contain at most cap rows from any one bucket
        salt = F.pmod(F.xxhash64(fid), F.lit(int(salt_buckets)))
        wb = Window.partitionBy(tile, salt).orderBy(*rank_cols)
        pre = (
            feats.withColumn("_rn", F.row_number().over(wb))
            .withColumn("_bn", F.count("*").over(Window.partitionBy(tile, salt)))
            .filter(F.col("_rn") <= cap)
        )
        # bucket counts ride along on the rn==1 row so n_total needs no
        # second pass over the raw input
        pre = pre.withColumn("_cnt", F.when(F.col("_rn") == 1, F.col("_bn")).otherwise(F.lit(0)))
        w = Window.partitionBy(tile).orderBy(*rank_cols)
        ranked = pre.withColumn("_grn", F.row_number().over(w))
        agg = ranked.groupBy(tile).agg(
            F.sum("_cnt").cast("long").alias("n_total"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_grn") <= cap, F.struct(F.col(ordc).alias("o"), fid.alias("i")))
                )
            ).alias("_kept"),
        )
    else:
        w = Window.partitionBy(tile).orderBy(*rank_cols)
        ranked = feats.withColumn("_grn", F.row_number().over(w))
        agg = ranked.groupBy(tile).agg(
            F.count("*").cast("long").alias("n_total"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_grn") <= cap, F.struct(F.col(ordc).alias("o"), fid.alias("i")))
                )
            ).alias("_kept"),
        )

    return agg.select(
        tile,
        "n_total",
        F.least(F.lit(cap).cast("long"), F.col("n_total")).alias("n_kept"),
        (F.col("n_total") - F.least(F.lit(cap).cast("long"), F.col("n_total"))).alias(
            "n_overflow"
        ),
        F.array_join(F.transform(F.col("_kept"), lambda s: s["i"].cast("string")), ",").alias(
            "ids_csv"
        ),
    )
