"""Spatial sampling & splitting for training-data hygiene.

Two operators every geospatial ML pipeline needs before any model sees the
table, both deterministic, Column-only, and exactly reproducible across
engines (md5-derived assignment — the registry's house randomness):

- `spatial_split`: BLOCK train/test split with a buffer ring. Random
  row-level splits leak spatial autocorrelation (a test point 10 m from a
  train point is effectively train); the standard cure is cell-block
  assignment — whole cells go to test by a deterministic hash — plus a
  BUFFER: train points whose cell touches a test cell within `buffer_cells`
  (Chebyshev) are EXCLUDED so no train/test pair is closer than
  buffer_cells - 1 cells. Assignment and exclusion are pure Column algebra
  (md5 on the packed cell key -> threshold; the ring check is a bounded
  explode + semi join against the distinct test-cell set).

- `stratified_cell_sample`: spatially balanced subsampling — cap rows per
  cell at `per_cell` by a deterministic md5 rank (dense megacity cells
  stop dominating the sample; empty regions keep everything). One window
  over the cell key; the curation-pipeline counterpart of
  cluster.cluster_sample's embedding-space balancing.

Reference provenance: the reference has no sampling surface; this serves
the brief's training-data pipeline axis (dedup/quality/curation are the
content side; these are the spatial side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cell_cols(x_col: str, y_col: str, cell_size: float):
    cx = F.floor(F.col(x_col).cast("double") / F.lit(float(cell_size)))
    cy = F.floor(F.col(y_col).cast("double") / F.lit(float(cell_size)))
    return cx.cast("long"), cy.cast("long")


def _cell_hash_unit(cx, cy, salt: int):
    """Deterministic uniform [0, 1] from the cell key — the first 15 hex
    digits of md5 over 2^60. NOTE the 60-bit integer does NOT fit a double
    exactly: the decimal->double cast rounds to nearest (53-bit mantissa),
    and a value in the top half-ulp below 2^60 rounds UP to exactly 2^60,
    yielding h = 1.0. Behavior stays fully deterministic and downstream
    consumers use strict `<` / least(fold, k-1) guards that absorb the
    closed upper end — but any twin MUST replicate this exact pipeline
    (md5 -> first 15 hex -> decimal -> IEEE round-to-nearest double ->
    divide by 2^60), not an exact-integer threshold, or boundary cells can
    diverge. (DuckDB's md5 + CAST chain matches.)"""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(",", cx, cy, F.lit(salt))), 1, 15
        ),
        16, 10,
    ).cast("decimal(20,0)").cast("double")
    return h / F.lit(float(1 << 60))


def spatial_split(
    points: DataFrame,
    cell_size: float,
    test_frac: float = 0.2,
    buffer_cells: int = 1,
    x_col: str = "x",
    y_col: str = "y",
    salt: int = 17,
) -> DataFrame:
    """Attach a `split` column: 'test' (the point's cell hashed below
    test_frac), 'buffer' (a non-test point whose cell is within
    buffer_cells Chebyshev of some test cell — excluded from training to
    kill boundary leakage), else 'train'. Deterministic in (cell, salt);
    changing the salt re-rolls the blocks. No train point's CELL touches a
    test cell closer than buffer_cells; with buffer_cells >= 1 the minimum
    train-test point distance is > (buffer_cells - 1) * cell_size.

    Plan: the test-cell set is a DISTINCT on hashed cells (bounded by
    distinct cells, not rows); the ring check explodes each test cell into
    its (2b+1)^2 neighborhood — bounded fan-out — and semi-joins the point
    frame's cell key. Points never shuffle; the two joins are broadcast-
    sized by the cell dimension in any realistic split."""
    if not (0.0 < test_frac < 1.0):
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    if buffer_cells < 0:
        raise ValueError(f"buffer_cells must be >= 0, got {buffer_cells}")
    cx, cy = _cell_cols(x_col, y_col, cell_size)
    pts = points.withColumn("_cx", cx).withColumn("_cy", cy)
    is_test_cell = _cell_hash_unit(F.col("_cx"), F.col("_cy"), salt) < F.lit(
        float(test_frac)
    )
    pts = pts.withColumn("_is_test", is_test_cell)
    test_cells = (
        pts.filter("_is_test").select("_cx", "_cy").distinct()
    )
    b = int(buffer_cells)
    ring = test_cells.select(
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("_cx") + dx).alias("_cx"),
                    (F.col("_cy") + dy).alias("_cy"),
                )
                for dx in range(-b, b + 1)
                for dy in range(-b, b + 1)
                if not (dx == 0 and dy == 0)
            ])
        ).alias("c")
    ).select(F.col("c._cx").alias("_cx"), F.col("c._cy").alias("_cy")) \
        .distinct() if b > 0 else None
    if ring is not None:
        in_ring = (
            pts.join(ring, ["_cx", "_cy"], "left_semi")
            .select("_cx", "_cy").distinct()
            .withColumn("_in_ring", F.lit(True))
        )
        pts = pts.join(in_ring, ["_cx", "_cy"], "left")
    else:
        pts = pts.withColumn("_in_ring", F.lit(None).cast("boolean"))
    split = (
        F.when(F.col("_is_test"), F.lit("test"))
        .when(F.col("_in_ring").isNotNull() & F.col("_in_ring"), F.lit("buffer"))
        .otherwise(F.lit("train"))
    )
    return pts.withColumn("split", split).drop(
        "_cx", "_cy", "_is_test", "_in_ring"
    )


def stratified_cell_sample(
    points: DataFrame,
    cell_size: float,
    per_cell: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    salt: int = 23,
) -> DataFrame:
    """Spatially balanced subsample: keep at most `per_cell` rows per grid
    cell, chosen by a deterministic md5 rank over (id, salt) — dense cells
    are capped, sparse cells keep everything, and the same inputs always
    yield the same sample. One window over the cell key (the tile_bundle
    top-k discipline; salt the key upstream if a single cell is
    pathological)."""
    if per_cell < 1:
        raise ValueError(f"per_cell must be >= 1, got {per_cell}")
    cx, cy = _cell_cols(x_col, y_col, cell_size)
    rk = F.md5(F.concat_ws(",", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(cx, cy).orderBy(rk, F.col(id_col))
    return (
        points.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cell)
        .drop("_rn")
    )


def spatial_folds(
    points: DataFrame,
    cell_size: float,
    k: int = 5,
    x_col: str = "x",
    y_col: str = "y",
    salt: int = 17,
) -> DataFrame:
    """Spatial k-fold assignment: every grid cell — and so every point in
    it — gets a deterministic fold id floor(md5_unit * k) in [0, k).
    Block-level cross-validation (leave-one-fold-out keeps each held-out
    region spatially contiguous at the cell scale); compose with
    spatial_split's ring logic per fold if buffered training sets are
    needed. Pure Column algebra, no shuffle."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    cx, cy = _cell_cols(x_col, y_col, cell_size)
    fold = F.floor(_cell_hash_unit(cx, cy, salt) * F.lit(float(k))).cast("long")
    return points.withColumn("fold", F.least(fold, F.lit(k - 1)))
