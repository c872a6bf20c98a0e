"""Distributed k-means over embedding columns + cluster-balanced sampling.

The curation ops a large training-data pipeline runs BETWEEN dedup and
selection: cluster the corpus embedding space (k-means), then sample per
cluster to re-balance it (the "diversity sampling" step — cap over-dense
regions, keep coverage of sparse ones).

This generalizes the Lloyd machinery inside engine.embedops.ivf_ann_topk into
a first-class operator: the centroid table stays broadcast-sized (k <= ~4096
by the same sqrt-N sizing as IVF), assignment is one Arrow matmul per batch
(embedops._nearest_centroids_gemm_udf — no per-row Python), and the update
step is a posexplode partial-sum groupBy (map-side combine -> k*dim tiny rows
to the driver). Per iteration: one shuffle. The corpus embedding column never
moves — the plan that holds at 10^9 rows.

No DuckDB twin: refined means are float-sum order-dependent across partitions
(same caveat as ivf_ann_topk's lloyd_iters>0 path, embedops.py:660-663), so
this is pytest-covered (structure recovery on a planted mixture, determinism,
balance properties) rather than registry-checked.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _init_centroids(
    corpus: DataFrame, k: int, corpus_id: str, vec_col: str, seed: int
) -> np.ndarray:
    """Deterministic init: the k corpus vectors with smallest md5-derived hash
    of (id, seed) — engine-independent and reproducible, same discipline as
    ivf_ann_topk's coarse quantizer."""
    from engine.textops import cross_hash

    key = cross_hash(
        F.concat(F.col(corpus_id).cast("string"), F.lit(f":{seed}")), "md5"
    )
    rows = corpus.select(vec_col).orderBy(key).limit(k).collect()
    return np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])


def kmeans(
    corpus: DataFrame,
    k: int | None = None,
    iters: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """Spherical k-means (cosine assignment, mean update) over an embedding
    column. Returns (assignments, centroids):

    - assignments: (corpus_id, cluster_id) — one row per corpus row;
    - centroids: (k, dim) float64 matrix after the final update.

    k=None auto-sizes to clamp(sqrt(n), 16, 4096) — broadcast-bounded like the
    IVF quantizer. iters bounds the Lloyd rounds (bounded iteration, engine
    discipline O5); an early exit fires when the max centroid shift drops
    below tol (computed driver-side from the k*dim partial sums — no extra
    pass over the corpus). Empty clusters keep their previous centroid.

    Cost model per iteration: one Arrow-matmul assignment pass over the corpus
    (vectors never shuffle) + one (cluster_id, dim-pos)-keyed partial-sum
    groupBy whose output is k*dim rows (driver-combined, broadcast back)."""
    from engine.embedops import _nearest_centroids_gemm_udf

    if k is None:
        import math

        k = max(16, min(4096, int(math.sqrt(corpus.count()))))
    cents = _init_centroids(corpus, k, corpus_id, vec_col, seed)
    base = corpus.select(F.col(corpus_id).alias("_id"), F.col(vec_col))

    def assign(cents_mat: np.ndarray) -> DataFrame:
        nc = _nearest_centroids_gemm_udf(cents_mat, 1)
        return base.withColumn("_cl", nc(F.col(vec_col))[0])

    tol = 1e-12
    for _ in range(max(1, iters)):
        assigned = assign(cents)
        stats = (
            assigned.select("_cl", F.posexplode(F.col(vec_col)).alias("_p", "_x"))
            .groupBy("_cl", "_p")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new_cents = cents.copy()
        for r in stats:
            new_cents[r["_cl"], r["_p"]] = r["_s"] / r["_n"]
        shift = float(np.max(np.abs(new_cents - cents)))
        cents = new_cents
        if shift < tol:
            break
    out = assign(cents).select(
        F.col("_id").alias(corpus_id), F.col("_cl").alias("cluster_id")
    )
    return out, cents


def cluster_sample(
    df: DataFrame,
    assignments: DataFrame,
    n_per_cluster: int,
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Cluster-balanced downsample: at most n_per_cluster rows per cluster,
    chosen deterministically (md5 hash order over (id, seed) — a stable
    pseudo-random draw reproducible across engines and runs). One window
    shuffle on cluster_id; df columns pass through with cluster_id attached.

    The re-balancing step of diversity sampling: dense clusters are capped at
    n_per_cluster while sparse clusters keep everything."""
    from engine.textops import cross_hash

    key = cross_hash(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")), "md5"
    )
    joined = df.join(
        assignments.select(F.col(id_col), F.col("cluster_id")), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(key.asc(), F.col(id_col).asc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_cluster)
        .drop("_rn")
    )
