"""k-means + cluster-balanced sampling (engine/cluster.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import cluster


def _planted(spark, n_per=200, n_clusters=4, dim=16, sep=20.0, seed=3):
    """Well-separated planted mixture: cluster c centered at sep * e_c."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = sep
        pts = center + rng.standard_normal((n_per, dim))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, [float(x) for x in p], c))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "true_cl"])


def test_recovers_planted_clusters(spark):
    df = _planted(spark)
    assigned, cents = cluster.kmeans(df, k=4, iters=8)
    assert cents.shape == (4, 16)
    joined = assigned.join(df.select("vec_id", "true_cl"), "vec_id")
    # each k-means cluster must be pure (one true cluster) and vice versa
    purity = (
        joined.groupBy("cluster_id")
        .agg(F.count_distinct("true_cl").alias("n_true"))
        .agg(F.max("n_true"))
        .collect()[0][0]
    )
    assert purity == 1
    n_found = assigned.select("cluster_id").distinct().count()
    assert n_found == 4


def test_deterministic(spark):
    df = _planted(spark, n_per=50)
    a1, c1 = cluster.kmeans(df, k=4, iters=4)
    a2, c2 = cluster.kmeans(df, k=4, iters=4)
    assert np.allclose(c1, c2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_empty_clusters_survive(spark):
    # k larger than the number of natural clusters: some centroids may end up
    # empty — they keep their previous position, no crash, all rows assigned
    df = _planted(spark, n_per=30, n_clusters=2)
    assigned, cents = cluster.kmeans(df, k=6, iters=3)
    assert assigned.count() == 60
    assert cents.shape[0] == 6
    assert np.isfinite(cents).all()


def test_cluster_sample_caps_dense_keeps_sparse(spark):
    df = _planted(spark, n_per=100, n_clusters=2)
    small = df.filter((F.col("true_cl") == 1) & (F.col("vec_id") < 105))
    mix = df.filter(F.col("true_cl") == 0).unionByName(small)  # 100 vs 5
    assigned, _ = cluster.kmeans(mix, k=2, iters=5)
    out = cluster.cluster_sample(mix, assigned, n_per_cluster=20)
    sizes = {
        r["cluster_id"]: r["n"]
        for r in out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sorted(sizes.values()) == [5, 20]
    # deterministic draw
    out2 = cluster.cluster_sample(mix, assigned, n_per_cluster=20)
    assert sorted(r["vec_id"] for r in out.collect()) == sorted(
        r["vec_id"] for r in out2.collect()
    )


def test_auto_k(spark):
    df = _planted(spark, n_per=100, n_clusters=2)
    assigned, cents = cluster.kmeans(df, iters=2)
    # clamp(sqrt(200), 16, 4096) = 16
    assert cents.shape[0] == 16
    assert assigned.count() == 200
