"""Embedding top-k: exact path vs numpy oracle; LSH path recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import embedops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_cosine_topk_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = (
        embedops.cosine_topk(queries, emb, k=4)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pdf = emb.select("vec_id", "embedding").toPandas()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    for qid in range(5):
        qi = int(np.where(ids == qid)[0][0])
        sims = (M @ M[qi]) / (norms * norms[qi])
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:4]
        want = [int(ids[i]) for i in order]
        have = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert have == want, f"query {qid}"


def test_cosine_topk_self_is_rank1(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = (
        embedops.cosine_topk(queries, emb, k=1)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert all(r["query_id"] == r["vec_id"] for r in top1)


def test_lsh_ann_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=3)
    approx = embedops.lsh_ann_topk(queries, emb, k=3, dim=64, multiprobe_bits=2)
    rec = embedops.ann_recall(exact, approx)
    assert rec >= 0.7, f"recall {rec}"
    # self always lands in its own bucket -> rank 1 guaranteed
    top1 = approx.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in top1)


def test_lsh_bucket_deterministic(spark, emb):
    planes = embedops._planes(64, 8, seed=42)
    a = emb.select("vec_id", embedops.lsh_bucket(F.col("embedding"), planes).alias("b"))
    b = emb.repartition(5).select(
        "vec_id", embedops.lsh_bucket(F.col("embedding"), planes).alias("b")
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_gemm_kernel_parity_cosine_topk(spark, emb):
    """The production gemm kernel (per-partition matmul + local top-k) returns
    the same ranks as the deterministic HOF path."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hof = embedops.cosine_topk(queries, emb, k=5, kernel="hof").toPandas()
    gemm = embedops.cosine_topk(
        queries, emb.repartition(4), k=5, kernel="gemm"
    ).toPandas()
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, hof[key].values.tolist())) == sorted(
        map(tuple, gemm[key].values.tolist())
    )


def test_gemm_kernel_parity_lsh(spark, emb):
    """gemm and hof kernels of lsh_ann_topk agree (same buckets, same ranks)."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hof = embedops.lsh_ann_topk(
        queries, emb, k=5, dim=64, n_planes=8, multiprobe_bits=2, kernel="hof"
    ).toPandas()
    gemm = embedops.lsh_ann_topk(
        queries, emb, k=5, dim=64, n_planes=8, multiprobe_bits=2, kernel="gemm"
    ).toPandas()
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, hof[key].values.tolist())) == sorted(
        map(tuple, gemm[key].values.tolist())
    )


def test_lsh_max_probes_cap(spark, emb):
    """max_probes bounds the probe fan-out; capped output ranks stay a coherent
    top-k (self-probe first -> self always rank 1)."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    capped = embedops.lsh_ann_topk(
        queries, emb, k=3, dim=64, n_planes=8, multiprobe_bits=2,
        kernel="gemm", max_probes=9,
    )
    top1 = capped.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in top1)


def test_ivf_ann_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=3)
    approx = embedops.ivf_ann_topk(queries, emb, k=3, n_centroids=8, n_probe=4)
    rec = embedops.ann_recall(exact, approx)
    assert rec >= 0.7, f"recall {rec}"
    # a query vector in the corpus always probes its own centroid -> rank 1 self
    top1 = approx.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in top1)
