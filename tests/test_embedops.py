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


def _synth_vectors(spark, n, dim, seed=7):
    """Deterministic synthetic embedding frame (seeded numpy), dense enough to
    measure recall in regimes the 500-row test parquet can't reach."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype(np.float64)
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_capped_recall(spark):
    """VERDICT r3 item 1: the production probe cap must be recall-tested where
    it actually bites. n_planes=14, bits=2 -> 106 probes total, auto cap = 47;
    assert margin-ordered capped recall >= uncapped recall - eps (the cap
    drops the LEAST likely buckets per query, so it should cost ~nothing)."""
    corpus = _synth_vectors(spark, 50_000, 16).persist()
    queries = corpus.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, corpus, k=5, kernel="gemm").persist()
    capped = embedops.lsh_ann_topk(
        queries, corpus, k=5, dim=16, n_planes=14, multiprobe_bits=2,
        kernel="gemm", max_probes="auto",
    )
    uncapped = embedops.lsh_ann_topk(
        queries, corpus, k=5, dim=16, n_planes=14, multiprobe_bits=2,
        kernel="gemm", max_probes=None,
    )
    r_capped = embedops.ann_recall(exact, capped)
    r_uncapped = embedops.ann_recall(exact, uncapped)
    corpus.unpersist()
    exact.unpersist()
    # both must be meaningful, and the 47/106 margin-ordered cap must not
    # cost more than eps recall vs the full Hamming-2 ball
    assert r_uncapped >= 0.5, f"uncapped recall {r_uncapped}"
    assert r_capped >= r_uncapped - 0.05, (
        f"capped {r_capped} vs uncapped {r_uncapped}"
    )


def test_gemm_query_guard_raises_on_brute_force(spark, emb):
    """VERDICT r3 item 2: an oversized query side must raise, not silently
    collect to the driver."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="query side exceeds"):
        embedops.cosine_topk(queries, emb, k=3, kernel="gemm", max_query_rows=5)


def test_gemm_query_guard_lsh_fallback(spark, emb):
    """lsh_ann_topk(kernel='gemm') with an oversized query side reroutes to the
    attach-join einsum rerank (no driver collect) and returns the same pairs."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=3, dim=64, n_planes=8, multiprobe_bits=2, kernel="gemm")
    normal = embedops.lsh_ann_topk(queries, emb, **kw).toPandas()
    rerouted = embedops.lsh_ann_topk(
        queries, emb, max_query_rows=5, **kw
    ).toPandas()
    key = ["query_id", "vec_id", "rank"]
    assert sorted(map(tuple, normal[key].values.tolist())) == sorted(
        map(tuple, rerouted[key].values.tolist())
    )


def test_ivf_auto_size_and_lloyd(spark, emb):
    """IVF auto-sizes the quantizer (sqrt(n), clamped) and Lloyd refinement
    keeps/improves recall; gemm assignment kernel end-to-end."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=3)
    approx = embedops.ivf_ann_topk(
        queries, emb, k=3, n_centroids=None, n_probe=6, kernel="gemm",
        lloyd_iters=1,
    )
    rec = embedops.ann_recall(exact, approx)
    assert rec >= 0.6, f"recall {rec}"
    top1 = approx.filter(F.col("rank") == 1).collect()
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


def test_ivf_trained_quantizer(spark, emb):
    """train_ivf_centroids: deterministic (same sample+iters -> identical
    matrix), serving-compatible shapes, and the trained quantizer's recall at
    a fixed probe budget is no worse than the untrained sample's (the whole
    point of training)."""
    C1 = embedops.train_ivf_centroids(emb, 8, train_rows=256, iters=5)
    C2 = embedops.train_ivf_centroids(emb, 8, train_rows=256, iters=5)
    assert C1.shape == (8, emb.first()["embedding"].__len__())
    assert np.array_equal(C1, C2)
    # clustered corpus (where quantizer training matters): 16 gaussians,
    # 2000 vectors, dim 16 — trained lists align with the real clusters, so
    # recall at a fixed probe budget beats the untrained md5 sample.
    rng = np.random.default_rng(11)
    cents = rng.normal(0, 1, (16, 16))
    assign = rng.integers(0, 16, 2000)
    X = cents[assign] + rng.normal(0, 0.15, (2000, 16))
    corpus = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(2000)],
        "vec_id long, embedding array<double>",
    ).persist()
    queries = corpus.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, corpus, k=3)
    stats = {}
    trained = embedops.ivf_ann_topk(
        queries, corpus, k=3, n_centroids=16, n_probe=2, train_iters=10,
        train_rows=1024, stats_out=stats,
    )
    untrained = embedops.ivf_ann_topk(
        queries, corpus, k=3, n_centroids=16, n_probe=2,
    )
    rt = embedops.ann_recall(exact, trained)
    ru = embedops.ann_recall(exact, untrained)
    assert rt >= ru, f"trained {rt} < untrained {ru}"
    assert rt >= 0.9, f"trained recall {rt} on cleanly clustered corpus"
    assert stats["candidates_total"] > 0
    # self-neighbor invariant survives training
    top1 = trained.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in top1)
    corpus.unpersist()


def test_ivf_train_rows_ceiling_guard(spark, emb):
    with pytest.raises(ValueError):
        embedops.train_ivf_centroids(
            emb, 8, train_rows=embedops.GEMM_MAX_QUERY_ROWS + 1
        )
