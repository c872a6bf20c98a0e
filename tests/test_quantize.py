"""Int8 embedding quantization: numpy parity, round-trip error bound,
code-scan recall vs the exact float path, and exact parity after rerank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import embedops, quantize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_quantize_np_bounds_and_zero():
    rng = np.random.default_rng(11)
    M = rng.normal(size=(50, 64))
    M[7] = 0.0  # zero vector
    codes, scale = quantize._quantize_np(M)
    assert codes.dtype == np.int8
    assert (np.abs(codes.astype(np.int32)) <= 127).all()
    assert scale[7] == 1.0 and (codes[7] == 0).all()
    # round-trip error bounded by half a quantization step per component
    back = codes.astype(np.float64) * scale[:, None]
    assert (np.abs(back - M) <= scale[:, None] / 2 + 1e-12).all()


def test_spark_quantize_matches_numpy(spark, emb):
    sub = emb.filter(F.col("vec_id") < 200)
    got = (
        quantize.quantize_int8(sub)
        .select("vec_id", "code", "qscale")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pdf = sub.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    codes, scale = quantize._quantize_np(M)
    have = np.vstack(
        [np.frombuffer(b, dtype=np.int8) for b in got["code"]]
    )
    assert (have == codes).all()
    assert np.allclose(got["qscale"].to_numpy(), scale)


def test_spark_round_trip_error_bound(spark, emb):
    sub = emb.filter(F.col("vec_id") < 100)
    orig = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in sub.select("vec_id", "embedding").collect()
    }
    deq = quantize.dequantize_int8(
        quantize.quantize_int8(sub).drop("embedding"), vec_col="approx"
    )
    for r in deq.select("vec_id", "qscale", "approx").collect():
        err = np.abs(np.asarray(r["approx"]) - orig[r["vec_id"]])
        assert (err <= r["qscale"] / 2 + 1e-12).all()


def test_int8_topk_recall_no_rerank(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=5)
    codes = quantize.quantize_int8(emb).select("vec_id", "code")
    approx = quantize.cosine_topk_int8(queries, codes, k=5)
    rec = embedops.ann_recall(exact, approx)
    assert rec >= 0.9, f"int8 code-scan recall {rec}"


def test_int8_topk_rerank_exact_parity(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        embedops.cosine_topk(queries, emb, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    codes = quantize.quantize_int8(emb).select("vec_id", "code")
    got = (
        quantize.cosine_topk_int8(
            queries, codes, k=3, rerank_corpus=emb, rerank_mult=4
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "vec_id", "rank"]].equals(
        exact[["query_id", "vec_id", "rank"]]
    )


def test_ivf_int8_matches_float_ivf_after_rerank(spark, emb):
    """Same seed => same centroid sample + nearest-1 assignment => identical
    candidate sets as the float IVF; the exact rerank then reproduces the
    float IVF's ranking (deterministic on this fixed corpus)."""
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flt = embedops.ivf_ann_topk(
        queries, emb, k=3, n_centroids=8, n_probe=4, kernel="gemm"
    )
    sq8 = quantize.ivf_ann_topk_int8(
        queries, emb, k=3, n_centroids=8, n_probe=4, rerank=True
    )
    assert embedops.ann_recall(flt, sq8) == 1.0


def test_ivf_int8_code_rank_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=3)
    sq8 = quantize.ivf_ann_topk_int8(
        queries, emb, k=3, n_centroids=8, n_probe=4, rerank=False
    )
    rec = embedops.ann_recall(exact, sq8)
    assert rec >= 0.7, f"IVF-SQ8 code-rank recall {rec}"
    # a query in the corpus probes its own centroid; int8 self-sim is still
    # the max (code cosine with itself is 1) -> rank 1 self
    top1 = sq8.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in top1)


def test_ivf_int8_query_guard_raises(spark, emb):
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="query side exceeds"):
        quantize.ivf_ann_topk_int8(
            queries, emb, k=2, n_centroids=8, max_query_rows=5
        )


def test_int8_query_guard_raises(spark, emb):
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    codes = quantize.quantize_int8(emb).select("vec_id", "code")
    with pytest.raises(ValueError, match="query side exceeds"):
        quantize.cosine_topk_int8(queries, codes, k=2, max_query_rows=5)
