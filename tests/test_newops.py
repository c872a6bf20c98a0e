"""Tests for round-continuation operators: sessionize, cosine near-dup."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from engine import embedops, temporal


def test_sessionize_gap_rule(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (40-min gap between e3 and e4)
        (1, 1, base),
        (2, 1, base + dt.timedelta(minutes=10)),
        (3, 1, base + dt.timedelta(minutes=20)),
        (4, 1, base + dt.timedelta(minutes=60)),
        (5, 1, base + dt.timedelta(minutes=65)),
        # user 2: single event = single session
        (6, 2, base),
        # user 3: boundary — exactly 30 min gap does NOT start a new session
        (7, 3, base),
        (8, 3, base + dt.timedelta(minutes=30)),
        (9, 3, base + dt.timedelta(minutes=60, seconds=1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = temporal.sessionize(df, key="user_id", ts="ts", gap_minutes=30,
                              order_tiebreak="event_id")
    got = {
        r["event_id"]: (r["session_idx"], r["is_session_start"])
        for r in out.collect()
    }
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (2, 1), 5: (2, 0),
        6: (1, 1),
        7: (1, 1), 8: (1, 0), 9: (2, 1),
    }


def test_sessionize_order_invariance(spark):
    """Output independent of input row order (shuffle-invariance property)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 5, base + dt.timedelta(minutes=7 * i + (i % 3) * 45)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    a = temporal.sessionize(df, order_tiebreak="event_id")
    b = temporal.sessionize(
        df.orderBy(F.desc("event_id")).repartition(7), order_tiebreak="event_id"
    )
    ka = sorted(map(tuple, a.select("event_id", "session_idx").collect()))
    kb = sorted(map(tuple, b.select("event_id", "session_idx").collect()))
    assert ka == kb


def _clustered_embeddings(spark, n_clusters=8, per_cluster=12, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + rng.standard_normal(dim) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_near_dups_exact_matches_numpy(spark):
    df = _clustered_embeddings(spark)
    out = embedops.cosine_near_dups(df, threshold=0.99, mode="exact")
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    pdf = df.toPandas()
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    want = {
        (int(pdf.vec_id[i]), int(pdf.vec_id[j]))
        for i in range(len(pdf))
        for j in range(i + 1, len(pdf))
        if sims[i, j] >= 0.99 - 1e-12
    }
    # float32 storage vs float64 numpy: allow boundary wobble only
    assert got.symmetric_difference(want) == set() or all(
        abs(sims[a, b] - 0.99) < 1e-6 for a, b in got.symmetric_difference(want)
    )


def test_cosine_near_dups_lsh_recall(spark):
    df = _clustered_embeddings(spark)
    exact = embedops.cosine_near_dups(df, threshold=0.99, mode="exact")
    approx = embedops.cosine_near_dups(
        df, threshold=0.99, mode="lsh", dim=16, n_planes=6, multiprobe_bits=1
    )
    e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    a = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    assert a <= e  # LSH path never invents pairs (same exact verify filter)
    assert len(a) / max(1, len(e)) >= 0.9  # tight-threshold dups share buckets


def test_ngram_jaccard_indexed_matches_brute_force(spark):
    from engine import textops

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different document with other words entirely"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "short one"),          # < 3 tokens: empty shingle set
        (6, "tiny"),               # empty shingle set
        (7, "the quick brown fox leaps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bf = textops.ngram_jaccard_pairs(df, "doc_id", "text", ngram=3, threshold=0.3)
    ix = textops.ngram_jaccard_pairs_indexed(df, "doc_id", "text", ngram=3,
                                             threshold=0.3)
    key = lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9))
    assert sorted(map(key, bf.collect())) == sorted(map(key, ix.collect()))
    # the empty-empty pair (5, 6) must appear with jaccard 1.0 in both
    assert (5, 6, 1.0) in set(map(key, ix.collect()))
