"""Text dedup / analysis operators vs brute-force oracles."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup of 0
        (3, "completely different content about spark engines"),
        (4, "der hund und die katze sind im haus und das ist gut"),  # German-ish
        (5, "the cat and the dog and the fox are friends of the house"),
        (6, "numbers 12345 67890 111 222 333 444 555 666 777 888"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = {r["keep_id"]: r for r in
           textops.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[0]["dup_count"] == 2 and out[0]["dup_ids"] == [0, 1]
    assert len(out) == 6  # 7 docs, one exact pair


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    out = df.select(
        textops.word_ngrams(textops.tokens(F.col("text")), 2).alias("g")
    ).first()["g"]
    assert out == ["a b", "b c", "c d"]
    short = spark.createDataFrame([("a",)], ["text"]).select(
        textops.word_ngrams(textops.tokens(F.col("text")), 3).alias("g")
    ).first()["g"]
    assert short == []


def test_minhash_identical_and_similar(spark, docs):
    sig = docs.select(
        "doc_id",
        textops.minhash_signature(
            textops.word_ngrams(textops.tokens(F.col("text")), 2), 64
        ).alias("sig"),
    ).toPandas().set_index("doc_id")["sig"]
    assert list(sig[0]) == list(sig[1])  # identical docs -> identical signatures
    est_near = sum(a == b for a, b in zip(sig[0], sig[2])) / 64
    est_far = sum(a == b for a, b in zip(sig[0], sig[3])) / 64
    assert est_near > 0.5 > est_far


def test_minhash_lsh_matches_brute_force(spark, docs):
    lsh = {
        (r["id_a"], r["id_b"])
        for r in textops.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.6, ngram=2
        ).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in textops.ngram_jaccard_pairs(
            docs, "doc_id", "text", ngram=2, threshold=0.6
        ).collect()
    }
    # LSH verifies with exact jaccard, so precision is 1; high-sim pairs must be found
    assert lsh <= brute
    assert (0, 1) in lsh and (0, 2) in lsh


def test_simhash_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in textops.simhash_near_dups(
            docs, "doc_id", "text", max_hamming=8
        ).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical
    # one-word swap on a 9-token doc flips ~8 bits; the pair still shares a
    # 16-bit chunk so the blocking finds it (guaranteed only for hamming <= 3)
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (0, 3) not in pairs


def test_simhash_deterministic(spark, docs):
    a = docs.select(textops.simhash(F.col("text")).alias("s")).toPandas()["s"]
    b = docs.repartition(3).select(
        "doc_id", textops.simhash(F.col("text")).alias("s")
    ).toPandas().sort_values("doc_id")["s"]
    assert sorted(a) == sorted(b)


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in
           docs.select("doc_id", textops.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en" and out[5] == "en"
    assert out[4] == "de"
    assert out[6] == "und"  # no stopwords at all


def test_quality_score(spark, docs):
    q = docs.select("doc_id", textops.quality_score(F.col("text")).alias("q")).collect()
    by = {r["doc_id"]: r["q"] for r in q}
    assert by[0]["n_tokens"] == 9
    assert by[6]["digit_ratio_e3"] > 400
    assert by[0]["score_e3"] > by[6]["score_e3"]  # prose beats digit soup


def test_token_count_modes(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], ["text"])
    ws = df.select(textops.token_count(F.col("text"), "whitespace").alias("n")).first()["n"]
    bpe = df.select(textops.token_count(F.col("text"), "bpe").alias("n")).first()["n"]
    assert ws == 4
    assert bpe == 6  # Hello / , / world / ! / 42 / times


def test_tfidf_top_terms(spark, docs):
    """TF-IDF top terms vs a hand-built pandas oracle (same smoothing)."""
    import math

    out = textops.tfidf_top_terms(docs, "doc_id", "text", k=3).toPandas()
    pdf = docs.toPandas()
    n = len(pdf)
    tf, dfreq = {}, {}
    for _, row in pdf.iterrows():
        terms = [t for t in row["text"].lower().split() if t]
        seen = set()
        for t in terms:
            tf[(row["doc_id"], t)] = tf.get((row["doc_id"], t), 0) + 1
        for t in set(terms):
            dfreq[t] = dfreq.get(t, 0) + 1
    for doc_id in pdf["doc_id"]:
        cand = [(d, t) for (d, t) in tf if d == doc_id]
        cand.sort(key=lambda k: (-tf[k], dfreq[k[1]], k[1]))
        want = [t for _, t in cand[:3]]
        got_rows = out[out["doc_id"] == doc_id].sort_values("rank")
        assert got_rows["term"].tolist() == want, doc_id
        for _, r in got_rows.iterrows():
            score = tf[(doc_id, r["term"])] * (
                math.log((1.0 + n) / (1.0 + dfreq[r["term"]])) + 1.0
            )
            assert r["tfidf_e6"] == math.floor(score * 1_000_000)


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "the quick  brown fox"), (1, "the quick brown   fox"),
         (2, "a different doc here")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fp"] for r in
          df.select("doc_id", textops.fingerprint(F.col("text"), 2).alias("fp")).collect()}
    assert fp[0] == fp[1] != fp[2]
