"""Text-analysis + deduplication operators for large-scale training-data pipelines.

All hot paths are JVM Column expressions (xxhash64, higher-order functions) —
hashing, shingling, minhash, banding and Jaccard never leave whole-stage codegen;
numpy appears only in the simhash bit-fold (Arrow-batched, operating on JVM-computed
token hashes).

Operators:
  exact_dedup        hash-groupBy exact dedup (content fingerprint -> keeper + dups)
  word_ngrams        n-gram shingles over the token array (Column)
  minhash_signature  k-permutation minhash over token/shingle hashes (Column)
  minhash_lsh_pairs  banded LSH candidate pairs + exact Jaccard verification
  ngram_jaccard_pairs exact n-gram Jaccard over LSH candidates (or all pairs)
  simhash            64-bit simhash (JVM token hashes + Arrow bit-fold)
  simhash_near_dups  near-dup pairs by simhash Hamming distance
  lang_id            stopword-profile language guess (Column-only)
  quality_score      length/punct/stopword/digit heuristics (Column-only)
  token_count        whitespace + BPE-ish regex token counts
  fingerprint        document fingerprint (min-shingle-hash + md5)

Scale notes: dedup family keys every shuffle on a hash (uniform by construction —
no skew); LSH bucket join is an equi-join on (band, band_hash) so AQE skew handling
applies to pathological buckets; signatures are fixed-width arrays (n_hashes*8 B).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = 2147483647  # 2^31 - 1


def tokens(text: Column, pattern: str = r"\s+") -> Column:
    """Lower-cased whitespace tokens (empty tokens filtered)."""
    return F.filter(F.split(F.lower(text), pattern), lambda t: t != "")


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-grams (empty if < n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content: (fp, keep_id, dup_count, dup_ids).
    Single hash aggregation; the md5 key is uniform so no skew."""
    return df.groupBy(F.md5(F.col(text_col)).alias("fp")).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("dup_count"),
        F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------
def _hash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signature(shingles: Column, n_hashes: int = 64, seed: int = 42) -> Column:
    """array<string> shingles -> array<long> of n_hashes minhash values.

    h_i(s) = (a_i * (xxhash64(s) mod M) + b_i) mod M with M = 2^31-1; all int64
    arithmetic stays below 2^62 (ANSI-safe). Empty shingle sets map to all-M
    sentinels (never collide with real minima)."""
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    sig = [
        F.coalesce(
            F.array_min(
                F.transform(base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)))
            ),
            F.lit(_MERSENNE).cast("long"),
        )
        for a, b in _hash_params(n_hashes, seed)
    ]
    return F.array(*sig)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct element sets)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db))
    union = F.size(da) + F.size(db) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(1.0))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle -> minhash -> band -> bucket
    equi-join -> exact-Jaccard verify. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    Shuffles: one per band-explode groupBy join (a single equi-join on
    (band, band_hash)) + the verify join; candidate volume is bounded by bucket
    sizes, not n^2."""
    if n_hashes % bands != 0:
        raise ValueError("bands must divide n_hashes")
    rows_per_band = n_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_ngrams(tokens(F.col(text_col)), ngram).alias("_sh"),
    ).withColumn("_sig", minhash_signature(F.col("_sh"), n_hashes, seed))
    banded = sh.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    sha = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    shb = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (brute force; oracle for the LSH path and the
    right plan only for small partitions of a corpus)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_ngrams(tokens(F.col(text_col)), ngram).alias("_sh"),
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_indexed(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index — same output as
    ngram_jaccard_pairs but with NO cross join: explode distinct shingles,
    equi-join the index with itself on the shingle hash (candidate pairs share
    >=1 shingle — any pair with jaccard > 0 appears), count shared shingles per
    pair (= intersection), derive the union from per-doc set sizes.

    This is the plan that survives scale-up: shuffle volume is the posting-list
    volume (sum of pair-counts per shingle), not n^2. Pathologically hot
    shingles behave like hot cells — AQE skew-join applies to the self-join;
    threshold > 0 guarantees every emitted pair shares a shingle, so no
    candidates are lost vs brute force."""
    if threshold <= 0:
        # jaccard == 0 pairs (disjoint sets) never co-occur in the index;
        # brute force is the only exact plan for threshold <= 0
        return ngram_jaccard_pairs(df, id_col, text_col, ngram, threshold)
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_ngrams(tokens(F.col(text_col)), ngram)).alias("_sh"),
    ).persist()
    sizes = sh.select("_id", F.size("_sh").alias("_n"))
    posts = sh.select("_id", F.explode("_sh").alias("_g")).select(
        "_id", F.xxhash64("_g").alias("_gh")
    )
    l, r = posts.alias("l"), posts.alias("r")
    inter = (
        l.join(r, (F.col("l._gh") == F.col("r._gh")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # parity with the brute-force semantics: two EMPTY shingle sets have
    # union == 0 -> jaccard defined as 1.0 (ngram_jaccard_pairs's otherwise arm)
    empt = sizes.filter(F.col("_n") == 0).select("_id")
    ea, eb = empt.alias("ea"), empt.alias("eb")
    empty_pairs = (
        ea.join(eb, F.col("ea._id") < F.col("eb._id"))
        .select(
            F.col("ea._id").alias("id_a"),
            F.col("eb._id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return out.unionByName(empty_pairs)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _simhash_fold(token_hashes: pd.Series) -> pd.Series:
    """array<long> token hashes -> 64-bit simhash (numpy bit-count fold)."""
    out = np.zeros(len(token_hashes), dtype=np.uint64)
    for i, hs in enumerate(token_hashes):
        if hs is None or len(hs) == 0:
            continue
        arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits(
            (votes > 0).astype(np.uint8)[::-1]
        ).view(">u8")[0]
    return pd.Series(out.astype(np.int64))


def simhash(text: Column) -> Column:
    """64-bit simhash: JVM tokenization+hashing, Arrow-batched numpy bit fold."""
    return _simhash_fold(F.transform(tokens(text), lambda t: F.xxhash64(t)))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 bit patterns (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash: block on 4 x 16-bit chunks (a pair within Hamming
    distance <= 3 shares at least one exact chunk — pigeonhole), verify exact
    Hamming. Equi-join on (chunk_idx, chunk_value): no n^2."""
    s = df.select(F.col(id_col).alias("_id"), simhash(F.col(text_col)).alias("_sh"))
    chunks = s.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("_sh"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming64(F.col("l._sh"), F.col("r._sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# language id / quality / tokens / fingerprint
# ---------------------------------------------------------------------------
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def lang_id(text: Column) -> Column:
    """Heuristic language guess: argmax of stopword-profile hit counts over the
    token array ('und' unknown when all profiles score 0)."""
    toks = tokens(text)
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("s"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("s") > 0, best.getField("lang")).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """struct of quality heuristics: n_chars, n_tokens, mean_token_len_e3,
    stop_ratio_e3 (per-mille), digit_ratio_e3, score_e3 (composite)."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_toks = F.size(toks)
    mean_tok = F.when(n_toks > 0, F.floor(n_chars * 1000 / n_toks)).otherwise(F.lit(0))
    all_stop = F.array(
        *[F.lit(w) for ws in _STOPWORDS.values() for w in ws]
    )
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(all_stop, t)))
    stop_ratio = F.when(n_toks > 0, F.floor(n_stop * 1000 / n_toks)).otherwise(F.lit(0))
    n_digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    digit_ratio = F.when(n_chars > 0, F.floor(n_digits * 1000 / n_chars)).otherwise(
        F.lit(0)
    )
    score = F.greatest(
        F.lit(0),
        F.least(F.lit(1000), F.lit(500) + stop_ratio * 2 - digit_ratio),
    )
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        mean_tok.cast("long").alias("mean_token_len_e3"),
        stop_ratio.cast("long").alias("stop_ratio_e3"),
        digit_ratio.cast("long").alias("digit_ratio_e3"),
        score.cast("long").alias("score_e3"),
    )


# BPE-ish pre-tokenizer: splits words, numbers, and punctuation runs like a GPT-2
# style pattern (simplified for the builtin regex engine)
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token counts: 'whitespace' (split on runs of whitespace) or 'bpe' (count of
    GPT-2-ish pre-tokenizer matches via regexp_count)."""
    if mode == "whitespace":
        return F.size(tokens(text)).cast("long")
    if mode == "bpe":
        return F.regexp_count(text, F.lit(_BPE_PATTERN)).cast("long")
    raise ValueError(f"unknown token_count mode {mode!r}")


def fingerprint(text: Column, ngram: int = 3) -> Column:
    """Deterministic int64 document fingerprint: minimum shingle hash (stable under
    shingle reordering, robust to whitespace differences via tokenization)."""
    sh = word_ngrams(tokens(text), ngram)
    return F.coalesce(
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s))),
        F.xxhash64(F.concat_ws(" ", tokens(text))),
    )
