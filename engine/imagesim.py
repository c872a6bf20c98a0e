"""Image near-duplicate detection on perceptual-hash codes.

The input table (BASELINE.json input_hint) carries a 64-bit `phash` per image;
near-duplicate images differ in a few bits. This module finds them WITHOUT an
n² comparison, with the same pigeonhole-blocking discipline as the text
simhash join (engine/textops.py simhash_near_dups) generalized to any
max_hamming and any int64 code column:

- split the 64 bits into n_chunks contiguous chunks (n_chunks > max_hamming);
  a pair within Hamming distance max_hamming agrees EXACTLY on at least one
  chunk (pigeonhole), so an equi-join on (chunk_idx, chunk_value) is a
  LOSSLESS candidate generator; bit_count(xor) verifies exactly.

- at 10^12 images the id-level pair set is quadratic in duplicate-cluster
  size (a hot phash — one meme reposted a million times — yields 10^12/2
  pairs by itself). The scalable shape therefore works on DISTINCT codes:
  hamming_code_pairs joins the |distinct codes| frame (vastly smaller, and
  bounded by 2^64 regardless of corpus growth), phash_dedup_clusters runs
  connected components over the code graph (engine/graph.py large-star/
  small-star) and maps every image to its cluster with ONE equi-join on the
  code — no id pair is ever materialized.

Reference parity: the reference has no image or similarity operator (its 661
Scala lines stop at geometry diffs, SparkJobs.scala:10-82); this serves the
image axis of the brief (phash-keyed dedup before the geo pipeline). The
DuckDB twins (hamming_*_sql) make every step oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import graph as _graph


def chunk_spec(max_hamming: int, n_chunks: int | None = None) -> list[tuple[int, int]]:
    """[(shift, width)] covering the 64 bits. n_chunks defaults to the
    pigeonhole minimum max_hamming+1 (fewest chunks => widest chunks =>
    fewest candidate collisions). Widths differ by at most 1 (64 = q*n + r:
    the first r chunks get q+1 bits) — callers' SQL twins must reproduce the
    same split, so it is defined here once."""
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    n = (max_hamming + 1) if n_chunks is None else n_chunks
    if not (max_hamming < n <= 64):
        raise ValueError(
            f"need max_hamming < n_chunks <= 64 for lossless blocking "
            f"(got max_hamming={max_hamming}, n_chunks={n})"
        )
    q, r = divmod(64, n)
    spec, shift = [], 0
    for i in range(n):
        w = q + (1 if i < r else 0)
        spec.append((shift, w))
        shift += w
    return spec


def _mask64(w: int) -> int:
    """Low-w-bits mask as a SIGNED int64 literal (w=64 -> -1 == all ones)."""
    m = (1 << w) - 1
    return m - (1 << 64) if m >= 1 << 63 else m


def _chunk_structs(code, spec: list[tuple[int, int]]):
    """One struct(ci, cv) per chunk. shiftrightunsigned keeps the split
    well-defined for negative codes (logical shift, engine-independent for
    the non-negative codes the oracle twins use)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned(code, s)
                .bitwiseAND(F.lit(_mask64(w)))
                .alias("cv"),
            )
            for i, (s, w) in enumerate(spec)
        ]
    )


def hamming64(a, b):
    """Hamming distance between two int64 bit patterns."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming_code_pairs(
    df: DataFrame,
    code_col: str = "code",
    max_hamming: int = 2,
    n_chunks: int | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT code values within max_hamming bits:
    (code_a, code_b, hamming) with code_a < code_b. Input duplicates are
    collapsed first, so the join size is governed by |distinct codes|, not
    corpus size — the property that makes the operator usable at 10^12 rows.
    Plan: distinct (1 shuffle) -> chunk explode -> equi-join on (ci, cv)
    (1 shuffle) -> exact verify -> pair distinct (1 shuffle)."""
    spec = chunk_spec(max_hamming, n_chunks)
    codes = df.select(F.col(code_col).cast("long").alias("_code")).distinct()
    chunks = codes.select(
        "_code", F.explode(_chunk_structs(F.col("_code"), spec)).alias("c")
    ).select("_code", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l._code") < F.col("r._code")),
        )
        .select(
            F.col("l._code").alias("code_a"),
            F.col("r._code").alias("code_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            hamming64(F.col("code_a"), F.col("code_b")).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_near_dups(
    df: DataFrame,
    id_col: str,
    code_col: str,
    max_hamming: int = 2,
    n_chunks: int | None = None,
) -> DataFrame:
    """Id-level near-dup pairs (id_a, id_b, hamming), id_a < id_b: every pair
    of rows whose codes differ in <= max_hamming bits, INCLUDING exact-code
    pairs (hamming 0). Quadratic in duplicate-cluster size by definition —
    use phash_dedup_clusters when clusters may be large; this expansion is
    for bounded cluster sizes and the oracle twin (hamming_near_dups_sql)."""
    codes = df.select(
        F.col(id_col).alias("_id"), F.col(code_col).cast("long").alias("_code")
    )
    cp = hamming_code_pairs(codes, "_code", max_hamming, n_chunks)
    cross = (
        codes.withColumnRenamed("_id", "_ida")
        .join(cp, F.col("_code") == F.col("code_a"))
        .drop("_code")
        .join(
            codes.withColumnRenamed("_id", "_idb"),
            F.col("_code") == F.col("code_b"),
        )
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    l, r = codes.alias("cl"), codes.alias("cr")
    within = l.join(
        r,
        (F.col("cl._code") == F.col("cr._code"))
        & (F.col("cl._id") < F.col("cr._id")),
    ).select(
        F.col("cl._id").alias("id_a"),
        F.col("cr._id").alias("id_b"),
        F.lit(0).cast("long").alias("hamming"),
    )
    return cross.unionByName(within)


def phash_dedup_clusters(
    df: DataFrame,
    id_col: str = "image_id",
    code_col: str = "phash",
    max_hamming: int = 2,
    n_chunks: int | None = None,
) -> DataFrame:
    """Every input row labeled with its near-dup cluster: (id_col, code_col,
    cluster_id) where cluster_id is the MINIMUM code in the row's transitive
    near-dup component (deterministic, engine-independent). The id column
    passes through untouched (strings fine). Scale shape: the quadratic
    work happens on distinct CODES only — connected components over the
    hamming_code_pairs graph — and images attach by one equi-join on the
    code. A million copies of one meme cost one code-graph node + one
    broadcast-or-shuffle join row each, never a pairwise expansion."""
    codes = df.select(F.col(code_col).cast("long").alias("_code")).distinct()
    pairs = hamming_code_pairs(codes, "_code", max_hamming, n_chunks)
    labels = _graph.connected_components(
        pairs, src="code_a", dst="code_b", nodes=codes, id_col="_code"
    ).select(F.col("id").alias("_code"), F.col("comp").alias("cluster_id"))
    return df.select(
        F.col(id_col), F.col(code_col).cast("long").alias(code_col)
    ).join(labels, F.col(code_col) == F.col("_code")).drop("_code")


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------
def _chunk_values_sql(spec: list[tuple[int, int]]) -> str:
    """VALUES list (ci, shift, mask) + lateral-style chunk extraction is
    clunky in a twin; emit a UNION ALL of per-chunk selects instead (n_chunks
    is tiny). Assumes code_expr >= 0 (DuckDB >> is arithmetic)."""
    parts = [
        f"SELECT _id, _code, {i} AS ci, (_code >> {s}) & {_mask64(w)} AS cv "
        f"FROM codes"
        for i, (s, w) in enumerate(spec)
    ]
    return " UNION ALL ".join(parts)


def hamming_near_dups_sql(
    table: str,
    id_expr: str,
    code_expr: str,
    max_hamming: int = 2,
    n_chunks: int | None = None,
) -> str:
    """DuckDB twin of hamming_near_dups. code_expr MUST be non-negative
    (DuckDB's >> is an arithmetic shift; the twins use the 60-bit md5
    cross-hash, which is). Emits (id_a, id_b, hamming)."""
    spec = chunk_spec(max_hamming, n_chunks)
    return f"""
        WITH codes AS MATERIALIZED (
          SELECT {id_expr} AS _id, {code_expr} AS _code FROM {table}
        ), chunks AS MATERIALIZED (
          {_chunk_values_sql(spec)}
        ), cand AS (
          SELECT DISTINCT
            LEAST(l._id, r._id) AS id_a, GREATEST(l._id, r._id) AS id_b,
            CAST(bit_count(xor(l._code, r._code)) AS BIGINT) AS hamming
          FROM chunks l JOIN chunks r
            ON l.ci = r.ci AND l.cv = r.cv AND l._id < r._id
        )
        SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {max_hamming}
    """


def hamming_code_pairs_sql(
    table: str,
    code_expr: str,
    max_hamming: int = 2,
    n_chunks: int | None = None,
) -> str:
    """DuckDB twin of hamming_code_pairs (distinct-code pair graph). Same
    non-negativity requirement as hamming_near_dups_sql."""
    spec = chunk_spec(max_hamming, n_chunks)
    parts = [
        f"SELECT _code, {i} AS ci, (_code >> {s}) & {_mask64(w)} AS cv "
        f"FROM codes"
        for i, (s, w) in enumerate(spec)
    ]
    chunks = " UNION ALL ".join(parts)
    return f"""
        WITH codes AS MATERIALIZED (
          SELECT DISTINCT {code_expr} AS _code FROM {table}
        ), chunks AS MATERIALIZED (
          {chunks}
        ), cand AS (
          SELECT DISTINCT l._code AS code_a, r._code AS code_b
          FROM chunks l JOIN chunks r
            ON l.ci = r.ci AND l.cv = r.cv AND l._code < r._code
        )
        SELECT code_a, code_b,
               CAST(bit_count(xor(code_a, code_b)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(code_a, code_b)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# SSIM verification (decoded-pixel confirmation of code-level candidates)
# ---------------------------------------------------------------------------
def np_ssim(a, b, win: int = 8, L: float = 255.0) -> float:
    """Mean SSIM between two equal-shape grayscale float arrays — the
    uniform-window variant of Wang et al. (box filter instead of the 11x11
    gaussian; standard C1=(0.01 L)^2, C2=(0.03 L)^2, valid-mode windows).
    Local moments come from 2D integral images, so the cost is O(pixels)
    regardless of window size. Identical inputs give exactly 1.0 (numerator
    and denominator are the same float expressions)."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    if min(a.shape) < win:
        raise ValueError(f"image smaller than ssim window {win}")
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2

    def box(x):
        c = np.cumsum(np.cumsum(x, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        return (
            c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]
        )

    n = float(win * win)
    mu_a, mu_b = box(a) / n, box(b) / n
    va = box(a * a) / n - mu_a * mu_a
    vb = box(b * b) / n - mu_b * mu_b
    cov = box(a * b) / n - mu_a * mu_b
    ssim_map = ((2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (va + vb + c2)
    )
    return float(ssim_map.mean())


def _gray_resized(px, size: int | None):
    """uint8 HxWx3 -> float64 grayscale, nearest-neighbor sampled to
    (size, size) when size is set (the multimodal.resize index rule)."""
    import numpy as np

    g = px.astype(np.float64).mean(axis=2)
    if size is None:
        return g
    h, w = g.shape
    yi = (np.arange(size) * h // size).clip(0, h - 1)
    xi = (np.arange(size) * w // size).clip(0, w - 1)
    return g[yi][:, xi]


def ssim_pairs(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    win: int = 8,
    resize_to: int | None = 64,
    prefilter_max_ids: int = 20_000_000,
) -> DataFrame:
    """Decoded-pixel SSIM over candidate pairs: (id_a, id_b, ssim, error).
    The slim-pair discipline of every near-dup join here: `pairs` carries ids
    only, and image bytes attach to SURVIVING candidates via two id-keyed
    equi-joins (each bounded by the image-table size) — bytes never ride the
    candidate-generation shuffle. Both images are grayscale-converted and
    (by default) nearest-sampled to resize_to^2 so differently-sized
    candidates compare; per-row decode errors surface in `error` instead of
    killing the batch (the multimodal kernel contract).

    This is the image-axis twin of the text pipeline's verify stages
    (minhash -> jaccard, simhash -> hamming): phash blocking proposes,
    pixel SSIM confirms."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from . import image_codec

    # Broadcast semi-join prefilter: when the participating id set is
    # driver-broadcastable (<= prefilter_max_ids; 20M longs ~ 160 MB), the
    # byte-carrying image table is filtered WITHOUT a shuffle before the
    # attach joins — at production scale (10^12 images, a thin candidate
    # set) this turns two corpus-sized byte shuffles into candidate-sized
    # ones. Above the bound the plain shuffled joins stand (the GEMM-guard
    # discipline: bounded sides are counted, never assumed).
    ids = (
        pairs.select(F.col(id_a).alias(id_col))
        .union(pairs.select(F.col(id_b).alias(id_col)))
        .distinct()
    )
    if ids.limit(prefilter_max_ids + 1).count() <= prefilter_max_ids:
        images = images.join(F.broadcast(ids), id_col, "left_semi")

    def side(suffix: str, key: str) -> DataFrame:
        return images.select(
            F.col(id_col).alias(key),
            F.col("bytes").alias(f"bytes{suffix}"),
            F.col("w").alias(f"w{suffix}"),
            F.col("h").alias(f"h{suffix}"),
            F.col("fmt").alias(f"fmt{suffix}"),
        )

    cand = pairs.select(id_a, id_b).join(side("_a", id_a), id_a).join(
        side("_b", id_b), id_b
    )
    # The decode+SSIM kernel is the expensive stage (~0.7 ms/pair), and AQE
    # sizes the attach-join's output partitions for SHUFFLE BYTES, not
    # Python cost — measured: it coalesced a 60k-pair frame to ~2 partitions
    # and ran the kernel near-serial (22 s for ~4 s of parallel work). An
    # explicit repartition is exempt from AQE coalescing and spreads pairs
    # evenly (round-robin) across the cluster.
    cand = cand.repartition(
        pairs.sparkSession.sparkContext.defaultParallelism
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ida, idb = getattr(row, id_a), getattr(row, id_b)
                try:
                    pa = image_codec.decode_image(
                        row.bytes_a, row.fmt_a, row.w_a, row.h_a
                    )
                    pb = image_codec.decode_image(
                        row.bytes_b, row.fmt_b, row.w_b, row.h_b
                    )
                    s = np_ssim(
                        _gray_resized(pa, resize_to),
                        _gray_resized(pb, resize_to),
                        win=win,
                    )
                    out.append((ida, idb, s, None))
                except Exception as e:  # per-pair isolation
                    out.append((ida, idb, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                out, columns=[id_a, id_b, "ssim", "error"]
            )

    id_type = dict(images.dtypes)[id_col]
    return cand.mapInPandas(
        kernel,
        schema=f"{id_a} {id_type}, {id_b} {id_type}, ssim double, "
        "error string",
    )


def phash_ssim_near_dups(
    images: DataFrame,
    id_col: str = "image_id",
    code_col: str = "phash",
    max_hamming: int = 2,
    min_ssim: float = 0.9,
    win: int = 8,
    resize_to: int | None = 64,
    n_chunks: int | None = None,
) -> DataFrame:
    """Verified image near-dup pairs at the CODE level: phash pigeonhole
    blocking proposes code pairs within max_hamming bits, then pixel SSIM of
    one deterministic REPRESENTATIVE image per code (min id) confirms —
    (code_a, code_b, hamming, ssim) with ssim >= min_ssim. Verification cost
    is per DISTINCT CODE PAIR, never per image pair: a million copies of a
    hot meme decode exactly once (the phash_dedup_clusters scale argument,
    extended to the verify stage)."""
    codes = images.select(F.col(code_col).cast("long").alias("_code")).distinct()
    cand = hamming_code_pairs(codes, "_code", max_hamming, n_chunks)
    # min_by keeps the representative's payload in ONE code-keyed shuffle
    # (an agg(min id) + id-join re-shuffles the byte-carrying table twice)
    reps = images.groupBy(F.col(code_col).cast("long").alias("_code")).agg(
        F.min_by(
            F.struct("bytes", "w", "h", "fmt"), F.col(id_col)
        ).alias("_s")
    ).select("_code", "_s.bytes", "_s.w", "_s.h", "_s.fmt")
    scored = ssim_pairs(
        cand.select("code_a", "code_b", "hamming"),
        reps,
        id_col="_code",
        id_a="code_a",
        id_b="code_b",
        win=win,
        resize_to=resize_to,
    ).join(cand, ["code_a", "code_b"])
    return scored.filter(F.col("ssim") >= min_ssim).select(
        "code_a", "code_b", "hamming", "ssim"
    )


def descriptor_matches(
    desc: DataFrame,
    max_hamming: int = 16,
    n_chunks: int | None = None,
    id_col: str = "image_id",
    kp_col: str = "kp",
    word_cols: tuple = ("d0", "d1", "d2", "d3"),
) -> DataFrame:
    """Cross-image keypoint matches over multi-word binary descriptors
    (multimodal.brief_descriptors' 256-bit BRIEF words): every unordered
    pair of keypoints from DIFFERENT images whose total hamming distance
    (summed over the words) is <= max_hamming, each exactly once —
    (image_a, kp_a, image_b, kp_b, hamming) with (image_a, kp_a) <
    (image_b, kp_b) lexicographically.

    Blocking is the pigeonhole discipline generalized to multiple words:
    n_chunks (default max_hamming + 1) disjoint bit ranges distributed
    round-robin over the words, each word's share split by chunk_spec. A
    pair within max_hamming bits can differ inside at most max_hamming
    chunks, so with >= max_hamming + 1 chunks at least one chunk matches
    exactly — LOSSLESS, the chunks need not even cover all bits. One
    (word, chunk, value) equi-join + pair distinct + exact bit_count
    verify; join volume is governed by chunk-value collisions
    (~n_keypoints^2 / 2^chunk_bits per chunk), so keep max_hamming small
    (near-duplicate patches), exactly like the phash operators."""
    n_words = len(word_cols)
    n = (max_hamming + 1) if n_chunks is None else n_chunks
    if n <= max_hamming:
        raise ValueError(
            f"need n_chunks > max_hamming for lossless blocking, got {n}"
        )
    per_word = [n // n_words + (1 if i < n % n_words else 0)
                for i in range(n_words)]
    chunk_structs = []
    for wi, (col, k) in enumerate(zip(word_cols, per_word)):
        if k == 0:
            continue
        for ci, (s, wd) in enumerate(chunk_spec(k - 1, k)):
            chunk_structs.append(
                F.struct(
                    F.lit(wi * 64 + ci).alias("ck"),
                    F.shiftrightunsigned(F.col(col), s)
                    .bitwiseAND(F.lit(_mask64(wd)))
                    .alias("cv"),
                )
            )
    base = desc.filter(F.col(word_cols[0]).isNotNull()).select(
        F.col(id_col).alias("img"),
        F.col(kp_col).alias("kp"),
        *[F.col(c) for c in word_cols],
    )
    chunks = base.select(
        "*", F.explode(F.array(*chunk_structs)).alias("c")
    ).select(
        "img", "kp", *word_cols,
        F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"),
    )
    left = chunks.select(
        F.col("img").alias("ia"), F.col("kp").alias("ka"),
        *[F.col(c).alias(f"a_{c}") for c in word_cols], "ck", "cv",
    )
    right = chunks.select(
        F.col("img").alias("ib"), F.col("kp").alias("kb"),
        *[F.col(c).alias(f"b_{c}") for c in word_cols], "ck", "cv",
    )
    ordered = (F.col("ia") < F.col("ib")) | (
        (F.col("ia") == F.col("ib")) & (F.col("ka") < F.col("kb"))
    )
    ham = None
    for c in word_cols:
        t = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        ham = t if ham is None else ham + t
    return (
        left.join(right, ["ck", "cv"])
        .filter((F.col("ia") != F.col("ib")) & ordered)
        .select("ia", "ka", "ib", "kb",
                *[f"a_{c}" for c in word_cols],
                *[f"b_{c}" for c in word_cols])
        .distinct()
        .select(
            F.col("ia").alias("image_a"), F.col("ka").alias("kp_a"),
            F.col("ib").alias("image_b"), F.col("kb").alias("kp_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
