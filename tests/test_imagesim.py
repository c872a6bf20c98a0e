"""engine.imagesim: phash hamming near-dup blocking + clustering.

Oracle strategy: brute-force O(n^2) hamming in Python over small corpora with
PLANTED near-dups (bit flips of base codes), so the pigeonhole blocking's
losslessness is checked against ground truth, not against itself."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from engine import imagesim
from tests.conftest import spark  # noqa: F401


def _brute_pairs(rows, max_h):
    out = {}
    for (ia, ca), (ib, cb) in itertools.combinations(rows, 2):
        h = bin((ca ^ cb) & (2**64 - 1)).count("1")
        if h <= max_h:
            a, b = sorted((ia, ib))
            out[(a, b)] = h
    return out


def _codes(rng, n_base=12, flips=3, copies=4):
    """Planted corpus: n_base random 64-bit codes, each with `copies` variants
    at <= `flips` bit flips (plus exact copies), ids sequential."""
    rows, nid = [], 0
    for _ in range(n_base):
        base = rng.getrandbits(63)
        rows.append((nid, base)); nid += 1
        for _ in range(copies):
            c = base
            for _ in range(rng.randint(0, flips)):
                c ^= 1 << rng.randrange(64)
            if c >= 2**63:  # wrap to signed int64 (bit-63 flips)
                c -= 2**64
            rows.append((nid, c)); nid += 1
    return rows


def test_chunk_spec_covers_64_bits():
    for h in (0, 1, 2, 3, 7):
        for n in (h + 1, h + 2, 8, 64):
            spec = imagesim.chunk_spec(h, n)
            assert len(spec) == n
            assert sum(w for _, w in spec) == 64
            assert spec[0][0] == 0
            for (s0, w0), (s1, _) in zip(spec, spec[1:]):
                assert s1 == s0 + w0
            assert max(w for _, w in spec) - min(w for _, w in spec) <= 1
    with pytest.raises(ValueError):
        imagesim.chunk_spec(3, 3)  # pigeonhole needs n_chunks > max_hamming
    with pytest.raises(ValueError):
        imagesim.chunk_spec(-1)


@pytest.mark.parametrize("max_h,n_chunks", [(2, None), (3, None), (3, 8), (5, 7)])
def test_pairs_match_bruteforce(spark, max_h, n_chunks):
    rng = random.Random(max_h * 100 + (n_chunks or 0))
    rows = _codes(rng)
    df = spark.createDataFrame(rows, "id long, code long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in imagesim.hamming_near_dups(
            df, "id", "code", max_hamming=max_h, n_chunks=n_chunks
        ).collect()
    }
    assert got == _brute_pairs(rows, max_h)


def test_negative_codes(spark):
    # int64 phashes can be negative; blocking must stay lossless
    rows = [(0, -1), (1, -2), (2, -(1 << 62)), (3, 7), (4, 5)]
    df = spark.createDataFrame(rows, "id long, code long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in imagesim.hamming_near_dups(df, "id", "code", 2).collect()
    }
    assert got == _brute_pairs(rows, 2)


def test_code_pairs_distinct_codes_only(spark):
    # a hot code repeated 1000x contributes ONE node, zero self-pairs
    df = spark.createDataFrame(
        [(i, 42) for i in range(1000)] + [(2000, 43)], "id long, code long"
    )
    got = imagesim.hamming_code_pairs(df, "code", max_hamming=1).collect()
    assert [(r["code_a"], r["code_b"], r["hamming"]) for r in got] == [(42, 43, 1)]


def test_clusters_transitive_and_string_ids(spark):
    # chain a-b-c within h<=1 each but a-c at distance 2: one cluster (min code)
    rows = [("img-a", 0b0000), ("img-b", 0b0001), ("img-c", 0b0011),
            ("img-x", 0b111000 << 40)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        r["image_id"]: r["cluster_id"]
        for r in imagesim.phash_dedup_clusters(df, max_hamming=1).collect()
    }
    assert got == {"img-a": 0, "img-b": 0, "img-c": 0, "img-x": 0b111000 << 40}


def test_clusters_on_planted_image_table(spark):
    # the bench shape at pytest scale: 4 copies per base phash (exact, 1-bit
    # flip, 2-bit flip, exact) -> every base collapses to ONE cluster at
    # max_hamming=2; every image labeled exactly once
    n, base_n = 2000, 500
    key = F.col("id")
    base_code = F.xxhash64((key % base_n).cast("string"))
    variant = (key / base_n).cast("long")
    bit1 = F.expr(f"shiftleft(1L, cast(id % {base_n} as int) % 61)")
    bit2 = F.expr(f"shiftleft(1L, cast((id % {base_n}) * 7 % 61 as int) + 1)")
    code = (
        F.when(variant == 1, base_code.bitwiseXOR(bit1))
        .when(variant == 2, base_code.bitwiseXOR(bit1).bitwiseXOR(bit2))
        .otherwise(base_code)
    )
    imgs = spark.range(0, n, 1, 8).select(
        F.concat(F.lit("img-"), key).alias("image_id"), code.alias("phash")
    )
    out = imagesim.phash_dedup_clusters(imgs, max_hamming=2).persist()
    assert out.count() == n
    assert out.select("image_id").distinct().count() == n
    stats = out.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    assert stats.count() == base_n
    assert stats.agg(F.min("sz"), F.max("sz")).collect()[0] == (4, 4)
    out.unpersist()


def test_sql_twin_matches_spark(spark):
    import duckdb

    rng = random.Random(99)
    rows = _codes(rng, n_base=8, flips=2, copies=3)
    # non-negative codes only (the twin's documented domain)
    df = spark.createDataFrame(rows, "id long, code long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in imagesim.hamming_near_dups(df, "id", "code", 2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, code BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            imagesim.hamming_near_dups_sql("t", "id", "code", 2)
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# SSIM verification
# ---------------------------------------------------------------------------
def _ssim_loop(a, b, win=8, L=255.0):
    """Direct per-window SSIM oracle (the textbook double loop)."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    vals = []
    for y in range(a.shape[0] - win + 1):
        for x in range(a.shape[1] - win + 1):
            wa = a[y : y + win, x : x + win]
            wb = b[y : y + win, x : x + win]
            mu_a, mu_b = wa.mean(), wb.mean()
            va = (wa * wa).mean() - mu_a * mu_a
            vb = (wb * wb).mean() - mu_b * mu_b
            cov = (wa * wb).mean() - mu_a * mu_b
            vals.append(
                ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
            )
    import numpy as np

    return float(np.mean(vals))


def test_np_ssim_matches_loop_oracle():
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, size=(17, 23)).astype(np.float64)
    b = (a + rng.normal(0, 12, size=a.shape)).clip(0, 255)
    got = imagesim.np_ssim(a, b)
    want = _ssim_loop(a, b)
    assert abs(got - want) < 1e-9


def test_np_ssim_identity_and_ordering():
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
    assert imagesim.np_ssim(a, a) == 1.0
    near = (a + rng.normal(0, 4, size=a.shape)).clip(0, 255)
    far = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
    s_near, s_far = imagesim.np_ssim(a, near), imagesim.np_ssim(a, far)
    assert s_near > s_far
    assert s_near > 0.8 and s_far < 0.3


def _image_rows(rng, specs):
    """(image_id, bytes, w, h, fmt) rows; specs = [(id, base_seed, noise)]:
    same base_seed -> same underlying pixels, noise pixels flipped."""
    import numpy as np

    from engine import image_codec

    rows = []
    for image_id, seed, noise, fmt, size in specs:
        r = np.random.default_rng(seed)
        px = r.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        if noise:
            rn = np.random.default_rng(seed + 1000 + noise)
            yy = rn.integers(0, size, size=noise)
            xx = rn.integers(0, size, size=noise)
            px = px.copy()
            px[yy, xx] = rn.integers(0, 256, size=(noise, 3), dtype=np.uint8)
        data = (
            image_codec.encode_png(px) if fmt == "png"
            else image_codec.encode_raw(px)
        )
        rows.append((image_id, data, size, size, fmt))
    return rows


def test_ssim_pairs_spark_matches_numpy(spark):
    import numpy as np

    from engine import image_codec

    rng = random.Random(9)
    specs = [
        ("a", 1, 0, "raw", 32),
        ("a2", 1, 20, "raw", 32),   # near-dup of a
        ("b", 2, 0, "png", 32),
        ("c", 3, 0, "raw", 16),     # different size than a
    ]
    rows = _image_rows(rng, specs)
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    pairs = spark.createDataFrame(
        [("a", "a2"), ("a", "b"), ("a", "c")], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["ssim"]
        for r in imagesim.ssim_pairs(pairs, images, resize_to=16).collect()
    }
    px = {}
    for image_id, data, w, h, fmt in rows:
        px[image_id] = image_codec.decode_image(data, fmt, w, h)
    for ia, ib in [("a", "a2"), ("a", "b"), ("a", "c")]:
        want = imagesim.np_ssim(
            imagesim._gray_resized(px[ia], 16),
            imagesim._gray_resized(px[ib], 16),
        )
        assert got[(ia, ib)] == pytest.approx(want, abs=1e-12)
    assert got[("a", "a2")] > got[("a", "b")]


def test_ssim_pairs_error_isolation(spark):
    rng = random.Random(10)
    rows = _image_rows(rng, [("a", 1, 0, "raw", 32), ("b", 2, 0, "raw", 32)])
    rows.append(("bad", b"\x00\x01garbage", 32, 32, "raw"))
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "bad")], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["ssim"], r["error"])
        for r in imagesim.ssim_pairs(pairs, images).collect()
    }
    assert got[("a", "b")][1] is None and got[("a", "b")][0] is not None
    assert got[("a", "bad")][0] is None and got[("a", "bad")][1]


def test_phash_ssim_near_dups_confirms_planted(spark):
    """Same pixels + 1-bit phash flip -> candidate confirmed by SSIM; a
    different image whose phash ALSO lands 1 bit away (planted collision)
    is proposed by blocking but rejected by the pixel verify."""
    rng = random.Random(11)
    rows = _image_rows(
        rng,
        [
            ("dup1", 5, 0, "raw", 32),
            ("dup2", 5, 6, "raw", 32),     # near-identical pixels
            ("decoy", 6, 0, "raw", 32),    # unrelated pixels
        ],
    )
    base = 0x0123456789ABCDEF
    data = [
        (ident, d, w, h, f, code)
        for (ident, d, w, h, f), code in zip(
            rows, [base, base ^ 1, base ^ 2]  # all within hamming 2
        )
    ]
    images = spark.createDataFrame(
        data,
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )
    got = imagesim.phash_ssim_near_dups(
        images, max_hamming=2, min_ssim=0.9
    ).collect()
    confirmed = {(r["code_a"], r["code_b"]) for r in got}
    assert confirmed == {(min(base, base ^ 1), max(base, base ^ 1))}
    (row,) = got
    assert row["hamming"] == 1 and row["ssim"] >= 0.9


# ---------------------------------------------------------------------------
# BRIEF descriptors + cross-image keypoint matching
# ---------------------------------------------------------------------------
def test_np_brief_loop_oracle():
    import numpy as np

    from engine import multimodal

    rng = np.random.default_rng(123)
    px = rng.integers(0, 256, size=(20, 18, 3), dtype=np.uint8)
    pat = multimodal.brief_pattern(256, 8, seed=9)
    corners = [(0, 0), (17, 19), (9, 4), (5, 12)]
    got = multimodal.np_brief(px, corners, pat)
    I = px.astype(np.int64).sum(axis=2)
    h, w = I.shape
    for ci, (x, y) in enumerate(corners):
        words = [0, 0, 0, 0]
        for i in range(256):
            ay, ax, by, bx = (int(v) for v in pat[i])
            la = I[min(max(y + ay, 0), h - 1), min(max(x + ax, 0), w - 1)]
            lb = I[min(max(y + by, 0), h - 1), min(max(x + bx, 0), w - 1)]
            if la > lb:
                words[i // 64] |= 1 << (i % 64)
        want = [wv - (1 << 64) if wv >= 1 << 63 else wv for wv in words]
        assert list(got[ci]) == want, ci


def test_brief_descriptors_and_matches_end_to_end(spark):
    """Two copies of the same content under different ids produce identical
    keypoints and descriptors; descriptor_matches finds every same-rank
    pair at hamming 0 across the two images and nothing from the unrelated
    image at a small threshold."""
    import numpy as np

    from engine import image_codec, multimodal
    from engine.imagesim import descriptor_matches

    rng = np.random.default_rng(321)
    content = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    rows = [
        ("a", image_codec.encode_raw(content), 24, 24, "raw"),
        ("b", image_codec.encode_raw(content), 24, 24, "raw"),
        ("c", image_codec.encode_raw(other), 24, 24, "raw"),
        ("bad", b"x", 8, 8, "tiff"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    desc = multimodal.brief_descriptors(df, max_corners=6).persist()
    rowsd = desc.collect()
    by_img = {}
    for r in rowsd:
        by_img.setdefault(r["image_id"], []).append(r)
    assert by_img["bad"][0]["error"] is not None
    da = {r["kp"]: r for r in by_img["a"]}
    db = {r["kp"]: r for r in by_img["b"]}
    assert set(da) == set(db) and len(da) >= 2
    for k in da:
        assert [da[k][c] for c in ("x", "y", "d0", "d1", "d2", "d3")] == \
            [db[k][c] for c in ("x", "y", "d0", "d1", "d2", "d3")]
    m = descriptor_matches(desc, max_hamming=4).collect()
    got = {(r["image_a"], r["kp_a"], r["image_b"], r["kp_b"]): r["hamming"]
           for r in m}
    for k in da:
        assert got[("a", k, "b", k)] == 0
    assert all(
        {p[0], p[2]} != {"a", "c"} and {p[0], p[2]} != {"b", "c"}
        for p in got
    )  # unrelated content never within 4 bits of 256
    desc.unpersist()


def test_descriptor_matches_bruteforce_parity(spark):
    """Planted near-duplicate descriptors across synthetic images: the
    blocked join returns EXACTLY the brute-force pair set (lossless
    pigeonhole over 4 words), duplicates deduped."""
    import random as _random

    rng = _random.Random(55)
    rows = []
    base = [rng.getrandbits(64) - (1 << 63) for _ in range(4)]

    def flip(words, k):
        out = list(words)
        for b in rng.sample(range(256), k):
            out[b // 64] ^= 1 << (b % 64)
        return [w - (1 << 64) if w >= 1 << 63 else (w + (1 << 64) if w < -(1 << 63) else w) for w in out]

    descs = {}
    for img in range(6):
        for kp in range(3):
            if img < 4:
                w = flip(base, rng.randint(0, 6))  # near family
            else:
                w = [rng.getrandbits(64) - (1 << 63) for _ in range(4)]
            descs[(str(img), kp)] = w
            rows.append((str(img), kp, *w))
    df = spark.createDataFrame(
        rows, "image_id string, kp int, d0 long, d1 long, d2 long, d3 long"
    )
    from engine.imagesim import descriptor_matches

    for h in (0, 5, 12):
        got = {
            (r["image_a"], r["kp_a"], r["image_b"], r["kp_b"]): r["hamming"]
            for r in descriptor_matches(df, max_hamming=h).collect()
        }
        want = {}
        keys = sorted(descs)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                (ia, ka), (ib, kb) = keys[i], keys[j]
                if ia == ib:
                    continue
                hm = sum(
                    bin((descs[keys[i]][w] ^ descs[keys[j]][w])
                        & ((1 << 64) - 1)).count("1")
                    for w in range(4)
                )
                if hm <= h:
                    want[(ia, ka, ib, kb)] = hm
        assert got == want, h
    import pytest as _pytest

    with _pytest.raises(ValueError):
        descriptor_matches(df, max_hamming=5, n_chunks=4)
