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
