"""Cell-index kernel tests: grid round-trips vs the numpy oracle, hierarchy
containment, rings, feature-id packing truth table (from the reference's
OSMDataUtils semantics, /root/reference/.../osmdata/OSMDataUtils.scala:5-21)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import cells


@pytest.fixture(scope="module")
def sample_phash():
    rng = np.random.default_rng(42)
    return rng.integers(0, 2**63, size=500, dtype=np.int64)


def test_grid_encode_phash_matches_numpy(spark, sample_phash):
    pdf = pd.DataFrame({"phash": sample_phash})
    df = spark.createDataFrame(pdf)
    for res in (0, 5, 9, 11, 28):
        got = (
            df.select(cells.grid_encode_phash(F.col("phash"), res).alias("c"))
            .toPandas()["c"]
            .to_numpy()
        )
        want = cells.np_grid_encode_phash(sample_phash, res)
        assert (got == want).all(), f"res={res}"


def test_grid_lonlat_agrees_with_phash_path(spark, sample_phash):
    """Encoding the float anchor point must land in the same cell as the pure
    integer path (anchor lon/lat are affine in x/y)."""
    pdf = pd.DataFrame({"phash": sample_phash})
    df = spark.createDataFrame(pdf)
    for res in (3, 9, 11):
        out = df.select(
            cells.grid_encode_phash(F.col("phash"), res).alias("a"),
            cells.grid_encode_lonlat(
                cells.anchor_lon(F.col("phash")), cells.anchor_lat(F.col("phash")), res
            ).alias("b"),
        ).toPandas()
        assert (out["a"] == out["b"]).all(), f"res={res}"


def test_grid_decode_roundtrip(spark, sample_phash):
    df = spark.createDataFrame(pd.DataFrame({"phash": sample_phash}))
    res = 11
    out = df.select(
        cells.grid_encode_phash(F.col("phash"), res).alias("c")
    ).select(
        cells.grid_res(F.col("c")).alias("r"),
        cells.grid_ix(F.col("c")).alias("ix"),
        cells.grid_iy(F.col("c")).alias("iy"),
        F.col("c"),
    ).toPandas()
    assert (out["r"] == res).all()
    repacked = res * cells._RES_SHIFT + out["ix"] * cells._IX_SHIFT + out["iy"]
    assert (repacked == out["c"]).all()
    assert (out["ix"] < 2**res).all() and (out["iy"] < 2**res).all()


def test_grid_parent_containment(spark, sample_phash):
    df = spark.createDataFrame(pd.DataFrame({"phash": sample_phash}))
    out = df.select(
        cells.grid_parent(cells.grid_encode_phash(F.col("phash"), 11), 4).alias("p"),
        cells.grid_encode_phash(F.col("phash"), 7).alias("direct"),
    ).toPandas()
    assert (out["p"] == out["direct"]).all()


def test_grid_children_inverse(spark):
    df = spark.createDataFrame(pd.DataFrame({"phash": [123456789012345]}))
    cell = cells.grid_encode_phash(F.col("phash"), 9)
    kids = df.select(F.explode(cells.grid_children(cell)).alias("k"), cell.alias("c"))
    back = kids.select(cells.grid_parent(F.col("k"), 1).alias("p"), "c").toPandas()
    assert len(back) == 4
    assert (back["p"] == back["c"]).all()


def test_grid_disk_and_ring(spark):
    df = spark.createDataFrame(pd.DataFrame({"phash": [2**61 + 987654321]}))
    cell = cells.grid_encode_phash(F.col("phash"), 9)
    for k, disk_n in [(0, 1), (1, 9), (2, 25)]:
        got = df.select(F.size(cells.grid_disk(cell, k, 9)).alias("n")).first()["n"]
        assert got == disk_n, f"k={k}"
    ring2 = df.select(F.size(cells.grid_ring(cell, 2, 9)).alias("n")).first()["n"]
    assert ring2 == 16


def test_grid_disk_wraps_longitude(spark):
    # ix = 0 at res 5: disk must wrap to ix = 31
    cell_val = 5 * cells._RES_SHIFT + 0 * cells._IX_SHIFT + 10
    df = spark.createDataFrame(pd.DataFrame({"c": [cell_val]}))
    out = df.select(F.explode(cells.grid_disk(F.col("c"), 1, 5)).alias("k")).toPandas()
    ixs = set((out["k"] % cells._RES_SHIFT) // cells._IX_SHIFT)
    assert ixs == {0, 1, 31}


def test_pack_feature_id_truth_table(spark):
    pdf = pd.DataFrame(
        {"id": [5, 5, 5], "type": ["node", "way", "relation"]}
    )
    out = (
        spark.createDataFrame(pdf)
        .select(cells.pack_feature_id(F.col("id"), F.col("type")).alias("p"))
        .toPandas()["p"]
        .tolist()
    )
    assert out == [5, 2**61 + 5, 2**62 + 5]
    df2 = spark.createDataFrame(pd.DataFrame({"p": out}))
    flags = df2.select(
        cells.is_node(F.col("p")).alias("n"),
        cells.is_way(F.col("p")).alias("w"),
        cells.is_relation(F.col("p")).alias("r"),
        cells.unpack_raw_id(F.col("p")).alias("raw"),
    ).toPandas()
    assert flags["n"].tolist() == [True, False, False]
    assert flags["w"].tolist() == [False, True, False]
    assert flags["r"].tolist() == [False, False, True]
    assert flags["raw"].tolist() == [5, 5, 5]


def test_pack_feature_id_range_guard(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [2**61], "type": ["node"]}))
    with pytest.raises(Exception, match="out of range"):
        df.select(cells.pack_feature_id(F.col("id"), F.col("type")).alias("p")).collect()


def test_synth_phash_sql_twin(spark):
    import duckdb

    keys = list(range(0, 5000, 37))
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = df.select(cells.synth_phash(F.col("k")).alias("p")).toPandas()["p"].tolist()
    want = duckdb.sql(
        f"select {cells.synth_phash_sql('k')} as p from (select unnest({keys}) as k)"
    ).df()["p"].tolist()
    assert got == want


def test_grid_encode_sql_twin(spark):
    import duckdb

    keys = list(range(0, 5000, 61))
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = (
        df.select(
            cells.grid_encode_phash(cells.synth_phash(F.col("k")), 9).alias("c")
        )
        .toPandas()["c"]
        .tolist()
    )
    sql = cells.grid_encode_phash_sql(cells.synth_phash_sql("k"), 9)
    want = duckdb.sql(
        f"select {sql} as c from (select unnest({keys}) as k)"
    ).df()["c"].tolist()
    assert got == want


# ---------------------------------------------------------------------------
# hex + s2 (numpy kernels)
# ---------------------------------------------------------------------------
def test_hex_ring_sizes_and_distinct():
    c = cells.np_hex_encode(np.array([12.3]), np.array([45.6]), 8)[0]
    for k in (1, 2, 3):
        ring = cells.np_hex_ring(int(c), k)
        assert len(ring) == 6 * k
        assert len(np.unique(ring)) == 6 * k


def test_hex_center_reencodes_to_self():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-80, 80, 300)
    for res in (4, 8, 12):
        c = cells.np_hex_encode(lon, lat, res)
        clon, clat = cells.np_hex_center(c)
        c2 = cells.np_hex_encode(clon, clat, res)
        assert (c == c2).all()


def test_hex_parent_mostly_contains():
    """Aperture-4 hex parents are approximate (like H3): the parent of a cell must be
    the hex whose center is nearest the child center at res-1 — check via re-encode."""
    rng = np.random.default_rng(2)
    lon = rng.uniform(-170, 170, 200)
    lat = rng.uniform(-80, 80, 200)
    c = cells.np_hex_encode(lon, lat, 9)
    p = cells.np_hex_parent(c, 1)
    res, _, _ = cells.np_hex_decode(p)
    assert (res == 8).all()
    clon, clat = cells.np_hex_center(c)
    assert (cells.np_hex_encode(clon, clat, 8) == p).all()


def test_s2_roundtrip_and_parent():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89, 89, 500)
    c = cells.np_s2_encode(lon, lat, 20)
    face, level, si, ti = cells.np_s2_decode(c)
    assert (level == 20).all()
    assert ((face >= 0) & (face <= 5)).all()
    # parent via Morton-shift == encode at coarser level
    p = cells.np_s2_parent(c, 3)
    direct = cells.np_s2_encode(lon, lat, 17)
    assert (p == direct).all()


def test_s2_udf_matches_numpy(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 200), "lat": rng.uniform(-89, 89, 200)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(cells.s2_encode_udf(15)(F.col("lon"), F.col("lat")).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    want = cells.np_s2_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 15)
    assert (got == want).all()


def test_hex_udf_matches_numpy(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {"lon": rng.uniform(-170, 170, 200), "lat": rng.uniform(-80, 80, 200)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(cells.hex_encode_udf(9)(F.col("lon"), F.col("lat")).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    want = cells.np_hex_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 9)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# geohash (4th index family)
# ---------------------------------------------------------------------------
def test_geohash_known_vectors():
    # canonical geohash test points
    assert cells.np_geohash(np.array([10.40744]), np.array([57.64911]), 11)[0] == "u4pruydqqvj"
    assert cells.np_geohash(np.array([10.40744]), np.array([57.64911]), 5)[0] == "u4pru"


def test_geohash_phash_matches_numpy(spark):
    df = spark.range(2000).select(cells.synth_phash(F.col("id")).alias("phash"))
    for prec in (5, 8):  # odd + even total-bit branches
        got = df.select(
            "phash", cells.geohash_phash(F.col("phash"), prec).alias("gh")
        ).collect()
        ph = np.array([r["phash"] for r in got], dtype=np.int64)
        lon, lat = cells.np_anchor(ph)
        want = cells.np_geohash(lon, lat, prec)
        assert [r["gh"] for r in got] == list(want)


def test_geohash_prefix_is_containment(spark):
    """geohash hierarchy: the precision-5 encode is the prefix of the
    precision-8 encode of the same point — string-prefix rollups are exact."""
    df = spark.range(500).select(cells.synth_phash(F.col("id")).alias("phash"))
    bad = df.select(
        cells.geohash_phash(F.col("phash"), 8).alias("g8"),
        cells.geohash_phash(F.col("phash"), 5).alias("g5"),
    ).filter(F.substring("g8", 1, 5) != F.col("g5"))
    assert bad.count() == 0
