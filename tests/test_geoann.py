"""geo_ann_topk: exact parity with the brute-force twin on the geotagged
embedding corpus, fuzzed soundness of the rect cover (poles, antimeridian),
and gemm/hof kernel agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import cells, geoann

SF = "/root/testdata/sf0.001"


def _geo_emb(spark):
    """embeddings + deterministic phash-derived anchor point per vec_id."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ph = cells.synth_phash(F.col("vec_id").cast("long"))
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        cells.anchor_lon(ph).alias("lon"),
        cells.anchor_lat(ph).alias("lat"),
    )


@pytest.fixture(scope="module")
def geo(spark):
    return _geo_emb(spark).persist()


def _frames_equal(a, b):
    cols = ["query_id", "vec_id", "rank"]
    pa_ = a.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = b.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    return pa_.equals(pb)


def test_parity_with_brute_force(spark, geo):
    queries = geo.filter(F.col("vec_id") % 25 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    r = 3_000_000.0  # 3000 km: plural candidates per query on 500 points
    got = geoann.geo_ann_topk(queries, geo, radius_m=r, k=5)
    want = geoann.geo_ann_brute_force(queries, geo, radius_m=r, k=5)
    assert want.count() > 0
    assert _frames_equal(got, want)


def test_parity_small_radius_and_explicit_res(spark, geo):
    queries = geo.filter(F.col("vec_id") % 50 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    for r, res in [(500_000.0, None), (500_000.0, 4), (8_000_000.0, 3)]:
        got = geoann.geo_ann_topk(queries, geo, radius_m=r, k=3, res=res)
        want = geoann.geo_ann_brute_force(queries, geo, radius_m=r, k=3)
        assert _frames_equal(got, want), f"r={r} res={res}"


def test_gemm_kernel_parity(spark, geo):
    queries = geo.filter(F.col("vec_id") % 50 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    hof = geoann.geo_ann_topk(queries, geo, radius_m=2e6, k=4, kernel="hof")
    gemm = geoann.geo_ann_topk(queries, geo, radius_m=2e6, k=4, kernel="gemm")
    assert _frames_equal(hof, gemm)


def test_fuzz_cover_soundness(spark):
    """Random corpora with polar + antimeridian mass: the cell-cover plan must
    reproduce the brute force exactly at every radius/res tried."""
    rng = np.random.default_rng(17)
    n, dim = 400, 8
    lon = np.concatenate(
        [
            rng.uniform(-180, 180, n - 120),
            rng.uniform(176, 180, 40),  # antimeridian east
            rng.uniform(-180, -176, 40),  # antimeridian west
            rng.uniform(-180, 180, 40),
        ]
    )
    lat = np.concatenate(
        [
            rng.uniform(-90, 90, n - 120),
            rng.uniform(-90, 90, 80),
            rng.uniform(85, 90, 20),  # north polar cap
            rng.uniform(-90, -85, 20),  # south polar cap
        ]
    )
    V = rng.normal(size=(n, dim))
    rows = [
        (int(i), float(lon[i]), float(lat[i]), [float(x) for x in V[i]])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, lon double, lat double, embedding array<double>"
    ).persist()
    queries = df.filter(F.col("vec_id") % 16 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    try:
        for r, res in [(300_000.0, None), (1_500_000.0, 5), (6_000_000.0, 2)]:
            got = geoann.geo_ann_topk(queries, df, radius_m=r, k=3, res=res)
            want = geoann.geo_ann_brute_force(queries, df, radius_m=r, k=3)
            assert _frames_equal(got, want), f"r={r} res={res}"
    finally:
        df.unpersist()


def test_polar_query_full_wrap(spark):
    """A near-pole query whose lon bound is unbounded: the cover falls back to
    the full wrap and still matches brute force (every in-radius point on the
    far side of the pole is found)."""
    rng = np.random.default_rng(5)
    pts = [(int(i), float(l), 89.0 + float(d), [float(x) for x in rng.normal(size=4)])
           for i, (l, d) in enumerate(zip(rng.uniform(-180, 180, 60),
                                          rng.uniform(-0.9, 0.9, 60)))]
    df = spark.createDataFrame(
        pts, schema="vec_id long, lon double, lat double, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    got = geoann.geo_ann_topk(queries, df, radius_m=400_000.0, k=10, res=6)
    want = geoann.geo_ann_brute_force(queries, df, radius_m=400_000.0, k=10)
    assert want.count() > 1  # the cap really has multiple in-radius points
    assert _frames_equal(got, want)


def test_no_rows_outside_radius(spark, geo):
    queries = geo.filter(F.col("vec_id") < 10).withColumnRenamed(
        "vec_id", "query_id"
    )
    out = geoann.geo_ann_topk(queries, geo, radius_m=1e6, k=100).toPandas()
    assert (out["dist_m"] <= 1e6).all()


class TestGeoRadiusJoin:
    def test_parity_vs_brute_force(self, spark):
        from engine.geoann import geo_radius_join
        from engine.joins import haversine_m

        rng = np.random.default_rng(17)
        pa = spark.createDataFrame(
            [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
                zip(rng.uniform(-30, 30, 40), rng.uniform(-20, 20, 40)))],
            "a_id long, lon double, lat double",
        )
        pb = spark.createDataFrame(
            [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
                zip(rng.uniform(-30, 30, 500), rng.uniform(-20, 20, 500)))],
            "b_id long, lon double, lat double",
        )
        r = 400_000.0
        got = {(x["a_id"], x["b_id"]) for x in
               geo_radius_join(pa, pb, r).collect()}
        brute = (
            pa.crossJoin(pb.select(F.col("b_id"), F.col("lon").alias("blon"),
                                   F.col("lat").alias("blat")))
            .withColumn("d", haversine_m(F.col("lon"), F.col("lat"),
                                         F.col("blon"), F.col("blat")))
            .filter(F.col("d") <= r)
        )
        want = {(x["a_id"], x["b_id"]) for x in brute.collect()}
        assert got == want
        assert len(want) > 50

    def test_polar_and_antimeridian(self, spark):
        from engine.geoann import geo_radius_join

        pa = spark.createDataFrame(
            [(0, 179.9, 0.0), (1, 10.0, 89.5)],
            "a_id long, lon double, lat double",
        )
        pb = spark.createDataFrame(
            [(0, -179.9, 0.05), (1, -170.0, 89.6), (2, 0.0, 0.0)],
            "b_id long, lon double, lat double",
        )
        got = {(x["a_id"], x["b_id"]) for x in
               geo_radius_join(pa, pb, 150_000.0).collect()}
        # 0<->0 crosses the antimeridian (~23 km); 1<->1 is near-polar
        # (~60 km); nothing reaches (0,0)
        assert got == {(0, 0), (1, 1)}
