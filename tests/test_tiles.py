"""Tile bundling: python-oracle parity, salted==unsalted plan equivalence,
overflow accounting, determinism."""

import random
from collections import defaultdict

from pyspark.sql import functions as F

from engine.tiles import tile_bundle


def _mk_rows(rng, n_tiles=12, max_per_tile=40):
    rows = []
    fid = 0
    for t in range(n_tiles):
        for _ in range(rng.randint(0, max_per_tile)):
            rows.append((t, fid, rng.randint(0, 5)))
            fid += 1
    rng.shuffle(rows)
    return rows


def _oracle(rows, cap, use_order):
    by_tile = defaultdict(list)
    for t, i, o in rows:
        by_tile[t].append((o if use_order else i, i))
    out = {}
    for t, lst in by_tile.items():
        lst.sort()
        kept = [i for _, i in lst[:cap]]
        out[t] = (len(lst), min(cap, len(lst)), max(0, len(lst) - cap),
                  ",".join(str(i) for i in kept))
    return out


def test_bundle_matches_oracle(spark):
    rng = random.Random(42)
    rows = _mk_rows(rng)
    df = spark.createDataFrame(rows, "tile_id: long, id: long, pri: long")
    for cap, use_order in [(5, False), (1, False), (100, False), (7, True)]:
        got = {
            r["tile_id"]: (r["n_total"], r["n_kept"], r["n_overflow"], r["ids_csv"])
            for r in tile_bundle(
                df.repartition(9), cap,
                order_col="pri" if use_order else None,
            ).collect()
        }
        assert got == _oracle(rows, cap, use_order), (cap, use_order)


def test_salted_plan_identical_output(spark):
    rng = random.Random(7)
    # one hot tile (skew) + several sparse tiles
    rows = [(0, i, i % 3) for i in range(500)] + [
        (t + 100, i, o) for t, i, o in _mk_rows(rng, n_tiles=6)
    ]
    df = spark.createDataFrame(rows, "tile_id: long, id: long, pri: long")
    plain = sorted(tile_bundle(df, 10, order_col="pri").collect())
    salted = sorted(tile_bundle(df, 10, order_col="pri", salt_buckets=8).collect())
    assert plain == salted
    # and the salted totals are right for the hot tile
    hot = [r for r in salted if r["tile_id"] == 0][0]
    assert hot["n_total"] == 500 and hot["n_kept"] == 10 and hot["n_overflow"] == 490


def test_order_tiebreak_on_id(spark):
    # equal order values -> rank falls back to id ascending
    rows = [(1, 30, 0), (1, 10, 0), (1, 20, 0)]
    df = spark.createDataFrame(rows, "tile_id: long, id: long, pri: long")
    r = tile_bundle(df, 2, order_col="pri").collect()[0]
    assert r["ids_csv"] == "10,20"


def test_cap_validation(spark):
    df = spark.createDataFrame([(1, 1)], "tile_id: long, id: long")
    import pytest

    with pytest.raises(ValueError):
        tile_bundle(df, 0)


def test_single_shuffle_unsalted(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], "tile_id: long, id: long")
    plan = tile_bundle(df, 5)._jdf.queryExecution().executedPlan().toString()
    # the groupBy must reuse the window's hash partitioning: exactly one
    # exchange on the tile key (plus nothing else)
    assert plan.count("Exchange hashpartitioning") == 1, plan
