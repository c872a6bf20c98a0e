"""Temporal parent tree + propagation vs a hand-traced fixture.

Mirrors the reference's intended semantics (RefUtilsTest.scala:6-36 spec list,
SURVEY.md §2.9 Q1/Q2): one version per distinct event timestamp, boundary-equal
events included, geometry = latest status <= boundary; propagation assigns each
change to the version in effect at its timestamp (clamped to version 1 for
pre-history changes) and forwards it to that version's parents.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine import cells, diff, propagate, schema, temporal

T1 = dt.datetime(2017, 1, 1)
T2 = dt.datetime(2017, 2, 1)
T3 = dt.datetime(2017, 3, 1)

N1 = 1
N5 = 5
W10 = cells.WAY_OFFSET + 10
R20 = cells.RELATION_OFFSET + 20


def _ov(id, type, version, ts, visible=True, tags=None, lon=None, lat=None,
        children=None, changeset=0):
    return {
        "id": id, "type": type, "version": version, "timestamp": ts,
        "visible": visible, "tags": tags or {}, "lon": lon, "lat": lat,
        "children": children, "changeset": changeset,
    }


def _mr(ref, type="node", role=""):
    return {"type": type, "ref": ref, "role": role}


@pytest.fixture(scope="module")
def objs(spark):
    rows = [
        # feature node 1: created T1, moved T3
        _ov(N1, "node", 1, T1, tags={"name": "a"}, lon=1.0, lat=1.0, changeset=11),
        _ov(N1, "node", 2, T3, tags={"name": "a"}, lon=2.0, lat=2.0, changeset=12),
        # non-feature node 5 (referenced by the way from T2)
        _ov(N5, "node", 1, T1, tags={}, lon=3.0, lat=3.0, changeset=13),
        # way 10: child n1 at T1; adds n5 at T2
        _ov(W10, "way", 1, T1, tags={"highway": "x"},
            children=[_mr(1)], changeset=21),
        _ov(W10, "way", 2, T2, tags={"highway": "x"},
            children=[_mr(1), _mr(5)], changeset=22),
        # relation 20: member way 10 from T2 (multipolygon -> has geometry)
        _ov(R20, "relation", 1, T2, tags={"type": "multipolygon", "name": "r"},
            children=[_mr(10, "way", "outer")], changeset=31),
    ]
    return spark.createDataFrame(rows, schema=schema.OBJECT_VERSIONS)


def test_ref_changes(objs):
    rc = {
        (r["childID"], r["parentID"], r["timestamp"], r["changeType"])
        for r in temporal.ref_changes(objs).collect()
    }
    assert rc == {
        (N1, W10, T1, temporal.REF_ADD),
        (N5, W10, T2, temporal.REF_ADD),
        (W10, R20, T2, temporal.REF_ADD),
    }


def test_ref_tree_versions(objs):
    tree = temporal.ref_tree(
        temporal.ref_changes(objs), temporal.geometry_statuses(objs)
    ).collect()
    t = {(r["id"], r["timestamp"]): (r["hasGeometry"], sorted(r["parents"]))
         for r in tree}
    # node 1: one version at T1 (its ADD), parents [W10], nodes carry no geometry flag
    assert t[(N1, T1)] == (False, [W10])
    # node 5: one version at T2
    assert t[(N5, T2)] == (False, [W10])
    # way 10: boundary at T1 (own geometry event), parents []; at T2 parents [R20]
    assert t[(W10, T1)] == (True, [])
    assert t[(W10, T2)] == (True, [R20])
    # relation 20 has no ref events -> dropped (RefUtils.scala:45-48)
    assert all(r["id"] != R20 for r in tree)
    assert len(tree) == 4


def test_ref_tree_boundary_events_included(spark):
    """Q1: an event exactly at the boundary timestamp must be applied (the reference
    walk drops it; the intended semantics include it)."""
    refs = spark.createDataFrame(
        [
            {"childID": 1, "parentID": 100, "changeset": 1, "timestamp": T1,
             "changeType": temporal.REF_ADD},
            {"childID": 1, "parentID": 200, "changeset": 2, "timestamp": T1,
             "changeType": temporal.REF_ADD},
            {"childID": 1, "parentID": 100, "changeset": 3, "timestamp": T2,
             "changeType": temporal.REF_DELETE},
        ]
    )
    geoms = spark.createDataFrame(
        [{"id": 1, "timestamp": T1, "hasGeometry": True}]
    )
    t = {r["timestamp"]: sorted(r["parents"])
         for r in temporal.ref_tree(refs, geoms).collect()}
    assert t[T1] == [100, 200]  # both same-ts ADDs applied at the T1 boundary
    assert t[T2] == [200]


def test_ref_tree_simultaneous_add_remove(spark):
    """Consolidation of contemporaneous changes (RefUtilsTest.scala:21-35 spec):
    add+remove at the same timestamp nets to absent."""
    refs = spark.createDataFrame(
        [
            {"childID": 1, "parentID": 100, "changeset": 1, "timestamp": T1,
             "changeType": temporal.REF_ADD},
            {"childID": 1, "parentID": 100, "changeset": 1, "timestamp": T1,
             "changeType": temporal.REF_DELETE},
        ]
    )
    geoms = spark.createDataFrame([{"id": 1, "timestamp": T1, "hasGeometry": False}])
    t = temporal.ref_tree(refs, geoms).collect()
    assert len(t) == 1 and t[0]["parents"] == []


def test_propagation_end_to_end(objs):
    out = propagate.propagate_changes(objs, do_coalesce=False).collect()
    key = lambda r: (r["featureID"], r["changeType"], r["depth"])
    got = {key(r) for r in out}
    # depth 0: first-order saves
    assert (N1, schema.FEATURE_CREATE, 0) in got
    assert (N1, schema.NODE_MOVE, 0) in got
    assert (W10, schema.FEATURE_CREATE, 0) in got
    assert (W10, schema.NODE_ADD, 0) in got
    assert (R20, schema.FEATURE_CREATE, 0) in got
    # depth 1: node1's move lands on way10 (version T2, has geometry)
    assert (W10, schema.NODE_MOVE, 1) in got
    # REFERENCE PARITY: relation 20 is nobody's child -> absent from the ref tree
    # (RefUtils.scala:45-48), so changes propagating INTO it are dropped by the
    # round-2 inner join. Its own first-order CREATE still saves at depth 0.
    assert (R20, schema.NODE_ADD, 1) not in got
    assert (R20, schema.NODE_MOVE, 2) not in got
    # node5's pre-history move clamps to way10's first version (reference walk
    # behavior) and surfaces as a way-level move at depth 1
    mv_w = [r for r in out if key(r) == (W10, schema.NODE_MOVE, 1)]
    assert {r["timestamp"] for r in mv_w} == {T1, T3}
    assert all(r["depth"] <= 1 for r in out)


def test_propagation_keeps_rootless_when_asked(objs):
    """drop_rootless=False (documented improvement): top-level features receive
    propagated changes instead of losing them at the inner join."""
    out = propagate.propagate_changes(
        objs, do_coalesce=False, drop_rootless=False
    ).collect()
    got = {(r["featureID"], r["changeType"], r["depth"]) for r in out}
    assert (R20, schema.NODE_ADD, 1) in got  # way10's member add reaches R20
    assert (R20, schema.NODE_MOVE, 2) in got  # node1's move: node -> way -> relation
    assert all(r["depth"] <= 2 for r in out)


def test_propagation_coalesced_conserves_counts(objs):
    raw = propagate.propagate_changes(objs, do_coalesce=False)
    coalesced = propagate.propagate_changes(objs, do_coalesce=True)
    assert (
        raw.agg(F.sum("count")).first()[0]
        == coalesced.agg(F.sum("count")).first()[0]
    )


def test_rollup_cells(spark):
    from engine import synth

    pts = synth.images_df(spark, 2000).select(
        cells.grid_encode_phash(F.col("phash"), 11).alias("cell")
    )
    out = propagate.rollup_cells(pts, 11, 7)
    counts = {r["res"]: r["total"] for r in
              out.groupBy("res").agg(F.sum("n").alias("total")).collect()}
    assert counts == {r: 2000 for r in range(7, 12)}
    # parent arithmetic consistency: res-7 rollup equals direct encode at res 7
    direct = (
        synth.images_df(spark, 2000)
        .select(cells.grid_encode_phash(F.col("phash"), 7).alias("cell"))
        .groupBy("cell")
        .count()
    )
    rolled = out.filter(F.col("res") == 7).select("cell", F.col("n").alias("count"))
    assert direct.exceptAll(rolled).isEmpty() and rolled.exceptAll(direct).isEmpty()
