"""First-order change generation vs hand-computed goldens — ports the reference's
fixture style (OSMDataUtilsTest.scala:33-68, ObjectVersionTest.scala:21-50,
RefUtilsTest.scala:7-15) to the rebuild, under the intended semantics of
SURVEY.md §2.9 (Q1-Q4)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine import cells, coalesce, diff, schema

T1 = dt.datetime(2017, 1, 1)
T2 = dt.datetime(2017, 2, 1)
T3 = dt.datetime(2017, 3, 1)
T4 = dt.datetime(2017, 4, 1)

WAY2 = cells.WAY_OFFSET + 2
REL3 = cells.RELATION_OFFSET + 3


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
def changes(spark):
    rows = [
        # node 1: create -> tag add + move -> tag change -> delete
        _ov(1, "node", 1, T1, tags={"name": "a"}, lon=10.0, lat=20.0, changeset=100),
        _ov(1, "node", 2, T2, tags={"name": "a", "amenity": "cafe"},
            lon=11.0, lat=21.0, changeset=101),
        _ov(1, "node", 3, T3, tags={"name": "b", "amenity": "cafe"},
            lon=11.0, lat=21.0, changeset=102),
        _ov(1, "node", 4, T4, visible=False,
            tags={"name": "b", "amenity": "cafe"}, lon=11.0, lat=21.0, changeset=103),
        # node 5: never a feature; first version has coords -> propagate-only move
        _ov(5, "node", 1, T1, tags={}, lon=1.0, lat=2.0, changeset=200),
        # way 2: create, then +2 children -1 child
        _ov(WAY2, "way", 1, T1, tags={"highway": "x"},
            children=[_mr(1), _mr(5)], changeset=300),
        _ov(WAY2, "way", 2, T2, tags={"highway": "x"},
            children=[_mr(1), _mr(6), _mr(7)], changeset=301),
        # relation 3: multipolygon-only tags (not a feature), becomes feature at v2
        _ov(REL3, "relation", 1, T1, tags={"type": "multipolygon"},
            children=[_mr(9, "way", "outer")], changeset=400),
        _ov(REL3, "relation", 2, T2,
            tags={"type": "multipolygon", "name": "r"},
            children=[_mr(9, "way", "outer"), _mr(10, "way", "inner")], changeset=401),
        # node 7: same-timestamp tie -> ordered by version (Q4)
        _ov(7, "node", 1, T1, tags={"a": "1"}, lon=0.0, lat=0.0, changeset=500),
        _ov(7, "node", 2, T1, tags={"a": "1", "b": "2"}, lon=0.0, lat=0.0,
            changeset=501),
    ]
    df = spark.createDataFrame(rows, schema=schema.OBJECT_VERSIONS)
    return diff.first_order_changes(df).collect()


def _by(changes, fid, ctype):
    return [c for c in changes if c["featureID"] == fid and c["changeType"] == ctype]


def test_feature_create(changes):
    c = _by(changes, 1, schema.FEATURE_CREATE)
    assert len(c) == 1
    c = c[0]
    assert c["tagsBefore"] == {} and c["tagChanges"] == {"name": "a"}
    assert c["count"] == 1 and c["changeset"] == 100 and c["save"]
    assert not c["propagate"]
    assert c["bbox"]["min"]["lon"] == 10.0 and c["bbox"]["max"]["lat"] == 20.0


def test_tag_add_and_node_move(changes):
    add = _by(changes, 1, schema.TAG_ADD)
    assert len(add) == 1
    assert add[0]["tagChanges"] == {"amenity": "cafe"}
    assert add[0]["tagsBefore"] == {"name": "a"}
    assert add[0]["count"] == 1 and not add[0]["propagate"]
    mv = _by(changes, 1, schema.NODE_MOVE)
    assert len(mv) == 1
    # nonTagChange: tagsBefore = after.tags, tagChanges = {} (Change.scala:18-25)
    assert mv[0]["tagsBefore"] == {"name": "a", "amenity": "cafe"}
    assert mv[0]["tagChanges"] == {}
    assert mv[0]["save"] and mv[0]["propagate"]


def test_tag_change(changes):
    ch = _by(changes, 1, schema.TAG_CHANGE)
    assert len(ch) == 1
    assert ch[0]["tagChanges"] == {"name": "b"}
    assert ch[0]["tagsBefore"] == {"name": "a", "amenity": "cafe"}
    assert ch[0]["changeset"] == 102


def test_feature_delete_recorded_against_prior(changes):
    d = _by(changes, 1, schema.FEATURE_DELETE)
    assert len(d) == 1
    d = d[0]
    # ChangeUtils.scala:33-38: the delete carries the PRIOR version's fields
    assert d["timestamp"] == T3 and d["changeset"] == 102
    assert d["tagsBefore"] == {"name": "b", "amenity": "cafe"}
    assert d["tagChanges"] == {}


def test_nonfeature_node_move_propagates_only(changes):
    mv = _by(changes, 5, schema.NODE_MOVE)
    assert len(mv) == 1
    assert not mv[0]["save"] and mv[0]["propagate"]
    others = [c for c in changes if c["featureID"] == 5 and c["changeType"] != schema.NODE_MOVE]
    assert all(not c["save"] for c in others)


def test_way_child_diffs(changes):
    assert len(_by(changes, WAY2, schema.FEATURE_CREATE)) == 1
    add = _by(changes, WAY2, schema.NODE_ADD)
    rem = _by(changes, WAY2, schema.NODE_REMOVE)
    assert len(add) == 1 and add[0]["count"] == 2
    assert len(rem) == 1 and rem[0]["count"] == 1
    assert add[0]["save"] and add[0]["propagate"]
    assert add[0]["bbox"] is None  # ways have no coords


def test_multipolygon_only_not_a_feature(changes):
    # v1 is not a feature -> no CREATE at T1; v2 becomes feature -> CREATE at T2,
    # and the create branch short-circuits member diffs (ChangeUtils.scala:27-45)
    cr = _by(changes, REL3, schema.FEATURE_CREATE)
    assert len(cr) == 1 and cr[0]["timestamp"] == T2
    # the create branch short-circuits the member diff at T2; v1's member add (vs the
    # empty prior) survives only in the propagate arm (ChangeUtils.scala:47-49,158-171)
    ma = _by(changes, REL3, schema.MEMBER_ADD)
    assert len(ma) == 1 and ma[0]["timestamp"] == T1
    assert not ma[0]["save"] and ma[0]["propagate"]
    # nothing from v1 may reach the save arm (non-feature)
    saved_t1 = [c for c in changes if c["featureID"] == REL3 and c["save"]
                and c["timestamp"] == T1]
    assert saved_t1 == []


def test_same_timestamp_ordered_by_version(changes):
    cr = _by(changes, 7, schema.FEATURE_CREATE)
    add = _by(changes, 7, schema.TAG_ADD)
    assert len(cr) == 1 and cr[0]["changeset"] == 500
    assert len(add) == 1 and add[0]["changeset"] == 501
    assert add[0]["tagChanges"] == {"b": "2"}


def test_order_invariance(spark, changes):
    """Property from SURVEY.md §5.4: output independent of input row order."""
    rows = [
        _ov(1, "node", 1, T1, tags={"name": "a"}, lon=10.0, lat=20.0, changeset=100),
        _ov(1, "node", 2, T2, tags={"name": "a", "amenity": "cafe"},
            lon=11.0, lat=21.0, changeset=101),
        _ov(1, "node", 3, T3, tags={"name": "b", "amenity": "cafe"},
            lon=11.0, lat=21.0, changeset=102),
    ]
    a = diff.first_order_changes(
        spark.createDataFrame(rows, schema=schema.OBJECT_VERSIONS)
    ).collect()
    b = diff.first_order_changes(
        spark.createDataFrame(rows[::-1], schema=schema.OBJECT_VERSIONS).repartition(3)
    ).collect()
    key = lambda c: (c["featureID"], c["changeType"], str(c["timestamp"]))
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_coalesce_counts_and_bbox_union(spark):
    ch_rows = [
        dict(featureID=1, changeType=5, count=1, tagsBefore={"a": "1"}, tagChanges={},
             bbox={"min": {"lon": 75.0, "lat": 35.0}, "max": {"lon": 76.0, "lat": 38.0}},
             timestamp=T1, changeset=9, depth=0),
        dict(featureID=1, changeType=5, count=2, tagsBefore={"b": "2"}, tagChanges={},
             bbox={"min": {"lon": 75.5, "lat": 37.0}, "max": {"lon": 77.0, "lat": 39.0}},
             timestamp=T2, changeset=9, depth=0),
        dict(featureID=1, changeType=2, count=1, tagsBefore={}, tagChanges={"c": "3"},
             bbox=None, timestamp=T1, changeset=9, depth=0),
    ]
    df = spark.createDataFrame(ch_rows, schema=schema.CHANGES)
    out = {(r["changeType"]): r for r in coalesce.coalesce_changes(df).collect()}
    m = out[5]
    # BboxTest.scala:7-12 union fixture: (75,35)-(76,38) U (75.5,37)-(77,39)
    assert m["count"] == 3 and m["timestamp"] == T2
    assert m["bbox"]["min"]["lon"] == 75.0 and m["bbox"]["min"]["lat"] == 35.0
    assert m["bbox"]["max"]["lon"] == 77.0 and m["bbox"]["max"]["lat"] == 39.0
    assert m["tagsBefore"] == {"a": "1"}  # earliest change's tags survive
    assert out[2]["bbox"] is None


def test_coalesce_count_conservation(spark):
    """Property: sum(count) preserved through coalescing."""
    ovs = __import__("engine.synth", fromlist=["synth"]).object_versions_df(
        spark, n_entities=60
    )
    ch = diff.changes_to_save(diff.first_order_changes(ovs))
    total_before = ch.agg(F.sum("count")).first()[0]
    total_after = coalesce.coalesce_changes(ch).agg(F.sum("count")).first()[0]
    assert total_before == total_after
