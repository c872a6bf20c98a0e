"""Explicit StructTypes for every engine table — never inferred.

The reference projects ORC onto case classes at analysis time
(`spark.read.orc(...).as[ObjectVersion]`, /root/reference/src/main/scala/com/
michaelsteffen/osm/historyanalysis/SparkJobs.scala:15; record layout at
osmdata/ObjectVersion.scala:3-17). The rebuild's equivalent is this module:
one authoritative StructType per logical dataset (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Graft primary input (BASELINE.json input_hint, bit-exact column set)
# ---------------------------------------------------------------------------
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), False),
    ]
)

POINT = T.StructType(
    [
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ]
)

# Mirrors reference Bbox(min: Point, max: Point)
# (/root/reference/.../osmdata/Bbox.scala:4-9; Athena DDL README.md:92).
BBOX = T.StructType(
    [
        T.StructField("min", POINT, False),
        T.StructField("max", POINT, False),
    ]
)

POLYGONS = T.StructType(
    [
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("ring", T.ArrayType(POINT, containsNull=False), False),
        T.StructField("bbox", BBOX, False),
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
    ]
)

TILES = T.StructType(
    [
        T.StructField("tile_id", T.LongType(), False),
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType(), False),
        T.StructField("bounds", BBOX, False),
    ]
)

# ---------------------------------------------------------------------------
# Versioned-entity history — graft analog of the reference ObjectVersion
# (/root/reference/.../osmdata/ObjectVersion.scala:3-17). `id` carries the packed
# 63-bit type+id encoding (OSMDataUtils.scala:5-15).
# ---------------------------------------------------------------------------
MEMBER_REF = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

OBJECT_VERSIONS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # packed type+id
        T.StructField("type", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("visible", T.BooleanType(), False),
        T.StructField(
            "tags", T.MapType(T.StringType(), T.StringType(), valueContainsNull=True), True
        ),
        T.StructField("lon", T.DoubleType(), True),  # nodes only
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("children", T.ArrayType(MEMBER_REF, containsNull=False), True),
        T.StructField("changeset", T.LongType(), False),
    ]
)

# Output fact table — mirrors the reference Change record
# (/root/reference/.../changes/Change.scala:5-15; Athena DDL README.md:85-99).
CHANGES = T.StructType(
    [
        T.StructField("featureID", T.LongType(), False),
        T.StructField("changeType", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField(
            "tagsBefore", T.MapType(T.StringType(), T.StringType(), True), True
        ),
        T.StructField(
            "tagChanges", T.MapType(T.StringType(), T.StringType(), True), True
        ),
        T.StructField("bbox", BBOX, True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("changeset", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# Change-type taxonomy (ChangeUtils.scala:9-18; decode table README.md:103-117).
FEATURE_CREATE = 0
FEATURE_DELETE = 1
TAG_ADD = 2
TAG_DELETE = 3
TAG_CHANGE = 4
NODE_MOVE = 5
NODE_ADD = 6
NODE_REMOVE = 7
MEMBER_ADD = 8
MEMBER_REMOVE = 9

CHANGE_TYPE_NAMES = {
    FEATURE_CREATE: "FEATURE_CREATE",
    FEATURE_DELETE: "FEATURE_DELETE",
    TAG_ADD: "TAG_ADD",
    TAG_DELETE: "TAG_DELETE",
    TAG_CHANGE: "TAG_CHANGE",
    NODE_MOVE: "NODE_MOVE",
    NODE_ADD: "NODE_ADD",
    NODE_REMOVE: "NODE_REMOVE",
    MEMBER_ADD: "MEMBER_ADD",
    MEMBER_REMOVE: "MEMBER_REMOVE",
}
