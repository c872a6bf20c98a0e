"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline on /root/testdata/sf0.001 (phash-derived anchors
                 -> grid-cell encode -> PIP join -> per-polygon rollup).
queries()     -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB-runnable ANSI-SQL twins for the driver's correctness gate.

Cross-engine determinism rules used throughout (so value-hashes match exactly):
- all synthetic keys/phashes derive from integer Column math with an ANSI-SQL twin
  (engine.cells.synth_phash / synth_phash_sql);
- aggregate sums over floats are computed as int64 sums of per-row FLOOR-scaled
  values (per-row double ops are IEEE-identical across engines; float SUM order
  is not);
- timestamps are emitted as epoch microseconds (int64).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine import cells, joins, synth


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _ensure_utc(spark: SparkSession) -> None:
    """The driver calls queries() with ITS OWN session; epoch-micros comparisons
    against DuckDB (naive-UTC) are only exact when the NTZ->TZ cast happens in
    UTC. Force it (harmless if already UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _epoch_us(col):
    """Epoch microseconds from TIMESTAMP or TIMESTAMP_NTZ (requires session tz
    UTC — see _ensure_utc; the NTZ -> TZ cast is then identity on the wall-clock
    value)."""
    return F.unix_micros(col.cast("timestamp"))

def _docs_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, phash, lon, lat, x, y) via the deterministic pseudo-phash
    (graft: every image is geotagged via its phash-derived anchor point)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.col("doc_id").cast("long")
    ph = cells.synth_phash(key)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        ph.alias("phash"),
        cells.anchor_lon(ph).alias("lon"),
        cells.anchor_lat(ph).alias("lat"),
        cells.phash_x(ph).alias("x"),
        cells.phash_y(ph).alias("y"),
    )


_DOCS_POINTS_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {cells.synth_phash_sql('doc_id')} AS phash
FROM documents
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 documents -> anchors -> res-9 cells -> PIP join against the
    deterministic polygon fixture -> per-polygon counts + bbox union."""
    pts = _docs_points(spark, "/root/testdata/sf0.001")
    polys = synth.polygons_df(spark, p=48, hot_frac=0.0, radius_scale=3.0)
    joined = joins.pip_join(pts, polys, res_min=4, res_max=9)
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("n_points"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
    )


# ---------------------------------------------------------------------------
# queries — each returns a DataFrame; names/aliases match oracle_sql exactly
# ---------------------------------------------------------------------------
def q_pack_feature_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — packed 63-bit type+id (OSMDataUtils.scala:5-15) + range recovery."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    typ = (
        F.when(F.col("o_orderkey") % 3 == 0, "node")
        .when(F.col("o_orderkey") % 3 == 1, "way")
        .otherwise("relation")
    )
    packed = cells.pack_feature_id(F.col("o_orderkey").cast("long"), typ)
    return (
        o.select(
            packed.alias("packed"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
        )
        .withColumn("is_way", cells.is_way(F.col("packed")))
        .withColumn("raw_id", cells.unpack_raw_id(F.col("packed")))
    )


def q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell encode at res 9 (pure int Column math) + per-cell counts — the
    scan->encode->agg core of the flagship (SURVEY.md §2.2 P4 graft analog)."""
    pts = _docs_points(spark, sf_dir)
    return (
        pts.select(cells.grid_encode_phash(F.col("phash"), 9).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
    )


def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup res 11 -> res 7 (the propagation analog, SparkJobs.scala:48-70):
    encode fine, roll up via pure parent arithmetic, aggregate per ancestor."""
    pts = _docs_points(spark, sf_dir)
    fine = pts.select(cells.grid_encode_phash(F.col("phash"), 11).alias("cell11"))
    return (
        fine.select(cells.grid_parent(F.col("cell11"), 4).alias("cell7"))
        .groupBy("cell7")
        .agg(F.count("*").alias("n_points"))
    )


def q_cell_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell encode + hierarchy rollup in one row (merged from the
    standalone cell_encode/cell_rollup rows to free a slot — VERDICT r3 item 6
    discipline): res-9 per-cell counts UNION the res-11 -> res-7 parent rollup
    (SparkJobs.scala:48-70 analog), tagged by a res column."""
    enc = q_cell_encode(spark, sf_dir).select(
        F.lit(9).cast("long").alias("res"), "cell", "n_points"
    )
    rol = q_cell_rollup(spark, sf_dir).select(
        F.lit(7).cast("long").alias("res"),
        F.col("cell7").alias("cell"),
        "n_points",
    )
    return enc.unionByName(rol)


def q_trip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory trip segmentation (engine.trajectory.trip_segments): the
    events stream as device fixes — user_id is the device, lon/lat derive
    deterministically from event_id via the cross-engine md5 hash — split
    into trips at >240 min gaps, with geodesic length in FLOOR-scaled integer
    millimeters (the knn_haversine-proven haversine twin, no raw double
    sums). Window-only: one shuffle on the entity key."""
    from engine import textops, trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    hx = textops.cross_hash(eid, "md5")
    hy = textops.cross_hash(F.concat(eid, F.lit("y")), "md5")
    pts = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        _epoch_us(F.col("ts")).alias("ts_us"),
        (F.pmod(hx, F.lit(360000)) / F.lit(1000.0) - F.lit(180.0)).alias("lon"),
        (F.pmod(hy, F.lit(170000)) / F.lit(1000.0) - F.lit(85.0)).alias("lat"),
    )
    out = trajectory.trip_segments(pts, id_col="user_id", gap_minutes=240.0)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("trip_idx").cast("long").alias("trip_idx"),
        F.col("start_us").cast("long").alias("start_us"),
        F.col("end_us").cast("long").alias("end_us"),
        F.col("duration_us").cast("long").alias("duration_us"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("length_mm").cast("long").alias("length_mm"),
    )


def trip_stats_sql() -> str:
    """DuckDB twin of q_trip_stats (same md5-derived lon/lat, same window
    order, same haversine + FLOOR-mm legs)."""
    from engine import textops, trajectory

    hx = textops.cross_hash_sql("CAST(event_id AS VARCHAR)")
    hy = textops.cross_hash_sql("CAST(event_id AS VARCHAR) || 'y'")
    inner = f"""(
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               (({hx}) % 360000) / 1000.0 - 180.0 AS lon,
               (({hy}) % 170000) / 1000.0 - 85.0 AS lat
        FROM events
    ) pts"""
    return trajectory.trip_segments_sql(
        inner, "user_id", "ts_us", "lon", "lat",
        gap_minutes=240.0, out_id="user_id",
    )


def q_anchor_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — bbox-union aggregate (Bbox.scala:5-8) as 4 min/max aggs per group."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = F.col("doc_id").cast("long")
    ph = cells.synth_phash(key)
    return (
        docs.select(
            F.col("lang"),
            cells.anchor_lon(ph).alias("lon"),
            cells.anchor_lat(ph).alias("lat"),
        )
        .groupBy("lang")
        .agg(
            F.min("lon").alias("min_lon"),
            F.max("lon").alias("max_lon"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
            F.count("*").alias("n"),
        )
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-style partial+final hash aggregation (TPC-H Q1 shape). Money sums as int64
    cents (cross-engine exact)."""
    _ensure_utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("sum_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — top-k per group via window row_number (deterministic tie-break)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "l_returnflag",
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def q_consecutive_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — consecutive-version diff via lag() (RefUtils.scala:11-42 rebuilt as a
    window): per user, emit transition rows where event_type changed."""
    _ensure_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return d.filter(
        F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type"))
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        _epoch_us(F.col("ts")).alias("ts_us"),
        "prev_type",
        "event_type",
    )


def q_change_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 — the 10-type change classifier shape: per consecutive event pair,
    classify into create/delete/value-up/value-down/retype (Column-only CASE over
    lagged columns; analog of ChangeUtils.scala:21-55)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_value", F.lag("value").over(w))
    )
    change_type = (
        F.when(F.col("prev_type").isNull(), 0)  # CREATE
        .when(F.col("prev_type") != F.col("event_type"), 4)  # RETYPE (tag-change analog)
        .when(F.col("value") > F.col("prev_value"), 2)  # VALUE_UP (add analog)
        .when(F.col("value") < F.col("prev_value"), 3)  # VALUE_DOWN (delete analog)
        .otherwise(9)
    )
    return (
        d.withColumn("change_type", change_type.cast("long"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
    )


def q_coalesce_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — coalesce fact rows per (entity, kind) with count/sum/extent — the rebuild
    of coalesceChanges (ChangeUtils.scala:93-104) keyed on the real pair (Q3 fix)."""
    _ensure_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.col("user_id").cast("long").alias("user_id"), F.col("event_type")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        _epoch_us(F.min("ts")).alias("min_ts_us"),
        _epoch_us(F.max("ts")).alias("max_ts_us"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — as-of assignment via union+window (engine.joins.asof_join): each 'click'
    event gets the latest 'login' event timestamp <= its own, per user."""
    _ensure_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
    )
    right = ev.filter(F.col("event_type") == "login").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
        F.col("event_id").cast("long").alias("login_event_id"),
    )
    out = joins.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["login_event_id"],
    )
    return out.select(
        "event_id", "user_id", _epoch_us(F.col("ts")).alias("ts_us"), "login_event_id"
    )


def q_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 both variants in one registry row (merged round 4 to free a slot
    for `colocation`): the as-of assignment rows tagged 'asof', the
    interval-bucket counts tagged 'interval'. Each half unchanged from its
    previously-green standalone row."""
    asof = q_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("tag"),
        F.col("event_id").alias("a"),
        F.col("user_id").alias("b"),
        F.col("ts_us").alias("c"),
        F.col("login_event_id").alias("d"),
    )
    iv = q_interval_join(spark, sf_dir).select(
        F.lit("interval").alias("tag"),
        F.col("year").alias("a"),
        F.col("n_items").alias("b"),
        F.lit(-1).cast("long").alias("c"),
        F.lit(-1).cast("long").alias("d"),
    )
    return asof.unionByName(iv)


_COLOC_RADIUS = 3.0
_COLOC_GAP_US = 3_600_000_000  # 1 hour


def q_colocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatiotemporal co-location join (engine.trajectory.colocation_pairs):
    events as device fixes (md5-derived planar coords), entity pairs with
    fixes within 3 planar units and 1 hour — forward-offset space-time
    blocking generates each qualifying fix pair exactly once; the oracle is
    the brute-force O(n^2) self-join (blocking completeness is exactly the
    property under test). min_d2 rides FLOOR-scaled."""
    from engine import textops, trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    hx = textops.cross_hash(eid, "md5")
    hy = textops.cross_hash(F.concat(eid, F.lit("y")), "md5")
    fixes = ev.select(
        F.col("user_id").cast("long").alias("entity_id"),
        _epoch_us(F.col("ts")).alias("ts_us"),
        (F.pmod(hx, F.lit(100000)) / F.lit(1000.0)).alias("x"),
        (F.pmod(hy, F.lit(60000)) / F.lit(1000.0)).alias("y"),
    )
    out = trajectory.colocation_pairs(
        fixes, _COLOC_RADIUS, _COLOC_GAP_US
    )
    return out.select(
        "entity_a", "entity_b",
        F.col("n_meetings").cast("long").alias("n_meetings"),
        "first_us", "last_us",
        F.floor(F.col("min_d2") * 1000000.0).cast("long").alias("min_d2_e6"),
    )


def colocation_sql() -> str:
    """DuckDB twin of q_colocation: the exhaustive fix self-join with
    a.uid < b.uid ordering (each cross-entity unordered fix pair exactly
    once, mirroring the blocked plan's uniqueness guarantee)."""
    from engine import textops

    hx = textops.cross_hash_sql("CAST(event_id AS VARCHAR)")
    hy = textops.cross_hash_sql("CAST(event_id AS VARCHAR) || 'y'")
    r2 = repr(_COLOC_RADIUS * _COLOC_RADIUS)
    return f"""
        WITH f AS (
          SELECT CAST(user_id AS BIGINT) AS uid,
                 CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 (({hx}) % 100000) / 1000.0 AS x,
                 (({hy}) % 60000) / 1000.0 AS y
          FROM events
        ), hits AS (
          SELECT a.uid AS entity_a, b.uid AS entity_b,
                 LEAST(a.ts_us, b.ts_us) AS t0,
                 GREATEST(a.ts_us, b.ts_us) AS t1,
                 (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
          FROM f a JOIN f b ON a.uid < b.uid
          WHERE ABS(a.ts_us - b.ts_us) <= {_COLOC_GAP_US}
            AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                  <= {r2}
        )
        SELECT entity_a, entity_b, COUNT(*) AS n_meetings,
               MIN(t0) AS first_us, MAX(t1) AS last_us,
               CAST(FLOOR(MIN(d2) * 1000000.0) AS BIGINT) AS min_d2_e6
        FROM hits GROUP BY 1, 2
    """


def q_multiway_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — multi-way union of per-depth frames (SparkJobs.scala:73-76 analog)."""
    from functools import reduce

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    frames = [
        li.filter(F.col("l_returnflag") == flag)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"))
        .withColumn("depth", F.lit(i).cast("long"))
        for i, flag in enumerate(["A", "N", "R"])
    ]
    return reduce(DataFrame.unionByName, frames)


def q_dim_decode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — broadcast decode join against a literal dim table (README.md:101-124)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = spark.createDataFrame(
        [("click", "Click"), ("view", "View"), ("login", "Login"),
         ("purchase", "Purchase"), ("error", "Error")],
        ["event_type", "label"],
    )
    return (
        ev.join(F.broadcast(dim), "event_type", "left")
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


def q_pip_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 graft — PIP join against rectangular regions (broadcast dim + containment);
    rectangle variant is the SQL-expressible twin of the ray-cast PIP."""
    pts = _docs_points(spark, sf_dir)
    rects = spark.createDataFrame(
        [(i, -180.0 + i * 45.0, -90.0 + i * 20.0, -180.0 + i * 45.0 + 60.0,
          -90.0 + i * 20.0 + 50.0) for i in range(8)],
        ["rect_id", "lon0", "lat0", "lon1", "lat1"],
    )
    cond = (
        (F.col("lon") >= F.col("lon0")) & (F.col("lon") < F.col("lon1"))
        & (F.col("lat") >= F.col("lat0")) & (F.col("lat") < F.col("lat1"))
    )
    return (
        pts.join(F.broadcast(rects), cond, "inner")
        .groupBy(F.col("rect_id").cast("long").alias("rect_id"))
        .agg(F.count("*").alias("n_points"))
    )


def q_pip_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-MULTIPOLYGON join (engine.joins.pip_join_multiring): outer ring
    + hole (OSM relation outer/inner roles). Axis-aligned rect rings make the
    even-odd ray cast exactly the half-open rect predicate ([x0,x1) x [y0,y1)),
    so the full cover+refine pipeline is value-checkable in SQL."""
    pts = _docs_points(spark, sf_dir)
    polys = []
    for i in range(6):
        x0, y0 = -170.0 + i * 55.0, -80.0 + i * 25.0
        x1, y1 = x0 + 50.0, y0 + 40.0
        hx0, hy0, hx1, hy1 = x0 + 12.5, y0 + 10.0, x0 + 37.5, y0 + 30.0
        outer = [
            {"lon": x0, "lat": y0}, {"lon": x1, "lat": y0},
            {"lon": x1, "lat": y1}, {"lon": x0, "lat": y1},
        ]
        hole = [
            {"lon": hx0, "lat": hy0}, {"lon": hx1, "lat": hy0},
            {"lon": hx1, "lat": hy1}, {"lon": hx0, "lat": hy1},
        ]
        polys.append(
            {
                "poly_id": i,
                "bbox": {"min": {"lon": x0, "lat": y0}, "max": {"lon": x1, "lat": y1}},
                "rings": [outer, hole],
            }
        )
    pdf = spark.createDataFrame(
        polys,
        schema="poly_id long, bbox struct<min:struct<lon:double,lat:double>,"
               "max:struct<lon:double,lat:double>>, "
               "rings array<array<struct<lon:double,lat:double>>>",
    )
    joined = joins.pip_join_multiring(pts, pdf, res_min=4, res_max=9)
    return joined.groupBy(F.col("poly_id").cast("long").alias("poly_id")).agg(
        F.count("*").alias("n_points")
    )


def _overlay_rects(df, key_col, x_mult, x_mod, w_base, w_mult, w_mod,
                   y_mult, y_mod, h_base, h_mult, h_mod, frac):
    """Deterministic axis-aligned rect polygons from an integer key column.

    All coordinates land on int + frac; using distinct fracs for the two
    sides (.125 vs .375) guarantees NO coordinate ever coincides across
    sides, so closed-vs-open boundary semantics can't affect the result and
    the DuckDB interval-overlap twin is exact."""
    k = F.col(key_col).cast("long")
    x0 = F.lit(-180.0) + (k * x_mult % x_mod).cast("double") + F.lit(frac)
    w = (F.lit(w_base) + (k * w_mult % w_mod)).cast("double")
    y0 = F.lit(-90.0) + (k * y_mult % y_mod).cast("double") + F.lit(frac)
    h = (F.lit(h_base) + (k * h_mult % h_mod)).cast("double")
    x1, y1 = x0 + w, y0 + h
    pt = lambda lon, lat: F.struct(lon.alias("lon"), lat.alias("lat"))  # noqa: E731
    return df.select(
        k.alias("poly_id"),
        F.struct(pt(x0, y0).alias("min"), pt(x1, y1).alias("max")).alias("bbox"),
        F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1)).alias("ring"),
    )


def q_poly_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-polygon overlay join + polygon dissolve in one registry row
    (tagged union, same slot discipline as tile_ops/knn).

    'pair' half: engine.overlay.polygon_overlay_join over rect regions
    derived from nation (A) and supplier (B) keys; the full cover ->
    blocking-res equi-join -> SAT/refine pipeline is value-checkable
    against a DuckDB interval-overlap twin because the rect coordinate
    lattices of the two sides never coincide (.125 vs .375).

    'dissolve' half: engine.dissolve.rect_union_area (grid-partitioned
    numpy slab sweep) over int rects derived from orders keys, 150 groups;
    checked values are n_rects, the EXACT union area (overlaps counted
    once — the measure, not the sum), and the packed dissolved extent. The
    DuckDB twin is the INDEPENDENT slab-decomposition algorithm
    (rect_union_area_slabs' shape) in pure SQL — two different exact
    algorithms must hash-agree."""
    from engine import dissolve, overlay

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    pa = _overlay_rects(nation, "n_nationkey", 37, 300, 20, 13, 40,
                        23, 120, 15, 7, 30, 0.125)
    pb = _overlay_rects(supplier, "s_suppkey", 53, 310, 10, 11, 30,
                        31, 130, 8, 17, 20, 0.375)
    out = overlay.polygon_overlay_join(
        pa, pb, convex_a=True, convex_b=True, res_min=3, res_max=8
    )
    pairs = out.select(
        F.lit("pair").alias("tag"),
        F.col("a_id").cast("long").alias("a_id"),
        F.col("b_id").cast("long").alias("b_id"),
        F.lit(-1).cast("long").alias("v"),
        F.lit(-1).cast("long").alias("w"),
    )

    k = F.col("o_orderkey").cast("long")
    rects = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (k % 150).alias("group_id"),
        ((k * 7919) % 20000).alias("x0"),
        ((k * 104729) % 20000).alias("y0"),
        ((k * 7919) % 20000 + 100 + (k * 31) % 1900).alias("x1"),
        ((k * 104729) % 20000 + 100 + (k * 53) % 1900).alias("y1"),
    )
    dis = dissolve.rect_union_area(rects, cell=4096)
    packed = (
        (F.col("minx") * 32768 + F.col("miny")) * 32768 + F.col("maxx")
    ) * 32768 + F.col("maxy")
    dis_rows = dis.select(
        F.lit("dissolve").alias("tag"),
        F.col("g").alias("a_id"),
        F.col("n_rects").alias("b_id"),
        F.col("union_area").alias("v"),
        packed.cast("long").alias("w"),
    )
    return pairs.unionByName(dis_rows)


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics: per-polygon aggregates of a per-point metric (the
    raster/vector composition a geospatial engine runs constantly) — PIP join
    (rect zones) feeding count / int64-scaled mean components / extent."""
    pts = _docs_points(spark, sf_dir)
    # deterministic per-point metric from the phash (int math)
    metric = (F.col("phash") % 1000).cast("long")
    rects = spark.createDataFrame(
        [(i, -180.0 + i * 45.0, -90.0 + i * 20.0, -180.0 + i * 45.0 + 60.0,
          -90.0 + i * 20.0 + 50.0) for i in range(8)],
        ["rect_id", "lon0", "lat0", "lon1", "lat1"],
    )
    cond = (
        (F.col("lon") >= F.col("lon0")) & (F.col("lon") < F.col("lon1"))
        & (F.col("lat") >= F.col("lat0")) & (F.col("lat") < F.col("lat1"))
    )
    return (
        pts.withColumn("metric", metric)
        .join(F.broadcast(rects), cond, "inner")
        .groupBy(F.col("rect_id").cast("long").alias("zone_id"))
        .agg(
            F.count("*").alias("n_points"),
            F.sum("metric").cast("long").alias("metric_sum"),
            F.min("metric").cast("long").alias("metric_min"),
            F.max("metric").cast("long").alias("metric_max"),
            F.count_distinct(cells.grid_encode_phash(F.col("phash"), 7))
             .alias("n_cells_r7"),
        )
    )


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-tile assignment at z=8 via pure integer math from phash (no floats)."""
    pts = _docs_points(spark, sf_dir)
    # integer-exact: tx = x div 2^(32-8), ty = y div 2^(31-8)
    tx = (F.col("x") / F.lit(2**24)).cast("long")
    ty = (F.col("y") / F.lit(2**23)).cast("long")
    return (
        pts.select((F.lit(8 * 2**50) + tx * F.lit(2**25) + ty).alias("tile_id"))
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
    )


def q_tile_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile bundling (engine.tiles.tile_bundle): per-tile capped feature
    packing — the vector-tile cut. Tiles are the res-7 grid cells of the
    phash anchors (pure int math, hash-stable); cap=8 features per tile in
    doc_id rank order, with total/kept/overflow accounting. One shuffle
    (window + groupBy share the tile hash partitioning)."""
    from engine.tiles import tile_bundle

    pts = _docs_points(spark, sf_dir)
    feats = pts.select(
        cells.grid_encode_phash(F.col("phash"), 7).alias("tile_id"), "doc_id"
    )
    return tile_bundle(feats, cap=8, tile_col="tile_id", id_col="doc_id")


def q_geom_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry measurement functions (engine.geomfns) driver-checked on
    exact arithmetic: per-nation polygons whose integer vertices derive from
    customer keys (first 64 customers per nation in key order). area2 is the
    exact integer shoelace (twice the area — no halving, stays BIGINT);
    perimeter sums floor-scaled IEEE sqrt segment lengths (correctly-rounded
    sqrt of exact-int doubles is engine-portable, per the repo's oracle
    determinism rules). The trig-based spherical/geodesic variants stay
    pytest-parity-checked (rel 1e-12) in tests/test_geomfns.py — JVM trig vs
    libm is not bit-stable, so they are kept out of the hash row."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    v = (
        cust.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 64)
        .select(
            F.col("c_nationkey").cast("long").alias("nk"),
            F.col("c_custkey").cast("long").alias("ck"),
            (F.col("c_custkey") % 199).cast("long").alias("vx"),
            ((F.col("c_custkey") * 37) % 181).cast("long").alias("vy"),
        )
    )
    poly = (
        v.groupBy("nk")
        .agg(F.sort_array(F.collect_list(F.struct("ck", "vx", "vy"))).alias("vs"))
        .filter(F.size("vs") >= 3)
        .select(
            "nk",
            F.transform("vs", lambda s: s["vx"]).alias("xs"),
            F.transform("vs", lambda s: s["vy"]).alias("ys"),
        )
    )
    # closing-edge included: pair each vertex with its rotated successor
    xr = F.concat(F.slice("xs", 2, F.size("xs") - 1), F.slice("xs", 1, 1))
    yr = F.concat(F.slice("ys", 2, F.size("ys") - 1), F.slice("ys", 1, 1))
    cross = F.zip_with(
        F.zip_with("xs", yr, lambda x, y2: x * y2),
        F.zip_with("ys", xr, lambda y, x2: y * x2),
        lambda a, b: a - b,
    )
    seg_e6 = F.zip_with(
        F.zip_with("xs", xr, lambda x, x2: x2 - x),
        F.zip_with("ys", yr, lambda y, y2: y2 - y),
        lambda dx, dy: F.floor(
            F.sqrt((dx * dx + dy * dy).cast("double")) * F.lit(1000000.0)
        ).cast("long"),
    )
    return poly.select(
        F.col("nk").alias("nationkey"),
        F.size("xs").cast("long").alias("n_vertices"),
        F.abs(F.aggregate(cross, F.lit(0).cast("long"), lambda a, x: a + x)).alias(
            "area2"
        ),
        F.aggregate(seg_e6, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "perimeter_e6"
        ),
        F.array_min("xs").cast("long").alias("min_x"),
        F.array_max("ys").cast("long").alias("max_y"),
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join (ring expansion, exact; engine.joins.knn_join): queries are every
    100th document, k=3 nearest document anchors (planar integer space)."""
    pts = _docs_points(spark, sf_dir)
    points = pts.select(F.col("doc_id").alias("point_id"), "x", "y")
    queries = pts.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "x", "y"
    )
    out = joins.knn_join(queries, points, k=3, max_radius=16)
    return out.select(
        "query_id", "point_id", F.col("rank").cast("long").alias("rank")
    )


def q_line_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-within-radius-of-polyline join (engine.lines.line_radius_join,
    int-exact arithmetic): document anchors folded into a 2^15 planar space,
    zigzag 4-vertex polylines derived from nation keys, radius 600. The
    cover -> cell equi-join -> integer-rational point-to-segment refine is
    hash-stable against a brute-force DuckDB twin running the identical
    int64 expressions (no floats anywhere in the checked path).

    The knn_geo registry row this replaces was redundant: knn_geo_brute_force
    IS the DuckDB twin of the knn_haversine row, and stays pytest-covered
    (tests/test_knn.py)."""
    from engine import lines as L

    pts = _docs_points(spark, sf_dir).select(
        F.col("doc_id").alias("point_id"),
        F.shiftrightunsigned(F.col("x"), 17).alias("x"),
        F.shiftrightunsigned(F.col("y"), 16).alias("y"),
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nk = F.col("n_nationkey").cast("long")
    verts = nation.select(
        nk.alias("line_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda j: F.struct(
                ((nk * 1973 + j * 4801) % 32768).cast("double").alias("x"),
                ((nk * 3271 + j * 6007) % 32768).cast("double").alias("y"),
            ),
        ).alias("pts"),
    )
    return L.line_radius_join(
        pts, verts, radius=600.0, arithmetic="int_exact"
    ).select(
        F.col("point_id").cast("long").alias("point_id"),
        F.col("line_id").cast("long").alias("line_id"),
    )


def q_knn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable geodesic kNN (engine.joins.knn_geo_join): ring expansion on a
    lon/lat grid with a wrap-aware haversine settle guarantee — the scale
    path; result-identical to the brute-force haversine oracle (the SQL twin
    IS the brute force). res forced so the ring machinery actually runs at
    test scale (the auto-sizer would short-circuit small inputs to the
    broadcast brute force); max_radius=1 keeps it to two ring rounds + the
    brute-force residue — all three phases exercised, half the per-round
    driver latency the tiny input would otherwise pay (results are
    res/max_radius-invariant by the settle-guarantee construction)."""
    pts = _docs_points(spark, sf_dir)
    queries = pts.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"), "lon", "lat"
    )
    points = pts.select(F.col("doc_id").alias("point_id"), "lon", "lat")
    out = joins.knn_geo_join(queries, points, k=3, res=3, max_radius=1)
    return out.select(
        "query_id", "point_id", F.col("rank").cast("long").alias("rank"),
        F.floor(F.col("dist_m") * 1000).cast("long").alias("dist_mm"),
    )


_HOTSPOT_RES = 8
_HOTSPOT_TILE = 90.0
# viewshed half of raster_field: 3 busiest pixels as observers, 6-cell
# circular range, eyes 2 count-units above terrain (radius <= res required)
_VIS_N_OBS = 3
_VIS_RADIUS = 6
_VIS_HEIGHT = 2
# edt half: proximity to cells holding >= 2 documents, same 6-cell radius
_EDT_MIN_Z = 2
# burn half: diamonds rasterized around the 3 busiest pixels (scanline fill)
_BURN_N = 3


def _hotspot_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared raster input for hotspot_cells / tile_pyramid: document anchor
    points binned onto a 90-degree tile grid at res=8 (engine.raster.
    heatmap_tiles — half-open cells, dense int64 counts per nonempty tile)."""
    from engine import raster

    pts = _docs_points(spark, sf_dir)
    return raster.heatmap_tiles(
        pts, tile_size=_HOTSPOT_TILE, res=_HOTSPOT_RES, x_col="lon", y_col="lat"
    )


def q_hotspot_cells(
    spark: SparkSession, sf_dir: str, tiles: DataFrame | None = None
) -> DataFrame:
    """Rasterize -> focal -> Getis-Ord Gi* end to end on the PRODUCTION halo
    kernel (engine.raster.heatmap_tiles + engine.focal.focal_sum/gi_star):
    one row per global pixel of the study area with its count, exact-int64
    3x3 focal sum, and FLOOR-scaled Gi* z (the oracle recomputes the whole
    pipeline with the independent scatter algebra + SQL moments; z is
    bit-stable because every input to the formula is exact int64 and the
    double expression graphs match op for op)."""
    from engine import focal

    res = _HOTSPOT_RES
    # persisted: the raster feeds gi_star's three consumers + the join below
    # (q_raster_field passes its own shared persisted raster instead)
    if tiles is None:
        tiles = _hotspot_tiles(spark, sf_dir).persist()
    zs = focal.gi_star(tiles, res, radius=1, kernel="halo", keep_fs=True)
    j = tiles.join(zs, ["tx", "ty"])
    ex = j.select(
        "tx", "ty",
        F.posexplode(F.arrays_zip("counts", "fs", "z")).alias("pix", "v"),
    )
    return ex.select(
        (F.col("tx") * res + F.pmod(F.col("pix"), res)).cast("long").alias("gx"),
        (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long").alias("gy"),
        F.col("v.counts").cast("long").alias("n"),
        F.col("v.fs").cast("long").alias("fs"),
        F.floor(F.col("v.z") * 1000000.0).cast("long").alias("z_e6"),
    )


def q_tile_pyramid(
    spark: SparkSession, sf_dir: str, tiles: DataFrame | None = None
) -> DataFrame:
    """Tile-pyramid rollup (engine.pyramid.pyramid_sum): levels 1..2 of 2x2
    count-grid aggregation over the heatmap raster, exploded to nonzero
    level-k global pixels (level, gx, gy, n); level 0 is the base raster
    itself. The oracle aggregates every level STRAIGHT from base pixels with
    floor-shifted coordinates — an independent derivation of the iterated
    2x2 rollup."""
    from engine import pyramid

    res = _HOTSPOT_RES
    if tiles is None:
        tiles = _hotspot_tiles(spark, sf_dir)
    base = tiles.select(
        F.lit(0).cast("long").alias("level"), "tx", "ty", "counts"
    )
    lv = pyramid.pyramid_sum(tiles, res, levels=2).select(
        F.col("level").cast("long").alias("level"), "tx", "ty", "counts"
    )
    ex = base.unionByName(lv).select(
        "level", "tx", "ty", F.posexplode("counts").alias("pix", "n")
    ).filter(F.col("n") != 0)
    return ex.select(
        "level",
        (F.col("tx") * res + F.pmod(F.col("pix"), res)).cast("long").alias("gx"),
        (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long").alias("gy"),
        F.col("n").cast("long").alias("n"),
    )


_ROADS = [
    (10, [(0.0, 5.0), (100.0, 5.0)]),
    (20, [(0.0, 25.0), (100.0, 25.0)]),
    (30, [(0.0, 45.0), (50.0, 45.0), (100.0, 55.0)]),
    (40, [(50.0, 0.0), (50.0, 60.0)]),
]
_SNAP_RADIUS = 4.0
_SNAP_GAP_MIN = 240.0


def q_raster_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-field family, tagged union (merged this session to free a slot
    for `contours` at the 50-row cap — both halves are the previously-green
    rows verbatim, same consolidation pattern as knn / geom_line):

    tag='hot' — q_hotspot_cells: (a=gx, b=gy, c=n, d=fs, e=z_e6; z_e6 stays
    nullable where the Gi* denominator is 0, exactly as before).
    tag='pyr' — q_tile_pyramid: (a=level, b=gx, c=gy, d=n, e=-1).
    tag='ter' — engine.terrain.terrain_gradients (Horn slope/aspect core)
    over the same raster, counts read as elevations: per nonflat pixel
    (a=gx, b=gy, c=dzdx8, d=dzdy8, e=0) — the gradient NUMERATORS are exact
    int64, so the production fused-halo pass hash-matches the DuckDB twin
    (two focal_stencil_sql scatter passes joined on the tile key).
    tag='d8' — engine.terrain.d8_flow + basins over the same raster: per
    pixel (a=gx, b=gy, c=d8_dir, d=d8_key, e=basin) — steepest-descent
    direction (exact 2*drop^2 rational-slope key, presence-masked edges,
    compass-priority ties) AND the basin label (min packed cell id of the
    flow forest's component, engine.graph CC). The twin replays the argmax
    as a max-over-packed-key group and the basins via the recursive-CTE CC
    walk — the whole hydrology pipeline is hash-checked.
    tag='vis' — engine.terrain.viewshed over the same raster, counts read
    as elevations: per pixel (a=gx, b=gy, c=vis, d=-1, e=-1) — how many of
    the {_VIS_N_OBS} busiest pixels (z DESC, gx, gy tie-break — a
    deterministic data-derived observer set at any sf) have exact-integer
    line of sight to the cell within radius {_VIS_RADIUS}, eyes
    {_VIS_HEIGHT} above terrain. The twin replays the circular range, the
    round-half-away lattice ray and the cross-multiplied strict-angle
    comparison as a lateral generate_series over (cell, observer) pairs —
    the full LOS kernel is hash-checked, seams and all.
    tag='edt' — engine.terrain.distance_transform(allocate=True) over the
    same raster: per pixel (a=gx, b=gy, c=dist2, d=alloc, e=-1) — the EXACT
    min squared euclidean distance to the nearest cell holding >=
    {_EDT_MIN_Z} documents within radius {_VIS_RADIUS} (-1 beyond) AND the
    Euclidean-Allocation winner (min packed source id on distance ties).
    The separable integer EDT kernel hash-matches the twin's brute
    min-over-pairs + min-pack-at-min-dist derivation.
    tag='burn' — engine.raster.rasterize_polygons over diamonds centered on
    the {_BURN_N} busiest pixels (z DESC, gx, gy — the viewshed observer
    discipline), radii (3 + 2*i) pixels, polygon 0 a donut (1.5-pixel hole,
    even-odd), value 100+i, priority i: per burned pixel (a=gx, b=gy,
    c=winning value, d=winning poly_id, e=-1). The twin replays the exact
    scanline span algebra (rasterize_polygons_sql) over the identically
    derived diamonds — vector->raster burn is hash-checked end to end.
    tag='stat' — global spatial autocorrelation of the same raster, THREE
    rows: (a=0, b=n_cells, c=w_sum, d=floor(moran_i*1e9), e=-1) from
    engine.focal.morans_i, and from engine.focal.join_counts (Black =
    count>0, same radius-1 queen weights) (a=1, b=n_black, c=joins, d=bb,
    e=bw) and (a=2, b=ww, c=floor(z_bb*1e6), d=floor(z_bw*1e6), e=-1).
    Both statistics reduce to exact int64 aggregates plus one fixed double
    expression graph (bit-equal across engines — pytest asserts ==, not
    approx), so the floor-scaled values hash-match the morans_i_sql /
    join_counts_sql twins.
    tag='lisa' — LOCAL Moran's I (Anselin LISA, engine.focal.local_morans)
    per pixel of the same raster: (a=gx, b=gy, c=floor(I_i*1e9), d=quadrant
    1..4 HH/LL/HL/LH or 0, e=-1); the twin (local_morans_sql) replays the
    scatter focal algebra + the identical (x-m)(S-mW)/m2 expression graph,
    per-pixel doubles bit-equal (pytest asserts ==).
    tag='fill' — engine.terrain.fill_depressions (Priority-Flood sink
    filling, counts read as elevations) per pixel: (a=gx, b=gy, c=filled
    elevation W, d=fill depth W-z, e=-1). The production block-Jacobi halo
    fixpoint is hash-checked against the twin's INDEPENDENT derivation
    (fill_depressions_sql: W = min threshold level with an escape path to
    the raster edge, one recursive-CTE flood over all candidate levels).
    tag='flats' — engine.terrain.resolve_flats over the filled surface
    (full hydrological conditioning, = condition_dem): per pixel (a=gx,
    b=gy, c=conditioned d8 dir, d=d8 key, e=flat BFS distance, -1 if
    unreachable). The twin (resolve_flats_sql over the fill twin's W)
    re-derives seeds via EXISTS, the flat gradient as a level-tracked
    recursive-CTE BFS capped by the raster's L1 span, and both argmax/
    argmin packed tie-breaks.
    tag='strahler' — engine.terrain.strahler_order over the conditioned
    flow frame (all-cells stream mask): per pixel (a=gx, b=gy, c=Strahler
    order, d=-1, e=-1) — 1 at heads, max(upstream)+1 exactly at >=2-way
    max-ties, the least fixpoint climbed from below on the shared halo
    exchange with an exact per-tile Kahn peel. The twin re-derives orders
    as counted order-level memberships S_k (seed = >=2-way S_{k-1}
    confluence, then the downstream recursive-CTE closure), a fully
    independent characterization of the same fixpoint.
    tag='flowacc' — engine.terrain.flow_accumulation over the same
    conditioned flow frame: per pixel (a=gx, b=gy, c=exact upstream cell
    count incl. itself, d=-1, e=-1) — the production two-level
    decomposition (per-tile vectorized Kahn + contracted tile-entry
    forest) hash-checked against the twin's INDEPENDENT per-source
    pointer-walk closure count (flow_accumulation_sql): the complete
    Fill -> Flats -> FlowAcc hydrology chain is now oracle-checked end
    to end.
    tag='cost' — engine.terrain.cost_surface (multi-source halo Dijkstra)
    over an all-ones cost raster on the explicit full world rectangle,
    sources = the 3 busiest pixels: per pixel (a=gx, b=gy, c=accumulated
    octile cost to the nearest source, d=-1, e=-1). Uniform cost makes the
    exact int64 metric closed-form (14*min(|dx|,|dy|) + 10*(max-min), min
    over sources), so the distributed block-Jacobi Dijkstra — seams,
    stationarity fast path and all — is hash-checked against an
    independent pure-SQL derivation; barrier/unreachable semantics are
    python-oracle-pinned in tests/test_terrain.py.
    tag='gdal' — engine.terrain.surface_products over the same raster
    (counts read as elevations): per pixel (a=gx, b=gy, c=TRI sum
    |z-z_n|, d=tpi_num*16+tpi_den packed — TPI's exact numerator
    n*z-sum(z_n) with its presence-masked neighbor count (den in 3..8),
    e=roughness max-min over the 3x3 incl. center). With
    slope/aspect/hillshade ('ter') this completes the gdaldem product
    family, all hash-checked vs the twin's independent 8-offset
    neighbor-join aggregates (surface_products_sql).
    tag='curv' — engine.terrain.curvature_numerators over the same raster:
    per pixel with any nonzero second difference (a=gx, b=gy, c=zt_d,
    d=zt_e, e=zt_f) — the Zevenbergen-Thorne quadric's three
    second-derivative NUMERATORS (axis-aligned second differences + the
    cross term), exact int64, everything the profile/plan/general
    curvature surfaces float-divide by cell area. The production fused
    halo pass (all five ZT stencils in one strip exchange) hash-matches
    three focal_stencil_sql scatter passes joined on the tile key — the
    'ter' derivation pattern extended to second order; the first-
    difference numerators (zt_g, zt_h) and the float curvature layer are
    pytest-pinned (tests/test_terrain.py curvature block).
    tag='lf' — engine.terrain.landform_classes over the same raster: per
    pixel (a=gx, b=gy, c=Weiss slope-position class 1..10, d=-1, e=-1) —
    TPI at radii 1 and 2 (exact e3 floor divisions) + Horn squared-
    gradient flatness cut by the ALL-integer 10-class decision table, so
    the classification hash-checks exactly against the INDEPENDENT
    neighbor-join twin (landform_classes_sql — no integral images, no
    stencils).
    tag='hor' — engine.terrain.horizon_angles over the same raster, EIGHT
    rows per pixel: (a=gx, b=gy, c=compass direction 0..7 packed with the
    winning step as c=dir, d=num, e=den) — the bounded-radius horizon per
    direction as the winning sample's EXACT rational (dz, step), clamped
    at flat sky (0,1), nearest-sample tie-break. The production fused halo
    scan (8 directions x R steps of cross-multiplied numpy compares in one
    strip exchange) hash-matches the twin's INDEPENDENT derivation: a
    lateral dirs-x-steps sample join with the argmax selected by NOT
    EXISTS cross-multiplication. The sky-view-factor float layer is
    pytest-pinned (tests/test_terrain.py horizon block)."""
    from engine import terrain
    from engine.graph import connected_components

    res = _HOTSPOT_RES
    # ONE raster build + persist feeds all four halves (hot, pyr, ter, d8)
    # — previously each half re-rasterized the document anchors (4 scans)
    tiles_r = _hotspot_tiles(spark, sf_dir).persist()
    # warm the shared cache with ONE action so the concurrent chains below
    # don't race to materialize it; the Arrow fetch of the (tiny, registry-
    # fixed 512-px) raster lets every one-shot halo pass over tiles_r run
    # driver-side with identical output (focal._halo_apply_driver — r6)
    tiles_r.count()
    tiles_r._halo_driver_pdf = tiles_r.toPandas()
    grads = terrain.terrain_gradients(tiles_r, res)
    ed = terrain.flow_edges(terrain.d8_flow(tiles_r, res), res).persist()
    # the CC loop (iterative, driver actions) overlaps the terrain fixpoint
    # chains further down; its future is resolved after they launch
    from concurrent.futures import ThreadPoolExecutor

    _cc_pool = ThreadPoolExecutor(1)
    _comp_fut = _cc_pool.submit(
        connected_components,
        ed.filter(F.col("dst").isNotNull()).select("src", "dst"),
        src="src", dst="dst", nodes=ed.select("src"), id_col="src",
    )
    ter = (
        grads.select(
            "tx", "ty",
            F.posexplode(F.arrays_zip("dzdx8", "dzdy8")).alias("pix", "g"),
        )
        .filter((F.col("g.dzdx8") != 0) | (F.col("g.dzdy8") != 0))
        .select(
            F.lit("ter").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res)).alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res)).cast("long").alias("b"),
            F.col("g.dzdx8").alias("c"),
            F.col("g.dzdy8").alias("d"),
            F.lit(0).cast("long").alias("e"),
        )
    )
    hot = q_hotspot_cells(spark, sf_dir, tiles=tiles_r).select(
        F.lit("hot").alias("tag"),
        F.col("gx").alias("a"),
        F.col("gy").alias("b"),
        F.col("n").alias("c"),
        F.col("fs").alias("d"),
        F.col("z_e6").alias("e"),
    )
    pyr = q_tile_pyramid(spark, sf_dir, tiles=tiles_r).select(
        F.lit("pyr").alias("tag"),
        F.col("level").alias("a"),
        F.col("gx").alias("b"),
        F.col("gy").alias("c"),
        F.col("n").alias("d"),
        F.lit(-1).cast("long").alias("e"),
    )
    obs_df = (
        tiles_r.select("tx", "ty", F.posexplode("counts").alias("pix", "z"))
        .select(
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("gx"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("gy"),
            F.col("z").cast("long").alias("z"),
        )
        .orderBy(F.col("z").desc(), "gx", "gy")
        .limit(_VIS_N_OBS)
        .select("gx", "gy")
    )
    # r6: kick the iterative chains off NOW, before the main thread builds
    # the dozen non-iterative half plans (pure Catalyst work) — their driver
    # actions interleave with plan construction instead of running after it.
    # cost needs only the all-ones rect + obs_df; fill -> flats ->
    # {strahler || flowacc} is its own chain; CC was submitted above.
    # Results are deterministic regardless of interleaving (every op is a
    # fixpoint / exact solve on its own input).
    fullt = spark.createDataFrame(
        [(tx, ty) for tx in range(-2, 2) for ty in range(-1, 1)],
        "tx long, ty long",
    )
    ones_cost = fullt.select(
        "tx", "ty",
        F.array_repeat(F.lit(1).cast("long"), res * res).alias("counts"),
    )
    _iter_pool = ThreadPoolExecutor(2)
    _cost_fut = _iter_pool.submit(
        terrain.cost_surface, ones_cost, res, obs_df, 8
    )

    def _hydro_chain():
        filled = terrain.fill_depressions(tiles_r, res)
        flats = terrain.resolve_flats(filled, res)
        with ThreadPoolExecutor(1) as _ex2:
            _st_fut = _ex2.submit(terrain.strahler_order, flats, res)
            acc = terrain.flow_accumulation(flats, res)
            st = _st_fut.result()
        return filled, flats, st, acc

    _hydro_fut = _iter_pool.submit(_hydro_chain)
    vis = (
        terrain.viewshed(
            tiles_r, res, obs_df,
            radius=_VIS_RADIUS, observer_height=_VIS_HEIGHT,
        )
        .select("tx", "ty", F.posexplode("vis").alias("pix", "v"))
        .select(
            F.lit("vis").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v").cast("long").alias("c"),
            F.lit(-1).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    src_tiles = tiles_r.select(
        "tx", "ty",
        F.transform(
            "counts",
            lambda c: F.when(c >= _EDT_MIN_Z, c)
            .otherwise(F.lit(0)).cast("long"),
        ).alias("counts"),
    )
    # same threshold mask applied to the collected frame so the radius-6
    # EDT halo pass rides the driver path too (exact integer compare —
    # identical values either way)
    import numpy as _np
    import pandas as _pd

    _tp = tiles_r._halo_driver_pdf
    src_tiles._halo_driver_pdf = _pd.DataFrame({
        "tx": _tp["tx"], "ty": _tp["ty"],
        "counts": [
            _np.where(
                _np.asarray(c, dtype=_np.int64) >= _EDT_MIN_Z,
                _np.asarray(c, dtype=_np.int64), 0
            ).tolist()
            for c in _tp["counts"]
        ],
    })
    edt = (
        terrain.distance_transform(
            src_tiles, res, radius=_VIS_RADIUS, allocate=True
        )
        .select(
            "tx", "ty",
            F.posexplode(F.arrays_zip("dist2", "alloc")).alias("pix", "v"),
        )
        .select(
            F.lit("edt").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v.dist2").cast("long").alias("c"),
            F.col("v.alloc").cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    from engine import raster as _raster
    from pyspark.sql import Window as _W

    pitch = _HOTSPOT_TILE / res
    bbase = (
        tiles_r.select("tx", "ty", F.posexplode("counts").alias("pix", "z"))
        .select(
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("gx"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("gy"),
            F.col("z").cast("long").alias("z"),
        )
        .orderBy(F.col("z").desc(), "gx", "gy")
        .limit(_BURN_N)
    )
    bobs = bbase.withColumn(
        "i0",
        F.row_number().over(
            _W.orderBy(F.col("z").desc(), "gx", "gy")
        ) - 1,
    )
    cx = (F.col("gx") + F.lit(0.5)) * F.lit(pitch)
    cy = (F.col("gy") + F.lit(0.5)) * F.lit(pitch)
    r_out = (F.lit(3) + F.lit(2) * F.col("i0")).cast("double") * F.lit(pitch)
    r_hole = F.lit(1.5 * pitch)

    def _diamond(rad):
        def pt(x, y):
            return F.struct(x.alias("x"), y.alias("y"))

        return F.array(
            pt(cx + rad, cy), pt(cx, cy + rad),
            pt(cx - rad, cy), pt(cx, cy - rad),
        )

    brings = F.when(
        F.col("i0") == 0, F.array(_diamond(r_out), _diamond(r_hole))
    ).otherwise(F.array(_diamond(r_out)))
    bpolys = bobs.select(
        F.col("i0").cast("long").alias("poly_id"),
        brings.alias("rings"),
        (F.lit(100) + F.col("i0")).cast("long").alias("v"),
        F.col("i0").cast("long").alias("pri"),
    )
    burn = _raster.rasterize_polygons(
        bpolys, _HOTSPOT_TILE, res, rings_col="rings",
        value_col="v", priority_col="pri",
    ).select(
        F.lit("burn").alias("tag"),
        F.col("gx").alias("a"),
        F.col("gy").alias("b"),
        F.col("value").alias("c"),
        F.col("poly_id").alias("d"),
        F.lit(-1).cast("long").alias("e"),
    )
    from engine import focal as _focal

    mi = _focal.morans_i(tiles_r, res, radius=1)
    jc = _focal.join_counts(tiles_r, res, radius=1, thresh=0)
    stat = (
        mi.select(
            F.lit("stat").alias("tag"),
            F.lit(0).cast("long").alias("a"),
            F.col("n_cells").alias("b"),
            F.col("w_sum").alias("c"),
            F.floor(F.col("moran_i") * F.lit(1000000000.0))
            .cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
        .unionByName(
            jc.select(
                F.lit("stat").alias("tag"),
                F.lit(1).cast("long").alias("a"),
                F.col("n_black").alias("b"),
                F.col("joins").alias("c"),
                F.col("bb").alias("d"),
                F.col("bw").alias("e"),
            )
        )
        .unionByName(
            jc.select(
                F.lit("stat").alias("tag"),
                F.lit(2).cast("long").alias("a"),
                F.col("ww").alias("b"),
                F.floor(F.col("z_bb") * F.lit(1000000.0))
                .cast("long").alias("c"),
                F.floor(F.col("z_bw") * F.lit(1000000.0))
                .cast("long").alias("d"),
                F.lit(-1).cast("long").alias("e"),
            )
        )
    )
    lisa = (
        _focal.local_morans(tiles_r, res, radius=1)
        .select(
            "tx", "ty",
            F.posexplode(F.arrays_zip("local", "quad")).alias("pix", "v"),
        )
        .select(
            F.lit("lisa").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.floor(F.col("v.local") * F.lit(1000000000.0))
            .cast("long").alias("c"),
            F.col("v.quad").cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    curv = (
        terrain.curvature_numerators(tiles_r, res)
        .select(
            "tx", "ty",
            F.posexplode(
                F.arrays_zip("zt_d", "zt_e", "zt_f")
            ).alias("pix", "v"),
        )
        .filter(
            (F.col("v.zt_d") != 0) | (F.col("v.zt_e") != 0)
            | (F.col("v.zt_f") != 0)
        )
        .select(
            F.lit("curv").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v.zt_d").cast("long").alias("c"),
            F.col("v.zt_e").cast("long").alias("d"),
            F.col("v.zt_f").cast("long").alias("e"),
        )
    )
    lf = (
        terrain.landform_classes(
            tiles_r, res, r_small=1, r_large=2,
            thresh_small_e3=500, thresh_large_e3=700, flat_num2=1000,
        )
        .select("tx", "ty", F.posexplode("landform").alias("pix", "v"))
        .select(
            F.lit("lf").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v").cast("long").alias("c"),
            F.lit(-1).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    _hz16 = [c for i in range(8) for c in (f"h{i}_num", f"h{i}_den")]
    hor = (
        terrain.horizon_angles(tiles_r, res, _VIS_RADIUS)
        .select(
            "tx", "ty",
            F.posexplode(F.arrays_zip(*_hz16)).alias("pix", "v"),
        )
        .select(
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("long").alias("dir"),
                            F.col(f"v.h{i}_num").cast("long").alias("num"),
                            F.col(f"v.h{i}_den").cast("long").alias("den"),
                        )
                        for i in range(8)
                    ]
                )
            ).alias("d"),
        )
        .select(
            F.lit("hor").alias("tag"), "a", "b",
            F.col("d.dir").alias("c"),
            F.col("d.num").alias("d"),
            F.col("d.den").alias("e"),
        )
    )
    gdal = (
        terrain.surface_products(tiles_r, res)
        .select(
            "tx", "ty",
            F.posexplode(
                F.arrays_zip("tri", "tpi_num", "tpi_den", "rough")
            ).alias("pix", "v"),
        )
        .select(
            F.lit("gdal").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v.tri").cast("long").alias("c"),
            (F.col("v.tpi_num") * 16 + F.col("v.tpi_den"))
            .cast("long").alias("d"),
            F.col("v.rough").cast("long").alias("e"),
        )
    )
    # join the chains launched right after obs_df above
    filled_r, flats_r, st_r, acc_r = _hydro_fut.result()
    cost_r = _cost_fut.result()
    _iter_pool.shutdown()
    comp = _comp_fut.result()
    _cc_pool.shutdown()
    d8 = (
        ed.join(comp, ed["src"] == comp["id"])
        .select(
            F.lit("d8").alias("tag"),
            F.col("gx").alias("a"),
            F.col("gy").alias("b"),
            F.col("d8_dir").alias("c"),
            F.col("d8_key").alias("d"),
            F.col("comp").alias("e"),
        )
    )
    fla = (
        flats_r
        .select(
            "tx", "ty",
            F.posexplode(
                F.arrays_zip("d8_dir", "d8_key", "flat_d")
            ).alias("pix", "v"),
        )
        .select(
            F.lit("flats").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v.d8_dir").cast("long").alias("c"),
            F.col("v.d8_key").cast("long").alias("d"),
            F.col("v.flat_d").cast("long").alias("e"),
        )
    )
    fil = (
        filled_r
        .join(tiles_r, ["tx", "ty"])
        .select(
            "tx", "ty",
            F.posexplode(F.arrays_zip("filled", "counts")).alias("pix", "v"),
        )
        .select(
            F.lit("fill").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v.filled").cast("long").alias("c"),
            (F.col("v.filled") - F.col("v.counts")).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    stro = (
        st_r
        .select("tx", "ty", F.posexplode("strahler").alias("pix", "v"))
        .select(
            F.lit("strahler").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v").cast("long").alias("c"),
            F.lit(-1).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    facc = (
        acc_r
        .select("tx", "ty", F.posexplode("acc").alias("pix", "v"))
        .select(
            F.lit("flowacc").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v").cast("long").alias("c"),
            F.lit(-1).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    # cost half: uniform-cost (all-ones) raster over the EXPLICIT full world
    # rectangle (tx -2..1, ty -1..0 at the 90-degree tile grid — anchors span
    # lon [-180,180) x lat [-90,90), so every data pixel is inside), sources
    # = the 3 busiest pixels (the viewshed observer discipline). On a
    # barrier-free full rectangle the octile metric has an exact closed form
    # (14*min(|dx|,|dy|) + 10*(max-min) per source, min over sources), so the
    # twin checks the PRODUCTION multi-tile halo Dijkstra — multi-source min,
    # both move multipliers, seam exchange, stationarity fast path — bit for
    # bit; barrier/unreachable semantics stay python-oracle-pinned in
    # tests/test_terrain.py.
    cost = (
        cost_r
        .select("tx", "ty", F.posexplode("cost_dist").alias("pix", "v"))
        .select(
            F.lit("cost").alias("tag"),
            (F.col("tx") * res + F.pmod(F.col("pix"), res))
            .cast("long").alias("a"),
            (F.col("ty") * res + F.floor(F.col("pix") / res))
            .cast("long").alias("b"),
            F.col("v").cast("long").alias("c"),
            F.lit(-1).cast("long").alias("d"),
            F.lit(-1).cast("long").alias("e"),
        )
    )
    return (
        hot.unionByName(pyr).unionByName(ter).unionByName(d8)
        .unionByName(vis).unionByName(edt).unionByName(burn)
        .unionByName(stat).unionByName(lisa).unionByName(fil)
        .unionByName(fla).unionByName(stro).unionByName(facc)
        .unionByName(cost).unionByName(gdal).unionByName(curv)
        .unionByName(hor).unionByName(lf)
    )


_CONTOUR_LEVEL = 1


def q_contours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares iso-line extraction (engine.contour.contour_segments)
    at z = 1 over the shared document-anchor heatmap raster: raster -> vector
    contour segments with exact rational edge crossings (sign-normalized
    num/den int64 pairs — no float crosses the engine boundary). The oracle
    replays the identical corner-scatter + case-table algebra in SQL
    (contour_segments_sql), so rows hash-match bit for bit."""
    res = _HOTSPOT_RES
    tiles = _hotspot_tiles(spark, sf_dir)
    cells = (
        tiles.select("tx", "ty", F.posexplode("counts").alias("pix", "n"))
        .filter(F.col("n") != 0)
        .select(
            (F.col("tx") * res + F.pmod(F.col("pix"), res)).alias("gx"),
            (F.col("ty") * res + F.floor(F.col("pix") / res)).alias("gy"),
            F.col("n").alias("z"),
        )
    )
    from engine.contour import contour_segments

    return contour_segments(cells, _CONTOUR_LEVEL)


def q_snap_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching end to end (engine.matching.match_routes): the events
    stream as device fixes (md5-derived planar coords in the road box),
    snapped to the nearest segment of a literal 4-road network within
    radius 4 (cell-cover candidates + deterministic (dist2, line, seg)
    argmin), trips split at >240 min gaps, routes compressed to distinct
    consecutive line ids. The oracle recomputes snap as a full cross join +
    window argmin and the route as an ordered string_agg — candidate
    generation (cover) vs exhaustive enumeration is exactly the
    completeness property under test."""
    from engine import matching, textops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    hx = textops.cross_hash(eid, "md5")
    hy = textops.cross_hash(F.concat(eid, F.lit("y")), "md5")
    fixes = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        _epoch_us(F.col("ts")).alias("ts_us"),
        (F.pmod(hx, F.lit(100000)) / F.lit(1000.0)).alias("x"),
        (F.pmod(hy, F.lit(60000)) / F.lit(1000.0)).alias("y"),
    )
    roads = spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in pts]) for lid, pts in _ROADS],
        "line_id long, pts array<struct<x:double,y:double>>",
    )
    out = matching.match_routes(
        fixes, roads, radius=_SNAP_RADIUS,
        id_col="user_id", ts_col="ts_us", gap_minutes=_SNAP_GAP_MIN,
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("trip_idx").cast("long").alias("trip_idx"),
        F.array_join(
            F.transform(F.col("route"), lambda s: s.cast("string")), "-"
        ).alias("route_str"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_matched").cast("long").alias("n_matched"),
        F.col("steps").cast("long").alias("steps"),
    )


_EMERGE_CELL = 10.0
_EMERGE_BIN_US = 259_200_000_000  # 3-day bins over the ~30-day events span


def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging hotspot analysis (engine.spacetime.emerging_hotspots): the
    events stream binned onto a 10x6-cell / 3-day space-time cube, per-bin
    Gi* z-scores, per-cell tie-corrected Mann-Kendall trend + category.
    Every stage (counts, focal scatter, in-area W, per-bin moments, z, MK
    pair signs, tie groups) is value-checked — mk_z is FLOOR-scaled e6 and
    hash-exact because all formula inputs are exact int64 and the double
    graphs match op for op."""
    from engine import spacetime, textops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    hx = textops.cross_hash(eid, "md5")
    hy = textops.cross_hash(F.concat(eid, F.lit("y")), "md5")
    pts = ev.select(
        _epoch_us(F.col("ts")).alias("ts_us"),
        (F.pmod(hx, F.lit(100000)) / F.lit(1000.0)).alias("x"),
        (F.pmod(hy, F.lit(60000)) / F.lit(1000.0)).alias("y"),
    )
    out = spacetime.emerging_hotspots(pts, _EMERGE_CELL, _EMERGE_BIN_US)
    return out.select(
        "gx", "gy", "n_bins", "n_events", "hot_bins", "last_hot", "mk_s",
        F.floor(F.col("mk_z") * 1000000.0).cast("long").alias("mk_z_e6"),
        "category",
    )


def emerging_hotspots_sql() -> str:
    """DuckDB twin of q_emerging_hotspots: the whole space-time pipeline in
    relational algebra (dense cube, scatter focal, per-bin moments, Gi* z,
    MK as a pairwise self-join on bins, tie groups via GROUP BY z)."""
    from engine import textops

    hx = textops.cross_hash_sql("CAST(event_id AS VARCHAR)")
    hy = textops.cross_hash_sql("CAST(event_id AS VARCHAR) || 'y'")
    return f"""
        WITH ev AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 (({hx}) % 100000) / 1000.0 AS x,
                 (({hy}) % 60000) / 1000.0 AS y
          FROM events
        ), counts AS (
          SELECT CAST(FLOOR(ts_us / {_EMERGE_BIN_US}) AS BIGINT) AS bin,
                 CAST(FLOOR(x / {_EMERGE_CELL!r}) AS BIGINT) AS gx,
                 CAST(FLOOR(y / {_EMERGE_CELL!r}) AS BIGINT) AS gy,
                 COUNT(*) AS n
          FROM ev GROUP BY 1, 2, 3
        ), area AS (SELECT DISTINCT gx, gy FROM counts),
        bins AS (SELECT DISTINCT bin FROM counts),
        na AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM area),
        offs AS (
          SELECT dx.o AS dx, dy.o AS dy
          FROM range(-1, 2) dx(o), range(-1, 2) dy(o)
        ), w AS (
          SELECT t.gx, t.gy, COUNT(*) AS w
          FROM (SELECT gx + dx AS gx, gy + dy AS gy FROM area, offs) t
          JOIN area a ON t.gx = a.gx AND t.gy = a.gy
          GROUP BY 1, 2
        ), fsq AS (
          SELECT bin, gx + dx AS gx, gy + dy AS gy, SUM(n)::BIGINT AS fs
          FROM counts, offs GROUP BY 1, 2, 3
        ), mo AS (
          SELECT bin, SUM(n)::BIGINT AS s, SUM(n * n)::BIGINT AS ss
          FROM counts GROUP BY 1
        ), mo2 AS (
          SELECT bin, s / nn AS mean,
                 sqrt(greatest(ss / nn - (s / nn) * (s / nn), 0.0)) AS sd
          FROM mo, na
        ), dense AS (
          SELECT b.bin, a.gx, a.gy,
                 COALESCE(c.n, 0)::BIGINT AS n,
                 COALESCE(f.fs, 0)::BIGINT AS fs,
                 w.w AS w, m.mean AS mean, m.sd AS sd
          FROM area a
          CROSS JOIN bins b
          LEFT JOIN counts c ON c.bin = b.bin AND c.gx = a.gx AND c.gy = a.gy
          LEFT JOIN fsq f ON f.bin = b.bin AND f.gx = a.gx AND f.gy = a.gy
          JOIN w ON w.gx = a.gx AND w.gy = a.gy
          JOIN mo2 m ON m.bin = b.bin
        ), zs AS (
          SELECT bin, gx, gy, n,
                 CASE WHEN sd * sqrt((nn * w - w * w) / (nn - 1.0)) > 0.0
                      THEN (fs - mean * w)
                             / (sd * sqrt((nn * w - w * w) / (nn - 1.0)))
                 END AS z
          FROM dense, na
        ), pairs AS (
          SELECT a.gx, a.gy,
                 SUM(CASE WHEN b.z > a.z THEN 1
                          WHEN b.z < a.z THEN -1 ELSE 0 END)::BIGINT AS mk_s
          FROM zs a JOIN zs b
            ON a.gx = b.gx AND a.gy = b.gy AND b.bin > a.bin
          GROUP BY 1, 2
        ), tie AS (
          SELECT gx, gy,
                 SUM(c * (c - 1) * (2 * c + 5))::BIGINT AS tie_sum
          FROM (SELECT gx, gy, z, COUNT(*)::BIGINT AS c
                FROM zs GROUP BY 1, 2, 3)
          GROUP BY 1, 2
        ), flags AS (
          SELECT gx, gy, COUNT(*)::BIGINT AS n_bins,
                 SUM(n)::BIGINT AS n_events,
                 SUM(CASE WHEN z IS NOT NULL AND z >= 1.645
                          THEN 1 ELSE 0 END)::BIGINT AS hot_bins,
                 MAX(CASE WHEN bin = (SELECT MAX(bin) FROM bins) THEN
                       CASE WHEN z IS NOT NULL AND z >= 1.645
                            THEN 1 ELSE 0 END END) AS last_hot_i
          FROM zs GROUP BY 1, 2
        ), scored AS (
          SELECT f.gx, f.gy, f.n_bins, f.n_events, f.hot_bins,
                 f.last_hot_i = 1 AS last_hot,
                 COALESCE(p.mk_s, 0) AS mk_s,
                 (f.n_bins * (f.n_bins - 1) * (2 * f.n_bins + 5)
                   - t.tie_sum)::DOUBLE / 18.0 AS var_s
          FROM flags f
          LEFT JOIN pairs p ON p.gx = f.gx AND p.gy = f.gy
          JOIN tie t ON t.gx = f.gx AND t.gy = f.gy
        ), mk AS (
          SELECT *,
                 CASE WHEN mk_s > 0 AND var_s > 0.0
                        THEN (mk_s - 1) / sqrt(var_s)
                      WHEN mk_s < 0 AND var_s > 0.0
                        THEN (mk_s + 1) / sqrt(var_s)
                      ELSE 0.0 END AS mk_z
          FROM scored
        )
        SELECT gx, gy, n_bins, n_events, hot_bins, last_hot, mk_s,
               CAST(FLOOR(mk_z * 1000000.0) AS BIGINT) AS mk_z_e6,
               CASE WHEN hot_bins = 0 THEN 'none'
                    WHEN last_hot AND hot_bins = 1 THEN 'new'
                    WHEN hot_bins * 2 >= n_bins AND mk_z >= 1.96
                      THEN 'intensifying'
                    WHEN hot_bins * 2 >= n_bins AND mk_z <= -1.96
                      THEN 'diminishing'
                    WHEN hot_bins * 10 >= n_bins * 9 THEN 'persistent'
                    ELSE 'sporadic' END AS category
        FROM mk
    """


def q_union_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 + J5 in one registry row (merged round 4 to free a slot — VERDICT
    r3 item 6 discipline): the multi-way union halves tagged 'union', the
    broadcast dim-decode halves tagged 'decode'. Each half is unchanged from
    its previously-green standalone row."""
    mu = q_multiway_union(spark, sf_dir).select(
        F.lit("union").alias("op"),
        F.col("l_linestatus").alias("k"),
        "n",
        "depth",
    )
    dd = q_dim_decode_join(spark, sf_dir).select(
        F.lit("decode").alias("op"),
        F.col("label").alias("k"),
        "n",
        F.lit(-1).cast("long").alias("depth"),
    )
    return mu.unionByName(dd)


def _anchor_lonlat_sql() -> tuple[str, str]:
    """The documents anchor lon/lat as DuckDB expressions (same formulas the
    oracle preamble derives from the synthetic phash)."""
    phash = cells.synth_phash_sql("doc_id")
    lon = f"(({phash}) % 4294967296) / 4294967296.0 * 360.0 - 180.0"
    lat = f"((({phash}) // 4294967296) % 2147483648) / 2147483648.0 * 180.0 - 90.0"
    return lon, lat


def _hotspot_tiles_cte() -> str:
    """DuckDB twin of _hotspot_tiles (engine.raster.heatmap_tiles_sql over
    the anchor points)."""
    from engine import raster

    lon, lat = _anchor_lonlat_sql()
    # parenthesized: heatmap_tiles_sql splices x_expr into "{x_expr} / {s}",
    # and these expressions end in a low-precedence "- 180.0"
    return raster.heatmap_tiles_sql(
        "documents", _HOTSPOT_TILE, _HOTSPOT_RES,
        x_expr=f"({lon})", y_expr=f"({lat})",
    )


def hotspot_cells_sql() -> str:
    """DuckDB twin of q_hotspot_cells: heatmap raster + the INDEPENDENT
    scatter focal algebra (engine.focal.focal_sum_sql, twice — values and
    the constant-1 window-size raster) + SQL-computed global moments; the
    Gi* double expression mirrors engine.focal.gi_star op for op (all
    inputs exact int64, so the z bits match)."""
    from engine import focal

    res = _HOTSPOT_RES
    n_px = res * res
    fs = focal.focal_sum_sql("tiles", res, 1)
    ws = focal.focal_sum_sql("ones", res, 1)
    return f"""
        WITH tiles AS ({_hotspot_tiles_cte()}),
        ones AS (
          SELECT tx, ty,
                 list_transform(range(0, {n_px}), i -> 1::BIGINT) AS counts
          FROM tiles
        ),
        fsq AS ({fs}),
        wq AS ({ws}),
        g AS (
          SELECT CAST(COUNT(*) * {n_px} AS DOUBLE) AS nn,
                 COUNT(*) * {n_px} AS n,
                 SUM(n_points)::BIGINT AS s
          FROM tiles
        ),
        g2 AS (
          SELECT SUM(c * c)::BIGINT AS ss
          FROM (SELECT unnest(counts) AS c FROM tiles)
        ),
        mo0 AS (SELECT nn, s / n AS mean, ss / n AS msq FROM g, g2),
        mo AS (
          SELECT nn, mean, sqrt(greatest(msq - mean * mean, 0.0)) AS sd
          FROM mo0
        ),
        px AS (
          SELECT t.tx, t.ty, i AS pix,
                 t.counts[i + 1] AS cnt,
                 f.focal[i + 1] AS fs,
                 w.focal[i + 1] AS wn
          FROM tiles t
          JOIN fsq f USING (tx, ty)
          JOIN wq w USING (tx, ty), range(0, {n_px}) r(i)
        )
        SELECT tx * {res} + pix % {res} AS gx,
               ty * {res} + pix // {res} AS gy,
               cnt AS n, fs,
               CASE WHEN sd * sqrt((nn * wn - wn * wn) / (nn - 1.0)) > 0.0
                    THEN CAST(FLOOR(
                           (fs - mean * wn)
                             / (sd * sqrt((nn * wn - wn * wn) / (nn - 1.0)))
                             * 1000000.0) AS BIGINT)
               END AS z_e6
        FROM px, mo
    """


def tile_pyramid_sql() -> str:
    """DuckDB twin of q_tile_pyramid, derived independently: every level k
    aggregates straight from base-level global pixels with floor-shifted
    coordinates, never via iterated 2x2 rollups."""
    res = _HOTSPOT_RES
    per = []
    for k in (1, 2):
        f = 1 << k
        per.append(f"""
          SELECT {k}::BIGINT AS level,
                 CAST(FLOOR(gx / {f}.0) AS BIGINT) AS gx,
                 CAST(FLOOR(gy / {f}.0) AS BIGINT) AS gy,
                 SUM(n)::BIGINT AS n
          FROM cells GROUP BY 1, 2, 3""")
    levels = " UNION ALL ".join(per)
    return f"""
        WITH tiles AS ({_hotspot_tiles_cte()}),
        cells AS (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS n
          FROM tiles, range(0, {res * res}) t(i)
          WHERE counts[i + 1] <> 0
        )
        SELECT 0::BIGINT AS level, gx, gy, n FROM cells
        UNION ALL {levels}
    """


def raster_field_sql() -> str:
    """DuckDB twin of q_raster_field: the two previously-green twins verbatim,
    re-projected onto the tagged-union columns, plus the 'ter' half — Horn
    gradient numerators via two focal_stencil_sql scatter passes (engine.
    terrain.HORN_* are plain stencil weight maps) joined on the tile key."""
    from engine.focal import focal_stencil_sql
    from engine.terrain import HORN_DZDX, HORN_DZDY

    from engine.terrain import fill_depressions_sql, resolve_flats_sql

    res = _HOTSPOT_RES
    # The conditioning chain (fill -> flats) feeds FOUR arms (fill, flats,
    # strahler, flowacc); derive it once as top-level MATERIALIZED CTEs
    # instead of re-splicing the recursive flood per arm. (Measured: ~3%
    # wall — DuckDB handles the duplicated CTEs well — kept for the single
    # point of derivation, not the speed.) Top-level WITH scopes across
    # every UNION ALL arm; the per-arm nested `WITH tiles AS (...)` CTEs
    # of the other halves are untouched.
    fl_sql = fill_depressions_sql("__cond_tiles", res)
    fz_sql = resolve_flats_sql("SELECT gx, gy, w FROM __cond_fl")
    return f"""
        WITH __cond_tiles AS MATERIALIZED ({_hotspot_tiles_cte()}),
        __cond_fl AS MATERIALIZED ({fl_sql}),
        __cond_fz AS MATERIALIZED ({fz_sql})
        SELECT 'hot' AS tag, gx AS a, gy AS b, n AS c, fs AS d, z_e6 AS e
        FROM ({hotspot_cells_sql()})
        UNION ALL
        SELECT 'pyr' AS tag, level AS a, gx AS b, gy AS c, n AS d,
               CAST(-1 AS BIGINT) AS e
        FROM ({tile_pyramid_sql()})
        UNION ALL
        SELECT 'ter' AS tag,
               g1.tx * {res} + i % {res} AS a,
               g1.ty * {res} + i // {res} AS b,
               g1.focal[i + 1] AS c,
               g2.focal[i + 1] AS d,
               CAST(0 AS BIGINT) AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({focal_stencil_sql('tiles', res, HORN_DZDX)}) s1) g1
        JOIN (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({focal_stencil_sql('tiles', res, HORN_DZDY)}) s2) g2
          USING (tx, ty),
             range(0, {res * res}) t(i)
        WHERE g1.focal[i + 1] <> 0 OR g2.focal[i + 1] <> 0
        UNION ALL
        SELECT 'd8' AS tag, a, b, c, d, e FROM ({_d8_sql()})
        UNION ALL
        SELECT * FROM ({_viewshed_sql()})
        UNION ALL
        SELECT * FROM ({_edt_sql()})
        UNION ALL
        SELECT * FROM ({_burn_sql()})
        UNION ALL
        SELECT 'stat' AS tag, a, b, c, d, e FROM ({_stat_sql()}) st
        UNION ALL
        SELECT 'lisa' AS tag, gx AS a, gy AS b,
               CAST(FLOOR(local * 1000000000.0) AS BIGINT) AS c,
               CAST(quad AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_lisa_sql()}) q) li
        UNION ALL
        SELECT 'fill' AS tag, gx AS a, gy AS b, CAST(w AS BIGINT) AS c,
               CAST(w - z AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM __cond_fl
        UNION ALL
        SELECT 'flats' AS tag, gx AS a, gy AS b, dir AS c, key AS d,
               flat_d AS e
        FROM __cond_fz
        UNION ALL
        SELECT 'strahler' AS tag, gx AS a, gy AS b, strahler AS c,
               CAST(-1 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM ({_strahler_sql_on('SELECT gx, gy, dir FROM __cond_fz', 10)}) sz
        UNION ALL
        SELECT 'flowacc' AS tag, gx AS a, gy AS b, acc AS c,
               CAST(-1 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM ({_flowacc_sql_on('SELECT gx, gy, dir FROM __cond_fz')}) fa
        UNION ALL
        SELECT * FROM ({_cost_sql()})
        UNION ALL
        SELECT 'gdal' AS tag, gx AS a, gy AS b, tri AS c,
               tpi_num * 16 + tpi_den AS d, rough AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_gdal_sql()}) q) gd
        UNION ALL
        SELECT 'curv' AS tag,
               c1.tx * {res} + i % {res} AS a,
               c1.ty * {res} + i // {res} AS b,
               c1.focal[i + 1] AS c,
               c2.focal[i + 1] AS d,
               c3.focal[i + 1] AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_curv_sql('zt_d')}) s1) c1
        JOIN (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_curv_sql('zt_e')}) s2) c2
          USING (tx, ty)
        JOIN (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_curv_sql('zt_f')}) s3) c3
          USING (tx, ty),
             range(0, {res * res}) t(i)
        WHERE c1.focal[i + 1] <> 0 OR c2.focal[i + 1] <> 0
           OR c3.focal[i + 1] <> 0
        UNION ALL
        SELECT 'hor' AS tag, hz.gx AS a, hz.gy AS b, hz.dir AS c,
               hz.num AS d, hz.den AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_horizon_sql()}) q) hz
        UNION ALL
        SELECT 'lf' AS tag, lw.gx AS a, lw.gy AS b, lw.landform AS c,
               CAST(-1 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM (WITH tiles AS ({_hotspot_tiles_cte()})
              SELECT * FROM ({_landform_sql()}) q) lw
    """


def _lisa_sql() -> str:
    from engine.focal import local_morans_sql

    return local_morans_sql("tiles", _HOTSPOT_RES, 1)


def _fill_sql() -> str:
    from engine.terrain import fill_depressions_sql

    return fill_depressions_sql("tiles", _HOTSPOT_RES)


def _flats_sql() -> str:
    from engine.terrain import fill_depressions_sql, resolve_flats_sql

    fill = fill_depressions_sql("tiles", _HOTSPOT_RES)
    return resolve_flats_sql(f"SELECT gx, gy, w FROM ({fill}) ff")


def _strahler_sql() -> str:
    from engine.terrain import strahler_order_sql

    return strahler_order_sql(
        f"SELECT gx, gy, dir FROM ({_flats_sql()}) ff", max_order=16
    )


def _strahler_sql_on(cells_sql: str, max_order: int = 16) -> str:
    """Order k needs >= 2^(k-1) heads; the hotspot raster is bounded by the
    32x16-px world rectangle (sf-INDEPENDENT), so 512 cells cap the order
    at 10 — max_order=10 is exact here, not a truncation, and drops 6 of
    the twin's 16 unrolled closure levels (with the shared MATERIALIZED
    conditioning CTEs this took the whole raster_field twin 12 s ->
    1.3 s measured)."""
    from engine.terrain import strahler_order_sql

    return strahler_order_sql(cells_sql, max_order=max_order)


def _flowacc_sql_on(cells_sql: str) -> str:
    from engine.terrain import flow_accumulation_sql

    return flow_accumulation_sql(cells_sql)


def _flowacc_sql() -> str:
    from engine.terrain import flow_accumulation_sql

    return flow_accumulation_sql(
        f"SELECT gx, gy, dir FROM ({_flats_sql()}) ff"
    )


def _landform_sql() -> str:
    from engine.terrain import landform_classes_sql

    return landform_classes_sql(
        "tiles", _HOTSPOT_RES, r_small=1, r_large=2,
        thresh_small_e3=500, thresh_large_e3=700, flat_num2=1000,
    )


def _horizon_sql() -> str:
    from engine.terrain import horizon_angles_sql

    res = _HOTSPOT_RES
    pixels = f"""
        SELECT tx * {res} + i % {res} AS gx,
               ty * {res} + i // {res} AS gy,
               counts[i + 1] AS z
        FROM tiles, range(0, {res * res}) t(i)
    """
    return horizon_angles_sql(pixels, _VIS_RADIUS)


def _curv_sql(stencil: str) -> str:
    from engine.focal import focal_stencil_sql
    from engine.terrain import ZT_STENCILS

    return focal_stencil_sql("tiles", _HOTSPOT_RES, ZT_STENCILS[stencil])


def _gdal_sql() -> str:
    from engine.terrain import surface_products_sql

    res = _HOTSPOT_RES
    pixels = f"""
        SELECT tx * {res} + i % {res} AS gx,
               ty * {res} + i // {res} AS gy,
               counts[i + 1] AS z
        FROM tiles, range(0, {res * res}) t(i)
    """
    return surface_products_sql(pixels)


def _cost_sql() -> str:
    """DuckDB twin of the raster_field 'cost' half: on the barrier-free
    all-ones full world rectangle the (c_a+c_b)x(5 cardinal / 7 diagonal)
    metric of engine.terrain.cost_surface collapses to the exact octile
    closed form 14*min(|dx|,|dy|) + 10*(max-min) per source; the nearest-
    source surface is its MIN over the 3 busiest pixels (z DESC, gx, gy —
    the identical deterministic selection the Spark side feeds as
    sources). A fully independent derivation: no Dijkstra, no recursion —
    if the distributed halo solve under-relaxes a single seam cell the
    hash flips."""
    res = _HOTSPOT_RES
    return f"""
        WITH qtiles AS ({_hotspot_tiles_cte()}),
        qcells AS (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS z
          FROM qtiles, range(0, {res * res}) t(i)
        ), qobs AS (
          SELECT gx AS ox, gy AS oy
          FROM qcells ORDER BY z DESC, gx, gy LIMIT {_VIS_N_OBS}
        ), qgrid AS (
          SELECT x.gx, y.gy
          FROM range({-2 * res}, {2 * res}) x(gx),
               range({-1 * res}, {1 * res}) y(gy)
        )
        SELECT 'cost' AS tag, g.gx AS a, g.gy AS b,
               CAST(MIN(
                 14 * LEAST(ABS(g.gx - o.ox), ABS(g.gy - o.oy))
                 + 10 * (GREATEST(ABS(g.gx - o.ox), ABS(g.gy - o.oy))
                         - LEAST(ABS(g.gx - o.ox), ABS(g.gy - o.oy)))
               ) AS BIGINT) AS c,
               CAST(-1 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM qgrid g CROSS JOIN qobs o
        GROUP BY g.gx, g.gy
    """


def _stat_sql() -> str:
    """DuckDB twin of the raster_field 'stat' half: morans_i_sql +
    join_counts_sql verbatim over the shared raster CTE, floor-scaled onto
    the union's long columns exactly as the Spark side does."""
    from engine.focal import join_counts_sql, morans_i_sql

    res = _HOTSPOT_RES
    return f"""
        WITH tiles AS ({_hotspot_tiles_cte()}),
        mi AS ({morans_i_sql("tiles", res, 1)}),
        jc AS ({join_counts_sql("tiles", res, 1, thresh=0)})
        SELECT CAST(0 AS BIGINT) AS a, n_cells AS b, w_sum AS c,
               CAST(FLOOR(moran_i * 1000000000.0) AS BIGINT) AS d,
               CAST(-1 AS BIGINT) AS e
        FROM mi
        UNION ALL
        SELECT CAST(1 AS BIGINT), n_black, joins, bb, bw FROM jc
        UNION ALL
        SELECT CAST(2 AS BIGINT), ww,
               CAST(FLOOR(z_bb * 1000000.0) AS BIGINT),
               CAST(FLOOR(z_bw * 1000000.0) AS BIGINT),
               CAST(-1 AS BIGINT)
        FROM jc
    """


def _edt_sql() -> str:
    """DuckDB twin of the raster_field 'edt' half (engine.terrain.
    distance_transform(allocate=True)): brute min-over-(cell, source)-pairs
    within the radius for dist2, then min packed source id among the
    pairs AT that min distance for the allocation — an independent
    derivation of the engine's separable integer EDT + lexicographic
    allocation fold."""
    res = _HOTSPOT_RES
    rr = _VIS_RADIUS * _VIS_RADIUS
    return f"""
        WITH etiles AS ({_hotspot_tiles_cte()}),
        ecells AS MATERIALIZED (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS z
          FROM etiles, range(0, {res * res}) t(i)
        ), epairs AS MATERIALIZED (
          SELECT c.gx, c.gy,
                 (c.gx - s.gx) * (c.gx - s.gx)
                   + (c.gy - s.gy) * (c.gy - s.gy) AS d2,
                 (s.gx + 1048576) * 4294967296 + (s.gy + 1048576) AS ap
          FROM ecells c JOIN ecells s
            ON s.z >= {_EDT_MIN_Z}
           AND (c.gx - s.gx) * (c.gx - s.gx)
                 + (c.gy - s.gy) * (c.gy - s.gy) <= {rr}
        ), em AS MATERIALIZED (
          SELECT gx, gy, MIN(d2) AS d2 FROM epairs GROUP BY gx, gy
        ), ea AS (
          SELECT p.gx, p.gy, MIN(p.ap) AS ap
          FROM epairs p JOIN em
            ON p.gx = em.gx AND p.gy = em.gy AND p.d2 = em.d2
          GROUP BY p.gx, p.gy
        )
        SELECT 'edt' AS tag, c.gx AS a, c.gy AS b,
               CAST(COALESCE(em.d2, -1) AS BIGINT) AS c,
               CAST(COALESCE(ea.ap, -1) AS BIGINT) AS d,
               CAST(-1 AS BIGINT) AS e
        FROM ecells c
        LEFT JOIN em ON em.gx = c.gx AND em.gy = c.gy
        LEFT JOIN ea ON ea.gx = c.gx AND ea.gy = c.gy
    """


def _burn_sql() -> str:
    """DuckDB twin of the raster_field 'burn' half: the same busiest-pixel
    selection (z DESC, gx, gy), the same diamond construction ((3 + 2*i0)
    pixel radii from the pixel center, polygon 0 a 1.5-pixel donut hole),
    then engine.raster.rasterize_polygons_sql — the operand-identical
    scanline span algebra — with the same (priority DESC, poly_id) winner."""
    from engine.raster import rasterize_polygons_sql

    res = _HOTSPOT_RES
    pitch = _HOTSPOT_TILE / res
    p, rh = repr(pitch), repr(1.5 * pitch)

    def dmd(rad: str) -> str:
        return (
            f"[{{'x': cx + {rad}, 'y': cy}}, {{'x': cx, 'y': cy + {rad}}}, "
            f"{{'x': cx - {rad}, 'y': cy}}, {{'x': cx, 'y': cy - {rad}}}]"
        )

    polys = f"""(
        WITH btiles AS ({_hotspot_tiles_cte()}),
        bcells AS (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS z
          FROM btiles, range(0, {res * res}) t(i)
        ), bobs AS (
          SELECT gx, gy,
                 ROW_NUMBER() OVER (ORDER BY z DESC, gx, gy) - 1 AS i0
          FROM bcells ORDER BY z DESC, gx, gy LIMIT {_BURN_N}
        ), bgeo AS (
          SELECT i0,
                 (gx + 0.5) * {p} AS cx,
                 (gy + 0.5) * {p} AS cy,
                 (3 + 2 * i0) * {p} AS r
          FROM bobs
        )
        SELECT i0 AS poly_id,
               CASE WHEN i0 = 0 THEN [{dmd('r')}, {dmd(rh)}]
                    ELSE [{dmd('r')}] END AS rings,
               100 + i0 AS v, i0 AS pri
        FROM bgeo
    )"""
    inner = rasterize_polygons_sql(
        polys, _HOTSPOT_TILE, res, value_expr="v", priority_expr="pri"
    )
    return f"""
        SELECT 'burn' AS tag, gx AS a, gy AS b, value AS c, poly_id AS d,
               CAST(-1 AS BIGINT) AS e
        FROM ({inner})
    """


def _viewshed_sql() -> str:
    """DuckDB twin of the raster_field 'vis' half (engine.terrain.viewshed,
    conventions in terrain.np_viewshed_counts): dense pixels of the hotspot
    raster as elevation cells, the {_VIS_N_OBS} busiest pixels as observers
    (z DESC, gx, gy — the identical deterministic selection), then per
    (cell-in-range, observer) pair a lateral range(1, chebyshev) walk of the
    round-half-away lattice ray with the exact cross-multiplied strict-angle
    block test; absent sample cells are transparent via the LEFT JOIN.
    vis = pairs-in-range minus blocked pairs (a 0-sample pair — self or
    adjacent — is visible by construction, matching the engine)."""
    res = _HOTSPOT_RES
    rr = _VIS_RADIUS * _VIS_RADIUS

    def rnd(v: str, d: str) -> str:
        # round-half-away-from-zero of v/d via nonneg integer division
        return (
            f"CASE WHEN ({v}) >= 0 THEN (2 * ({v}) + ({d})) // (2 * ({d}))"
            f" ELSE -((2 * -({v}) + ({d})) // (2 * ({d}))) END"
        )

    px = rnd("t.k * s0.dx", "s0.d8")
    py = rnd("t.k * s0.dy", "s0.d8")
    return f"""
        WITH vtiles AS ({_hotspot_tiles_cte()}),
        vcells AS MATERIALIZED (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS z
          FROM vtiles, range(0, {res * res}) t(i)
        ), vobs AS MATERIALIZED (
          SELECT gx AS ox, gy AS oy, z + {_VIS_HEIGHT} AS zo
          FROM vcells ORDER BY z DESC, gx, gy LIMIT {_VIS_N_OBS}
        ), vpairs AS MATERIALIZED (
          SELECT c.gx, c.gy, o.ox, o.oy, o.zo,
                 c.z - o.zo AS bb,
                 c.gx - o.ox AS dx, c.gy - o.oy AS dy,
                 (c.gx - o.ox) * (c.gx - o.ox)
                   + (c.gy - o.oy) * (c.gy - o.oy) AS dt2,
                 GREATEST(ABS(c.gx - o.ox), ABS(c.gy - o.oy)) AS d8
          FROM vcells c JOIN vobs o
            ON (c.gx - o.ox) * (c.gx - o.ox)
                 + (c.gy - o.oy) * (c.gy - o.oy) <= {rr}
        ), vsamp AS (
          SELECT s0.gx, s0.gy, s0.ox, s0.oy, s0.zo, s0.bb, s0.dt2,
                 {px} AS px, {py} AS py
          FROM vpairs s0 JOIN range(1, {_VIS_RADIUS}) t(k) ON t.k < s0.d8
        ), vblk AS (
          SELECT q.gx, q.gy, COUNT(*) AS nblk FROM (
            SELECT s.gx, s.gy, s.ox, s.oy,
                   BOOL_OR(c.z IS NOT NULL AND (
                     ((c.z - s.zo) >= 0 AND s.bb < 0)
                     OR ((c.z - s.zo) >= 0 AND s.bb >= 0
                         AND (c.z - s.zo) * (c.z - s.zo) * s.dt2
                               > s.bb * s.bb * (s.px * s.px + s.py * s.py))
                     OR ((c.z - s.zo) < 0 AND s.bb < 0
                         AND (c.z - s.zo) * (c.z - s.zo) * s.dt2
                               < s.bb * s.bb * (s.px * s.px + s.py * s.py))
                   )) AS blk
            FROM vsamp s LEFT JOIN vcells c
              ON c.gx = s.ox + s.px AND c.gy = s.oy + s.py
            GROUP BY s.gx, s.gy, s.ox, s.oy
          ) q WHERE q.blk GROUP BY q.gx, q.gy
        ), vnp AS (
          SELECT gx, gy, COUNT(*) AS npairs FROM vpairs GROUP BY gx, gy
        )
        SELECT 'vis' AS tag, c.gx AS a, c.gy AS b,
               COALESCE(np.npairs, 0) - COALESCE(bk.nblk, 0) AS c,
               CAST(-1 AS BIGINT) AS d, CAST(-1 AS BIGINT) AS e
        FROM vcells c
        LEFT JOIN vnp np ON np.gx = c.gx AND np.gy = c.gy
        LEFT JOIN vblk bk ON bk.gx = c.gx AND bk.gy = c.gy
    """


def _d8_sql() -> str:
    """DuckDB twin of the raster_field 'd8' half: per pixel of the hotspot
    raster, steepest-descent D8 direction + exact rational-slope key +
    basin label. The argmax replays as MAX over a packed (key, priority)
    int (key * 16 + (15 - dir): highest key wins, then LOWEST dir — the
    engine's compass-priority tie-break); basins via the recursive-CTE CC
    walk (engine.graph.connected_components_sql) over the (src -> dst)
    pointer forest with sinks coalescing to themselves."""
    from engine.graph import connected_components_sql

    res = _HOTSPOT_RES
    # (dir, dx, dy, orth) in the engine's priority order E,NE,N,NW,W,S,SW,SE
    nbrs = [
        (0, 1, 0, 2), (1, 1, 1, 1), (2, 0, 1, 2), (3, -1, 1, 1),
        (4, -1, 0, 2), (5, 0, -1, 2), (6, -1, -1, 1), (7, 1, -1, 1),
    ]
    nbr_rows = ", ".join(f"({d}, {dx}, {dy}, {m})" for d, dx, dy, m in nbrs)
    pack = "(({x}) + 1048576) * 4294967296 + (({y}) + 1048576)"

    def base(sfx: str) -> str:
        # the CTE chain is needed both in the outer query and inside the CC
        # walk's pairs CTE; DuckDB rejects duplicate CTE aliases across the
        # nesting, so each copy gets its own suffix
        return f"""
        WITH tiles{sfx} AS ({_hotspot_tiles_cte()}),
        d8_cells{sfx} AS MATERIALIZED (
          SELECT tx * {res} + i % {res} AS gx,
                 ty * {res} + i // {res} AS gy,
                 counts[i + 1] AS z
          FROM tiles{sfx}, range(0, {res * res}) t(i)
        ), d8_nbrs{sfx}(dir, dx, dy, mult) AS (
          SELECT * FROM (VALUES {nbr_rows})
        ), d8_best{sfx} AS MATERIALIZED (
          SELECT c.gx, c.gy,
                 MAX((c.z - n.z) * (c.z - n.z) * o.mult * 16
                     + (15 - o.dir)) AS packed
          FROM d8_cells{sfx} c
          JOIN d8_nbrs{sfx} o ON TRUE
          JOIN d8_cells{sfx} n ON n.gx = c.gx + o.dx AND n.gy = c.gy + o.dy
          WHERE c.z - n.z > 0
          GROUP BY c.gx, c.gy
        )
    """

    edges = f"""
        {base('_e')}
        SELECT {pack.format(x='b.gx', y='b.gy')} AS src,
               {pack.format(x='b.gx + o.dx', y='b.gy + o.dy')} AS dst
        FROM d8_best_e b JOIN d8_nbrs_e o ON o.dir = 15 - (b.packed % 16)
    """
    return f"""
        {base('')}
        SELECT c.gx AS a, c.gy AS b,
               CAST(COALESCE(15 - (bst.packed % 16), -1) AS BIGINT) AS c,
               CAST(COALESCE(bst.packed // 16, 0) AS BIGINT) AS d,
               CAST(COALESCE(cc.cluster_id,
                             {pack.format(x='c.gx', y='c.gy')}) AS BIGINT) AS e
        FROM d8_cells c
        LEFT JOIN d8_best bst ON bst.gx = c.gx AND bst.gy = c.gy

        LEFT JOIN ({connected_components_sql(edges, 'src', 'dst')}) cc
          ON cc.id = {pack.format(x='c.gx', y='c.gy')}
    """


def contours_sql() -> str:
    """DuckDB twin of q_contours: the base-raster cells CTE (same derivation
    as tile_pyramid_sql's `cells`) fed through contour_segments_sql."""
    from engine.contour import contour_segments_sql

    res = _HOTSPOT_RES
    cells = f"""
        WITH tiles AS ({_hotspot_tiles_cte()})
        SELECT tx * {res} + i % {res} AS gx,
               ty * {res} + i // {res} AS gy,
               counts[i + 1] AS z
        FROM tiles, range(0, {res * res}) t(i)
        WHERE counts[i + 1] <> 0
    """
    return contour_segments_sql(cells, _CONTOUR_LEVEL)


def snap_route_sql() -> str:
    """DuckDB twin of q_snap_route: the snap argmin over the EXHAUSTIVE
    fix x segment cross join (vs the engine's cell-cover candidates — cover
    completeness is exactly what the hash check proves), projection algebra
    mirroring engine.matching._proj op for op, then the same trip split +
    consecutive-dup route compression as ordered string_agg."""
    from engine import textops

    hx = textops.cross_hash_sql("CAST(event_id AS VARCHAR)")
    hy = textops.cross_hash_sql("CAST(event_id AS VARCHAR) || 'y'")
    gap_us = int(_SNAP_GAP_MIN * 60_000_000)
    r2 = repr(_SNAP_RADIUS * _SNAP_RADIUS)
    rows = []
    for lid, pts in _ROADS:
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            rows.append(
                f"({lid}::BIGINT, {i}::BIGINT, {ax!r}, {ay!r}, {bx!r}, {by!r})"
            )
    segs = ",\n            ".join(rows)
    return f"""
        WITH fixes AS (
          SELECT CAST(user_id AS BIGINT) AS uid,
                 CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                 (({hx}) % 100000) / 1000.0 AS x,
                 (({hy}) % 60000) / 1000.0 AS y
          FROM events
        ), segs AS (
          SELECT * FROM (VALUES
            {segs}
          ) AS t(line_id, seg_idx, ax, ay, bx, by)
        ), cand0 AS (
          SELECT uid, ts_us, x, y, line_id, seg_idx, ax, ay,
                 bx - ax AS vx, by - ay AS vy
          FROM fixes, segs
        ), cand1 AS (
          SELECT *, CASE WHEN vx * vx + vy * vy > 0.0
                         THEN ((x - ax) * vx + (y - ay) * vy)
                                / (vx * vx + vy * vy)
                         ELSE 0.0 END AS t_raw
          FROM cand0
        ), cand2 AS (
          SELECT *, ax + LEAST(GREATEST(t_raw, 0.0), 1.0) * vx AS qx,
                    ay + LEAST(GREATEST(t_raw, 0.0), 1.0) * vy AS qy
          FROM cand1
        ), cand AS (
          SELECT uid, ts_us, x, y, line_id, seg_idx,
                 (x - qx) * (x - qx) + (y - qy) * (y - qy) AS d2
          FROM cand2
        ), best AS (
          SELECT uid, ts_us, x, y, line_id
          FROM (SELECT *, ROW_NUMBER() OVER (
                            PARTITION BY uid, ts_us, x, y
                            ORDER BY d2, line_id, seg_idx) AS rn
                FROM cand WHERE d2 <= {r2})
          WHERE rn = 1
        ), j AS (
          SELECT f.uid, f.ts_us, f.x, f.y, b.line_id AS line
          FROM fixes f LEFT JOIN best b USING (uid, ts_us, x, y)
        ), tr0 AS (
          SELECT *, LAG(ts_us) OVER (PARTITION BY uid ORDER BY ts_us, x, y)
                      AS prev_ts
          FROM j
        ), tr AS (
          SELECT uid, ts_us, x, y, line,
                 CAST(SUM(CASE WHEN prev_ts IS NULL
                                 OR ts_us - prev_ts > {gap_us}
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY uid ORDER BY ts_us, x, y
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS trip_idx
          FROM tr0
        ), st0 AS (
          SELECT *, LAST_VALUE(line IGNORE NULLS)
                      OVER (PARTITION BY uid, trip_idx ORDER BY ts_us, x, y
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS lastline
          FROM tr
        ), st AS (
          SELECT *, CASE WHEN line IS NOT NULL
                           AND (lastline IS NULL OR line <> lastline)
                         THEN 1 ELSE 0 END AS step
          FROM st0
        )
        SELECT uid AS user_id, trip_idx,
               COALESCE(string_agg(CASE WHEN step = 1
                                        THEN CAST(line AS VARCHAR) END, '-'
                                   ORDER BY ts_us, x, y), '') AS route_str,
               COUNT(*) AS n_points,
               COUNT(line) AS n_matched,
               CAST(SUM(step) AS BIGINT) AS steps
        FROM st GROUP BY 1, 2
    """


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on content: keep min doc_id per text, report
    duplicate multiplicity (md5 is standard — identical across engines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.md5(F.col("text")).alias("fp")).agg(
        F.min(F.col("doc_id").cast("long")).alias("keep_doc_id"),
        F.count("*").alias("dup_count"),
    )


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated per-doc text metrics (VERDICT r3 item 6 + the round-4
    text_quality merge that freed a slot for tile_bundle): whitespace token
    count, char count, chars/token (scaled int), BPE-ish pre-tokenizer count
    (engine.textops._BPE_PATTERN), stopword occurrences via length-difference
    counting, PLUS the quality heuristics (engine.textops.quality_score) and
    language ID (engine.textops.lang_id) formerly in their own row. All
    Column-only — one scan, no shuffle; every half stays hash-checked."""
    from engine import textops
    from engine.textops import _BPE_PATTERN

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntok = F.size(F.split(F.col("text"), " "))
    q = textops.quality_score(F.col("text"))

    def occurrences(word: str):
        pat = f" {word} "
        return (F.length("text") - F.length(F.replace(F.col("text"), F.lit(pat), F.lit("")))) / len(pat)

    n_stop = sum(occurrences(w) for w in ["the", "and", "of"])
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        ntok.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_m"),
        F.floor(F.length("text") * 1000.0 / ntok).cast("long").alias("chars_per_tok_e3"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        n_stop.cast("long").alias("n_stop"),
        q.getField("n_tokens").alias("q_n_tokens"),
        q.getField("mean_token_len_e3").alias("mean_token_len_e3"),
        q.getField("stop_ratio_e3").alias("stop_ratio_e3"),
        q.getField("digit_ratio_e3").alias("digit_ratio_e3"),
        textops.lang_id(F.col("text")).alias("lang_guess"),
    )


def q_rollup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level hierarchy rollup res 11 -> 9 (engine.propagate.rollup_cells):
    each level aggregates the previous level's 4x-smaller output — the graft analog
    of the reference's bounded propagation loop (SparkJobs.scala:43-76)."""
    from engine import propagate

    pts = _docs_points(spark, sf_dir)
    fine = pts.select(cells.grid_encode_phash(F.col("phash"), 11).alias("cell"))
    return propagate.rollup_cells(fine, 11, 9).select(
        "cell", F.col("n").alias("n"), F.col("res").cast("long").alias("res")
    )


def _lineitem_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic OBJECT_VERSIONS-shaped history derived from lineitem with
    pure Column math (every derivation has an ANSI-SQL twin): entity =
    l_orderkey (node/way/relation by key mod 3), version = l_linenumber, tags a
    2-5 key map with a conditional 'promo' key, a {type: multipolygon}
    non-feature case, and a standing type=multipolygon key on feature RELATION
    versions (so they have geometry); node coords from part/supp keys; way
    children are consecutive node-ref ranges and relation children consecutive
    WAY-ref ranges (a real node->way->relation tree, so the propagation
    pipeline reaches depth 2). Exercises every change type of
    engine.diff.first_order_changes (ChangeUtils.scala:21-55) while staying
    DuckDB-reproducible — unlike the PRNG fixture behind change_pipeline."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") < 2000
    )
    key = F.col("l_orderkey").cast("long")
    m3 = key % 3
    typ = F.when(m3 == 0, "node").when(m3 == 1, "way").otherwise("relation")
    is_mp = ((key + F.col("l_linenumber")) % 37) == 0
    promo = F.col("l_quantity") > 25
    is_rel = m3 == 2
    # relations carry type=multipolygon in their FEATURE tag maps too, so
    # feature relation versions have geometry (ObjectVersion.hasGeometry needs
    # it) — the propagation pipeline's depth-2 saves depend on this
    base_map = F.when(
        is_rel,
        F.create_map(
            F.lit("type"), F.lit("multipolygon"),
            F.lit("flag"), F.col("l_returnflag"),
            F.lit("status"), F.col("l_linestatus"),
        ),
    ).otherwise(
        F.create_map(
            F.lit("flag"), F.col("l_returnflag"), F.lit("status"), F.col("l_linestatus")
        )
    )
    promo_map = F.when(
        is_rel,
        F.create_map(
            F.lit("type"), F.lit("multipolygon"),
            F.lit("flag"), F.col("l_returnflag"),
            F.lit("status"), F.col("l_linestatus"),
            F.lit("promo"), F.lit("y"),
        ),
    ).otherwise(
        F.create_map(
            F.lit("flag"), F.col("l_returnflag"), F.lit("status"), F.col("l_linestatus"),
            F.lit("promo"), F.lit("y"),
        )
    )
    tags = F.when(
        is_mp, F.create_map(F.lit("type"), F.lit("multipolygon"))
    ).otherwise(F.when(promo, promo_map).otherwise(base_map))
    is_node = m3 == 0
    lon = F.when(is_node, (F.col("l_partkey") % 360 - 180).cast("double"))
    lat = F.when(is_node, (F.col("l_suppkey") % 180 - 90).cast("double"))
    ref_lo = F.col("l_suppkey").cast("long") % 100
    ref_hi = ref_lo + F.col("l_partkey").cast("long") % 3
    # ways reference nodes; relations reference WAYS — a real 3-level tree, so
    # propagation reaches depth 2 (node -> way -> relation)
    child_type = F.when(is_rel, "way").otherwise("node")
    children = F.when(
        ~is_node,
        F.transform(
            F.sequence(ref_lo, ref_hi),
            lambda r: F.struct(
                child_type.alias("type"), r.alias("ref"), F.lit("").alias("role")
            ),
        ),
    )
    return li.select(
        cells.pack_feature_id(key, typ).alias("id"),
        typ.alias("type"),
        F.col("l_linenumber").cast("int").alias("version"),
        F.col("l_shipdate").alias("timestamp"),
        (F.col("l_quantity") > 2).alias("visible"),
        tags.alias("tags"),
        lon.alias("lon"),
        lat.alias("lat"),
        children.alias("children"),
        (F.col("l_suppkey").cast("long") % 50).alias("changeset"),
    )


def q_change_firstorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/§2.6 hash-checked: engine.diff.first_order_changes (the flagship
    pipeline's first stage, ChangeUtils.scala:21-55) over the Column-math
    lineitem history — scalar projection (maps/bboxes stay internal) so the
    full 10-type emitter logic is value-checked against the DuckDB twin."""
    _ensure_utc(spark)
    from engine import diff

    out = diff.first_order_changes(_lineitem_history(spark, sf_dir))
    return out.select(
        F.col("featureID").cast("long").alias("featureID"),
        F.col("changeType").cast("long").alias("changeType"),
        F.col("count").cast("long").alias("cnt"),
        _epoch_us(F.col("timestamp")).alias("ts_us"),
        F.col("changeset").cast("long").alias("changeset"),
        "save",
        "propagate",
    )


def q_change_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 hash-checked on the real pipeline operator: changes_to_save ->
    engine.coalesce.coalesce_changes (ChangeUtils.scala:93-104) over the same
    derived history."""
    _ensure_utc(spark)
    from engine import coalesce, diff

    fo = diff.changes_to_save(
        diff.first_order_changes(_lineitem_history(spark, sf_dir))
    )
    co = coalesce.coalesce_changes(fo)
    return co.select(
        F.col("featureID").cast("long").alias("featureID"),
        F.col("changeType").cast("long").alias("changeType"),
        F.col("count").cast("long").alias("cnt"),
        _epoch_us(F.col("timestamp")).alias("ts_us"),
        F.col("changeset").cast("long").alias("changeset"),
        F.col("depth").cast("long").alias("depth"),
    )


def q_change_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full change pipeline (first-order diff -> temporal parent tree -> bounded
    propagation -> coalesce) — the end-to-end rebuild of
    SparkJobs.generateChanges (SparkJobs.scala:10-82) — over the deterministic
    Column-math lineitem history, so the WHOLE pipeline is value-checked
    against an unrolled per-depth DuckDB oracle (the fixture's node->way->
    relation tree drains after 3 rounds; changes save at depths 0, 1 and 2).
    drop_rootless=False (the documented improvement mode): top-level ways and
    relations keep geometry-only tree entries, so changes propagating INTO
    them are assigned and saved rather than silently dropped."""
    _ensure_utc(spark)
    from engine import propagate

    out = propagate.propagate_changes(
        _lineitem_history(spark, sf_dir), do_coalesce=True, depth=6,
        drop_rootless=False,
    )
    return out.select(
        F.col("featureID").cast("long").alias("featureID"),
        F.col("changeType").cast("long").alias("changeType"),
        F.col("count").cast("long").alias("cnt"),
        _epoch_us(F.col("timestamp")).alias("ts_us"),
        F.col("changeset").cast("long").alias("changeset"),
        F.col("depth").cast("long").alias("depth"),
    )


def q_streaming_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged Structured Streaming surface (engine.streaming), driven to
    completion against deterministic multi-batch directories: (a) file-source
    ingest -> watermarked per-cell windowed counts; (b) the custom stateful
    sessionizer (applyInPandasWithState, event-time state expiry); (c) a
    watermarked stream-stream interval join (images x trailing labels, state
    bounded by the two-sided time-range predicate). Returned as
    DIGEST rows (metric, value) — streaming state is non-SQL-expressible, so
    the driver records a rows-only check while the exact values are pinned by
    the committed golden (tests/golden/golden_digests.json, asserted in
    tests/test_streaming.py) and batch==streaming equality by the rest of that
    module."""
    import datetime as dt
    import shutil
    import tempfile

    from engine import streaming

    base = dt.datetime(2024, 1, 1)
    d1 = tempfile.mkdtemp(prefix="stream_q_")
    d2 = tempfile.mkdtemp(prefix="stream_sess_q_")
    d3 = tempfile.mkdtemp(prefix="stream_lbl_q_")
    try:
        for batch in range(3):
            rows = [
                (
                    f"img{batch:02d}_{i:04d}",
                    (batch * 1000 + i) * 2654435761 % (2**62),
                    f"caption {batch}/{i}",
                    base + dt.timedelta(minutes=5 * batch),
                )
                for i in range(60)
            ]
            spark.createDataFrame(
                rows, schema=streaming.STREAM_IMAGES_SCHEMA
            ).coalesce(1).write.mode("append").parquet(d1)
            sess_rows = [
                (
                    f"k{i % 7}",
                    0,
                    None,
                    base + dt.timedelta(minutes=40 * batch + (i % 5)),
                )
                for i in range(35)
            ]
            spark.createDataFrame(
                sess_rows, schema=streaming.STREAM_IMAGES_SCHEMA
            ).coalesce(1).write.mode("append").parquet(d2)
            # trailing labels: lag = i%20 minutes -> joined iff lag <= 15
            # (max_lag); label lN with N = i%4. The golden values are
            # derived INDEPENDENTLY in pure Python (FIXTURES.md §5):
            # n_joined = 3*48, checksum = sum (b*1000+i)*((i%4)+1) over
            # joined (b, i).
            lbl_rows = [
                (
                    f"img{batch:02d}_{i:04d}",
                    f"l{i % 4}",
                    base + dt.timedelta(minutes=5 * batch + (i % 20)),
                )
                for i in range(60)
            ]
            spark.createDataFrame(
                lbl_rows, schema=streaming.STREAM_LABELS_SCHEMA
            ).coalesce(1).write.mode("append").parquet(d3)

        agg = streaming.streaming_cell_counts(
            streaming.read_image_stream(spark, d1), res=5, window="10 minutes"
        )
        q = streaming.run_to_memory(agg, "q_stream_cells", output_mode="complete")
        try:
            cells_pdf = spark.sql(
                "SELECT COUNT(DISTINCT cell) AS n_cells, "
                "CAST(SUM(n_images) AS BIGINT) AS total_images, "
                "CAST(SUM((cell % 1000000007) * n_images) AS BIGINT) AS checksum "
                "FROM q_stream_cells"
            ).toPandas()
        finally:
            q.stop()

        sess = streaming.streaming_sessionize(
            streaming.read_image_stream(spark, d2, max_files_per_trigger=1),
            key="image_id", ts="event_time", gap_minutes=30,
        )
        q2 = streaming.run_to_memory(sess, "q_stream_sess", output_mode="append")
        try:
            sess_pdf = spark.sql(
                "SELECT COUNT(*) AS n_sessions, "
                "CAST(SUM(n_events) AS BIGINT) AS total_events, "
                "CAST(SUM(session_start_us) AS BIGINT) AS sum_start_us, "
                "CAST(SUM(session_end_us) AS BIGINT) AS sum_end_us "
                "FROM q_stream_sess"
            ).toPandas()
        finally:
            q2.stop()

        sj = streaming.streaming_interval_join(
            streaming.read_image_stream(spark, d1).select(
                "image_id", "event_time"
            ),
            spark.readStream.format("parquet")
            .schema(streaming.STREAM_LABELS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(d3),
        )
        q3 = streaming.run_to_memory(sj, "q_stream_join", output_mode="append")
        try:
            join_pdf = spark.sql(
                "SELECT COUNT(*) AS n_joined, "
                "CAST(SUM((CAST(regexp_extract(image_id, 'img(\\\\d+)_(\\\\d+)', 1)"
                " AS BIGINT) * 1000 + "
                "CAST(regexp_extract(image_id, 'img(\\\\d+)_(\\\\d+)', 2) AS BIGINT))"
                " * (CAST(substr(label, 2) AS BIGINT) + 1)) AS BIGINT) AS checksum "
                "FROM q_stream_join"
            ).toPandas()
        finally:
            q3.stop()

        out = [("cells_" + c, int(cells_pdf[c].iloc[0]))
               for c in ["n_cells", "total_images", "checksum"]]
        out += [("sess_" + c, int(sess_pdf[c].iloc[0]))
                for c in ["n_sessions", "total_events", "sum_start_us",
                          "sum_end_us"]]
        out += [("join_" + c, int(join_pdf[c].iloc[0]))
                for c in ["n_joined", "checksum"]]
        return spark.createDataFrame(
            sorted(out), schema="metric string, value long"
        )
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
        shutil.rmtree(d3, ignore_errors=True)


def q_olap_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets + ordered-set aggregates in one row (digest-merge of the
    old cube_agg and percentiles rows): CUBE over (returnflag, linestatus)
    with counts, sums, and exact interpolated percentiles (Spark percentile
    == ANSI percentile_cont) per cube group, floor-scaled to int."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.col("l_quantity").cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(qty).alias("sum_qty"),
        F.floor(F.expr("percentile(CAST(l_quantity AS BIGINT), 0.5)") * 100)
        .cast("long").alias("p50_qty_cents"),
        F.floor(F.expr("percentile(CAST(l_quantity AS BIGINT), 0.9)") * 100)
        .cast("long").alias("p90_qty_cents"),
    )


def q_cell_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-set compaction (engine.cells.compact_cells — the H3-compact
    analog on the aperture-4 grid) + roundtrip: 'compact' rows are the
    minimal cell set for the res-5 anchor cells of the documents corpus,
    'roundtrip' rows uncompact that set back to res 5 and must equal the
    original distinct encode — which is exactly what the DuckDB twin
    computes for that part, so the roundtrip is value-checked without any
    uncompact logic in SQL."""
    pts = _docs_points(spark, sf_dir)
    c5 = pts.select(cells.grid_encode_phash(F.col("phash"), 5).alias("cell")).distinct()
    compacted = cells.compact_cells(c5, min_res=2).localCheckpoint()
    back = cells.uncompact_cells(compacted, 5)
    return (
        compacted.select(F.lit("compact").alias("part"), "cell")
        .unionByName(back.select(F.lit("roundtrip").alias("part"), "cell"))
    )


def q_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged binary-image surface (BASELINE.json input_hint): (a) decode every
    image's binary payload, round-trip through its own codec, check PSNR>=40dB
    + caption presence (engine.image_codec.verify_images_batches); (b) decode +
    per-image feature extraction with per-row error isolation
    (engine.multimodal.extract_features). Both Arrow-batched mapInPandas over
    deterministic seeded synth images. Returned as DIGEST rows (metric, value)
    so the driver's rows-only check sees a stable shape AND the exact values
    are pinned by the committed golden (tests/golden/golden_digests.json,
    asserted in tests/test_codec_synth.py). Binary payloads have no SQL twin:
    rows-only."""
    from engine import image_codec, multimodal

    imgs = synth.images_df(spark, 200, with_bytes=True)
    ver = imgs.mapInPandas(
        image_codec.verify_images_batches(), schema=image_codec.VERIFY_SCHEMA
    )
    vd = ver.groupBy().agg(
        F.count("*").alias("n_images"),
        F.sum(F.when(F.col("pixels_ok"), 1).otherwise(0)).alias("n_pixels_ok"),
        F.sum(F.when(F.col("caption_ok"), 1).otherwise(0)).alias("n_caption_ok"),
        F.sum(F.when(F.col("psnr_db") >= 40.0, 1).otherwise(0)).alias("n_psnr40"),
    )
    v = vd.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"verify_{c}").alias("metric"),
                        F.col(c).cast("long").alias("value"),
                    )
                    for c in ["n_images", "n_pixels_ok", "n_caption_ok", "n_psnr40"]
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    feats = multimodal.extract_features(synth.images_df(spark, 240, with_bytes=True))
    fd = feats.groupBy("fmt").agg(
        F.count("*").alias("n_images"),
        F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("n_decoded"),
        F.floor(F.avg("brightness") * 100).cast("long").alias("avg_brightness_e2"),
        F.floor(F.avg("edge_energy") * 100).cast("long").alias("avg_edge_e2"),
    )
    f = fd.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.concat(F.col("fmt"), F.lit(f"_{c}")).alias("metric"),
                        F.col(c).cast("long").alias("value"),
                    )
                    for c in ["n_images", "n_decoded", "avg_brightness_e2",
                              "avg_edge_e2"]
                ]
            )
        ).alias("kv")
    ).select("kv.*")

    # (c) per-tile thumbnail mosaics (engine.multimodal.tile_mosaic): the
    # image x geo composition — capped members, fixed-size raw-RGB24 canvas.
    # Digest = tile/member/error counts + the exact pixel sum across every
    # canvas (golden-pinned from an independent numpy derivation in
    # tests/gen_goldens.py).
    @F.pandas_udf("long")
    def _bytes_sum(b: pd.Series) -> pd.Series:
        import numpy as _np

        return b.map(lambda v: int(_np.frombuffer(v, dtype=_np.uint8).sum(dtype=_np.int64)))

    tiles_src = synth.images_df(spark, 200, with_bytes=True).withColumn(
        "tile_id", cells.grid_encode_phash(F.col("phash"), 2)
    )
    mos = multimodal.tile_mosaic(tiles_src, grid=3, thumb=8)
    md = mos.groupBy().agg(
        F.count("*").alias("mosaic_n_tiles"),
        F.sum("n_images").alias("mosaic_n_members"),
        F.sum("n_errors").alias("mosaic_n_errors"),
        F.sum(_bytes_sum(F.col("mosaic"))).alias("mosaic_pixel_sum"),
    )
    m = md.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("metric"), F.col(c).cast("long").alias("value"))
                    for c in ["mosaic_n_tiles", "mosaic_n_members",
                              "mosaic_n_errors", "mosaic_pixel_sum"]
                ]
            )
        ).alias("kv")
    ).select("kv.*")

    # (d) LOSSY leg — block-DCT payloads (engine.image_codec.encode_bdct,
    # pure-numpy JPEG-shaped codec) over smooth deterministic content: the
    # verify gate's bdct branch (decode -> re-encode at the stream's own
    # quality -> decode, PSNR>=40) runs in-pipeline, and the fidelity kernel
    # (engine.synth.lossy_fidelity_batches) additionally checks ORIGINAL vs
    # decoded — actually lossy (every image differs from its source) while
    # every PSNR lands in [40, 50) dB. Values golden-pinned like the rest.
    lossy_src = synth.lossy_images_df(spark, 160)
    lv = lossy_src.mapInPandas(
        image_codec.verify_images_batches(), schema=image_codec.VERIFY_SCHEMA
    )
    lvd = lv.groupBy().agg(
        F.count("*").alias("lossy_verify_n_images"),
        F.sum(F.when(F.col("pixels_ok"), 1).otherwise(0)).alias(
            "lossy_verify_n_pixels_ok"
        ),
        F.sum(F.when(F.col("psnr_db") >= 40.0, 1).otherwise(0)).alias(
            "lossy_verify_n_psnr40"
        ),
    )
    lf = lossy_src.mapInPandas(
        synth.lossy_fidelity_batches(),
        schema="image_id string, psnr_e2 long, lossy boolean",
    )
    lfd = lf.groupBy().agg(
        F.sum(F.when(F.col("lossy"), 1).otherwise(0)).alias("lossy_n_lossy"),
        F.sum(
            F.when((F.col("psnr_e2") >= 4000) & (F.col("psnr_e2") < 5000), 1)
            .otherwise(0)
        ).alias("lossy_n_psnr_40_50"),
        F.min("psnr_e2").alias("lossy_min_psnr_e2"),
        F.max("psnr_e2").alias("lossy_max_psnr_e2"),
    )
    lo = lvd.crossJoin(lfd)
    lcols = [
        "lossy_verify_n_images", "lossy_verify_n_pixels_ok",
        "lossy_verify_n_psnr40", "lossy_n_lossy", "lossy_n_psnr_40_50",
        "lossy_min_psnr_e2", "lossy_max_psnr_e2",
    ]
    lg = lo.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("metric"), F.col(c).cast("long").alias("value")
                    )
                    for c in lcols
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    return v.unionByName(f).unionByName(m).unionByName(lg).orderBy("metric")


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 interval variant (engine.joins.interval_join): assign each lineitem to
    the year bucket containing its shipdate (literal broadcast dim + range
    predicate)."""
    _ensure_utc(spark)
    import datetime as dt

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_shipdate"),
        F.lit(0).alias("k"),
    )
    years = spark.createDataFrame(
        [(0, y, dt.datetime(y, 1, 1), dt.datetime(y + 1, 1, 1)) for y in
         range(1992, 2000)],
        ["k", "year", "t_from", "t_to"],
    )
    out = joins.interval_join(li, F.broadcast(years), on="k",
                              left_ts="l_shipdate", right_from="t_from",
                              right_to="t_to")
    return out.groupBy(F.col("year").cast("long").alias("year")).agg(
        F.count("*").alias("n_items")
    )


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — the external SQL query surface (README.md:85-124 analog): registered
    views + spark.sql multi-join aggregation (customer->orders->lineitem->nation)."""
    for t in ["customer", "orders", "lineitem", "nation"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000)
                   AS BIGINT)) AS revenue_e4,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF terms (engine.textops.tfidf_top_terms): integer
    rank tuple, floor-scaled score — hash-checked against the SQL twin."""
    from engine import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.tfidf_top_terms(docs, "doc_id", "text", k=5)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table
    (engine.embedops.cosine_topk): queries = vec_id < 10, k = 5."""
    from engine import embedops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = embedops.cosine_topk(queries, emb, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate NN (engine.embedops.lsh_ann_topk) on the
    deterministic HOF kernel — oracle-checked against lsh_ann_topk_sql (the
    seeded hyperplanes are embedded as double literals in the generated SQL;
    the uncapped multiprobe set equals a Hamming-ball bucket join). The gemm
    kernel is the production path; hof==gemm parity is asserted in
    tests/test_embedops.py."""
    from engine import embedops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = embedops.lsh_ann_topk(queries, emb, k=5, dim=64, n_planes=8,
                                multiprobe_bits=2, kernel="hof")
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate NN (engine.embedops.ivf_ann_topk): coarse
    quantizer (cross-engine md5-ordered centroid sample) + inverted-list probe
    + exact double-precision rerank, on the deterministic HOF kernel —
    oracle-checked against ivf_ann_topk_sql."""
    from engine import embedops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = embedops.ivf_ann_topk(queries, emb, k=5, n_centroids=16, n_probe=4,
                                kernel="hof")
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 (engine.embedops.ivf_sq8_topk) at its SQL-checkable registry
    config: sampled md5-ordered centroids (the untrained contract), spill=2
    list assignment, m_rerank >= all candidates + kernel='hof' so the int8
    prefilter is a no-op and the output is exactly 'exact rerank over the
    union of spilled probed lists' — hash-checked against ivf_sq8_cov_sql.
    The int8 scan + trained quantizer (the high-recall operating point) are
    gated by pytest invariants and the sq8_hirecall bench instead (the
    lloyd_iters/train_iters oracle contract)."""
    import numpy as np

    from engine import embedops, textops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sample_key = textops.cross_hash(
        F.concat(F.col("vec_id").cast("string"), F.lit(":42")), "md5"
    )
    rows = emb.select("embedding").orderBy(sample_key).limit(16).collect()
    cents = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    out = embedops.ivf_sq8_topk(
        queries, emb, k=5, n_centroids=16, n_probe=4, spill=2,
        m_rerank=1 << 30, kernel="hof", cents=cents,
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH + IVF + IVF-SQ8 approximate-NN in one registry row (merged to free
    a slot — VERDICT r3 item 6 discipline): union of the hash-checked method
    results tagged by a method column. The exact/lsh/ivf halves are unchanged
    from their previously-green rows; 'sq8' is the r5 spilled-coverage config
    (q_ann_sq8)."""
    exact = q_cosine_topk(spark, sf_dir).withColumn("method", F.lit("exact"))
    lsh = q_ann_lsh(spark, sf_dir).withColumn("method", F.lit("lsh"))
    ivf = q_ann_ivf(spark, sf_dir).withColumn("method", F.lit("ivf"))
    sq8 = q_ann_sq8(spark, sf_dir).withColumn("method", F.lit("sq8"))
    return exact.unionByName(lsh).unionByName(ivf).unionByName(sq8)


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image phash near-dup clustering (engine.imagesim): pigeonhole-blocked
    hamming pairs over DISTINCT codes + connected components over the code
    graph + one equi-join back — the only shape that survives hot phashes at
    10^12 images (a million-copy meme is ONE code-graph node). Oracle codes
    derive from documents.text via the cross-engine md5 hash masked to every
    4th bit (15 effective bits -> planted near-collisions at hamming <= 2);
    production input is the images table's phash int64 directly
    (imagesim.phash_dedup_clusters defaults, tests/test_imagesim.py)."""
    from engine import imagesim, textops

    mask = 0x1111111111111111
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    coded = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textops.cross_hash(F.col("text"), "md5")
        .bitwiseAND(F.lit(mask))
        .alias("code"),
    )
    out = imagesim.phash_dedup_clusters(
        coded, id_col="doc_id", code_col="code", max_hamming=2
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("code").cast("long").alias("code"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the capped-probe LSH regime, hash-checked (VERDICT r3 items
    1+6): n_planes=14, multiprobe_bits=2, max_probes=47 — the cap genuinely
    bites (47 of 106 probes). Exact top-5 (cosine_topk hof) vs the capped
    static-order hof path (the deterministic twin of the production gemm
    kernel, whose margin-ordered capped recall is additionally gated in
    tests/test_embedops.py::test_lsh_capped_recall). Emits one row:
    (n_exact, n_hit, recall_e6)."""
    from engine import embedops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = embedops.cosine_topk(queries, emb, k=5, kernel="hof").select(
        "query_id", "vec_id"
    )
    approx = embedops.lsh_ann_topk(
        queries, emb, k=5, dim=64, n_planes=14, multiprobe_bits=2,
        kernel="hof", max_probes=47,
    ).select("query_id", "vec_id", F.lit(1).alias("_m"))
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce(F.col("_m"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            "n_exact",
            "n_hit",
            F.floor(F.col("n_hit") * 1000000 / F.col("n_exact"))
            .cast("long")
            .alias("recall_e6"),
        )
    )


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (engine.textops.minhash_lsh_pairs) on the
    cross-engine md5 hash path — oracle-checked end-to-end against
    textops.minhash_lsh_pairs_sql (xxhash64 stays the production default)."""
    from engine import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textops.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.8, ngram=3, hash_impl="md5"
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.floor(F.col("jaccard") * 1000).cast("long").alias("jaccard_e3"),
    )


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (engine.textops.simhash_near_dups) on the md5 hash
    path — oracle-checked against textops.simhash_near_dups_sql (lossless chunk
    blocking: output == all pairs with hamming <= 3)."""
    from engine import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textops.simhash_near_dups(
        docs, "doc_id", "text", max_hamming=3, hash_impl="md5"
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_cell_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex + S2 + geohash cell encodings (engine.cells hex_encode_udf /
    s2_encode_udf numpy pandas_udfs; geohash_phash Column-only base32) as one
    tagged union — all three families' histograms stay hash-checked against
    their DuckDB twins in a single registry row (r3 merged hex+s2 to free a
    slot for geo_ann; r4 folds in the former geohash row to free one for
    geom_measures). Cells ride as strings so the base32 family unions with
    the integer ones; `aux` carries geohash's full-precision min (its
    string-hierarchy check), empty for hex/s2."""
    pts = _docs_points(spark, sf_dir)
    hexes = (
        pts.select(cells.hex_encode_udf(6)(F.col("lon"), F.col("lat")).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
        .select(F.lit("hex").alias("fam"), F.col("cell").cast("string").alias("cell"),
                "n_points", F.lit("").alias("aux"))
    )
    s2 = (
        pts.select(cells.s2_encode_udf(12)(F.col("lon"), F.col("lat")).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
        .select(F.lit("s2").alias("fam"), F.col("cell").cast("string").alias("cell"),
                "n_points", F.lit("").alias("aux"))
    )
    gh = (
        pts.select(cells.geohash_phash(F.col("phash"), 8).alias("gh8"))
        .groupBy(F.substring("gh8", 1, 5).alias("cell"))
        .agg(F.count("*").alias("n_points"), F.min("gh8").alias("aux"))
        .select(F.lit("gh").alias("fam"), "cell", "n_points", "aux")
    )
    return hexes.unionByName(s2).unionByName(gh)


def q_geo_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-constrained similarity search (engine.geoann.geo_ann_topk): exact
    cosine top-5 within a 3000 km haversine radius over the geotagged
    embedding corpus (anchors derive from the vec_id pseudo-phash). The cell
    cover + equi-join + window plan is the scale path; the DuckDB twin is the
    brute-force radius join (parity also fuzz-tested in tests/test_geoann.py
    incl. polar full-wrap and antimeridian covers)."""
    from engine import geoann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ph = cells.synth_phash(F.col("vec_id").cast("long"))
    geo = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        cells.anchor_lon(ph).alias("lon"),
        cells.anchor_lat(ph).alias("lat"),
    )
    queries = geo.filter(F.col("vec_id") % 25 == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    out = geoann.geo_ann_topk(queries, geo, radius_m=3_000_000.0, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.floor(F.col("sim") * 1000000).cast("long").alias("sim_e6"),
        F.floor(F.col("dist_m") * 1000).cast("long").alias("dist_mm"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs (engine.textops.ngram_jaccard_pairs) over a
    bounded document subset — the brute-force oracle of the MinHash/LSH path,
    itself oracle-checked here (jaccard = inter/union of exact int sets: double
    division is IEEE-identical across engines)."""
    from engine import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    out = textops.ngram_jaccard_pairs_indexed(
        docs, "doc_id", "text", ngram=3, threshold=0.05
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.floor(F.col("jaccard") * 1000).cast("long").alias("jaccard_e3"),
    )


def q_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (engine.embedops.cosine_near_dups, exact
    mode on a bounded subset). Cosine computed double-cast per element, summed in
    array order — measured bit-identical to the DuckDB twin (44850/44850 exact),
    so the e6-scaled sim is hash-safe."""
    from engine import embedops

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 300
    )
    out = embedops.cosine_near_dups(emb, "vec_id", "embedding", threshold=0.25,
                                    mode="exact")
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.floor(F.col("sim") * 1000000).cast("long").alias("sim_e6"),
    )


def q_rel_window_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the former semi_anti_join + window_range rows (merged to
    free a registry slot for dedup_cluster, same consolidation pattern as
    cell_families): rows tagged 'semi_anti' carry (nationkey, has_orders,
    customer count); rows tagged 'wrange' carry (user, event, trailing-1h
    int64-cents running sum over a RANGE frame). Both halves stay hash-checked
    verbatim against their DuckDB twins."""
    sa = q_semi_anti_join(spark, sf_dir).select(
        F.lit("semi_anti").alias("tag"),
        F.col("c_nationkey").alias("k1"),
        F.col("has_orders").cast("long").alias("k2"),
        F.col("n").alias("v1"),
        F.lit(-1).cast("long").alias("v2"),
    )
    wr = q_window_range(spark, sf_dir).select(
        F.lit("wrange").alias("tag"),
        F.col("user_id").alias("k1"),
        F.col("event_id").alias("k2"),
        F.col("ts_us").alias("v1"),
        F.col("trail_cents").alias("v2"),
    )
    return sa.unionByName(wr)


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering family, tagged union (merged this session to give DBSCAN a
    driver-checked row at the 50-row cap, same consolidation pattern as knn /
    geom_line):

    tag='neardup' — the previous dedup_cluster row verbatim: MinHash+LSH
    pairs (md5 oracle path) -> distributed connected components ->
    (id=doc_id, label=cluster_id = min doc in component, flag=-1);
    hash-checked against a DuckDB recursive-CTE walk over the same pairs.

    tag='dbscan' — engine.cluster.dbscan over the phash-derived anchor
    points folded to a 4096^2 integer planar space (x>>20, y>>19): eps=180,
    min_pts=5 (at sf0.01: 186 cores in 96 clusters, 281 border, 33 noise —
    every code path live). All distance/blocking math is integer-valued in
    doubles (exact), so the brute-force DuckDB twin reproduces core sets,
    min-label components (recursive CTE), border min-assignment and noise
    bit-for-bit. (id, label = cluster min core id or -1, flag = is_core)."""
    from engine import graph, textops
    from engine.cluster import dbscan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = textops.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.8, ngram=3, hash_impl="md5"
    )
    nd = graph.neardup_clusters(pairs).select(
        F.lit("neardup").alias("tag"),
        F.col("id").cast("long").alias("id"),
        F.col("cluster_id").cast("long").alias("label"),
        F.lit(-1).cast("long").alias("flag"),
    )
    pts = _docs_points(spark, sf_dir).select(
        "doc_id",
        F.shiftrightunsigned(F.col("x"), 20).alias("x"),
        F.shiftrightunsigned(F.col("y"), 19).alias("y"),
    )
    db = dbscan(pts, eps=180.0, min_pts=5, id_col="doc_id").select(
        F.lit("dbscan").alias("tag"),
        F.col("doc_id").alias("id"),
        F.col("label"),
        F.col("is_core").cast("long").alias("flag"),
    )
    return nd.unionByName(db)


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (operators absent from the reference — SURVEY.md §2.4 'not
    present' — added for engine completeness): per nation, customers WITH >=1
    order (left_semi) and WITHOUT any (left_anti)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey")
    w = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(F.count("*").alias("n"))
        .withColumn("has_orders", F.lit(True))
    )
    wo = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(F.count("*").alias("n"))
        .withColumn("has_orders", F.lit(False))
    )
    return w.unionByName(wo)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (engine.temporal.sessionize): 30-minute gap rule
    over the events stream, one output row per (user, session) with bounds +
    event count — lag + cumulative-sum window math, one shuffle on user_id."""
    _ensure_utc(spark)
    from engine import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = temporal.sessionize(ev, key="user_id", ts="ts", gap_minutes=30,
                            order_tiebreak="event_id")
    return s.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_idx").cast("long").alias("session_idx"),
    ).agg(
        F.count("*").alias("n_events"),
        _epoch_us(F.min("ts")).alias("start_us"),
        _epoch_us(F.max("ts")).alias("end_us"),
    )


def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (trailing 1 hour per user): int64-cents running sum —
    the time-windowed rollup shape (range frames, not row frames; peers at the
    same timestamp are included identically in both engines)."""
    _ensure_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            us.alias("ts_us"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("trail_cents", F.sum("cents").over(w))
        .drop("cents")
    )




def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data curation: exact dedup (keep min doc_id per
    content) -> quality gate (>= 20 tokens, digit ratio < 30%) -> language
    filter (en/de only) -> per-lang selection stats. The end-to-end selection
    query a 100 TB training pipeline runs; every stage is a Column expression
    over one scan + one dedup shuffle."""
    from engine import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = textops.quality_score(F.col("text"))
    scored = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.md5("text").alias("fp"),
        q.getField("n_tokens").alias("n_tokens"),
        q.getField("digit_ratio_e3").alias("digit_ratio_e3"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter((F.col("n_tokens") >= 20) & (F.col("digit_ratio_e3") < 300))
        .filter(F.col("lang").isin("en", "de"))
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_selected"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def q_curation_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation summary + distinct-cells surface in one registry row (merged
    round 4 to free a slot for the new geo rows): the per-lang selection
    stats tagged 'cur', the per-resolution distinct-cell counts tagged
    'cells'. Both halves unchanged from their previously-green standalone
    rows; the tagged union keeps each hash-checked."""
    cur = q_curation(spark, sf_dir).select(
        F.lit("cur").alias("part"),
        F.col("lang").alias("k"),
        F.col("n_selected").alias("a"),
        F.col("total_tokens").alias("b"),
        F.col("min_doc_id").alias("c"),
        F.col("max_doc_id").alias("d"),
    )
    cells_half = q_distinct_cells(spark, sf_dir).select(
        F.lit("cells").alias("part"),
        F.col("res").cast("string").alias("k"),
        F.col("n_cells").alias("a"),
        F.col("n_points").alias("b"),
        F.lit(-1).cast("long").alias("c"),
        F.lit(-1).cast("long").alias("d"),
    )
    return cur.unionByName(cells_half)


def q_distinct_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count surface: exact count_distinct per resolution (the
    approx_count_distinct sketch swaps in at scale — same plan shape, one
    pass; exactness here keeps the oracle check meaningful)."""
    pts = _docs_points(spark, sf_dir)
    frames = []
    for res in (7, 9, 11):
        frames.append(
            pts.select(cells.grid_encode_phash(F.col("phash"), res).alias("cell"))
            .agg(
                F.lit(res).cast("long").alias("res"),
                F.count_distinct("cell").alias("n_cells"),
                F.count("*").alias("n_points"),
            )
        )
    from functools import reduce

    return reduce(DataFrame.unionByName, frames)


def q_tile_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile assignment + tile bundling in one registry row (merged this
    session to free a slot for the routing/idw/geofence/trajsim rows —
    VERDICT r3 item 6 discipline): the z=8 raster-tile counts tagged
    'assign', the capped vector-tile cut tagged 'bundle'. Each half
    unchanged from its previously-green standalone row."""
    assign = q_tile_assign(spark, sf_dir).select(
        F.lit("assign").alias("tag"), "tile_id",
        F.col("n_points").alias("a"),
        F.lit(-1).cast("long").alias("b"),
        F.lit(-1).cast("long").alias("c"),
        F.lit("").alias("ids_csv"),
    )
    bundle = q_tile_bundle(spark, sf_dir).select(
        F.lit("bundle").alias("tag"), "tile_id",
        F.col("n_total").alias("a"),
        F.col("n_kept").alias("b"),
        F.col("n_overflow").alias("c"),
        "ids_csv",
    )
    return assign.unionByName(bundle)


def q_knn_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planar + geodesic kNN in one registry row (merged this session, same
    slot-freeing discipline): ring-expansion planar kNN tagged 'planar'
    (dist_mm=-1 — its rank is the checked value), haversine ring kNN tagged
    'haversine' with FLOOR-scaled dist_mm. Halves unchanged."""
    # r6: the haversine half's ring rounds and the planar half's sizing
    # counts are independent driver-action sequences — overlap them
    # (guide §2.6, the q_routing discipline)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as _ex:
        _hav_fut = _ex.submit(q_knn_haversine, spark, sf_dir)
        planar = q_knn(spark, sf_dir).select(
            F.lit("planar").alias("tag"), "query_id", "point_id", "rank",
            F.lit(-1).cast("long").alias("dist_mm"),
        )
        hav = _hav_fut.result().select(
            F.lit("haversine").alias("tag"), "query_id", "point_id", "rank",
            "dist_mm",
        )
    return planar.unionByName(hav)


def q_geom_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry measurements + polyline radius join in one registry row
    (merged this session): shoelace/perimeter per nation polygon tagged
    'geom', the int-exact points-within-radius-of-polyline pairs tagged
    'line'. Halves unchanged."""
    geom = q_geom_measures(spark, sf_dir).select(
        F.lit("geom").alias("tag"),
        F.col("nationkey").alias("a"),
        F.col("n_vertices").alias("b"),
        F.col("area2").alias("c"),
        F.col("perimeter_e6").alias("d"),
        F.col("min_x").alias("e"),
        F.col("max_y").alias("f"),
    )
    line = q_line_join(spark, sf_dir).select(
        F.lit("line").alias("tag"),
        F.col("point_id").alias("a"),
        F.col("line_id").alias("b"),
        F.lit(-1).cast("long").alias("c"),
        F.lit(-1).cast("long").alias("d"),
        F.lit(-1).cast("long").alias("e"),
        F.lit(-1).cast("long").alias("f"),
    )
    return geom.unionByName(line)


def q_hash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH + SimHash near-dup pairs in one registry row (merged this
    session): LSH band pairs tagged 'minhash' (v = jaccard_e3), pigeonhole
    hamming pairs tagged 'simhash' (v = hamming). Halves unchanged."""
    mh = q_minhash_dedup(spark, sf_dir).select(
        F.lit("minhash").alias("tag"), "id_a", "id_b",
        F.col("jaccard_e3").alias("v"),
    )
    sh = q_simhash_dedup(spark, sf_dir).select(
        F.lit("simhash").alias("tag"), "id_a", "id_b",
        F.col("hamming").alias("v"),
    )
    return mh.unionByName(sh)


_ROUTE_NODES = 2000
_ROUTE_MAX_DIST = 12


def _route_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted graph from orders: src = key mod N, dst/w from
    the cross-engine md5 hash (same derivation in routing_sql)."""
    from engine import textops

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ok = F.col("o_orderkey").cast("long")
    h1 = textops.cross_hash(ok.cast("string"), "md5")
    h2 = textops.cross_hash(F.concat(ok.cast("string"), F.lit("w")), "md5")
    return o.select(
        F.pmod(ok, F.lit(_ROUTE_NODES)).alias("src"),
        F.pmod(h1, F.lit(_ROUTE_NODES)).alias("dst"),
        (F.pmod(h2, F.lit(9)) + 1).alias("w"),
    )


def q_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network shortest paths (engine.routing.shortest_paths): frontier
    Bellman-Ford over an md5-derived weighted graph on the orders table, two
    sources, distance-bounded (the isochrone query shape — bounds rounds at
    max_dist/min_w + 1 = 13). Labels are packed (dist, hops) BIGINT minima,
    so dist AND the fewest-hops tie-break are engine-exact; the oracle is
    the unrolled-relaxation CTE twin (14 rounds >= the 13-round bound)."""
    from concurrent.futures import ThreadPoolExecutor

    from engine import routing

    sources = spark.createDataFrame(
        [(0, 7), (1, 42)], ["source_id", "node"]
    )
    # r6: the two halves are independent iterative loops whose wall is
    # driver-action rounds, not compute — run them from concurrent driver
    # threads so the scheduler interleaves their (tiny) per-round jobs
    # (guide §2.6; the q_raster_field chain-overlap discipline)
    with ThreadPoolExecutor(1) as _ex:
        _multi_fut = _ex.submit(
            lambda: routing.shortest_paths(
                _route_edges(spark, sf_dir), sources,
                max_dist=_ROUTE_MAX_DIST, max_rounds=16,
            )
        )
        # r5 half: single-pair BIDIRECTIONAL search (engine.routing.
        # point_to_point) on the same graph, 7 -> 42 — the oracle is the same
        # unrolled-relaxation twin filtered to the target node, so the
        # meet-in-the-middle machinery is hash-checked against plain
        # relaxation
        p2p = routing.point_to_point(
            _route_edges(spark, sf_dir), 7, 42,
            max_dist=_ROUTE_MAX_DIST, max_rounds=16,
        ).withColumn("tag", F.lit("p2p"))
        multi = _multi_fut.result().withColumn("tag", F.lit("multi"))
    return multi.unionByName(p2p)


def routing_sql() -> str:
    from engine import routing, textops

    h1 = textops.cross_hash_sql("CAST(o_orderkey AS VARCHAR)")
    h2 = textops.cross_hash_sql("CAST(o_orderkey AS VARCHAR) || 'w'")
    edges = f"""
        SELECT CAST(o_orderkey AS BIGINT) % {_ROUTE_NODES} AS src,
               ({h1}) % {_ROUTE_NODES} AS dst,
               ({h2}) % 9 + 1 AS w
        FROM orders
    """
    srcs = "SELECT 0 AS source_id, 7 AS node UNION ALL SELECT 1, 42"
    multi = routing.shortest_paths_sql(
        edges, srcs, rounds=14, max_dist=_ROUTE_MAX_DIST
    )
    p2p_srcs = "SELECT 0 AS source_id, 7 AS node"
    p2p = routing.shortest_paths_sql(
        edges, p2p_srcs, rounds=14, max_dist=_ROUTE_MAX_DIST
    )
    return f"""
        SELECT 'multi' AS tag, source_id, node, dist, hops FROM ({multi})
        UNION ALL
        SELECT 'p2p' AS tag, source_id, node, dist, hops FROM ({p2p})
        WHERE node = 42
    """


_IDW_CELL = 2048.0
_IDW_RADIUS = 3000.0


_GWR_RADIUS = 4096.0


def q_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolation / local-regression field family, tagged union (the
    raster_field merge discipline — the key stays `idw` for round-over-round
    comparability; both halves hash-exact):

    tag='idw' — engine.interp.idw_grid over document anchors folded to the
    2^15 planar space (the line_join fold), values from integer key math;
    the clamped unit-free 1/d^2 weights accumulate as FLOOR-scaled int64
    sums, so num/den (s1/s2) AND the double ratio (v1) hash-match
    interp.idw_grid_sql. s3..s5=-1, v2=NULL.
    tag='gwr' — engine.interp.gwr_grid: geographically weighted regression
    value ~ beta0 + beta1*attr at every cell center, bisquare kernel,
    bandwidth {_GWR_RADIUS}; attr from independent integer key math
    (doc_id % 83). The five WLS moments (s1..s5 = sw/swa/swv/swaa/swav,
    FLOOR-scaled int64 — order-independent sums) and the closed-form
    coefficient doubles (v1=beta1, v2=beta0, NULL on singular windows)
    hash-match interp.gwr_grid_sql bit for bit."""
    from engine import interp

    pts = _docs_points(spark, sf_dir).select(
        F.shiftrightunsigned(F.col("x"), 17).cast("double").alias("x"),
        F.shiftrightunsigned(F.col("y"), 16).cast("double").alias("y"),
        ((F.col("doc_id") % 83).cast("double") / 10.0).alias("a"),
        ((F.col("doc_id") % 997).cast("double") / 10.0).alias("value"),
    )
    nl = F.lit(-1).cast("long")
    nd = F.lit(None).cast("double")
    i = interp.idw_grid(pts, _IDW_CELL, _IDW_RADIUS).select(
        F.lit("idw").alias("tag"), "cx", "cy",
        F.col("n_samples").cast("long").alias("n"),
        F.col("num_e9").alias("s1"), F.col("den_e9").alias("s2"),
        nl.alias("s3"), nl.alias("s4"), nl.alias("s5"),
        F.col("value").alias("v1"), nd.alias("v2"),
    )
    g = interp.gwr_grid(pts, _IDW_CELL, _GWR_RADIUS).select(
        F.lit("gwr").alias("tag"), "cx", "cy",
        F.col("n_samples").cast("long").alias("n"),
        F.col("sw_e9").alias("s1"), F.col("swa_e9").alias("s2"),
        F.col("swv_e9").alias("s3"), F.col("swaa_e9").alias("s4"),
        F.col("swav_e9").alias("s5"),
        F.col("beta1").alias("v1"), F.col("beta0").alias("v2"),
    )
    return i.unionByName(g)


def idw_sql() -> str:
    from engine import interp

    phash = cells.synth_phash_sql("doc_id")
    xi = f"(({phash}) % 4294967296)"
    yi = f"((({phash}) // 4294967296) % 2147483648)"
    samples = f"""
        SELECT {xi} // 131072 AS x, {yi} // 65536 AS y,
               CAST(CAST(doc_id AS BIGINT) % 83 AS DOUBLE) / 10.0 AS a,
               CAST(CAST(doc_id AS BIGINT) % 997 AS DOUBLE) / 10.0 AS value
        FROM documents
    """
    idw = interp.idw_grid_sql(samples, _IDW_CELL, _IDW_RADIUS)
    gwr = interp.gwr_grid_sql(samples, _IDW_CELL, _GWR_RADIUS)
    return f"""
        SELECT 'idw' AS tag, cx, cy, CAST(n_samples AS BIGINT) AS n,
               num_e9 AS s1, den_e9 AS s2,
               CAST(-1 AS BIGINT) AS s3, CAST(-1 AS BIGINT) AS s4,
               CAST(-1 AS BIGINT) AS s5,
               value AS v1, CAST(NULL AS DOUBLE) AS v2
        FROM ({idw}) qi
        UNION ALL
        SELECT 'gwr' AS tag, cx, cy, CAST(n_samples AS BIGINT) AS n,
               sw_e9 AS s1, swa_e9 AS s2, swv_e9 AS s3, swaa_e9 AS s4,
               swav_e9 AS s5, beta1 AS v1, beta0 AS v2
        FROM ({gwr}) qg
    """


_GEOFENCE_RECTS = [
    (1, 0.0, 0.0, 40.0, 30.0),
    (2, 30.0, 20.0, 70.0, 50.0),
    (3, 60.0, 0.0, 100.0, 30.0),
]


def _event_fixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as device fixes with md5-derived planar coords (the colocation
    derivation) and a unique, time-ordered key: second * 2^20 + event_id
    (event ids stay < 2^20 at every sf, so the key is collision-free and
    the lag-window total order is engine-independent)."""
    from engine import textops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    hx = textops.cross_hash(eid, "md5")
    hy = textops.cross_hash(F.concat(eid, F.lit("y")), "md5")
    return ev.select(
        F.col("user_id").cast("long").alias("entity_id"),
        (
            (_epoch_us(F.col("ts")) / 1_000_000).cast("long") * F.lit(1048576)
            + F.col("event_id").cast("long")
        ).alias("ts_us"),
        (F.pmod(hx, F.lit(100000)) / F.lit(1000.0)).alias("x"),
        (F.pmod(hy, F.lit(60000)) / F.lit(1000.0)).alias("y"),
    )


_EVENT_FIXES_SQL_BODY = """
    SELECT CAST(user_id AS BIGINT) AS entity_id,
           (CAST(epoch_us(ts) AS BIGINT) // 1000000) * 1048576
             + CAST(event_id AS BIGINT) AS ts_us,
           (({hx}) % 100000) / 1000.0 AS x,
           (({hy}) % 60000) / 1000.0 AS y
    FROM events
"""


def _event_fixes_sql() -> str:
    from engine import textops

    return _EVENT_FIXES_SQL_BODY.format(
        hx=textops.cross_hash_sql("CAST(event_id AS VARCHAR)"),
        hy=textops.cross_hash_sql("CAST(event_id AS VARCHAR) || 'y'"),
    )


def q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit transitions (engine.trajectory.
    geofence_transitions): events as fixes, three overlapping literal zones
    labeled by the rect_zones_expr HOF (zero joins), transitions from the
    per-entity zone-set lag diff. The oracle builds the same SORTED zone
    list by closed-boundary BETWEEN concatenation and runs the list-lambda
    twin."""
    from engine import trajectory

    fixes = _event_fixes(spark, sf_dir)
    labeled = fixes.select(
        "entity_id", "ts_us",
        trajectory.rect_zones_expr(_GEOFENCE_RECTS, "x", "y").alias("zones"),
    )
    return trajectory.geofence_transitions(labeled)


def geofence_sql() -> str:
    from engine import trajectory

    zone_parts = " || ".join(
        f"(CASE WHEN x BETWEEN {x0} AND {x1} AND y BETWEEN {y0} AND {y1} "
        f"THEN [CAST({z} AS BIGINT)] ELSE CAST([] AS BIGINT[]) END)"
        for z, x0, y0, x1, y1 in _GEOFENCE_RECTS
    )
    labeled = f"""
        SELECT entity_id, ts_us, {zone_parts} AS zones
        FROM ({_event_fixes_sql()})
    """
    return trajectory.geofence_transitions_sql(labeled)


_TRAJSIM_THRESHOLD = 15.0
_TRAJSIM_MAX_USER = 40


def q_trajsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity join (engine.trajsim.similar_trips, Hausdorff):
    each low-id user's fix cloud as one trip (seq = the unique time key),
    all pairs within Hausdorff 15 planar units. dist rides FLOOR-scaled;
    pair membership compares exact squared doubles, so the brute-force
    DuckDB max-of-min twin matches bit-for-bit."""
    from engine import trajsim

    fixes = _event_fixes(spark, sf_dir).filter(
        F.col("entity_id") < _TRAJSIM_MAX_USER
    )
    trips = fixes.select(
        F.col("entity_id").alias("trip_id"),
        F.col("ts_us").alias("seq"),
        "x", "y",
    )
    out = trajsim.similar_trips(trips, threshold=_TRAJSIM_THRESHOLD)
    return out.select(
        "trip_a", "trip_b",
        F.floor(F.col("dist") * 1000000.0).cast("long").alias("dist_e6"),
        "n_a", "n_b",
    )


def trajsim_sql() -> str:
    from engine import trajsim

    trips = f"""
        SELECT entity_id AS trip_id, ts_us AS seq, x, y
        FROM ({_event_fixes_sql()})
        WHERE entity_id < {_TRAJSIM_MAX_USER}
    """
    inner = trajsim.hausdorff_pairs_sql(trips, _TRAJSIM_THRESHOLD)
    return f"""
        SELECT trip_a, trip_b,
               CAST(FLOOR(dist * 1000000.0) AS BIGINT) AS dist_e6,
               n_a, n_b
        FROM ({inner})
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 queries (the driver checks at most 50 — VERDICT r2 item 1):
    the 48 DuckDB-oracle-checked queries come FIRST, the 2 rows-only digest
    queries (binary images, streaming state — pinned by committed goldens)
    come last, so a future truncation can only ever shed rows-only checks."""
    return {
        "pack_feature_id": q_pack_feature_id,
        "cell_grid": q_cell_grid,
        "trip_stats": q_trip_stats,
        "anchor_bbox": q_anchor_bbox,
        "pricing_summary": q_pricing_summary,
        "topk_per_group": q_topk_per_group,
        "consecutive_diff": q_consecutive_diff,
        "change_taxonomy": q_change_taxonomy,
        "coalesce_changes": q_coalesce_changes,
        "temporal_joins": q_temporal_joins,
        "colocation": q_colocation,
        "union_decode": q_union_decode,
        "pip_holes": q_pip_holes,
        "poly_overlay": q_poly_overlay,
        "zonal_stats": q_zonal_stats,
        "tile_ops": q_tile_ops,
        "geom_line": q_geom_line,
        "knn": q_knn_union,
        "routing": q_routing,
        "idw": q_idw,
        "geofence": q_geofence,
        "trajsim": q_trajsim,
        "raster_field": q_raster_field,
        "contours": q_contours,
        "snap_route": q_snap_route,
        "emerging_hotspots": q_emerging_hotspots,
        "dedup_exact": q_dedup_exact,
        "text_metrics": q_text_metrics,
        "rollup_chain": q_rollup_chain,
        "change_firstorder": q_change_firstorder,
        "change_coalesce": q_change_coalesce,
        "change_pipeline": q_change_pipeline,
        "olap_aggs": q_olap_aggs,
        "cell_compact": q_cell_compact,
        "sql_surface": q_sql_surface,
        "tfidf": q_tfidf,
        "ann_topk": q_ann_topk,
        "phash_neardup": q_phash_neardup,
        "ann_recall": q_ann_recall,
        "hash_neardup": q_hash_neardup,
        "dedup_cluster": q_dedup_cluster,
        "cell_families": q_cell_families,
        "geo_ann": q_geo_ann,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_neardup": q_cosine_neardup,
        "rel_window_ops": q_rel_window_ops,
        "sessionize": q_sessionize,
        "curation": q_curation_cells,
        "streaming_suite": q_streaming_suite,
        "image_pipeline": q_image_pipeline,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins
# ---------------------------------------------------------------------------
def textops_sql_minhash() -> str:
    from engine import textops

    return textops.minhash_lsh_pairs_sql(
        "documents", "doc_id", "text", n_hashes=64, bands=16, ngram=3,
        threshold=0.8, seed=42,
    )


def dedup_cluster_sql() -> str:
    """DuckDB twin of q_dedup_cluster (tagged union): the previous recursive
    min-label walk over the exact minhash pair set ('neardup'), plus a
    brute-force integer-exact DBSCAN ('dbscan') — eps-ball counts via cross
    join (500 rows at sf0.01; the quarantined-oracle O(n^2) is the point),
    core-core components via the same recursive-CTE walk, border = min core
    neighbor label, noise = -1. Every compared value is integer arithmetic;
    no float crosses the engine boundary."""
    from engine import graph

    inner = graph.connected_components_sql(textops_sql_minhash())
    ph = cells.synth_phash_sql("doc_id")
    core_pairs = """
        SELECT p.ia AS id_a, p.ib AS id_b
        FROM dbpairs p
        JOIN dbcore c1 ON p.ia = c1.id
        JOIN dbcore c2 ON p.ib = c2.id
    """
    cc = graph.connected_components_sql(core_pairs)
    return f"""
        SELECT 'neardup' AS tag, id, cluster_id AS label,
               CAST(-1 AS BIGINT) AS flag
        FROM ({inner})
        UNION ALL
        SELECT tag, id, label, flag FROM (
          WITH dbpts AS MATERIALIZED (
            SELECT CAST(doc_id AS BIGINT) AS id,
                   (({ph}) % 4294967296) // 1048576 AS x,
                   ((({ph}) // 4294967296) % 2147483648) // 524288 AS y
            FROM documents
          ), dbpairs AS MATERIALIZED (
            SELECT a.id AS ia, b.id AS ib
            FROM dbpts a, dbpts b
            WHERE (a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) <= 32400
          ), dbcore AS MATERIALIZED (
            SELECT ia AS id FROM dbpairs GROUP BY ia HAVING COUNT(*) >= 5
          ), dbcc AS MATERIALIZED (
            {cc}
          ), dbborder AS (
            SELECT p.ia AS id, MIN(cc.cluster_id) AS label
            FROM dbpairs p
            JOIN dbcore c ON p.ib = c.id
            JOIN dbcc cc ON cc.id = p.ib
            WHERE p.ia NOT IN (SELECT id FROM dbcore)
            GROUP BY p.ia
          ), dblab AS (
            SELECT id, cluster_id AS label, CAST(1 AS BIGINT) AS flag
            FROM dbcc
            UNION ALL
            SELECT id, label, CAST(0 AS BIGINT) AS flag FROM dbborder
          )
          SELECT 'dbscan' AS tag, pts.id AS id,
                 CAST(COALESCE(l.label, -1) AS BIGINT) AS label,
                 COALESCE(l.flag, CAST(0 AS BIGINT)) AS flag
          FROM dbpts pts LEFT JOIN dblab l ON pts.id = l.id
        )
    """


def textops_sql_simhash() -> str:
    from engine import textops

    return textops.simhash_near_dups_sql("documents", "doc_id", "text", max_hamming=3)


def change_firstorder_sql() -> str:
    """DuckDB twin of q_change_firstorder. The derived history has a known tag
    vocabulary {flag, status, promo, type}, so the map-HOF key-set diffs reduce
    to per-key presence booleans; children are consecutive integer ref ranges,
    so the array_except counts reduce to interval arithmetic. Change-type codes
    follow engine.schema (CREATE 0 .. MEMBER_REMOVE 9)."""
    return """
        WITH hist AS (
          SELECT CAST(l_orderkey AS BIGINT) AS rawid,
                 CAST(l_orderkey AS BIGINT) % 3 AS m3,
                 l_linenumber AS version, l_shipdate AS ts,
                 ((CAST(l_orderkey AS BIGINT) + l_linenumber) % 37 = 0) AS is_mp,
                 (l_quantity > 25) AS promo,
                 l_returnflag AS flag, l_linestatus AS status,
                 (l_quantity > 2) AS visible,
                 CAST(l_suppkey AS BIGINT) % 50 AS changeset,
                 CASE WHEN CAST(l_orderkey AS BIGINT) % 3 = 0
                      THEN CAST(l_partkey % 360 - 180 AS DOUBLE) END AS lon,
                 CASE WHEN CAST(l_orderkey AS BIGINT) % 3 = 0
                      THEN CAST(l_suppkey % 180 - 90 AS DOUBLE) END AS lat,
                 CASE WHEN CAST(l_orderkey AS BIGINT) % 3 <> 0
                      THEN CAST(l_suppkey AS BIGINT) % 100 END AS ref_lo,
                 CASE WHEN CAST(l_orderkey AS BIGINT) % 3 <> 0
                      THEN CAST(l_suppkey AS BIGINT) % 100
                           + CAST(l_partkey AS BIGINT) % 3 END AS ref_hi
          FROM lineitem WHERE l_orderkey < 2000
        ), lagged AS (
          SELECT *,
                 LAG(is_mp) OVER w AS p_is_mp, LAG(promo) OVER w AS p_promo,
                 LAG(flag) OVER w AS p_flag, LAG(status) OVER w AS p_status,
                 COALESCE(LAG(visible) OVER w, FALSE) AS p_vis,
                 LAG(lon) OVER w AS p_lon, LAG(lat) OVER w AS p_lat,
                 LAG(ref_lo) OVER w AS p_ref_lo, LAG(ref_hi) OVER w AS p_ref_hi,
                 LAG(ts) OVER w AS p_ts, LAG(changeset) OVER w AS p_cs,
                 (LAG(version) OVER w IS NULL) AS is_first
          FROM hist
          WINDOW w AS (PARTITION BY rawid ORDER BY ts, version)
        ), conds AS (
          SELECT *,
                 CASE m3 WHEN 0 THEN rawid
                         WHEN 1 THEN rawid + 2305843009213693952
                         ELSE rawid + 4611686018427387904 END AS fid,
                 (NOT is_mp) AS feat,
                 (NOT is_first AND NOT p_is_mp) AS p_feat,
                 -- per-key presence: flag/status iff non-mp; promo iff non-mp
                 -- and quantity gate; type iff mp; prev side guarded by the
                 -- empty ObjectVersion.empty prior (is_first -> no keys)
                 (NOT is_mp) AS h_fs,
                 (NOT is_first AND NOT p_is_mp) AS p_h_fs,
                 (NOT is_mp AND promo) AS h_promo,
                 (NOT is_first AND NOT p_is_mp AND p_promo) AS p_h_promo,
                 -- relations carry 'type' on EVERY version (feature maps
                 -- include type=multipolygon); nodes/ways only when mp
                 (is_mp OR m3 = 2) AS h_type,
                 (NOT is_first AND (p_is_mp OR m3 = 2)) AS p_h_type
          FROM lagged
        ), evals AS (
          SELECT *,
                 ((NOT p_feat OR NOT p_vis) AND feat AND visible) AS c_create,
                 (p_feat AND p_vis AND (NOT feat OR NOT visible)) AS c_delete,
                 2 * CAST(h_fs AND NOT p_h_fs AS INT)
                   + CAST(h_promo AND NOT p_h_promo AS INT)
                   + CAST(h_type AND NOT p_h_type AS INT) AS n_add_keys,
                 2 * CAST(p_h_fs AND NOT h_fs AS INT)
                   + CAST(p_h_promo AND NOT h_promo AS INT)
                   + CAST(p_h_type AND NOT h_type AS INT) AS n_del_keys,
                 CASE WHEN h_fs AND p_h_fs
                      THEN CAST(flag <> p_flag AS INT)
                         + CAST(status <> p_status AS INT)
                      ELSE 0 END AS n_chg_keys,
                 (m3 = 0 AND NOT (lat IS NOT DISTINCT FROM p_lat
                                  AND lon IS NOT DISTINCT FROM p_lon)) AS moved,
                 CASE WHEN m3 = 0 THEN 0
                      WHEN p_ref_lo IS NULL THEN ref_hi - ref_lo + 1
                      ELSE (ref_hi - ref_lo + 1)
                           - GREATEST(0, LEAST(ref_hi, p_ref_hi)
                                         - GREATEST(ref_lo, p_ref_lo) + 1)
                      END AS n_added,
                 CASE WHEN m3 = 0 OR p_ref_lo IS NULL THEN 0
                      ELSE (p_ref_hi - p_ref_lo + 1)
                           - GREATEST(0, LEAST(ref_hi, p_ref_hi)
                                         - GREATEST(ref_lo, p_ref_lo) + 1)
                      END AS n_removed
          FROM conds
        )
        SELECT fid AS featureID, CAST(0 AS BIGINT) AS changeType,
               CAST(1 AS BIGINT) AS cnt, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               changeset, TRUE AS save, FALSE AS propagate
        FROM evals WHERE c_create
        UNION ALL
        SELECT fid, 1, 1, CAST(epoch_us(p_ts) AS BIGINT), p_cs, TRUE, FALSE
        FROM evals WHERE c_delete
        UNION ALL
        SELECT fid, 2, n_add_keys, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, FALSE
        FROM evals WHERE NOT c_create AND NOT c_delete AND n_add_keys > 0
        UNION ALL
        SELECT fid, 3, n_del_keys, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, FALSE
        FROM evals WHERE NOT c_create AND NOT c_delete AND n_del_keys > 0
        UNION ALL
        SELECT fid, 4, n_chg_keys, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, FALSE
        FROM evals WHERE NOT c_create AND NOT c_delete AND n_chg_keys > 0
        UNION ALL
        SELECT fid, 5, 1, CAST(epoch_us(ts) AS BIGINT), changeset, feat, TRUE
        FROM evals WHERE NOT c_create AND NOT c_delete AND moved
        UNION ALL
        SELECT fid, 6, n_added, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, TRUE
        FROM evals WHERE NOT c_create AND NOT c_delete AND m3 = 1 AND n_added > 0
        UNION ALL
        SELECT fid, 8, n_added, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, TRUE
        FROM evals WHERE NOT c_create AND NOT c_delete AND m3 = 2 AND n_added > 0
        UNION ALL
        SELECT fid, 7, n_removed, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, TRUE
        FROM evals WHERE NOT c_create AND NOT c_delete AND m3 = 1 AND n_removed > 0
        UNION ALL
        SELECT fid, 9, n_removed, CAST(epoch_us(ts) AS BIGINT), changeset,
               feat, TRUE
        FROM evals WHERE NOT c_create AND NOT c_delete AND m3 = 2 AND n_removed > 0
    """


def change_pipeline_sql() -> str:
    """DuckDB twin of q_change_pipeline: the propagation loop UNROLLED per
    depth. On the lineitem-history fixture the tree is exactly 3 levels
    (nodes -> ways -> relations), so the bounded loop drains after round 3 and
    plain SQL can replay it: round 1 assigns the self-seeded propagate arm to
    tree versions (as-of) and forwards to parents (no saves — SparkJobs.scala
    :55-57 re-propagation round); rounds 2/3 save at depths 1/2 where the
    assigned version has geometry and forward again. The as-of assignment is
    DuckDB's ASOF JOIN with a first-version fallback (pre-history changes
    clamp to version 1 — ChangeUtils.scala:57-91 takeWhile semantics); the
    temporal tree (membership + geometry per boundary) replays
    engine.temporal.ref_tree's window algebra with the same tie rules (events
    before probes, ADD before DELETE, hasGeometry=true wins). Coalesce matches
    engine.coalesce: SUM counts, MAX timestamp, arg-min (ts, cnt, depth)."""
    way_off = 2305843009213693952
    rel_off = 4611686018427387904

    def asof_round(q: str, side: str, out: str) -> str:
        """One propagation round: as-of assign queue `q` to tree `side`."""
        return f"""
        {out}_raw AS (
          SELECT q.parentID, q.featureID, q.changeType, q.cnt, q.c_ts,
                 q.changeset,
                 COALESCE(t.ts_us, fv.f_ts) AS v_ts
          FROM {q} q
          ASOF LEFT JOIN {side} t
            ON q.parentID = t.id AND q.c_ts >= t.ts_us
          LEFT JOIN (SELECT id, MIN(ts_us) AS f_ts FROM {side} GROUP BY id) fv
            ON q.parentID = fv.id
          WHERE COALESCE(t.ts_us, fv.f_ts) IS NOT NULL
        ),
        {out} AS (
          SELECT a.*, t.hg
          FROM {out}_raw a
          JOIN {side} t ON t.id = a.parentID AND t.ts_us = a.v_ts
        )"""

    return f"""
        WITH fo AS ({change_firstorder_sql()}),
        hist AS (
          SELECT CAST(l_orderkey AS BIGINT) AS rawid,
                 CAST(l_orderkey AS BIGINT) % 3 AS m3,
                 l_linenumber AS version,
                 CAST(epoch_us(l_shipdate) AS BIGINT) AS ts_us,
                 ((CAST(l_orderkey AS BIGINT) + l_linenumber) % 37 = 0) AS is_mp,
                 CAST(l_suppkey AS BIGINT) % 100 AS ref_lo,
                 CAST(l_suppkey AS BIGINT) % 100
                   + CAST(l_partkey AS BIGINT) % 3 AS ref_hi
          FROM lineitem WHERE l_orderkey < 2000
        ),
        wr AS (
          SELECT rawid, m3, ts_us, ref_lo, ref_hi,
                 CASE WHEN m3 = 1 THEN rawid + {way_off}
                      ELSE rawid + {rel_off} END AS pid,
                 NOT is_mp AS hg,
                 LAG(ref_lo) OVER w AS p_lo, LAG(ref_hi) OVER w AS p_hi
          FROM hist WHERE m3 <> 0
          WINDOW w AS (PARTITION BY rawid ORDER BY ts_us, version)
        ),
        refev AS (
          -- ADD (ct=0): refs entering the [ref_lo, ref_hi] range;
          -- DELETE (ct=1): refs leaving it. Way children are node ids (raw),
          -- relation children are WAY ids (raw + way offset).
          SELECT pid AS parentID,
                 CASE WHEN m3 = 1 THEN r ELSE r + {way_off} END AS childID,
                 ts_us, 0 AS ct
          FROM wr, UNNEST(range(ref_lo, ref_hi + 1)) AS t(r)
          WHERE p_lo IS NULL OR r < p_lo OR r > p_hi
          UNION ALL
          SELECT pid, CASE WHEN m3 = 1 THEN r ELSE r + {way_off} END, ts_us, 1
          FROM wr, UNNEST(range(p_lo, p_hi + 1)) AS t(r)
          WHERE p_lo IS NOT NULL AND (r < ref_lo OR r > ref_hi)
        ),
        geomev AS (SELECT pid AS id, ts_us, hg FROM wr),
        bounds AS (
          SELECT DISTINCT id, ts_us FROM (
            SELECT childID AS id, ts_us FROM refev
            UNION ALL SELECT id, ts_us FROM geomev) u
        ),
        pairs AS (SELECT DISTINCT childID AS id, parentID FROM refev),
        memb AS MATERIALIZED (
          SELECT id, parentID, ts_us FROM (
            SELECT id, parentID, ts_us, probe,
                   LAST_VALUE(ct IGNORE NULLS) OVER (
                     PARTITION BY id, parentID ORDER BY ts_us, probe, ct
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
            FROM (
              SELECT childID AS id, parentID, ts_us, ct, 0 AS probe FROM refev
              UNION ALL
              SELECT b.id, p.parentID, b.ts_us, NULL AS ct, 1 AS probe
              FROM bounds b JOIN pairs p ON b.id = p.id) s
          ) t WHERE probe = 1 AND state = 0
        ),
        tree AS MATERIALIZED (
          SELECT DISTINCT id, ts_us, COALESCE(state, FALSE) AS hg FROM (
            SELECT id, ts_us, probe,
                   LAST_VALUE(g IGNORE NULLS) OVER (
                     PARTITION BY id ORDER BY ts_us, probe, g
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
            FROM (
              SELECT id, ts_us, hg AS g, 0 AS probe FROM geomev
              UNION ALL
              SELECT id, ts_us, NULL AS g, 1 AS probe FROM bounds) s
          ) t WHERE probe = 1
        ),
        tree2 AS (SELECT * FROM tree WHERE id >= {way_off}),
        tree3 AS (SELECT * FROM tree WHERE id >= {rel_off}),
        q1 AS (
          SELECT featureID AS parentID, featureID, changeType, cnt,
                 ts_us AS c_ts, changeset
          FROM fo WHERE propagate
        ),
        {asof_round('q1', 'tree', 'a1')},
        q2 AS (
          SELECT m.parentID, a.parentID AS featureID, a.changeType, a.cnt,
                 a.c_ts, a.changeset
          FROM a1 a JOIN memb m ON m.id = a.parentID AND m.ts_us = a.v_ts
        ),
        {asof_round('q2', 'tree2', 'a2')},
        q3 AS (
          SELECT m.parentID, a.parentID AS featureID, a.changeType, a.cnt,
                 a.c_ts, a.changeset
          FROM a2 a JOIN memb m ON m.id = a.parentID AND m.ts_us = a.v_ts
        ),
        {asof_round('q3', 'tree3', 'a3')},
        allc AS (
          SELECT featureID, changeType, cnt, ts_us, changeset, 0 AS depth
          FROM fo WHERE save
          UNION ALL
          SELECT parentID, changeType, cnt, c_ts, changeset, 1 FROM a2 WHERE hg
          UNION ALL
          SELECT parentID, changeType, cnt, c_ts, changeset, 2 FROM a3 WHERE hg
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY featureID, changeset, changeType
            ORDER BY ts_us, cnt, depth) AS rn
          FROM allc
        )
        SELECT featureID, CAST(changeType AS BIGINT) AS changeType,
               CAST(SUM(cnt) AS BIGINT) AS cnt,
               CAST(MAX(ts_us) AS BIGINT) AS ts_us, changeset,
               CAST(MIN(CASE WHEN rn = 1 THEN depth END) AS BIGINT) AS depth
        FROM ranked GROUP BY featureID, changeset, changeType
    """


def tfidf_sql() -> str:
    from engine import textops

    return textops.tfidf_top_terms_sql("documents", "doc_id", "text", k=5)


def embedops_sql_ann_lsh() -> str:
    from engine import embedops

    return embedops.lsh_ann_topk_sql(
        "embeddings", "vec_id", "embedding", "_id < 10",
        k=5, dim=64, n_planes=8, multiprobe_bits=2, seed=42,
    )


def embedops_sql_ann_ivf() -> str:
    from engine import embedops

    return embedops.ivf_ann_topk_sql(
        "embeddings", "vec_id", "embedding", "_id < 10",
        k=5, n_centroids=16, n_probe=4, seed=42,
    )


def embedops_sql_ann_sq8() -> str:
    from engine import embedops

    return embedops.ivf_sq8_cov_sql(
        "embeddings", "vec_id", "embedding", "_id < 10",
        k=5, n_centroids=16, n_probe=4, spill=2, seed=42,
    )


def phash_neardup_sql() -> str:
    """DuckDB twin of q_phash_neardup: same masked md5 codes, the
    hamming_code_pairs twin for the code graph, the recursive-CTE connected
    components twin for labels, COALESCE(code) for singleton codes (the Spark
    side passes nodes= so isolated codes self-label)."""
    from engine import graph, imagesim, textops

    mask = 0x1111111111111111
    code_expr = f"({textops.cross_hash_sql('text')} & {mask})"
    pairs = imagesim.hamming_code_pairs_sql("documents", code_expr, max_hamming=2)
    cc = graph.connected_components_sql(pairs, id_a="code_a", id_b="code_b")
    return f"""
        WITH doc_codes AS MATERIALIZED (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, {code_expr} AS code
          FROM documents
        )
        SELECT d.doc_id, d.code,
               CAST(COALESCE(cc.cluster_id, d.code) AS BIGINT) AS cluster_id
        FROM doc_codes d LEFT JOIN ({cc}) cc ON cc.id = d.code
    """


def embedops_sql_ann_recall() -> str:
    """DuckDB twin of q_ann_recall: exact top-5 (same list_cosine_similarity
    ranking the cosine_topk row is hash-green on) left-joined against the
    capped static-order LSH probe set (first 47 masks of the canonical flip
    enumeration — the IN-list twin of lsh_ann_topk(kernel='hof',
    max_probes=47)); one summary row."""
    from engine import embedops

    planes = embedops._planes(64, 14, 42)
    bucket = embedops._plane_bucket_sql("_v", planes)
    masks, _ = embedops._flip_masks(14, 2)
    in_list = ", ".join(str(int(x)) for x in masks[:47])
    cos = embedops.cosine_double_sql("q._qv", "c._v")
    return f"""
        WITH b AS MATERIALIZED (
          SELECT vec_id AS _id, embedding AS _v, {bucket} AS _bucket
          FROM embeddings
        ), q AS MATERIALIZED (
          SELECT _id AS _qid, _v AS _qv, _bucket AS _qb FROM b WHERE _id < 50
        ), exact AS (
          SELECT _qid, _cid FROM (
            SELECT q._qid, c._id AS _cid,
                   ROW_NUMBER() OVER (PARTITION BY q._qid
                     ORDER BY list_cosine_similarity(q._qv, c._v) DESC, c._id) AS rank
            FROM q CROSS JOIN b c
          ) WHERE rank <= 5
        ), approx AS (
          SELECT _qid, _cid FROM (
            SELECT q._qid, c._id AS _cid,
                   ROW_NUMBER() OVER (PARTITION BY q._qid
                     ORDER BY {cos} DESC, c._id) AS rank
            FROM q JOIN b c ON xor(q._qb, c._bucket) IN ({in_list})
          ) WHERE rank <= 5
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN a._cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hit,
               CAST(FLOOR(SUM(CASE WHEN a._cid IS NOT NULL THEN 1 ELSE 0 END)
                    * 1000000 / COUNT(*)) AS BIGINT) AS recall_e6
        FROM exact e LEFT JOIN approx a ON e._qid = a._qid AND e._cid = a._cid
    """


def _geo_ann_oracle_sql() -> str:
    """Brute-force DuckDB twin of q_geo_ann: radius theta-join + cosine
    window, same haversine/cosine expression order as the engine (see
    engine.joins.haversine_m_sql / engine.embedops.cosine_double_sql)."""
    from engine import embedops

    ph = cells.synth_phash_sql("vec_id")
    lon_e = f"(({ph}) % 4294967296) / 4294967296.0 * 360.0 - 180.0"
    lat_e = f"((({ph}) // 4294967296) % 2147483648) / 2147483648.0 * 180.0 - 90.0"
    sim = embedops.cosine_double_sql("q.embedding", "c.embedding")
    hav = joins.haversine_m_sql("q.lon", "q.lat", "c.lon", "c.lat")
    return f"""
        WITH pts AS MATERIALIZED (
          SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
                 {lon_e} AS lon, {lat_e} AS lat
          FROM embeddings
        )
        SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank,
               CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_e6,
               CAST(FLOOR(dist_m * 1000) AS BIGINT) AS dist_mm
        FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 {sim} AS sim, {hav} AS dist_m,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                    ORDER BY {sim} DESC, c.vec_id) AS rank
          FROM (SELECT * FROM pts WHERE vec_id % 25 = 0) q
          JOIN pts c ON {hav} <= 3000000.0
        ) t WHERE rank <= 5
    """


def oracle_sql() -> dict[str, str]:
    phash = cells.synth_phash_sql("doc_id")
    cell9 = cells.grid_encode_phash_sql(phash, 9)
    cell11 = cells.grid_encode_phash_sql(phash, 11)
    lon = f"(({phash}) % 4294967296) / 4294967296.0 * 360.0 - 180.0"
    lat = f"((({phash}) // 4294967296) % 2147483648) / 2147483648.0 * 180.0 - 90.0"
    xi = f"(({phash}) % 4294967296)"
    yi = f"((({phash}) // 4294967296) % 2147483648)"
    cell5_cte = (
        f"SELECT DISTINCT {cells.grid_encode_phash_sql(phash, 5)} AS cell "
        "FROM documents"
    )
    compact5 = cells.compact_unroll_sql(cell5_cte, 5, 2)
    d = {
        "pack_feature_id": """
            SELECT CASE CAST(o_orderkey AS BIGINT) % 3
                     WHEN 0 THEN CAST(o_orderkey AS BIGINT)
                     WHEN 1 THEN CAST(o_orderkey AS BIGINT) + 2305843009213693952
                     ELSE CAST(o_orderkey AS BIGINT) + 4611686018427387904
                   END AS packed,
                   CAST(o_orderkey AS BIGINT) AS o_orderkey,
                   (CAST(o_orderkey AS BIGINT) % 3 = 1) AS is_way,
                   CAST(o_orderkey AS BIGINT) AS raw_id
            FROM orders
        """,
        "cell_grid": f"""
            SELECT 9 AS res, {cell9} AS cell, COUNT(*) AS n_points
            FROM documents GROUP BY 1, 2
            UNION ALL
            SELECT 7 AS res, {cells.grid_parent_sql(cell11, 4)} AS cell,
                   COUNT(*) AS n_points
            FROM documents GROUP BY 1, 2
        """,
        "trip_stats": trip_stats_sql(),
        "anchor_bbox": f"""
            SELECT lang,
                   MIN({lon}) AS min_lon, MAX({lon}) AS max_lon,
                   MIN({lat}) AS min_lat, MAX({lat}) AS max_lat,
                   COUNT(*) AS n
            FROM documents GROUP BY lang
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_base_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS sum_disc_e4,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "topk_per_group": """
            SELECT l_returnflag, CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(rnk AS BIGINT) AS rnk
            FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
              FROM lineitem
            ) t WHERE rnk <= 5
        """,
        "consecutive_diff": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us, prev_type, event_type
            FROM (
              SELECT user_id, ts, event_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM events
            ) t
            WHERE prev_type IS NOT NULL AND prev_type <> event_type
        """,
        "change_taxonomy": """
            SELECT CAST(CASE
                     WHEN prev_type IS NULL THEN 0
                     WHEN prev_type <> event_type THEN 4
                     WHEN value > prev_value THEN 2
                     WHEN value < prev_value THEN 3
                     ELSE 9
                   END AS BIGINT) AS change_type,
                   COUNT(*) AS n
            FROM (
              SELECT event_type, value,
                     LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
                     LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
              FROM events
            ) t GROUP BY 1
        """,
        "coalesce_changes": """
            SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                   COUNT(*) AS cnt,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
                   CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us
            FROM events GROUP BY user_id, event_type
        """,
        "temporal_joins": """
            SELECT 'asof' AS tag, event_id AS a, user_id AS b,
                   ts_us AS c, login_event_id AS d
            FROM (
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(user_id AS BIGINT) AS user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(login_event_id AS BIGINT) AS login_event_id
            FROM (
              SELECT user_id, ts, side, event_id,
                     LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, side, CASE WHEN side = 0 THEN event_id ELSE 0 END
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS login_event_id
              FROM (
                SELECT user_id, ts, 0 AS side, event_id FROM events WHERE event_type = 'login'
                UNION ALL
                SELECT user_id, ts, 1 AS side, event_id FROM events WHERE event_type = 'click'
              ) u
            ) t WHERE side = 1
        )
            UNION ALL
            SELECT 'interval' AS tag, year AS a, n_items AS b,
                   CAST(-1 AS BIGINT) AS c, CAST(-1 AS BIGINT) AS d
            FROM (
            SELECT CAST(y.year AS BIGINT) AS year, COUNT(*) AS n_items
            FROM lineitem l
            JOIN (SELECT y AS year,
                         make_timestamp(y, 1, 1, 0, 0, 0.0) AS t_from,
                         make_timestamp(y + 1, 1, 1, 0, 0, 0.0) AS t_to
                  FROM (SELECT unnest(range(1992, 2000)) AS y)) y
              ON l.l_shipdate >= y.t_from AND l.l_shipdate < y.t_to
            GROUP BY 1
        )
        """,
        "colocation": colocation_sql(),        "union_decode": """
            SELECT 'union' AS op, l_linestatus AS k, n, depth FROM (
              SELECT l_linestatus, COUNT(*) AS n, CAST(0 AS BIGINT) AS depth
              FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_linestatus
              UNION ALL
              SELECT l_linestatus, COUNT(*) AS n, CAST(1 AS BIGINT) AS depth
              FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_linestatus
              UNION ALL
              SELECT l_linestatus, COUNT(*) AS n, CAST(2 AS BIGINT) AS depth
              FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
            )
            UNION ALL
            SELECT 'decode' AS op, label AS k, n, CAST(-1 AS BIGINT) AS depth FROM (
              SELECT d.label AS label, COUNT(*) AS n
              FROM events e
              LEFT JOIN (VALUES ('click','Click'),('view','View'),('login','Login'),
                                ('purchase','Purchase'),('error','Error')) AS d(event_type, label)
                ON e.event_type = d.event_type
              GROUP BY d.label
            )
        """,
        "raster_field": raster_field_sql(),
        "contours": contours_sql(),
        "snap_route": snap_route_sql(),
        "emerging_hotspots": emerging_hotspots_sql(),
        "pip_holes": f"""
            SELECT CAST(r.poly_id AS BIGINT) AS poly_id, COUNT(*) AS n_points
            FROM (SELECT {lon} AS lon, {lat} AS lat FROM documents) p
            JOIN (SELECT i AS poly_id,
                         -170.0 + i * 55.0 AS x0, -80.0 + i * 25.0 AS y0,
                         -170.0 + i * 55.0 + 50.0 AS x1,
                         -80.0 + i * 25.0 + 40.0 AS y1
                  FROM (SELECT unnest(range(6)) AS i)) r
              ON p.lon >= r.x0 AND p.lon < r.x1 AND p.lat >= r.y0 AND p.lat < r.y1
                 AND NOT (p.lon >= r.x0 + 12.5 AND p.lon < r.x0 + 37.5
                          AND p.lat >= r.y0 + 10.0 AND p.lat < r.y0 + 30.0)
            GROUP BY 1
        """,
        "zonal_stats": f"""
            SELECT CAST(r.rect_id AS BIGINT) AS zone_id, COUNT(*) AS n_points,
                   CAST(SUM(p.metric) AS BIGINT) AS metric_sum,
                   CAST(MIN(p.metric) AS BIGINT) AS metric_min,
                   CAST(MAX(p.metric) AS BIGINT) AS metric_max,
                   COUNT(DISTINCT {cells.grid_encode_phash_sql('p.phash', 7)})
                     AS n_cells_r7
            FROM (SELECT {lon} AS lon, {lat} AS lat, ({phash}) % 1000 AS metric,
                         ({phash}) AS phash
                  FROM documents) p
            JOIN (SELECT i AS rect_id, -180.0 + i * 45.0 AS lon0, -90.0 + i * 20.0 AS lat0,
                         -180.0 + i * 45.0 + 60.0 AS lon1, -90.0 + i * 20.0 + 50.0 AS lat1
                  FROM (SELECT unnest(range(8)) AS i)) r
              ON p.lon >= r.lon0 AND p.lon < r.lon1 AND p.lat >= r.lat0 AND p.lat < r.lat1
            GROUP BY 1
        """,
        "tile_assign": f"""
            SELECT (8 * 1125899906842624 + ({xi} // 16777216) * 33554432
                    + ({yi} // 8388608)) AS tile_id,
                   COUNT(*) AS n_points
            FROM documents GROUP BY 1
        """,
        "tile_bundle": f"""
            WITH f AS (
              SELECT {cells.grid_encode_phash_sql(phash, 7)} AS tile_id,
                     CAST(doc_id AS BIGINT) AS doc_id
              FROM documents
            ), ranked AS (
              SELECT tile_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY tile_id ORDER BY doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY tile_id) AS n_total
              FROM f
            )
            SELECT tile_id,
                   CAST(ANY_VALUE(n_total) AS BIGINT) AS n_total,
                   CAST(LEAST(8, ANY_VALUE(n_total)) AS BIGINT) AS n_kept,
                   CAST(ANY_VALUE(n_total) - LEAST(8, ANY_VALUE(n_total)) AS BIGINT)
                     AS n_overflow,
                   COALESCE(string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
                              ',' ORDER BY doc_id), '') AS ids_csv
            FROM ranked
            GROUP BY tile_id
        """,
        "geom_measures": """
            WITH v AS (
              SELECT CAST(c_nationkey AS BIGINT) AS nk,
                     CAST(c_custkey AS BIGINT) AS ck,
                     CAST(c_custkey % 199 AS BIGINT) AS vx,
                     CAST((c_custkey * 37) % 181 AS BIGINT) AS vy,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_custkey) AS rn
              FROM customer
            ), poly AS (
              SELECT nk, list(vx ORDER BY ck) AS xs, list(vy ORDER BY ck) AS ys,
                     COUNT(*) AS n
              FROM v WHERE rn <= 64 GROUP BY nk HAVING COUNT(*) >= 3
            )
            SELECT nk AS nationkey,
                   CAST(n AS BIGINT) AS n_vertices,
                   CAST(abs(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
                        i -> xs[i] * ys[1 + (i % CAST(n AS INT))]
                           - ys[i] * xs[1 + (i % CAST(n AS INT))]))) AS BIGINT) AS area2,
                   CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
                        i -> CAST(FLOOR(sqrt(CAST(
                               (xs[1 + (i % CAST(n AS INT))] - xs[i])
                                 * (xs[1 + (i % CAST(n AS INT))] - xs[i])
                             + (ys[1 + (i % CAST(n AS INT))] - ys[i])
                                 * (ys[1 + (i % CAST(n AS INT))] - ys[i]) AS DOUBLE))
                             * 1000000.0) AS BIGINT))) AS BIGINT) AS perimeter_e6,
                   CAST(list_min(xs) AS BIGINT) AS min_x,
                   CAST(list_max(ys) AS BIGINT) AS max_y
            FROM poly
        """,
        "knn": f"""
            SELECT query_id, point_id, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT q.doc_id AS query_id, p.doc_id AS point_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.doc_id
                       ORDER BY (CAST(q.x AS DOUBLE) - p.x) * (CAST(q.x AS DOUBLE) - p.x)
                              + (CAST(q.y AS DOUBLE) - p.y) * (CAST(q.y AS DOUBLE) - p.y),
                              p.doc_id) AS rank
              FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, {xi} AS x, {yi} AS y
                    FROM documents WHERE doc_id % 100 = 0) q
              CROSS JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, {xi} AS x, {yi} AS y
                          FROM documents) p
            ) t WHERE rank <= 3
        """,
        "line_join": f"""
            WITH pts AS (
              SELECT CAST(doc_id AS BIGINT) AS point_id,
                     {xi} // 131072 AS px, {yi} // 65536 AS py
              FROM documents
            ), verts AS (
              SELECT CAST(n_nationkey AS BIGINT) AS line_id, j,
                     (n_nationkey * 1973 + j * 4801) % 32768 AS vx,
                     (n_nationkey * 3271 + j * 6007) % 32768 AS vy
              FROM nation, (SELECT unnest(range(4)) AS j)
            ), segs AS (
              SELECT a.line_id, a.vx AS ax, a.vy AS ay, b.vx AS bx, b.vy AS by
              FROM verts a JOIN verts b
                ON a.line_id = b.line_id AND b.j = a.j + 1
            ), cand AS (
              SELECT p.point_id, s.line_id,
                     (s.bx - s.ax) * (s.bx - s.ax)
                       + (s.by - s.ay) * (s.by - s.ay) AS t_den,
                     (p.px - s.ax) * (s.bx - s.ax)
                       + (p.py - s.ay) * (s.by - s.ay) AS t_num,
                     (p.px - s.ax) * (p.px - s.ax)
                       + (p.py - s.ay) * (p.py - s.ay) AS d2a,
                     (p.px - s.bx) * (p.px - s.bx)
                       + (p.py - s.by) * (p.py - s.by) AS d2b
              FROM pts p CROSS JOIN segs s
            )
            SELECT DISTINCT point_id, line_id
            FROM cand
            WHERE CASE
                    WHEN t_den = 0 OR t_num <= 0 THEN d2a <= 360000
                    WHEN t_num >= t_den THEN d2b <= 360000
                    ELSE d2a * t_den - t_num * t_num <= 360000 * t_den
                  END
        """,
        "knn_haversine": f"""
            SELECT query_id, point_id, CAST(rank AS BIGINT) AS rank,
                   CAST(FLOOR(dist_m * 1000) AS BIGINT) AS dist_mm
            FROM (
              SELECT q.doc_id AS query_id, p.doc_id AS point_id,
                     {joins.haversine_m_sql('q.lon', 'q.lat', 'p.lon', 'p.lat')}
                       AS dist_m,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.doc_id
                       ORDER BY {joins.haversine_m_sql('q.lon', 'q.lat', 'p.lon', 'p.lat')},
                                p.doc_id) AS rank
              FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, {lon} AS lon, {lat} AS lat
                    FROM documents WHERE doc_id % 25 = 0) q
              CROSS JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, {lon} AS lon,
                                 {lat} AS lat FROM documents) p
            ) t WHERE rank <= 3
        """,
        "dedup_exact": """
            SELECT md5(text) AS fp, MIN(CAST(doc_id AS BIGINT)) AS keep_doc_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "text_metrics": r"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), scored AS (
              SELECT doc_id, text, toks,
                     len(list_filter(toks, x -> x IN ('der','und','die','das','ist'))) AS c_de,
                     len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS c_en,
                     len(list_filter(toks, x -> x IN ('el','la','los','que','es'))) AS c_es,
                     len(list_filter(toks, x -> x IN ('le','la','et','les','est'))) AS c_fr
              FROM t
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_m,
                   CAST(FLOOR(length(text) * 1000.0 / len(string_split(text, ' '))) AS BIGINT)
                     AS chars_per_tok_e3,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
                   CAST((length(text) - length(replace(text, ' the ', ''))) / 5
                      + (length(text) - length(replace(text, ' and ', ''))) / 5
                      + (length(text) - length(replace(text, ' of ', ''))) / 4
                     AS BIGINT) AS n_stop,
                   CAST(len(toks) AS BIGINT) AS q_n_tokens,
                   CAST(CASE WHEN len(toks) > 0
                        THEN FLOOR(length(text) * 1000.0 / len(toks)) ELSE 0 END AS BIGINT)
                     AS mean_token_len_e3,
                   CAST(CASE WHEN len(toks) > 0
                        THEN FLOOR(len(list_filter(toks, x -> x IN (
                             'the','and','of','to','is','der','und','die','das','ist',
                             'le','la','et','les','est','el','los','que','es'))) * 1000.0
                             / len(toks)) ELSE 0 END AS BIGINT) AS stop_ratio_e3,
                   CAST(CASE WHEN length(text) > 0
                        THEN FLOOR((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                             * 1000.0 / length(text)) ELSE 0 END AS BIGINT) AS digit_ratio_e3,
                   -- argmax with ties going to the lexicographically largest
                   -- lang, mirroring the engine's struct-max comparison
                   CASE
                     WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                     WHEN c_fr = greatest(c_de, c_en, c_es, c_fr) THEN 'fr'
                     WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
                     WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
                     ELSE 'de'
                   END AS lang_guess
            FROM scored
        """,
        "olap_aggs": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(FLOOR(percentile_cont(0.5)
                        WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) * 100)
                        AS BIGINT) AS p50_qty_cents,
                   CAST(FLOOR(percentile_cont(0.9)
                        WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) * 100)
                        AS BIGINT) AS p90_qty_cents
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "cell_compact": f"""
            SELECT 'compact' AS part, cell FROM ({compact5}) c
            UNION ALL
            SELECT 'roundtrip' AS part, cell FROM ({cell5_cte}) b
        """,
                "sql_surface": """
            SELECT n.n_name AS nation,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS revenue_e4,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "poly_overlay": """
            WITH a AS (
              SELECT CAST(n_nationkey AS BIGINT) AS a_id,
                     -180 + (n_nationkey * 37 % 300) + 0.125 AS x0,
                     -90 + (n_nationkey * 23 % 120) + 0.125 AS y0,
                     -180 + (n_nationkey * 37 % 300) + 0.125
                       + (20 + (n_nationkey * 13 % 40)) AS x1,
                     -90 + (n_nationkey * 23 % 120) + 0.125
                       + (15 + (n_nationkey * 7 % 30)) AS y1
              FROM nation
            ), b AS (
              SELECT CAST(s_suppkey AS BIGINT) AS b_id,
                     -180 + (s_suppkey * 53 % 310) + 0.375 AS x0,
                     -90 + (s_suppkey * 31 % 130) + 0.375 AS y0,
                     -180 + (s_suppkey * 53 % 310) + 0.375
                       + (10 + (s_suppkey * 11 % 30)) AS x1,
                     -90 + (s_suppkey * 31 % 130) + 0.375
                       + (8 + (s_suppkey * 17 % 20)) AS y1
              FROM supplier
            )
            , r AS (
              SELECT CAST(o_orderkey AS BIGINT) % 150 AS g,
                     (CAST(o_orderkey AS BIGINT) * 7919) % 20000 AS x0,
                     (CAST(o_orderkey AS BIGINT) * 104729) % 20000 AS y0,
                     (CAST(o_orderkey AS BIGINT) * 7919) % 20000 + 100
                       + (CAST(o_orderkey AS BIGINT) * 31) % 1900 AS x1,
                     (CAST(o_orderkey AS BIGINT) * 104729) % 20000 + 100
                       + (CAST(o_orderkey AS BIGINT) * 53) % 1900 AS y1
              FROM orders
            ), edges AS (
              SELECT DISTINCT g, x FROM (
                SELECT g, x0 AS x FROM r UNION ALL SELECT g, x1 FROM r)
            ), slabs AS (
              SELECT g, x AS lo,
                     lead(x) OVER (PARTITION BY g ORDER BY x) AS hi
              FROM edges
            ), act AS (
              SELECT s.g, s.lo, s.hi, r.y0, r.y1
              FROM slabs s JOIN r ON r.g = s.g
                AND r.x0 <= s.lo AND r.x1 >= s.hi
              WHERE s.hi IS NOT NULL
            ), seg AS (
              SELECT g,
                     (hi - lo) * GREATEST(
                       y1 - GREATEST(y0, COALESCE(
                         max(y1) OVER (PARTITION BY g, lo ORDER BY y0, y1
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         y0)),
                       0) AS area
              FROM act
            ), dsum AS (
              SELECT g, CAST(SUM(area) AS BIGINT) AS v FROM seg GROUP BY g
            ), ext AS (
              SELECT g, COUNT(*) AS n_rects,
                     MIN(x0) AS minx, MIN(y0) AS miny,
                     MAX(x1) AS maxx, MAX(y1) AS maxy
              FROM r GROUP BY g
            )
            SELECT 'pair' AS tag, a.a_id AS a_id, b.b_id AS b_id,
                   CAST(-1 AS BIGINT) AS v, CAST(-1 AS BIGINT) AS w
            FROM a, b
            WHERE a.x0 < b.x1 AND b.x0 < a.x1 AND a.y0 < b.y1 AND b.y0 < a.y1
            UNION ALL
            SELECT 'dissolve' AS tag, e.g AS a_id,
                   CAST(e.n_rects AS BIGINT) AS b_id, d.v AS v,
                   ((e.minx * 32768 + e.miny) * 32768 + e.maxx) * 32768
                     + e.maxy AS w
            FROM ext e JOIN dsum d ON d.g = e.g
        """,
        "rollup_chain": f"""
            WITH c11 AS (
              SELECT {cells.grid_encode_phash_sql(cells.synth_phash_sql('doc_id'), 11)} AS cell,
                     COUNT(*) AS n
              FROM documents GROUP BY 1
            ), c10 AS (
              SELECT {cells.grid_parent_sql('cell', 1)} AS cell,
                     CAST(SUM(n) AS BIGINT) AS n
              FROM c11 GROUP BY 1
            ), c9 AS (
              SELECT {cells.grid_parent_sql('cell', 1)} AS cell,
                     CAST(SUM(n) AS BIGINT) AS n
              FROM c10 GROUP BY 1
            )
            SELECT cell, n, CAST(11 AS BIGINT) AS res FROM c11
            UNION ALL SELECT cell, n, CAST(10 AS BIGINT) AS res FROM c10
            UNION ALL SELECT cell, n, CAST(9 AS BIGINT) AS res FROM c9
        """,
        "ngram_jaccard": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents WHERE doc_id < 500
            ), sh AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3
                          THEN list_distinct(list_transform(
                                 range(1, len(toks) - 1),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                          ELSE [] END AS g
              FROM t
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.g, b.g)) AS inter,
                     len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   CAST(FLOOR(CASE WHEN uni > 0
                        THEN CAST(inter AS DOUBLE) / uni ELSE 1.0 END * 1000)
                        AS BIGINT) AS jaccard_e3
            FROM p
            WHERE (CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 1.0 END)
                  >= 0.05
        """,
        "cosine_neardup": """
            WITH a AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
            ), p AS (
              SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                     list_sum(list_transform(range(1, len(x.embedding) + 1),
                       i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(x.embedding) + 1),
                          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(range(1, len(y.embedding) + 1),
                          i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))))
                       AS sim
              FROM a x JOIN a y ON x.vec_id < y.vec_id
            )
            SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_e6
            FROM p WHERE sim >= 0.25
        """,
        "rel_window_ops": """
            SELECT 'semi_anti' AS tag, CAST(c_nationkey AS BIGINT) AS k1,
                   CAST(1 AS BIGINT) AS k2, COUNT(*) AS v1,
                   CAST(-1 AS BIGINT) AS v2
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY 2
            UNION ALL
            SELECT 'semi_anti' AS tag, CAST(c_nationkey AS BIGINT) AS k1,
                   CAST(0 AS BIGINT) AS k2, COUNT(*) AS v1,
                   CAST(-1 AS BIGINT) AS v2
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY 2
            UNION ALL
            SELECT 'wrange' AS tag, CAST(user_id AS BIGINT) AS k1,
                   CAST(event_id AS BIGINT) AS k2,
                   CAST(epoch_us(ts) AS BIGINT) AS v1,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS v2
            FROM events
        """,
        "sessionize": """
            WITH t AS (
              SELECT user_id, event_id, epoch_us(ts) AS us,
                     LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
              FROM events
            ), s AS (
              SELECT user_id, us,
                     SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_idx
              FROM t
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events,
                   CAST(MIN(us) AS BIGINT) AS start_us,
                   CAST(MAX(us) AS BIGINT) AS end_us
            FROM s GROUP BY 1, 2
        """,
        "curation": f"""
            SELECT 'cur' AS part, lang AS k, n_selected AS a,
                   total_tokens AS b, min_doc_id AS c, max_doc_id AS d
            FROM (
            WITH scored AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, md5(text) AS fp,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '')) AS n_tokens,
                     CASE WHEN length(text) > 0
                          THEN FLOOR((length(text) -
                               length(regexp_replace(text, '[0-9]', '', 'g')))
                               * 1000.0 / length(text)) ELSE 0 END AS digit_ratio_e3
              FROM documents
            ), kept AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                FROM scored
              ) WHERE rn = 1 AND n_tokens >= 20 AND digit_ratio_e3 < 300
                AND lang IN ('en', 'de')
            )
            SELECT lang, COUNT(*) AS n_selected,
                   CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
                   MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
            FROM kept GROUP BY lang
        )
            UNION ALL
            SELECT 'cells' AS part, CAST(res AS VARCHAR) AS k, n_cells AS a,
                   n_points AS b, CAST(-1 AS BIGINT) AS c, CAST(-1 AS BIGINT) AS d
            FROM (
            SELECT CAST(7 AS BIGINT) AS res, COUNT(DISTINCT (7 * 288230376151711744 + (((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) % 4294967296) // 33554432) * 536870912 + ((((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) // 4294967296) % 2147483648) // 16777216))) AS n_cells,
                   COUNT(*) AS n_points FROM documents
            UNION ALL
            SELECT CAST(9 AS BIGINT), COUNT(DISTINCT (9 * 288230376151711744 + (((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) % 4294967296) // 8388608) * 536870912 + ((((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) // 4294967296) % 2147483648) // 4194304))), COUNT(*) FROM documents
            UNION ALL
            SELECT CAST(11 AS BIGINT), COUNT(DISTINCT (11 * 288230376151711744 + (((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) % 4294967296) // 2097152) * 536870912 + ((((((CAST(doc_id AS BIGINT) * 134775813 + 1) % 2147483648) * 4294967296 + ((CAST(doc_id AS BIGINT) * 1103515245 + 12345) % 4294967296)) // 4294967296) % 2147483648) // 1048576))), COUNT(*) FROM documents
        )
        """,
        "change_firstorder": change_firstorder_sql(),
        "change_pipeline": change_pipeline_sql(),
        "change_coalesce": f"""
            WITH fo AS ({change_firstorder_sql()})
            SELECT featureID, changeType, CAST(SUM(cnt) AS BIGINT) AS cnt,
                   CAST(MAX(ts_us) AS BIGINT) AS ts_us, changeset,
                   CAST(0 AS BIGINT) AS depth
            FROM fo WHERE save
            GROUP BY featureID, changeset, changeType
        """,
        "tfidf": tfidf_sql(),
        "cell_families": f"""
            SELECT 'hex' AS fam, CAST(CAST(hex_cell AS BIGINT) AS VARCHAR) AS cell,
                   COUNT(*) AS n_points, '' AS aux
            FROM ({cells.hex_encode_sql(lon, lat, 6, 'FROM documents')})
            GROUP BY 1, 2
            UNION ALL
            SELECT 's2' AS fam, CAST(CAST(s2_cell AS BIGINT) AS VARCHAR) AS cell,
                   COUNT(*) AS n_points, '' AS aux
            FROM ({cells.s2_encode_sql(lon, lat, 12, 'FROM documents')})
            GROUP BY 1, 2
            UNION ALL
            SELECT 'gh' AS fam, substr(gh8, 1, 5) AS cell,
                   COUNT(*) AS n_points, MIN(gh8) AS aux
            FROM (SELECT {cells.geohash_phash_sql(phash, 8)} AS gh8 FROM documents)
            GROUP BY 1, 2
        """,
        "geo_ann": _geo_ann_oracle_sql(),
        "ann_topk": f"""
            SELECT 'exact' AS method, query_id, vec_id, rank FROM (
              SELECT CAST(query_id AS BIGINT) AS query_id,
                     CAST(vec_id AS BIGINT) AS vec_id,
                     CAST(rank AS BIGINT) AS rank
              FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                  c.vec_id) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                CROSS JOIN embeddings c
              ) t WHERE rank <= 5
            )
            UNION ALL
            SELECT 'lsh' AS method, query_id, vec_id, rank
            FROM ({embedops_sql_ann_lsh()})
            UNION ALL
            SELECT 'ivf' AS method, query_id, vec_id, rank
            FROM ({embedops_sql_ann_ivf()})
            UNION ALL
            SELECT 'sq8' AS method, query_id, vec_id, rank
            FROM ({embedops_sql_ann_sq8()})
        """,
        "phash_neardup": phash_neardup_sql(),
        "ann_recall": embedops_sql_ann_recall(),
        "minhash_dedup": textops_sql_minhash(),
        "dedup_cluster": dedup_cluster_sql(),
        "simhash_dedup": textops_sql_simhash(),
    }
    # tagged-union merges (this session, freeing slots for the four new
    # rows below — every merged half is the previously-green SQL verbatim)
    d["tile_ops"] = f"""
        SELECT 'assign' AS tag, tile_id, n_points AS a,
               CAST(-1 AS BIGINT) AS b, CAST(-1 AS BIGINT) AS c,
               '' AS ids_csv
        FROM ({d.pop("tile_assign")})
        UNION ALL
        SELECT 'bundle' AS tag, tile_id, n_total AS a, n_kept AS b,
               n_overflow AS c, ids_csv
        FROM ({d.pop("tile_bundle")})
    """
    d["knn"] = f"""
        SELECT 'planar' AS tag, query_id, point_id, rank,
               CAST(-1 AS BIGINT) AS dist_mm
        FROM ({d.pop("knn")})
        UNION ALL
        SELECT 'haversine' AS tag, query_id, point_id, rank, dist_mm
        FROM ({d.pop("knn_haversine")})
    """
    d["geom_line"] = f"""
        SELECT 'geom' AS tag, nationkey AS a, n_vertices AS b, area2 AS c,
               perimeter_e6 AS d, min_x AS e, max_y AS f
        FROM ({d.pop("geom_measures")})
        UNION ALL
        SELECT 'line' AS tag, point_id AS a, line_id AS b,
               CAST(-1 AS BIGINT) AS c, CAST(-1 AS BIGINT) AS d,
               CAST(-1 AS BIGINT) AS e, CAST(-1 AS BIGINT) AS f
        FROM ({d.pop("line_join")})
    """
    d["hash_neardup"] = f"""
        SELECT 'minhash' AS tag, id_a, id_b, jaccard_e3 AS v
        FROM ({d.pop("minhash_dedup")})
        UNION ALL
        SELECT 'simhash' AS tag, id_a, id_b, CAST(hamming AS BIGINT) AS v
        FROM ({d.pop("simhash_dedup")})
    """
    d["routing"] = routing_sql()
    d["idw"] = idw_sql()
    d["geofence"] = geofence_sql()
    d["trajsim"] = trajsim_sql()
    return d
