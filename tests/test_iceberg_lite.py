"""iceberg_lite: snapshot commits, metadata row counts, pruning, resume."""

import pytest
from pyspark.sql import functions as F

from engine import iceberg_lite


@pytest.fixture()
def table(tmp_path):
    return iceberg_lite.Table(str(tmp_path / "tbl"))


def test_append_and_metadata_rowcount(spark, table):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    s1 = table.append(df)
    assert s1 == 0
    assert table.row_count() == 100  # from manifests, no scan
    s2 = table.append(spark.range(50).withColumn("v", F.col("id") * 3))
    assert s2 == 1
    assert table.row_count() == 150
    # time travel: old snapshot still readable
    assert table.read(spark, sid=0).count() == 100
    assert table.read(spark).count() == 150


def test_overwrite(spark, table):
    table.append(spark.range(10).withColumn("v", F.lit(1)))
    table.overwrite(spark.range(5).withColumn("v", F.lit(2)))
    assert table.row_count() == 5
    assert table.read(spark).agg(F.max("v")).first()[0] == 2


def test_range_pruning(spark, table):
    df = spark.range(0, 1000).withColumn("cell", F.col("id"))
    table.append(df.filter(F.col("cell") < 500).repartition(1), range_cols=["cell"])
    table.append(df.filter(F.col("cell") >= 500).repartition(1), range_cols=["cell"])
    snap = table.snapshot()
    assert all(f["partition_ranges"].get("cell") for f in snap["files"])
    pruned = table.read(spark, prune={"cell": (0, 100)})
    # only the first file qualifies
    assert pruned.count() == 500
    full = table.read(spark)
    assert full.count() == 1000


def test_compact_binpacks_small_files(spark, table):
    """Bin-pack compaction: many tiny appended files -> one atomic 'compact'
    snapshot with fewer files and bit-identical contents; old snapshots stay
    time-travelable."""
    for i in range(5):
        table.append(spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 2).repartition(2))
    files_before = len(table.snapshot()["files"])
    rows_before = table.row_count()
    sid_before = table.current_snapshot_id()
    before = {(r["id"], r["v"]) for r in table.read(spark).collect()}

    sid = table.compact(spark, target_file_bytes=64 * 1024 * 1024)
    assert sid == sid_before + 1
    assert table.snapshot()["operation"] == "compact"
    assert len(table.snapshot()["files"]) < files_before
    assert table.row_count() == rows_before  # manifest counts preserved
    after = {(r["id"], r["v"]) for r in table.read(spark).collect()}
    assert after == before
    # pre-compaction snapshot still readable (time travel)
    assert table.read(spark, sid=sid_before).count() == rows_before
    # nothing left to compact -> no new snapshot
    assert table.compact(spark, target_file_bytes=64 * 1024 * 1024) == sid


def test_checkpoint_resume(spark, table):
    units = [f"u{i}" for i in range(4)]
    assert table.pending_units("r1", units) == units
    table.append(spark.range(1))
    table.checkpoint_unit_done("r1", "u0", table.current_snapshot_id(),
                               metrics={"rows": 1})
    table.checkpoint_unit_done("r1", "u2", table.current_snapshot_id())
    assert table.pending_units("r1", units) == ["u1", "u3"]
    # a different run id sees everything pending
    assert table.pending_units("r2", units) == units
    ck = table.checkpoint_load("r1")
    assert ck["units"]["u0"]["metrics"]["rows"] == 1


def test_optimize_parallelism_from_manifest(spark, table):
    from engine.session import optimize_parallelism

    table.append(spark.range(1000))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    # manifest row count feeds the reference heuristic (App.scala:52-72) — no scan
    p = optimize_parallelism(spark, table.row_count(), executors=2, cores=4)
    assert p == max(1000 // 1_500_000, 2 * 4 * 4) == 32
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    p2 = optimize_parallelism(spark, 3_000_000_000, executors=2, cores=4)
    assert p2 == 2000
    spark.conf.set("spark.sql.shuffle.partitions", before)
