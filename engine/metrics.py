"""Per-partition row/byte/cell metrics (BASELINE.json north_rule: "emits
per-partition row/byte/cell metrics")."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, key_col: str | None = None) -> dict:
    """Cheap single-pass metrics: rows, distinct keys, and rows-per-Spark-partition
    distribution (max/median skew indicator)."""
    per_part = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
    )
    stats = per_part.agg(
        F.sum("n").alias("rows"),
        F.count("*").alias("partitions"),
        F.max("n").alias("max_rows"),
        F.expr("percentile_approx(n, 0.5)").alias("median_rows"),
    ).first()
    out = {
        "rows": int(stats["rows"] or 0),
        "partitions": int(stats["partitions"] or 0),
        "max_partition_rows": int(stats["max_rows"] or 0),
        "median_partition_rows": int(stats["median_rows"] or 0),
    }
    if out["median_partition_rows"]:
        out["skew_ratio"] = round(
            out["max_partition_rows"] / out["median_partition_rows"], 2
        )
    if key_col is not None and key_col in df.columns:
        out["distinct_keys"] = df.select(key_col).distinct().count()
    return out
