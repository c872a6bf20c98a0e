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


def _row_size_expr(df: DataFrame):
    """Approximate per-row byte size from the schema: octet_length for
    strings/binary, fixed widths for numerics/timestamps, recursive-ish
    flat treatment for everything else (arrays/maps/structs estimated via
    their JSON length — still a single Column expression, no extra pass)."""
    from pyspark.sql import types as T

    parts = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType
        if isinstance(t, (T.StringType,)):
            parts.append(F.coalesce(F.octet_length(c), F.lit(0)))
        elif isinstance(t, T.BinaryType):
            parts.append(F.coalesce(F.length(c), F.lit(0)))
        elif isinstance(t, (T.LongType, T.DoubleType, T.TimestampType,
                            T.TimestampNTZType)):
            parts.append(F.lit(8))
        elif isinstance(t, (T.IntegerType, T.FloatType, T.DateType)):
            parts.append(F.lit(4))
        elif isinstance(t, (T.BooleanType, T.ByteType)):
            parts.append(F.lit(1))
        else:  # arrays/maps/structs: JSON length as an upper-bound estimate
            parts.append(F.coalesce(F.octet_length(F.to_json(c)), F.lit(0)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def partition_byte_metrics(df: DataFrame) -> dict:
    """Per-partition BYTE distribution (north_rule: row/byte/cell metrics):
    one pass, schema-derived row-size estimate summed per Spark partition."""
    per_part = (
        df.select(
            F.spark_partition_id().alias("pid"),
            _row_size_expr(df).alias("sz"),
        )
        .groupBy("pid")
        .agg(F.sum("sz").alias("b"))
    )
    stats = per_part.agg(
        F.sum("b").alias("total"),
        F.max("b").alias("mx"),
        F.expr("percentile_approx(b, 0.5)").alias("md"),
    ).first()
    return {
        "approx_bytes": int(stats["total"] or 0),
        "max_partition_bytes": int(stats["mx"] or 0),
        "median_partition_bytes": int(stats["md"] or 0),
    }
