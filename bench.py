"""Benchmark runner — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec through grid-encode (H3-analog) +
point-in-polygon spatial join on a synthetic slice of the image+caption table.
Per-query timings run the oracle-checked operator suite at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north_rule's two-cluster-size criterion, sandbox proxy): the same
flagship job at local[8] vs local[$SPARK_GRAFT_CPUS] on the same input; reports both
throughputs + efficiency ( (thr_N4 / thr_N) / (cores_N4 / cores_N) ). Controlled by
SPARK_GRAFT_BENCH_SCALING=1 (default on; set 0 to skip the second session).

Output: {"metric": "images_per_sec_h3_pip", "value": N, "unit": "sec", ...}
(value is the flagship wall-clock in seconds; throughput + scaling live in the
extra keys so the driver's schema stays as specified).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _flagship_elapsed(cores: int, n_images: int, shuffle_parts: int) -> tuple[float, int]:
    """Run the flagship grid-encode + PIP join at the given parallelism in a fresh
    SparkSession; return (best wall_seconds of 2 timed runs, result_rows).

    Methodology (fair N vs 4N comparison): the input points are persisted and
    materialized BEFORE timing, and one untimed warm-up run amortizes JVM codegen +
    Python-worker fork cost, so the timed region measures exactly the metric:
    cell encode (Column math) + cover join + ray-cast refine + aggregation."""
    from pyspark.sql import functions as F

    from engine import cells, joins, synth
    from engine.session import get_spark

    spark = get_spark(
        f"bench-flagship-{cores}",
        cores=cores,
        shuffle_partitions=shuffle_parts,
        driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
    try:
        images = synth.images_df(
            spark, n_images, with_bytes=False, hot_frac=0.2, partitions=cores * 2
        )
        pts = images.select(
            "image_id",
            cells.anchor_lon(F.col("phash")).alias("lon"),
            cells.anchor_lat(F.col("phash")).alias("lat"),
        ).persist()
        pts.count()  # materialize input outside the timed region
        polys = synth.polygons_df(spark, p=200, hot_frac=0.1, radius_scale=2.0)

        def run() -> int:
            return (
                joins.pip_join(pts, polys)
                .groupBy("poly_id")
                .agg(F.count("*").alias("n_points"))
                .count()
            )

        # two runs, take the min: the first doubles as warm-up (codegen,
        # broadcast); min-of-N is the robust estimator on a noisy host
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            rows = run()
            best = min(best, time.time() - t0)
        return best, rows
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_N", "4000000"))
    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # --- flagship at full parallelism -------------------------------------
    t_full, _ = _flagship_elapsed(cpus, n_images, shuffle_parts=cpus)
    thr_full = n_images / t_full

    result: dict = {
        "metric": "images_per_sec_h3_pip",
        "value": round(t_full, 3),
        "unit": "sec",
        "sf": sf,
        "n_images": n_images,
        "throughput_images_per_sec": round(thr_full, 1),
        "cores": cpus,
    }

    # --- scaling proxy: N vs 4N cores (local[8] vs local[cpus]) -----------
    if do_scaling and cpus >= 16:
        small = max(2, cpus // 4)
        t_small, _ = _flagship_elapsed(small, n_images, shuffle_parts=small)
        thr_small = n_images / t_small
        eff = (thr_full / thr_small) / (cpus / small)
        result.update(
            {
                "scaling": {
                    "cores_small": small,
                    "cores_large": cpus,
                    "throughput_small": round(thr_small, 1),
                    "throughput_large": round(thr_full, 1),
                    "efficiency": round(eff, 3),
                }
            }
        )

    # --- per-query timings over the oracle suite at sf_dir ----------------
    import __spark_entry__ as entry_mod
    from engine.session import get_spark

    # representative subset by default (keeps the whole bench under ~5 min);
    # SPARK_GRAFT_BENCH_ALL_QUERIES=1 times every registered query
    fast_subset = [
        "cell_encode", "cell_rollup", "rollup_chain", "pip_rect", "tile_assign",
        "pricing_summary", "topk_per_group", "consecutive_diff", "coalesce_changes",
        "asof_join", "dedup_exact", "token_stats", "cosine_topk", "knn",
    ]
    all_queries = entry_mod.queries()
    if os.environ.get("SPARK_GRAFT_BENCH_ALL_QUERIES", "0") != "1":
        all_queries = {k: v for k, v in all_queries.items() if k in fast_subset}

    spark = get_spark("bench-queries", cores=cpus, shuffle_partitions=max(cpus, 8))
    queries = {}
    try:
        for name, fn in all_queries.items():
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                queries[name] = round(time.time() - t0, 3)
            except Exception as e:  # keep the bench line intact on one bad query
                queries[name] = -1.0
                print(f"bench query {name} failed: {e}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()  # queries may persist intermediates
    finally:
        spark.stop()
    result["queries"] = queries

    print(json.dumps(result))


if __name__ == "__main__":
    main()
