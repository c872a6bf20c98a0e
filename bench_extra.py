"""Extra benchmarks for optimization work (guide §1.4 noop isolation).

NOT the driver bench — bench.py is frozen. This harness times each registry
query in two phases so driver-side iterative loops are attributable:

  construct = fn(spark, sf_dir)        # plan build; iterative operators run
                                       # their driver-action rounds here
  noop      = df.write.format("noop")  # the final job

Usage:
  python bench_extra.py [query ...]            # default: the bench fast_subset
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=...  # same env contract as bench.py
  BENCH_EXTRA_REPEATS=n                        # repeat each query n times (min)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))

    import __spark_entry__ as entry_mod
    from engine.session import get_spark

    all_queries = entry_mod.queries()
    names = sys.argv[1:] or [
        k for k in all_queries
        if k not in ("streaming_suite", "image_pipeline")
    ]

    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    out = {}
    try:
        for name in names:
            fn = all_queries[name]
            best = None
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
                spark.catalog.clearCache()
                rec = {
                    "construct": round(t1 - t0, 3),
                    "noop": round(t2 - t1, 3),
                    "total": round(t2 - t0, 3),
                }
                if best is None or rec["total"] < best["total"]:
                    best = rec
            out[name] = best
            print(f"{name:22s} construct={best['construct']:8.3f} "
                  f"noop={best['noop']:8.3f} total={best['total']:8.3f}",
                  file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
