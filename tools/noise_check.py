"""Ad-hoc clean-window re-measurement of the r03 driver-bench regressions
(VERDICT r3 item 3): flagship and pip_holes, interleaved A/B/A/B, min per
config, host steal%/load recorded. One JSON line on stdout."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_load() -> float:
    return os.getloadavg()[0]


def steal_snapshot() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:9]))
    return v[7], sum(v)


def flagship_once() -> float:
    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    out = subprocess.run(
        [sys.executable, bench, "--_flagship", "32", "4000000", "32", "none"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": os.path.dirname(bench)},
    )
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED "):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-500:])


def pip_holes_min3() -> float:
    """min-of-3 pip_holes at sf0.1 in a fresh subprocess session (same query
    shape bench.py times single-shot)."""
    code = r"""
import time
import __spark_entry__ as m
from engine.session import get_spark
spark = get_spark("noise-pip-holes", cores=32, shuffle_partitions=32)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    m.queries()["pip_holes"](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
    spark.catalog.clearCache()
print("ELAPSED", best)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
    )
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED "):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-500:])


def main() -> None:
    rounds = int(os.environ.get("NOISE_ROUNDS", "3"))
    s0, t0 = steal_snapshot()
    load_start = host_load()
    flag, holes = [], []
    for _ in range(rounds):
        flag.append(round(flagship_once(), 3))
        holes.append(round(pip_holes_min3(), 3))
    s1, t1 = steal_snapshot()
    print(json.dumps({
        "flagship_s": flag, "flagship_min": min(flag),
        "pip_holes_s": holes, "pip_holes_min": min(holes),
        "load1_start": round(load_start, 2), "load1_end": round(host_load(), 2),
        "steal_pct": round(100 * (s1 - s0) / max(1, t1 - t0), 2),
    }))


if __name__ == "__main__":
    main()
