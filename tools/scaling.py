"""Scaling-efficiency evidence (north rule): the same zonal job at two
parallelism levels — local[8] vs local[32] (N vs 4N cores; this sandbox has
no real cluster) — on identical input. Efficiency = (T_N / T_4N) / 4.

Writes BENCH_SCALING.json and prints a markdown row for BASELINE.md.

Usage: python tools/scaling.py [N=4096] [features=512]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n: int, features: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_SKIP_QUERIES="1",
        BENCH_N=str(n),
        BENCH_FEATURES=str(features),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    features = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    lo, hi = 8, 32
    r_lo = run_at(lo, n, features)
    r_hi = run_at(hi, n, features)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)
    result = {
        "workload": {"raster": f"{n}x{n}", "tiles": r_lo["n_tiles"], "features": features,
                     "stats": ["count", "sum", "mean", "min", "max", "stdev"]},
        "local_8_sec": t_lo,
        "local_32_sec": t_hi,
        "tiles_per_sec_8": r_lo["tiles_per_sec"],
        "tiles_per_sec_32": r_hi["tiles_per_sec"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "passes_0.8": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
