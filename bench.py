"""Benchmark: headline zonal-stats throughput (tiles/sec) + driver queries.

Prints ONE JSON line:
  {"metric": "zonal_tiles_per_sec", "value": <headline seconds>, "unit":
   "sec", "queries": {...per-query seconds...}, "sf": ..., "tiles_per_sec": N}

Headline workload: 2048x2048 synthetic raster (64 tiles of 256x256, the
reference's natural block size) x 128 polygons including one mega-polygon
covering ~25% of the raster (the skew case the north rule calls out), full
pipeline: PNG decode -> tile-cover candidate join -> exact coverage kernel
-> 6-stat aggregate.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_SKIP_QUERIES=1 to run headline only.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE_N = 2048
HEADLINE_TILE = 256


def build_headline_inputs(spark):
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    rng = np.random.default_rng(42)
    arr = rng.uniform(0, 1000, (HEADLINE_N, HEADLINE_N))
    meta = RasterMeta(
        "bench", xmin=0, ymax=float(HEADLINE_N), dx=1, dy=1,
        width=HEADLINE_N, height=HEADLINE_N,
        tile_w=HEADLINE_TILE, tile_h=HEADLINE_TILE,
    )
    raster = Raster.from_array(spark, arr, meta)

    wkts = []
    # 127 mid-size irregular polygons (circles with jitter)
    for i in range(127):
        cx = float(rng.uniform(100, HEADLINE_N - 100))
        cy = float(rng.uniform(100, HEADLINE_N - 100))
        r = float(rng.uniform(20, 140))
        theta = np.linspace(0, 2 * math.pi, 65)
        rr = r * (1 + 0.15 * np.sin(5 * theta + i))
        xs = cx + rr * np.cos(theta)
        ys = cy + rr * np.sin(theta)
        wkts.append(
            "POLYGON ((" + ", ".join(f"{x:.3f} {y:.3f}" for x, y in zip(xs, ys)) + "))"
        )
    # 1 mega-polygon (skew): covers ~25% of the raster
    half = HEADLINE_N / 2
    theta = np.linspace(0, 2 * math.pi, 513)
    rr = half * 0.56 * (1 + 0.08 * np.sin(9 * theta))
    xs = half + rr * np.cos(theta)
    ys = half + rr * np.sin(theta)
    wkts.append(
        "POLYGON ((" + ", ".join(f"{x:.3f} {y:.3f}" for x, y in zip(xs, ys)) + "))"
    )
    feats = features_from_wkt(spark, wkts)
    return raster, feats


def run_headline(spark) -> tuple[float, int]:
    from exactextractr_spark.operators.zonal import exact_extract

    raster, feats = build_headline_inputs(spark)
    n_tiles = raster.meta.n_tile_rows * raster.meta.n_tile_cols
    # warm the tile table (generation is driver-side; exclude from timing)
    tiles_cached = raster.tiles
    t0 = time.time()
    out = exact_extract(
        raster, feats, ["count", "sum", "mean", "min", "max", "stdev"]
    )
    rows = out.collect()
    dt = time.time() - t0
    assert len(rows) == 128, len(rows)
    return dt, n_tiles


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    timings = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main():
    from exactextractr_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    headline_sec, n_tiles = run_headline(spark)
    queries = (
        {} if os.environ.get("BENCH_SKIP_QUERIES") else run_queries(spark)
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "zonal_headline_sec",
                "value": round(headline_sec, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "tiles_per_sec": round(n_tiles / headline_sec, 2),
                "n_tiles": n_tiles,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
