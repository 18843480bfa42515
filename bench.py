"""Benchmark: headline zonal-stats throughput (tiles/sec) + driver queries.

Prints ONE JSON line:
  {"metric": "zonal_tiles_per_sec", "value": <headline seconds>, "unit":
   "sec", "queries": {...per-query seconds...}, "sf": ..., "tiles_per_sec": N}

Headline workload: 16384x16384 synthetic raster (4,096 tiles of 256x256, the
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

HEADLINE_N = int(os.environ.get("BENCH_N", "16384"))
HEADLINE_TILE = 256
N_FEATURES = int(os.environ.get("BENCH_FEATURES", "128"))


def build_headline_inputs(spark, tmp_dir: str | None = None):
    import pandas as pd

    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.tiles import TILE_SCHEMA, Raster, RasterMeta

    rng = np.random.default_rng(42)
    meta = RasterMeta(
        "bench", xmin=0, ymax=float(HEADLINE_N), dx=1, dy=1,
        width=HEADLINE_N, height=HEADLINE_N,
        tile_w=HEADLINE_TILE, tile_h=HEADLINE_TILE,
    )
    # generate the tile table DISTRIBUTED (deterministic per-tile seed) and
    # persist to parquet — tiles come from columnar storage exactly as they
    # would from an Iceberg table, with column pruning + pushdown available
    ntc = meta.n_tile_cols

    from exactextractr_spark.core.png import encode_tile, phash64

    def _gen(batches):
        for pdf in batches:
            rows = []
            for tid in pdf["id"]:
                tr, tc = divmod(int(tid), ntc)
                g = meta.tile_grid(tr, tc)
                block = np.random.default_rng(42 + int(tid)).uniform(
                    0, 1000, (g.nrows, g.ncols)
                )
                rows.append(
                    {
                        "image_id": f"{meta.layer}/{tr}/{tc}",
                        "bytes": encode_tile(block),
                        "w": g.ncols,
                        "h": g.nrows,
                        "fmt": "png",
                        "caption": meta.caption(tr, tc),
                        "phash": phash64(block),
                    }
                )
            yield pd.DataFrame(rows)

    n_tiles = meta.n_tile_rows * meta.n_tile_cols
    # file count FIXED (not CPUS-dependent) so every parallelism level reads
    # the identical input, and small enough that each file holds several
    # tiles (scan tasks stay balanced at any local[N])
    n_files = min(64, n_tiles)
    tiles_path = (tmp_dir or "/tmp/exactextractr_bench") + f"/tiles_n{HEADLINE_N}"
    import os as _os

    if not _os.path.exists(tiles_path + "/_SUCCESS"):
        (
            spark.range(n_tiles)
            .repartition(n_files)
            .mapInPandas(_gen, TILE_SCHEMA)
            .write.mode("overwrite")
            .parquet(tiles_path)
        )
    raster = Raster.from_tiles(spark.read.parquet(tiles_path), meta)

    wkts = []
    # N-1 mid-size irregular polygons (circles with jitter)
    for i in range(N_FEATURES - 1):
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


def run_headline(spark) -> tuple[float, float, int]:
    from exactextractr_spark.operators.zonal import exact_extract

    raster, feats = build_headline_inputs(spark)
    n_tiles = raster.meta.n_tile_rows * raster.meta.n_tile_cols

    def once() -> float:
        t0 = time.time()
        rows = exact_extract(
            raster, feats, ["count", "sum", "mean", "min", "max", "stdev"]
        ).collect()
        assert len(rows) == N_FEATURES, len(rows)
        return time.time() - t0

    cold = once()  # includes python-worker imports + parquet footer reads
    reps = int(os.environ.get("BENCH_REPS", "5"))
    # best-of-k: this host is a shared VM with noisy neighbors; min is the
    # code's capability, medians over interleaved runs live in tools/scaling.py
    warm = min(once() for _ in range(reps))
    return cold, warm, n_tiles


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    reps = int(os.environ.get("BENCH_QUERY_REPS", "3"))
    timings = {}
    for name, fn in entry_mod.queries().items():
        # best-of-k: a single-shot number on this noisy shared VM measures
        # first-touch parquet reads + plan compile + neighbor load as much
        # as the query (observed 3x swings on identical code); the min of
        # three runs is the query's capability
        best = float("inf")
        for _ in range(reps):
            # identical logical plans hit Spark's CacheManager across
            # calls: without clearCache a rep of a query that persists an
            # intermediate re-times only the post-cache part
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return timings


def main():
    from exactextractr_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    cold_sec, warm_sec, n_tiles = run_headline(spark)
    queries = (
        {} if os.environ.get("BENCH_SKIP_QUERIES") else run_queries(spark)
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "zonal_headline_sec",
                "value": round(warm_sec, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "tiles_per_sec": round(n_tiles / warm_sec, 2),
                "cold_sec": round(cold_sec, 3),
                "n_tiles": n_tiles,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
