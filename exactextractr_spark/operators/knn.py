"""kNN search via cell-index ring expansion (north-rule operator).

No reference analog (the reference's STRtree answers intersection queries
only); semantics per BASELINE.json: "kNN tile lookup uses the same index
with ring-expansion search". Implementation: iterative candidate join —
each round widens the Chebyshev ring radius for still-unsatisfied queries,
joins on the packed cell id (equi-join, broadcastable), and finishes with an
exact-distance top-k window. The loop runs on the driver but every round is
a distributed join; round count is O(log) for any reasonable density.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..core.cellindex import CellIndex


def _disk_cells_udf(index: CellIndex, res: int):
    """Batch-vectorized Chebyshev annulus: cells with ring distance in
    [r_in, r_out] around each query's cell. One meshgrid of offsets per
    DISTINCT (r_in, r_out) pair in the Arrow batch (a round shares one
    pair across all remaining queries), then a single broadcasted add +
    clip + pack over all rows — no per-row/per-shell Python loops."""
    schema = T.ArrayType(T.LongType())
    n = index.n(res)
    sx = (index.xmax - index.xmin) / n
    sy = (index.ymax - index.ymin) / n
    xmin, ymin = index.xmin, index.ymin

    @F.pandas_udf(schema)
    def cells_for(
        x: pd.Series, y: pd.Series, r_in: pd.Series, r_out: pd.Series
    ) -> pd.Series:
        xv = x.to_numpy(np.float64)
        yv = y.to_numpy(np.float64)
        ri = r_in.to_numpy(np.int64)
        ro = r_out.to_numpy(np.int64)
        ix = np.clip(np.floor((xv - xmin) / sx).astype(np.int64), 0, n - 1)
        iy = np.clip(np.floor((yv - ymin) / sy).astype(np.int64), 0, n - 1)
        out: list = [None] * len(xv)
        for a, b in set(zip(ri.tolist(), ro.tolist())):
            rows = np.nonzero((ri == a) & (ro == b))[0]
            d = np.arange(-b, b + 1, dtype=np.int64)
            gx, gy = np.meshgrid(d, d, indexing="ij")
            ann = np.maximum(np.abs(gx), np.abs(gy)) >= a
            offx, offy = gx[ann], gy[ann]
            cx = ix[rows][:, None] + offx[None, :]
            cy = iy[rows][:, None] + offy[None, :]
            valid = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
            packed = (np.int64(res) << 58) | (cx << 29) | cy
            for j, row in enumerate(rows):
                out[row] = packed[j][valid[j]]
        return pd.Series(out)

    return cells_for


def knn_points(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    index: CellIndex,
    res: int = 6,
    max_rounds: int = 8,
) -> DataFrame:
    """For each query (qid, qx, qy) find the k nearest points
    (pid, px, py). Returns (qid, pid, dist, rank).

    Each round r expands the ring shells [prev+1 .. 2^r] for queries that
    haven't yet accumulated k candidates whose worst candidate distance is
    safely inside the searched radius.
    """
    spark = queries.sparkSession
    cells = _disk_cells_udf(index, res)
    n = index.n(res)
    cell_w = (index.xmax - index.xmin) / n
    cell_h = (index.ymax - index.ymin) / n

    # packed quad id via pure Catalyst arithmetic (see CellIndex.pack):
    # id = (res << 58) | (ix << 29) | iy
    ix = F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.floor((F.col("px") - F.lit(index.xmin)) / F.lit(cell_w))),
    ).cast("long")
    iy = F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.floor((F.col("py") - F.lit(index.ymin)) / F.lit(cell_h))),
    ).cast("long")
    pts = points.withColumn(
        "cell",
        F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(ix, 29))
        .bitwiseOR(iy),
    )

    # Round loop invariant: ``topk`` is a MATERIALIZED (localCheckpoint)
    # per-query running top-k — at most |queries| * k rows. Each round's
    # ring join therefore executes exactly once; later rounds never re-run
    # earlier rounds' joins (no lineage growth), and the completion test is
    # a groupBy aggregate over the bounded topk table, not a window over an
    # ever-growing union.
    remaining = queries
    topk: DataFrame | None = None
    w = Window.partitionBy("qid").orderBy("dist", "pid")
    prev_r = -1
    for round_i in range(max_rounds):
        radius = min(2**round_i, n)
        cand_cells = remaining.withColumn(
            "cell",
            F.explode(
                cells(
                    F.col("qx"), F.col("qy"), F.lit(prev_r + 1), F.lit(radius)
                )
            ),
        )
        hits = (
            cand_cells.join(pts, on="cell", how="inner")
            .withColumn(
                "dist",
                F.sqrt(
                    (F.col("qx") - F.col("px")) ** 2 + (F.col("qy") - F.col("py")) ** 2
                ),
            )
            .select("qid", "pid", "dist")
        )
        merged = hits if topk is None else topk.unionByName(hits)
        topk = (
            merged.dropDuplicates(["qid", "pid"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "pid", "dist")
            .localCheckpoint(eager=True)
        )
        # a query is done when it holds k candidates whose worst distance
        # fits inside the ring radius already searched (guarantees no
        # closer point outside); plain aggregate — no window
        safe = min(radius * min(cell_w, cell_h), 1e300)
        done_ids = (
            topk.groupBy("qid")
            .agg(F.count("*").alias("_n"), F.max("dist").alias("_kth"))
            .filter((F.col("_n") >= k) & (F.col("_kth") <= F.lit(safe)))
            .select("qid")
        )
        remaining = remaining.join(done_ids, on="qid", how="left_anti")
        prev_r = radius
        if radius >= n or remaining.isEmpty():
            break

    return topk.withColumn("rank", F.row_number().over(w)).select(
        "qid", "pid", "dist", "rank"
    )
