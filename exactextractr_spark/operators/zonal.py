"""``exact_extract`` — zonal statistics over (feature × tile) candidate pairs.

Spark-first re-expression of the reference pipeline
(``/root/reference/R/exact_extract.R:270-773`` + ``src/exact_extract.cpp:
266-507``): the reference's per-feature loop and ``subdivide`` chunking
disappear into shuffle parallelism; its StatsRegistry merge is Spark's
partial/final aggregation.

Plan shape (the reference's *raster-sequential* strategy,
``raster_sequential_processor.cpp:38-121``, with the STRtree replaced by a
tile-key equi-join Catalyst can broadcast or shuffle-hash):

    features ──explode tile cover (pure Catalyst sequence arithmetic)──┐
    tiles ──decode (mapInPandas)───────────────────────────────────────┤
                                                                        ▼
          equi-join on (tile_row, tile_col)  +  exact bbox refine
                                                                        ▼
          coverage kernel (mapInPandas, Arrow-vectorized) → sparse facts
                                                                        ▼
     groupBy(feature_id).agg(all algebraic stats)   [+ groupBy(fid, v)
     for frequency stats; quantiles interpolate JVM-side from one window
     pass over the frequency table — no per-feature Python group]
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import geom as G
from ..core.coverage import coverage_fraction
from ..core.grid import Box, Grid
from ..plans.stats import StatsPlan, quantile_name
from ..sources.tiles import Raster

EARTH_RADIUS = 6378137.0  # authalic, ref raster_area.h:63
_PI180 = math.pi / 180.0

FACTS_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("w", T.DoubleType(), True),
        T.StructField("cov", T.DoubleType(), False),
        T.StructField("cell", T.LongType(), True),
        T.StructField("cx", T.DoubleType(), True),
        T.StructField("cy", T.DoubleType(), True),
        T.StructField("area", T.DoubleType(), True),
    ]
)

#: frac/weighted_frac produce one result column per GLOBAL distinct value;
#: beyond this the raster is not categorical and the request fails loudly
#: (matches Spark's own spark.sql.pivotMaxValues default)
MAX_FRAC_VALUES = 10_000

#: per-(feature, tile) partial value-frequency rows — kernel-side combine of
#: the groupBy(fid, v) shuffle (shuffle bytes scale with distinct values per
#: tile, not with covered cells)
FREQ_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
        T.StructField("sum_c", T.DoubleType(), False),
        T.StructField("sum_cw", T.DoubleType(), True),
    ]
)

#: per-(feature, tile) algebraic moments — the reference's StatsRegistry
#: accumulator (raster_stats.h:31-140) emitted as ONE row per candidate
#: pair, so the shuffle is independent of cell count entirely
MOMENTS_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), False),
        T.StructField("_p_sum_c", T.DoubleType(), True),
        T.StructField("_p_sum_xc", T.DoubleType(), True),
        T.StructField("_p_sum_xxc", T.DoubleType(), True),
        T.StructField("_p_sum_cw", T.DoubleType(), True),
        T.StructField("_p_sum_xcw", T.DoubleType(), True),
        T.StructField("_p_sum_xxcw", T.DoubleType(), True),
        T.StructField("_p_min", T.DoubleType(), True),
        T.StructField("_p_max", T.DoubleType(), True),
    ]
)


def cell_areas(grid: Grid, rows: np.ndarray, spherical: bool) -> np.ndarray:
    """Cell area per row index — cartesian constant or per-latitude-band
    spherical (ref raster_area.h:21-69, authalic radius 6378137)."""
    if not spherical:
        return np.full(len(rows), grid.dx * grid.dy)
    y_top = grid.ymax - rows * grid.dy
    y_bot = y_top - grid.dy
    return (
        EARTH_RADIUS
        * EARTH_RADIUS
        * _PI180
        * np.abs(np.sin(y_bot * _PI180) - np.sin(y_top * _PI180))
        * grid.dx
    )


# ---------------------------------------------------------------------------
# candidate join
# ---------------------------------------------------------------------------

def feature_tile_cover(values: Raster, feats: DataFrame) -> DataFrame:
    """Explode each feature's bbox into covering tile keys (pure Catalyst
    sequence arithmetic — the 'H3 cover' of the north rule at tile
    granularity). Returns (tile_row, tile_col, feature_id, geom, f-bbox)."""
    m = values.meta
    step_x = m.dx * m.tile_w
    step_y = m.dy * m.tile_h

    f = feats.filter(
        (F.col("fxmin") <= F.lit(m.xmax))
        & (F.col("fxmax") >= F.lit(m.xmin))
        & (F.col("fymin") <= F.lit(m.ymax))
        & (F.col("fymax") >= F.lit(m.ymin))
    )
    tr0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_rows - 1),
            F.floor((F.lit(m.ymax) - F.col("fymax")) / F.lit(step_y)),
        ),
    ).cast("int")
    tr1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_rows - 1),
            F.floor((F.lit(m.ymax) - F.col("fymin")) / F.lit(step_y)),
        ),
    ).cast("int")
    tc0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_cols - 1),
            F.floor((F.col("fxmin") - F.lit(m.xmin)) / F.lit(step_x)),
        ),
    ).cast("int")
    tc1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_cols - 1),
            F.floor((F.col("fxmax") - F.lit(m.xmin)) / F.lit(step_x)),
        ),
    ).cast("int")
    return f.withColumn("tile_row", F.explode(F.sequence(tr0, tr1))).withColumn(
        "tile_col", F.explode(F.sequence(tc0, tc1))
    )


def candidate_pairs(
    values: Raster,
    feats: DataFrame,
    broadcast_features: bool = True,
    salt_buckets: int = 1,
) -> DataFrame:
    """Grouped candidate join: each tile row carries the LIST of features
    overlapping it, so a tile's (heavy) pixel payload crosses the JVM→Python
    boundary exactly once no matter how many features touch it — the fanout
    of a continent-sized polygon duplicates only its (small) WKB into the
    per-tile lists, never the rasters. At 10^12-tile scale the per-tile
    work list is also the unit of checkpointing and skew is bounded by
    features-per-tile, not cells-per-feature.

    ``salt_buckets > 1`` splits each hot tile's feature list into that many
    salt buckets (north-rule skew handling): the per-tile ``collect_list``
    and the downstream kernel row both stay bounded; the tile payload is
    replicated once per non-empty bucket — the standard payload-duplication
    vs task-size salting trade."""
    cover = feature_tile_cover(values, feats).select(
        "tile_row",
        "tile_col",
        F.struct("feature_id", "geom", "fxmin", "fymin", "fxmax", "fymax").alias(
            "_feat"
        ),
    )
    group_keys = ["tile_row", "tile_col"]
    if salt_buckets > 1:
        cover = cover.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("_feat.feature_id")), F.lit(salt_buckets)).cast(
                "int"
            ),
        )
        group_keys = group_keys + ["_salt"]
    per_tile = cover.groupBy(*group_keys).agg(
        F.collect_list("_feat").alias("feats")
    )
    if salt_buckets > 1:
        per_tile = per_tile.drop("_salt")
    if broadcast_features:
        per_tile = F.broadcast(per_tile)
    tile_side = values.raw_meta
    if tile_side is None:
        tile_side = values.tiles
    return tile_side.join(per_tile, on=["tile_row", "tile_col"], how="inner")


class FeatureBroadcast:
    """Driver-collected feature set for the feature-sequential strategy
    (ref feature_sequential_processor.cpp:24-91): when the polygon table is
    small enough to broadcast (the reference's only mode), the candidate
    'join' degenerates to a vectorized bbox test inside the kernel and the
    whole zonal plan is ONE stage: scan tiles → kernel → agg. No shuffle,
    no per-tile list build, no AQE job chain — at 10^12-tile scale the tile
    scan is the only data motion."""

    __slots__ = ("ids", "fxmin", "fymin", "fxmax", "fymax", "wkbs", "_geoms")

    def __getstate__(self):
        return (self.ids, self.fxmin, self.fymin, self.fxmax, self.fymax, self.wkbs)

    def __setstate__(self, st):
        self.ids, self.fxmin, self.fymin, self.fxmax, self.fymax, self.wkbs = st
        self._geoms = None

    def __init__(self, rows):
        self._geoms = None
        n = len(rows)
        self.ids = np.empty(n, dtype=np.int64)
        self.fxmin = np.empty(n, dtype=np.float64)
        self.fymin = np.empty(n, dtype=np.float64)
        self.fxmax = np.empty(n, dtype=np.float64)
        self.fymax = np.empty(n, dtype=np.float64)
        self.wkbs = []
        for i, r in enumerate(rows):
            self.ids[i] = r["feature_id"]
            self.fxmin[i] = r["fxmin"]
            self.fymin[i] = r["fymin"]
            self.fxmax[i] = r["fxmax"]
            self.fymax[i] = r["fymax"]
            self.wkbs.append(bytes(r["geom"]))

    def overlapping(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Indices of features whose bbox intersects the given tile box."""
        return np.nonzero(
            (self.fxmin < xmax)
            & (self.fxmax > xmin)
            & (self.fymin < ymax)
            & (self.fymax > ymin)
        )[0]

    def overlapping_inclusive(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Closed-interval variant for LINEAR features, whose degenerate
        bboxes can lie exactly on a tile edge (the line kernel's edge
        ownership de-duplicates boundary segments)."""
        return np.nonzero(
            (self.fxmin <= xmax)
            & (self.fxmax >= xmin)
            & (self.fymin <= ymax)
            & (self.fymax >= ymin)
        )[0]

    def geom(self, i: int):
        """Parsed geometry, cached per worker (the broadcast value is
        deserialized once per executor, so the cache amortizes across all
        tasks and batches)."""
        g = self._geoms
        if g is None:
            g = self._geoms = [None] * len(self.wkbs)
        if g[i] is None:
            g[i] = G.from_wkb(self.wkbs[i])
        return g[i]


#: features above this count fall back to the cover-join strategy
BROADCAST_FEATURE_LIMIT = 200_000

#: only fuse the broadcast-size guard with the collect when the optimizer
#: estimates the whole feature table comfortably collectable; larger or
#: unestimable tables count first so no geometry bytes reach the driver
#: before the fallback decision
_FUSED_COLLECT_MAX_BYTES = 256 << 20


def build_candidates(
    values: Raster,
    feats: DataFrame,
    broadcast_features: bool = True,
    salt_buckets: int = 1,
):
    """Choose the candidate strategy (the reference's --strategy flag,
    exactextract.cpp:95-101):

    - feature-sequential / broadcast (small feature table): returns
      ``(tiles_df, sc.broadcast(FeatureBroadcast))`` — single-stage plan.
    - raster-sequential / cover join (huge feature table): returns
      ``(joined_df_with_feats_lists, None)``.
    """
    # CRS reconciliation: the reference auto-transforms the polygons to the
    # raster CRS with a warning (R/exact_extract.R:360-377). We do the same
    # for the closed-form pair (EPSG:4326 <-> EPSG:3857, core/crs.py); every
    # other mismatched pair fails loudly instead of producing silently wrong
    # answers on misaligned coordinates.
    # ONE metadata job covers both the CRS audit and the broadcast-size
    # guard: agg(count, collect_set(crs)) — the CRS audit must see every
    # row's crs anyway (any single mismatched row invalidates the run), so
    # folding count() into the same aggregate is free, and every zonal query
    # now issues at most one auxiliary driver job before the kernel stage.
    n_feats: int | None = None
    check_crs = "crs" in feats.columns and bool(values.meta.crs)
    if check_crs:
        meta_row = feats.agg(
            F.count(F.lit(1)).alias("n"),
            # coalesce to "" so a null-crs row is visible in the set — rows
            # with no CRS are conventionally assumed to already be in the
            # raster CRS and must NOT be silently reprojected
            F.collect_set(F.coalesce(F.col("crs"), F.lit(""))).alias("cset"),
        ).first()
        n_feats = meta_row["n"]
        cset = set(meta_row["cset"])
        has_null = "" in cset
        fcrs = sorted(cset - {""})
        bad = [c for c in fcrs if c != values.meta.crs]
        if bad:
            from ..core.crs import can_transform
            from ..sources.features import transform_features

            if has_null:
                # mixed null-CRS and defined-CRS rows: transform_features
                # reprojects EVERY row, which would silently move the
                # null-CRS geometries (assumed already in the raster CRS)
                raise ValueError(
                    "feature table mixes rows with no CRS and rows in "
                    f"{bad[0]!r}; cannot auto-transform without silently "
                    "reprojecting the CRS-less rows — stamp or transform "
                    "them explicitly first"
                )
            if len(set(bad)) == 1 and len(fcrs) == 1 and can_transform(
                bad[0], values.meta.crs
            ):
                import warnings

                warnings.warn(
                    f"transforming features from {bad[0]!r} to the raster "
                    f"CRS {values.meta.crs!r} (ref R/exact_extract.R:360-377)"
                )
                feats = transform_features(feats, bad[0], values.meta.crs)
            else:
                raise ValueError(
                    f"feature CRS {bad[0]!r} does not match the raster CRS "
                    f"{values.meta.crs!r} and no closed-form transform "
                    "exists; transform the features to the raster CRS first "
                    "(the reference transforms automatically via PROJ, "
                    "R/exact_extract.R:360-377)"
                )
    if not broadcast_features:
        return (
            candidate_pairs(
                values, feats, broadcast_features=False, salt_buckets=salt_buckets
            ),
            None,
        )
    # Broadcast-size guard fused with the broadcast collect: when the CRS
    # audit already counted the table, reuse that count and only collect
    # under the limit. Otherwise, a table whose optimizer size estimate is
    # comfortably collectable takes ONE bounded job (limit+1 rows, count
    # derived from the result — saves an auxiliary driver job on every
    # small-feature query); a large or unestimable table keeps the old
    # count-FIRST order so no geometry bytes ever land on the driver
    # before the refusal decision (a 10M-feature table of megabyte WKBs
    # must not stage limit+1 geometries just to discover the fallback).
    sel_cols = ("feature_id", "geom", "fxmin", "fymin", "fxmax", "fymax")
    rows = None
    if n_feats is None:
        est = None
        try:
            est = int(
                str(
                    feats._jdf.queryExecution().optimizedPlan().stats()
                    .sizeInBytes()
                )
            )
        except Exception:
            pass
        if est is not None and est <= _FUSED_COLLECT_MAX_BYTES:
            rows = (
                feats.select(*sel_cols)
                .limit(BROADCAST_FEATURE_LIMIT + 1)
                .collect()
            )
            n_feats = len(rows)
        else:
            # column-pruned bounded count: no geometry bytes move
            n_feats = feats.limit(BROADCAST_FEATURE_LIMIT + 1).count()
    if n_feats > BROADCAST_FEATURE_LIMIT:
        return (
            candidate_pairs(
                values, feats, broadcast_features=True,
                salt_buckets=salt_buckets,
            ),
            None,
        )
    if rows is None:
        rows = feats.select(*sel_cols).collect()
    fb = FeatureBroadcast(rows)
    tile_side = values.raw_meta
    if tile_side is None:
        tile_side = values.tiles
    # driver-side tile pruning from feature bboxes (the reference's crop,
    # exact_extract.cpp:359-361): skip the filter when features blanket the
    # raster — scanning everything beats building a huge IN-set
    m = values.meta
    step_x = m.dx * m.tile_w
    step_y = m.dy * m.tile_h
    keys: set[tuple[int, int]] = set()
    blanket = False
    cap = max(64, (m.n_tile_rows * m.n_tile_cols) // 2)
    for i in range(len(fb.ids)):
        tr0 = max(0, min(m.n_tile_rows - 1, int((m.ymax - fb.fymax[i]) // step_y)))
        tr1 = max(0, min(m.n_tile_rows - 1, int((m.ymax - fb.fymin[i]) // step_y)))
        tc0 = max(0, min(m.n_tile_cols - 1, int((fb.fxmin[i] - m.xmin) // step_x)))
        tc1 = max(0, min(m.n_tile_cols - 1, int((fb.fxmax[i] - m.xmin) // step_x)))
        # bail out on the SPAN before enumerating: one raster-blanketing
        # polygon on a 10^12-tile grid must not build the cross product
        if len(keys) + (tr1 - tr0 + 1) * (tc1 - tc0 + 1) > cap:
            blanket = True
            break
        for tr in range(tr0, tr1 + 1):
            for tc in range(tc0, tc1 + 1):
                keys.add((tr, tc))
    if not blanket and len(keys) < m.n_tile_rows * m.n_tile_cols:
        spark = tile_side.sparkSession
        # pandas/Arrow path => a true LocalTableScan: a python-list
        # createDataFrame becomes a 32-slice python RDD whose first
        # materialization costs one python-worker round-trip PER SLICE
        # (measured ~4s of pure overhead per fresh query plan)
        ks = sorted(keys)
        keys_df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "tile_row": pd.Series([k[0] for k in ks], dtype="int32"),
                    "tile_col": pd.Series([k[1] for k in ks], dtype="int32"),
                }
            )
        )
        tile_side = tile_side.join(
            F.broadcast(keys_df), on=["tile_row", "tile_col"], how="inner"
        )
    sc = tile_side.sparkSession.sparkContext
    return tile_side, sc.broadcast(fb)


def candidate_pairs_flat(values: Raster, feats: DataFrame) -> DataFrame:
    """Metadata-only (feature × tile) candidate pairs with the exact bbox
    refine — no pixel payloads; for diagnostics / pair accounting."""
    m = values.meta
    cover = feature_tile_cover(values, feats)
    tile_xmin = F.lit(m.xmin) + F.col("tile_col") * F.lit(m.dx * m.tile_w)
    tile_ymax = F.lit(m.ymax) - F.col("tile_row") * F.lit(m.dy * m.tile_h)
    tile_xmax = F.least(F.lit(m.xmax), tile_xmin + F.lit(m.dx * m.tile_w))
    tile_ymin = F.greatest(F.lit(m.ymin), tile_ymax - F.lit(m.dy * m.tile_h))
    return cover.filter(
        (F.col("fxmin") < tile_xmax)
        & (F.col("fxmax") > tile_xmin)
        & (F.col("fymin") < tile_ymax)
        & (F.col("fymax") > tile_ymin)
    )


# Broadcast the weight tile table only while its full pixel payload is
# plausibly executor-memory safe. Above this the hint is dropped and the
# slim-key equi-join on (w_tr, w_tc) shuffles instead (AQE picks the
# strategy) — an unconditional broadcast of a 100-TB-scale weight raster's
# payloads is a driver/executor OOM, not a slowdown.
WEIGHT_BROADCAST_MAX_BYTES = 64 << 20


def _weight_payload_bytes(wm) -> int:
    """Upper-bound estimate of the weight raster's in-memory pixel payload
    (8 bytes/cell float64), computable from metadata alone — no job."""
    return int(wm.width) * int(wm.height) * 8


def _attach_weights(cand: DataFrame, values: Raster, weights: Raster) -> DataFrame:
    """Join the weight tiles overlapping each candidate value tile
    (collect_list of structs; exactly 1 element when schemes align).
    Grouping happens on a slim key projection so the heavy tile payload
    never enters the shuffle; the weight side is broadcast only below a
    size gate (see WEIGHT_BROADCAST_MAX_BYTES).

    Aligned fast path: when the weight raster shares the value raster's
    grid AND tiling exactly, value tile (r, c) overlaps weight tile
    (r, c) and nothing else — one equi-join on the tile index, no
    explode/collect_list shuffle at all (the common case: weights
    produced alongside values on one grid)."""
    wm = weights.meta
    vm = values.meta
    aligned = (
        wm.xmin == vm.xmin and wm.ymax == vm.ymax
        and wm.dx == vm.dx and wm.dy == vm.dy
        and wm.tile_w == vm.tile_w and wm.tile_h == vm.tile_h
        and wm.width == vm.width and wm.height == vm.height
    )
    if aligned:
        w1 = weights.tiles.select(
            "tile_row", "tile_col",
            F.array(
                F.struct(
                    F.col("xmin").alias("xmin"),
                    F.col("ymax").alias("ymax"),
                    F.col("dx").alias("dx"),
                    F.col("dy").alias("dy"),
                    F.col("nrows").alias("nrows"),
                    F.col("ncols").alias("ncols"),
                    F.col("px").alias("px"),
                )
            ).alias("wtiles"),
        )
        if _weight_payload_bytes(wm) <= WEIGHT_BROADCAST_MAX_BYTES:
            w1 = F.broadcast(w1)
        return cand.join(w1, on=["tile_row", "tile_col"], how="left")
    w = weights.tiles.select(
        F.col("tile_row").alias("w_tr"),
        F.col("tile_col").alias("w_tc"),
        F.struct(
            F.col("xmin").alias("xmin"),
            F.col("ymax").alias("ymax"),
            F.col("dx").alias("dx"),
            F.col("dy").alias("dy"),
            F.col("nrows").alias("nrows"),
            F.col("ncols").alias("ncols"),
            F.col("px").alias("px"),
        ).alias("wtile"),
    )
    step_x = wm.dx * wm.tile_w
    step_y = wm.dy * wm.tile_h
    wr0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(wm.n_tile_rows - 1),
            F.floor((F.lit(wm.ymax) - F.col("ymax")) / F.lit(step_y) + F.lit(1e-9)),
        ),
    ).cast("int")
    wr1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(wm.n_tile_rows - 1),
            F.floor((F.lit(wm.ymax) - F.col("ymin")) / F.lit(step_y) - F.lit(1e-9)),
        ),
    ).cast("int")
    wc0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(wm.n_tile_cols - 1),
            F.floor((F.col("xmin") - F.lit(wm.xmin)) / F.lit(step_x) + F.lit(1e-9)),
        ),
    ).cast("int")
    wc1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(wm.n_tile_cols - 1),
            F.floor((F.col("xmax") - F.lit(wm.xmin)) / F.lit(step_x) - F.lit(1e-9)),
        ),
    ).cast("int")
    slim = cand.select("tile_row", "tile_col", "xmin", "ymin", "xmax", "ymax").dropDuplicates(
        ["tile_row", "tile_col"]
    )
    expanded = slim.withColumn("w_tr", F.explode(F.sequence(wr0, wr1))).withColumn(
        "w_tc", F.explode(F.sequence(wc0, wc1))
    )
    if _weight_payload_bytes(wm) <= WEIGHT_BROADCAST_MAX_BYTES:
        w = F.broadcast(w)
    joined = expanded.join(w, on=["w_tr", "w_tc"], how="left")
    wlists = joined.groupBy("tile_row", "tile_col").agg(
        F.collect_list("wtile").alias("wtiles")
    )
    return cand.join(wlists, on=["tile_row", "tile_col"], how="left")


def static_weight_lists(values_meta, weights: Raster) -> DataFrame:
    """(tile_row, tile_col, wtiles) keyed by VALUE-raster tile index, built
    entirely from the static weight raster — for stream-static joins where
    the value tiles arrive as a stream and no stateful grouping may run on
    the streaming side (``_attach_weights`` groups on the candidate side,
    which Structured Streaming forbids before the final aggregate). Each
    weight tile enumerates the value tiles it overlaps (pure arithmetic on
    the value grid), then one STATIC groupBy collects the per-value-tile
    weight lists; the streaming join is a stateless broadcast equi-join."""
    wt = weights.tiles.select(
        "xmin", "ymin", "xmax", "ymax",
        F.struct(
            F.col("xmin").alias("xmin"),
            F.col("ymax").alias("ymax"),
            F.col("dx").alias("dx"),
            F.col("dy").alias("dy"),
            F.col("nrows").alias("nrows"),
            F.col("ncols").alias("ncols"),
            F.col("px").alias("px"),
        ).alias("wtile"),
    )
    m = values_meta
    step_x = m.dx * m.tile_w
    step_y = m.dy * m.tile_h
    vr0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_rows - 1),
            F.floor((F.lit(m.ymax) - F.col("ymax")) / F.lit(step_y) + F.lit(1e-9)),
        ),
    ).cast("int")
    vr1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_rows - 1),
            F.floor((F.lit(m.ymax) - F.col("ymin")) / F.lit(step_y) - F.lit(1e-9)),
        ),
    ).cast("int")
    vc0 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_cols - 1),
            F.floor((F.col("xmin") - F.lit(m.xmin)) / F.lit(step_x) + F.lit(1e-9)),
        ),
    ).cast("int")
    vc1 = F.greatest(
        F.lit(0),
        F.least(
            F.lit(m.n_tile_cols - 1),
            F.floor((F.col("xmax") - F.lit(m.xmin)) / F.lit(step_x) - F.lit(1e-9)),
        ),
    ).cast("int")
    expanded = wt.withColumn("tile_row", F.explode(F.sequence(vr0, vr1))).withColumn(
        "tile_col", F.explode(F.sequence(vc0, vc1))
    )
    return expanded.groupBy("tile_row", "tile_col").agg(
        F.collect_list("wtile").alias("wtiles")
    )


# ---------------------------------------------------------------------------
# the coverage kernel as a mapInPandas stage
# ---------------------------------------------------------------------------

def coverage_facts(
    cand: DataFrame,
    *,
    values_meta,
    weighted: bool = False,
    area_weights: bool = False,
    spherical: bool = False,
    coverage_area: bool = False,
    include_cell: bool = False,
    include_xy: bool = False,
    include_area: bool = False,
    keep_nodata: bool = False,
    default_value: float | None = None,
    default_weight: float | None = None,
    emit: str = "pixels",
    feats_bc=None,
    disagg: "tuple[int, int]" = (1, 1),
    by_layer: bool = False,
    coverage_only: bool = False,
) -> DataFrame:
    """Run the exact coverage kernel per (feature, tile) row.

    ``feats_bc`` (a ``sc.broadcast(FeatureBroadcast)``) switches the kernel
    to the feature-sequential strategy: ``cand`` is then the bare tile
    DataFrame and candidates are found by a vectorized bbox test.

    ``emit`` selects the kernel-side reduction (the reference's per-chunk
    StatsRegistry accumulation, stats_registry.h:25-84, done before the
    shuffle instead of after it):

    - ``"pixels"``: sparse facts (feature_id, v, w, cov[, cell, cx, cy,
      area]) — the coverage-fraction raster in long form, for the pixel/UDF
      path.
    - ``"freq"``: per-(feature, tile, value) partial sums (v, Σc, Σcw) —
      combine for the groupBy(fid, v) frequency-stat shuffle.
    - ``"moments"``: ONE row per (feature, tile) of algebraic moments —
      shuffle volume independent of cell count; the 100-TB path for all
      algebraic stats.
    """
    raster_xmin = values_meta.xmin
    raster_ymax = values_meta.ymax
    raster_width = values_meta.width
    need_cell = include_cell
    need_xy = include_xy
    need_area = include_area or coverage_area or area_weights or spherical

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math as _math

        from ..core.png import decode_tile as _decode

        fb = feats_bc.value if feats_bc is not None else None
        fx, fy = disagg
        geom_cache: dict[bytes, object] = {}

        def _iter_feats(row):
            """Yield (feature_id, geom, fxmin, fymin, fxmax, fymax) for
            candidates of this tile, from the broadcast (vectorized bbox
            test) or the per-tile list (cover-join mode)."""
            if fb is not None:
                for j in fb.overlapping(row.xmin, row.ymin, row.xmax, row.ymax):
                    yield (
                        int(fb.ids[j]),
                        fb.geom(j),
                        fb.fxmin[j],
                        fb.fymin[j],
                        fb.fxmax[j],
                        fb.fymax[j],
                    )
                return
            for ft in row.feats:
                # exact bbox refine (cover cells are floor-rounded)
                if (
                    ft["fxmin"] >= row.xmax
                    or ft["fxmax"] <= row.xmin
                    or ft["fymin"] >= row.ymax
                    or ft["fymax"] <= row.ymin
                ):
                    continue
                gwkb = bytes(ft["geom"])
                geom = geom_cache.get(gwkb)
                if geom is None:
                    geom = G.from_wkb(gwkb)
                    if len(geom_cache) > 4096:
                        geom_cache.clear()
                    geom_cache[gwkb] = geom
                yield (
                    ft["feature_id"],
                    geom,
                    ft["fxmin"],
                    ft["fymin"],
                    ft["fxmax"],
                    ft["fymax"],
                )

        for pdf in batches:
            outs = []
            has_w = "wtiles" in pdf.columns
            raw_mode = "px" not in pdf.columns
            for row in pdf.itertuples(index=False):
                # decode this tile's pixels ONCE for all its features
                if coverage_only:
                    # geometry-only queries (coverage_fraction, rasterize):
                    # no pixel payload ships or decodes, values read as 0
                    px = None
                elif raw_mode:
                    px = _decode(bytes(row.bytes), int(row.ncols), int(row.nrows))
                    nodata = row.nodata
                    if nodata is not None and not (
                        isinstance(nodata, float) and _math.isnan(nodata)
                    ):
                        px = np.where(px == nodata, np.nan, px)
                else:
                    px = np.asarray(row.px, dtype=np.float64).reshape(
                        int(row.nrows), int(row.ncols)
                    )
                tile_grid = Grid(row.xmin, row.ymin, row.xmax, row.ymax, row.dx, row.dy)
                for feature_id, geom, fxmin, fymin, fxmax, fymax in _iter_feats(row):
                    sub = tile_grid.crop(Box(fxmin, fymin, fxmax, fymax))
                    if sub.size == 0:
                        continue
                    if fx > 1 or fy > 1:
                        # disaggregate: coverage on the finer common grid;
                        # the value raster is sampled by integer division —
                        # the reference's lazy RasterView (raster.h:248-312)
                        # without materializing the upsampled block
                        samp = Grid(
                            sub.xmin, sub.ymin, sub.xmax, sub.ymax,
                            sub.dx / fx, sub.dy / fy,
                        )
                    else:
                        samp = sub
                    cov = coverage_fraction(samp, geom)
                    rr, cc = np.nonzero(cov > 0)
                    if len(rr) == 0:
                        continue
                    covv = cov[rr, cc]
                    # offsets of the cropped grid within the tile
                    r_off, c_off = tile_grid.row_col_offset(sub)
                    tr = rr // fy + r_off
                    tc = cc // fx + c_off
                    v = np.zeros(len(rr)) if px is None else px[tr, tc]
                    if default_value is not None:
                        v = np.where(np.isnan(v), default_value, v)
                    if not keep_nodata:
                        ok = ~np.isnan(v)
                        if not ok.all():
                            tr, tc, v, covv = tr[ok], tc[ok], v[ok], covv[ok]
                            rr, cc = rr[ok], cc[ok]
                        if len(v) == 0:
                            continue
                    n = len(v)
                    # cell centers in world coords, at sampling resolution
                    cx = samp.xmin + (cc + 0.5) * samp.dx
                    cy = samp.ymax - (rr + 0.5) * samp.dy
                    rec: dict[str, np.ndarray] = {
                        "feature_id": np.full(n, feature_id, dtype=np.int64),
                        "v": v,
                        "cov": covv,
                    }
                    if need_area:
                        area = cell_areas(samp, rr, spherical)
                    else:
                        area = None
                    if coverage_area and area is not None:
                        covv = covv * area
                        rec["cov"] = covv
                    if has_w or area_weights:
                        if area_weights and area is not None:
                            w = area.copy()
                        elif has_w:
                            w = np.full(n, np.nan)
                            wtiles = row.wtiles if row.wtiles is not None else []
                            for wt in wtiles:
                                wpx = np.asarray(wt["px"], dtype=np.float64).reshape(
                                    int(wt["nrows"]), int(wt["ncols"])
                                )
                                wr = np.floor((wt["ymax"] - cy) / wt["dy"]).astype(np.int64)
                                wc = np.floor((cx - wt["xmin"]) / wt["dx"]).astype(np.int64)
                                sel = (
                                    (wr >= 0)
                                    & (wr < int(wt["nrows"]))
                                    & (wc >= 0)
                                    & (wc < int(wt["ncols"]))
                                )
                                if sel.any():
                                    w[sel] = wpx[wr[sel], wc[sel]]
                            if default_weight is not None:
                                w = np.where(np.isnan(w), default_weight, w)
                        rec["w"] = w
                    else:
                        w = np.full(n, np.nan)
                        rec["w"] = w
                    if emit == "moments":
                        # one scalar row per pair, accumulated as plain
                        # python lists — a pandas frame per pair costs more
                        # than the moments themselves
                        cw = covv * w
                        vc = v * covv
                        vcw = v * cw
                        moments_tuple = (
                            covv.sum(),
                            vc.sum(),
                            (v * vc).sum(),
                            cw.sum(),
                            vcw.sum(),
                            (v * vcw).sum(),
                            v.min(),
                            v.max(),
                        )
                        if by_layer:
                            # multi-layer single pass: tag with this tile
                            # row's layer so one scan serves every layer
                            outs.append((feature_id, row.layer) + moments_tuple)
                        else:
                            outs.append((feature_id,) + moments_tuple)
                        continue
                    if emit == "freq":
                        uv, inv = np.unique(v, return_inverse=True)
                        sum_c = np.bincount(inv, weights=covv)
                        sum_cw = np.bincount(inv, weights=covv * w)
                        rec_f = (
                            np.full(len(uv), feature_id, np.int64),
                            uv,
                            sum_c,
                            sum_cw,
                        )
                        if by_layer:
                            # multi-layer single pass: tag with this tile
                            # row's layer (same as the moments emit)
                            rec_f = (
                                rec_f[0],
                                np.full(len(uv), row.layer, dtype=object),
                            ) + rec_f[1:]
                        outs.append(rec_f)
                        continue
                    if need_cell:
                        # 1-based global cell index of the value raster, row-major
                        # 1-based cell index of the VALUE raster even when
                        # disaggregated (ref raster_utils.cpp:53-118)
                        grow = int(round((raster_ymax - tile_grid.ymax) / tile_grid.dy)) + tr
                        gcol = int(round((tile_grid.xmin - raster_xmin) / tile_grid.dx)) + tc
                        rec["cell"] = (grow * raster_width + gcol + 1).astype(np.int64)
                    else:
                        rec["cell"] = np.zeros(n, dtype=np.int64)
                    rec["cx"] = cx if need_xy else np.zeros(n)
                    rec["cy"] = cy if need_xy else np.zeros(n)
                    rec["area"] = area if area is not None else np.zeros(n)
                    outs.append(tuple(rec[c] for c in _out_cols))
            if outs:
                # ONE frame per Arrow batch (np.concatenate of column
                # arrays), not a pandas concat of per-pair frames
                if emit == "moments":
                    cols = list(zip(*outs))
                    data = {_out_cols[0]: np.asarray(cols[0], dtype=np.int64)}
                    for i, name in enumerate(_out_cols):
                        if i == 0:
                            continue
                        if name == "layer":
                            data[name] = list(cols[i])
                        else:
                            data[name] = np.asarray(cols[i], dtype=np.float64)
                    yield pd.DataFrame(data)
                else:
                    cols = list(zip(*outs))
                    yield pd.DataFrame(
                        {
                            name: np.concatenate(cols[i])
                            for i, name in enumerate(_out_cols)
                        }
                    )

    if emit == "moments":
        schema = MOMENTS_SCHEMA
        if by_layer:
            schema = T.StructType(
                [schema.fields[0], T.StructField("layer", T.StringType())]
                + list(schema.fields[1:])
            )
    elif emit == "freq":
        schema = FREQ_SCHEMA
        if by_layer:
            schema = T.StructType(
                [schema.fields[0], T.StructField("layer", T.StringType())]
                + list(schema.fields[1:])
            )
    else:
        schema = FACTS_SCHEMA
    _out_cols = [f.name for f in schema.fields]
    return cand.mapInPandas(_kernel, schema)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def exact_extract(
    values: Raster,
    features: DataFrame,
    stats: "list[str] | str",
    *,
    weights: "Raster | str | None" = None,
    quantiles: "list[float] | None" = None,
    coverage_area: bool = False,
    spherical: bool = False,
    default_value: float | None = None,
    default_weight: float | None = None,
    broadcast_features: bool = True,
    salt_buckets: int = 1,
    append_cols: "DataFrame | None" = None,
    sort: bool = True,
) -> DataFrame:
    """Named-stats path of the reference API (R/exact_extract.R:270-773).

    ``features`` must have (feature_id, geom, fxmin..fymax) — see
    ``sources.features.prepare_features``. ``weights`` may be a second
    Raster or the string ``'area'`` (cell-area weighting,
    R/exact_extract_helpers.R:154-160). ``sort=False`` skips the final
    global orderBy — at scale that is one avoidable full sort; pass False
    whenever downstream consumers don't need feature_id order.

    Cardinality note: frequency stats (``mode``/``minority``/``variety``/
    ``median``/``quantile``/``frac``/``weighted_frac``) shuffle one row
    per DISTINCT (feature, value) pair, and ``frac`` additionally collects
    the GLOBAL distinct value set on the driver to zero-fill (the
    reference's own two-pass semantics, src/exact_extract.cpp:420-434) —
    intended for categorical rasters. A continuous-valued raster makes
    these scale with covered cells; algebraic stats are unaffected.
    """
    if isinstance(stats, str):
        stats = [stats]
    plan = StatsPlan(stats, quantiles or [])

    area_weights = weights == "area"
    wraster = weights if isinstance(weights, Raster) else None
    if plan.needs_weights and weights is None:
        raise ValueError(f"stats {sorted(set(stats))} require weights")
    if weights is not None and not plan.needs_weights:
        import warnings

        warnings.warn(
            "weights provided but no requested stat uses them "
            "(ref test_exact_extract_errors.R:28-36)"
        )
    disagg = (1, 1)
    if wraster is not None:
        vg, wg = values.meta.grid, wraster.meta.grid
        # grid compatibility: integer-multiple resolution + aligned origins
        # (ref grid.h:219-282, checked at exact_extract.cpp:316-317)
        if not vg.compatible_with(wg):
            raise ValueError(
                "weights grid is not compatible with the value grid "
                "(resolutions must be integer multiples, origins aligned)"
            )
        if wg.dx < vg.dx or wg.dy < vg.dy:
            # finer weights disaggregate the VALUE raster onto the finest
            # common grid (ref RasterView, raster.h:248-312); count/sum are
            # meaningless on disaggregated values (exact_extract.cpp:329-332)
            disagg = (int(round(vg.dx / wg.dx)), int(round(vg.dy / wg.dy)))
            banned = {"count", "sum"} & set(stats)
            if banned:
                raise ValueError(
                    f"stats {sorted(banned)} cannot be computed when the "
                    "value raster is disaggregated to a finer weight grid"
                )

    cand, feats_bc = build_candidates(
        values, features, broadcast_features, salt_buckets=salt_buckets
    )
    if wraster is not None:
        cand = _attach_weights(cand, values, wraster)

    kernel_kwargs = dict(
        feats_bc=feats_bc,
        disagg=disagg,
        values_meta=values.meta,
        weighted=wraster is not None or area_weights,
        area_weights=area_weights,
        spherical=spherical,
        coverage_area=coverage_area,
        default_value=default_value,
        default_weight=default_weight,
    )

    result: DataFrame | None = None
    fin = plan.finalize_columns()

    if plan.freq:
        # one kernel pass; everything (algebraic included) derives exactly
        # from the merged value-frequency table. The freq table is consumed
        # once per requested freq-stat piece (mode + minority + quantile +
        # frac each reference it), so materialize it — it is tiny (features ×
        # distinct values) and saves a full kernel re-scan per piece.
        # localCheckpoint: blocks are released when the result is GC'd, no
        # CacheManager entry leaked across repeated calls.
        partials = coverage_facts(cand, emit="freq", **kernel_kwargs)
        freq_df = partials.groupBy("feature_id", "v").agg(
            F.sum("sum_c").alias("sum_c"), F.sum("sum_cw").alias("sum_cw")
        ).localCheckpoint(eager=True)
        if plan.algebraic:
            agg_df = freq_df.groupBy("feature_id").agg(
                *plan.algebraic_aggs_from_freq()
            )
            result = agg_df.select(
                "feature_id", *[fin[s].alias(s) for s in plan.algebraic]
            )
        freq_result = _freq_stats(plan, freq_df)
        result = (
            freq_result
            if result is None
            else result.join(freq_result, on="feature_id", how="full")
        )
    elif plan.algebraic:
        # moments path: kernel emits ONE row per (feature, tile); the final
        # shuffle is independent of cell count (StatsRegistry merge)
        moments = coverage_facts(cand, emit="moments", **kernel_kwargs)
        agg_df = moments.groupBy("feature_id").agg(
            *plan.algebraic_aggs_from_moments()
        )
        result = agg_df.select(
            "feature_id", *[fin[s].alias(s) for s in plan.algebraic]
        )

    # features with no facts: reference returns a row with 0/NA stats
    # (test_exact_extract.R:433-485) — left join back to the feature list.
    # In broadcast mode the ids are already on the driver: a LocalRelation
    # avoids re-scanning the feature source (one fewer job per query).
    if feats_bc is not None:
        # pandas/Arrow => LocalTableScan (no python-RDD slices; see
        # build_candidates for the measured per-plan cost of the list path)
        base = features.sparkSession.createDataFrame(
            pd.DataFrame(
                {"feature_id": pd.Series(feats_bc.value.ids, dtype="int64")}
            )
        )
        # per-feature agg output is as small as the broadcast feature set:
        # hint it so the backfill is a BroadcastHashJoin, not a sort-merge
        result = base.join(F.broadcast(result), on="feature_id", how="left")
    else:
        base = features.select("feature_id")
        result = base.join(result, on="feature_id", how="left")
    fill = {}
    for s in ("count", "sum", "weighted_count", "weighted_sum", "variety"):
        if s in result.columns:
            fill[s] = 0.0 if s != "variety" else 0
    if fill:
        result = result.fillna(fill)
    if append_cols is not None:
        result = result.join(append_cols, on="feature_id", how="left")
    return result.orderBy("feature_id") if sort else result


def exact_extract_pixels(
    values: Raster,
    features: DataFrame,
    *,
    weights: "Raster | None" = None,
    include_xy: bool = False,
    include_cell: bool = False,
    include_area: bool = False,
    coverage_area: bool = False,
    spherical: bool = False,
    default_value: float | None = None,
    default_weight: float | None = None,
    broadcast_features: bool = True,
    include_cols: "DataFrame | None" = None,
) -> DataFrame:
    """The R-function path's pixel table (ref src/exact_extract.cpp:46-237):
    one row per (feature, covered cell) with value / coverage_fraction /
    optional weight / x / y / cell / area columns.

    ``include_cols`` (ref R/exact_extract.R include_cols): a DataFrame with
    a ``feature_id`` column whose remaining columns are copied onto every
    pixel row of that feature (broadcast left join — attribute tables are
    small next to pixel tables)."""
    cand, feats_bc = build_candidates(values, features, broadcast_features)
    disagg = (1, 1)
    if weights is not None:
        wg, vg = weights.meta.grid, values.meta.grid
        # same grid-compatibility contract as exact_extract (ref
        # grid.h:219-282): a misaligned/non-integer-ratio weight grid must
        # raise, not silently sample wrong cells
        if not vg.compatible_with(wg):
            raise ValueError(
                "weights grid is not compatible with the value grid "
                "(resolutions must be integer multiples, origins aligned)"
            )
        if wg.dx < vg.dx or wg.dy < vg.dy:
            disagg = (int(round(vg.dx / wg.dx)), int(round(vg.dy / wg.dy)))
        cand = _attach_weights(cand, values, weights)
    facts = coverage_facts(
        cand,
        feats_bc=feats_bc,
        disagg=disagg,
        values_meta=values.meta,
        include_cell=include_cell,
        include_xy=include_xy,
        include_area=include_area,
        coverage_area=coverage_area,
        spherical=spherical,
        default_value=default_value,
        default_weight=default_weight,
    )
    cols = [F.col("feature_id"), F.col("v").alias("value")]
    if weights is not None:
        cols.append(F.col("w").alias("weight"))
    cols.append(F.col("cov").alias("coverage_fraction"))
    if include_xy:
        cols += [F.col("cx").alias("x"), F.col("cy").alias("y")]
    if include_cell:
        cols.append(F.col("cell"))
    if include_area:
        cols.append(F.col("area"))
    out = facts.select(*cols)
    if include_cols is not None:
        out = out.join(F.broadcast(include_cols), on="feature_id", how="left")
    return out


def exact_extract_apply(
    values: Raster,
    features: DataFrame,
    fn,
    schema,
    *,
    weights: "Raster | None" = None,
    **pixel_kwargs,
) -> DataFrame:
    """UD(A)F surface — the reference's R-function path
    (R/exact_extract.R:144-166, 585-721): ``fn(pdf) -> pdf`` receives one
    pandas frame per feature (columns value/coverage_fraction[/weight/...])
    and may return any number of rows. One-to-one Spark analog:
    groupBy(feature_id).applyInPandas."""
    pixels = exact_extract_pixels(values, features, weights=weights, **pixel_kwargs)
    return pixels.groupBy("feature_id").applyInPandas(fn, schema)


def _freq_stats(plan: StatsPlan, freq_df: DataFrame) -> DataFrame:
    """Frequency-map stats over groupBy(fid, v): mode/minority/variety/
    median/quantile/frac/weighted_frac (ref raster_stats.h:176-230, 281-304,
    393-411)."""
    pieces: list[DataFrame] = []
    fid = F.col("feature_id")

    wanted = set(plan.freq)
    # mode/majority, minority, and variety fuse into ONE hash aggregate —
    # max_by/min_by over struct(sum_c, v) realize the reference's tie rules
    # (mode: highest count, tie -> highest value, raster_stats.h:176-186;
    # minority: lowest count, tie -> lowest value, raster_stats.h:393-403)
    # in a single exchange instead of two sort windows + a join chain.
    point_aggs: list = []
    if wanted & {"mode", "majority"}:
        mode_expr = F.max_by(
            "v", F.struct(F.col("sum_c").alias("c"), F.col("v").alias("vv"))
        )
        for s in [x for x in plan.freq if x in ("mode", "majority")]:
            point_aggs.append(mode_expr.alias(s))
    if "minority" in wanted:
        point_aggs.append(
            F.min_by(
                "v", F.struct(F.col("sum_c").alias("c"), F.col("v").alias("vv"))
            ).alias("minority")
        )
    if "variety" in wanted:
        point_aggs.append(F.count("v").cast("int").alias("variety"))
    if point_aggs:
        pieces.append(freq_df.groupBy("feature_id").agg(*point_aggs))
    qs: list[float] = []
    if "median" in wanted:
        qs.append(0.5)
    if "quantile" in wanted:
        qs.extend(plan.quantiles)
    if qs:
        qnames = (["median"] if "median" in wanted else []) + (
            [quantile_name(q) for q in plan.quantiles] if "quantile" in wanted else []
        )
        qvals = qs
        # Distributed exact weighted quantile (weighted_quantiles.cpp:20-70
        # semantics, same as core/quantiles.weighted_quantile): the
        # s-coordinate of every (feature, v) row comes from ONE window pass
        # (row_number + exclusive/total running sums, all sharing a single
        # exchange+sort by feature_id/v), and each requested q interpolates
        # between the bracketing rows via max_by/min_by in the SAME
        # feature_id aggregate — no per-feature Python group, so a
        # continuous-valued mega-polygon no longer funnels its whole
        # frequency table through one Python task. Bit-exactness: the
        # running window sums accumulate in ascending-v order (the same
        # left-to-right fold as np.cumsum), and the interpolation expression
        # mirrors the numpy operation order term for term.
        from pyspark.sql.window import Window

        wo = Window.partitionBy("feature_id").orderBy("v")
        w_prev = wo.rowsBetween(Window.unboundedPreceding, -1)
        w_all = wo.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        valid = freq_df.where(
            F.col("v").isNotNull() & ~F.isnan(F.col("v"))
        )
        kk = (F.row_number().over(wo) - F.lit(1)).cast("double")
        nn = F.count(F.lit(1)).over(w_all).cast("double")
        csum_prev = F.sum("sum_c").over(w_prev)
        tot = F.sum("sum_c").over(w_all)
        s_col = F.when(kk == 0.0, F.lit(0.0)).otherwise(
            kk * F.col("sum_c") + (nn - F.lit(1.0)) * csum_prev
        )
        staged = valid.select(
            "feature_id",
            "v",
            s_col.alias("_s"),
            (tot * (nn - F.lit(1.0))).alias("_sn"),
        )
        q_aggs: list = []
        for nm, q in zip(qnames, qvals):
            tgt = F.lit(float(q)) * F.col("_sn")
            left = F.max_by(
                F.struct(F.col("_s").alias("s"), F.col("v").alias("v")),
                F.when(F.col("_s") <= tgt, F.col("_s")),
            )
            right = F.min_by(
                F.struct(F.col("_s").alias("s"), F.col("v").alias("v")),
                F.when(F.col("_s") > tgt, F.col("_s")),
            )
            target_v = F.max(tgt)
            vmax = F.max("v")
            interp = left["v"] + (
                (target_v - left["s"]) * (right["v"] - left["v"])
            ) / (right["s"] - left["s"])
            q_aggs.append(
                F.when(right.isNull(), vmax).otherwise(interp).alias(nm)
            )
        pieces.append(staged.groupBy("feature_id").agg(*q_aggs))
    for s, num in (("frac", "sum_c"), ("weighted_frac", "sum_cw")):
        if s in wanted:
            # global distinct value set across ALL features
            # (ref exact_extract.cpp:420-434, 533-540) — two-pass like the
            # reference; the distinct set is tiny (categorical rasters).
            # limit-bounded like every other driver-side metadata job: a
            # continuous raster fails LOUDLY here instead of OOMing the
            # driver or exploding the pivot
            rows = (
                freq_df.select("v").where(F.col("v").isNotNull())
                .distinct().limit(MAX_FRAC_VALUES + 1).collect()
            )
            if len(rows) > MAX_FRAC_VALUES:
                raise ValueError(
                    f"'{s}' requires a categorical raster: more than "
                    f"{MAX_FRAC_VALUES} distinct values found (one result "
                    "column per value, ref exact_extract.cpp:420-434); use "
                    "quantile/median stats for continuous rasters"
                )
            vals = sorted(r[0] for r in rows if r[0] is not None)
            tot = freq_df.groupBy("feature_id").agg(F.sum(num).alias("_tot"))
            piv = (
                freq_df.groupBy("feature_id")
                .pivot("v", vals)
                .agg(F.first(num))
                .join(tot, on="feature_id")
            )
            sel = [fid]
            for vv in vals:
                cname = f"{vv:g}".replace("-", "m").replace(".", "_")
                sel.append(
                    (F.coalesce(F.col(f"`{vv}`"), F.lit(0.0)) / F.col("_tot")).alias(
                        f"{s}_{cname}"
                    )
                )
            pieces.append(piv.select(*sel))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.join(p, on="feature_id", how="full")
    return out
