"""coverage_fraction / exact_resample / rasterize_polygons / pixel path
goldens (reference: test_coverage_fraction.R, test_exact_resample.R,
test_rasterize.R, test_exact_extract_include_args.R)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from exactextractr_spark.operators.coverage_op import coverage_fraction_df
from exactextractr_spark.operators.rasterize import rasterize_polygons
from exactextractr_spark.operators.resample import exact_resample
from exactextractr_spark.operators.zonal import (
    exact_extract_apply,
    exact_extract_pixels,
)
from exactextractr_spark.sources.features import features_from_wkt
from exactextractr_spark.sources.tiles import Raster, RasterMeta

SQ_WKT = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"


def meta33(layer="values", tile=3):
    return RasterMeta(layer=layer, xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=tile, tile_h=tile)


def test_line_cell_lengths(spark):
    # the reference's linear coverage: per-cell traversal length
    # (raster_cell_intersection.cpp:250-259); diagonal of a 3x3 unit grid
    # crosses cells (2,0),(1,1),(0,2) with length sqrt(2) each
    import numpy as np

    from exactextractr_spark.operators.coverage_op import line_cell_lengths_df
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    r = Raster.from_array(spark, np.arange(1.0, 10.0).reshape(3, 3), meta)
    feats = features_from_wkt(spark, ["LINESTRING (0 0, 3 3)"])
    rows = {x["cell"]: x for x in line_cell_lengths_df(r, feats).collect()}
    # cells (row=2,col=0)->7, (1,1)->5, (0,2)->3; 1-based row-major ids
    assert sorted(rows) == [3, 5, 7]
    for cell, want_v in ((3, 3.0), (5, 5.0), (7, 7.0)):
        assert rows[cell]["v"] == want_v
        assert rows[cell]["length"] == pytest.approx(np.sqrt(2.0), rel=1e-12)
    # length-weighted mean over the diagonal = (3+5+7)/3 = 5
    total = sum(x["v"] * x["length"] for x in rows.values()) / sum(
        x["length"] for x in rows.values()
    )
    assert total == pytest.approx(5.0, rel=1e-12)


def test_coverage_fraction_df(spark):
    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    r = Raster.from_array(spark, arr, meta33())
    feats = features_from_wkt(spark, [SQ_WKT])
    rows = coverage_fraction_df(r, feats).collect()
    got = {row["cell"]: row["cov"] for row in rows}
    want = {1: 0.25, 2: 0.5, 3: 0.25, 4: 0.5, 5: 1.0, 6: 0.5, 7: 0.25, 8: 0.5, 9: 0.25}
    assert len(got) == 9
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_resample_sum_preservation(spark):
    # test_exact_resample.R:16-43: resampling with 'sum' preserves total
    rng = np.random.default_rng(42)
    arr = rng.uniform(0, 100, (20, 20))
    src_meta = RasterMeta("v", xmin=0, ymax=20, dx=1, dy=1, width=20, height=20,
                          tile_w=7, tile_h=7)
    src = Raster.from_array(spark, arr, src_meta)
    # coarser unaligned destination covering the source
    dst_meta = RasterMeta("d", xmin=-1, ymax=21, dx=3, dy=3, width=8, height=8,
                          tile_w=8, tile_h=8)
    out = exact_resample(src, dst_meta, "sum")
    total = sum(r["value"] for r in out.collect())
    assert total == pytest.approx(arr.sum(), rel=1e-9)


def test_resample_mean_aligned(spark):
    # 2x2 downsample of an aligned grid: mean of each 2x2 block
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    src_meta = RasterMeta("v", xmin=0, ymax=4, dx=1, dy=1, width=4, height=4,
                          tile_w=4, tile_h=4)
    dst_meta = RasterMeta("d", xmin=0, ymax=4, dx=2, dy=2, width=2, height=2,
                          tile_w=2, tile_h=2)
    out = exact_resample(Raster.from_array(spark, arr, src_meta), dst_meta, "mean")
    got = {(r["dst_row"], r["dst_col"]): r["value"] for r in out.collect()}
    blocks = arr.reshape(2, 2, 2, 2).mean(axis=(1, 3))
    for rr in range(2):
        for cc in range(2):
            assert got[(rr, cc)] == pytest.approx(blocks[rr, cc])


def test_rasterize_polygons(spark):
    # two half-plane-ish triangles over a 2x2 grid: each cell goes to the
    # polygon covering more of it; tie -> first feature
    feats = features_from_wkt(
        spark,
        [
            "POLYGON ((0 0, 2 0, 0 2, 0 0))",  # lower-left triangle
            "POLYGON ((2 0, 2 2, 0 2, 2 0))",  # upper-right triangle
        ],
    )
    meta = RasterMeta("g", xmin=0, ymax=2, dx=1, dy=1, width=2, height=2,
                      tile_w=2, tile_h=2)
    got = {r["cell"]: r["feature_id"] for r in
           rasterize_polygons(spark, feats, meta).collect()}
    # cell 1 = top-left (half/half tie -> feature 1), cell 2 = top-right (f2),
    # cell 3 = bottom-left (f1), cell 4 = bottom-right (tie -> f1)
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}


def test_rasterize_min_coverage(spark):
    feats = features_from_wkt(spark, ["POLYGON ((0 0, 1.5 0, 1.5 2, 0 2, 0 0))"])
    meta = RasterMeta("g", xmin=0, ymax=2, dx=1, dy=1, width=2, height=2,
                      tile_w=2, tile_h=2)
    got = {r["cell"] for r in
           rasterize_polygons(spark, feats, meta, min_coverage=0.75).collect()}
    # right-column cells covered 0.5 < 0.75 -> dropped
    assert got == {1, 3}


def test_pixels_include_args(spark):
    # include_xy/cell semantics (test_exact_extract_include_args.R:18-201)
    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    r = Raster.from_array(spark, arr, meta33())
    feats = features_from_wkt(spark, [SQ_WKT])
    rows = exact_extract_pixels(
        r, feats, include_xy=True, include_cell=True, include_area=True
    ).collect()
    by_cell = {row["cell"]: row for row in rows}
    assert len(by_cell) == 9
    assert by_cell[1]["x"] == 0.5 and by_cell[1]["y"] == 2.5
    assert by_cell[5]["value"] == 5.0
    assert by_cell[5]["coverage_fraction"] == pytest.approx(1.0)
    assert by_cell[9]["area"] == pytest.approx(1.0)


def test_apply_in_pandas_surface(spark):
    # the reference's fun=function(v, c) weighted.mean(v, c) path
    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    r = Raster.from_array(spark, arr, meta33())
    feats = features_from_wkt(spark, [SQ_WKT])

    def wmean(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["coverage_fraction"]
        return pd.DataFrame(
            {
                "feature_id": [pdf["feature_id"].iloc[0]],
                "wmean": [(pdf["value"] * c).sum() / c.sum()],
            }
        )

    schema = T.StructType(
        [
            T.StructField("feature_id", T.LongType()),
            T.StructField("wmean", T.DoubleType()),
        ]
    )
    got = exact_extract_apply(r, feats, wmean, schema).collect()
    assert got[0]["wmean"] == pytest.approx(5.0)


def test_multi_tile_resample_unaligned(spark):
    # jittered extents (test_exact_resample.R:16-43 style)
    rng = np.random.default_rng(7)
    arr = rng.uniform(-5, 5, (30, 30))
    src_meta = RasterMeta("v", xmin=0.37, ymax=30.21, dx=1, dy=1, width=30,
                          height=30, tile_w=11, tile_h=9)
    dst_meta = RasterMeta("d", xmin=-2, ymax=33, dx=2.5, dy=2.5, width=16,
                          height=16, tile_w=16, tile_h=16)
    out = exact_resample(Raster.from_array(spark, arr, src_meta), dst_meta, "sum")
    total = sum(r["value"] for r in out.collect())
    assert total == pytest.approx(arr.sum(), rel=1e-9)
