"""Stack / multi-layer semantics + dense coverage + weight-grid validation."""

import numpy as np
import pytest

from exactextractr_spark.operators.coverage_op import coverage_fraction_raster
from exactextractr_spark.operators.stack import exact_extract_stack
from exactextractr_spark.operators.zonal import exact_extract
from exactextractr_spark.sources.features import features_from_wkt
from exactextractr_spark.sources.tiles import Raster, RasterMeta

SQ_WKT = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"


def meta33(layer):
    return RasterMeta(layer=layer, xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)


def test_stack_apply_naming(spark):
    # stack naming rules: multiple layers -> stat.layer
    # (R/exact_extract_helpers.R:28-93, tests at test_exact_extract.R:792-874)
    a = Raster.from_array(spark, np.arange(1, 10, dtype=np.float64).reshape(3, 3),
                          meta33("a"))
    b = Raster.from_array(spark, 2 * np.arange(1, 10, dtype=np.float64).reshape(3, 3),
                          meta33("b"))
    feats = features_from_wkt(spark, [SQ_WKT])
    df = exact_extract_stack([a, b], feats, ["mean", "sum"])
    row = df.collect()[0].asDict()
    assert row["mean.a"] == pytest.approx(5.0)
    assert row["mean.b"] == pytest.approx(10.0)
    assert row["sum.a"] == pytest.approx(20.0)
    assert row["sum.b"] == pytest.approx(40.0)


def test_stack_weight_recycling(spark):
    # one value layer recycled against two weight layers
    v = Raster.from_array(spark, np.arange(1, 10, dtype=np.float64).reshape(3, 3),
                          meta33("v"))
    w1 = Raster.from_array(spark, np.ones((3, 3)), meta33("w1"))
    w2arr = np.zeros((3, 3)); w2arr[2, :] = 1.0
    w2 = Raster.from_array(spark, w2arr, meta33("w2"))
    df = exact_extract_stack([v], features_from_wkt(spark, [SQ_WKT]),
                             ["weighted_mean"], weights=[w1, w2],
                             full_colnames=True)
    row = df.collect()[0].asDict()
    assert row["weighted_mean.v.w1"] == pytest.approx(5.0)
    assert row["weighted_mean.v.w2"] == pytest.approx(8.0)


def test_stack_recycling_error(spark):
    v = Raster.from_array(spark, np.ones((3, 3)), meta33("a"))
    v2 = Raster.from_array(spark, np.ones((3, 3)), meta33("b"))
    w = [Raster.from_array(spark, np.ones((3, 3)), meta33(f"w{i}")) for i in range(3)]
    with pytest.raises(ValueError, match="recycled"):
        exact_extract_stack([v, v2], features_from_wkt(spark, [SQ_WKT]),
                            ["weighted_mean"], weights=w)


def test_incompatible_weight_grid(spark):
    v = Raster.from_array(spark, np.ones((3, 3)), meta33("v"))
    wmeta = RasterMeta("w", xmin=0.31, ymax=3, dx=1, dy=1, width=3, height=3,
                       tile_w=3, tile_h=3)
    w = Raster.from_array(spark, np.ones((3, 3)), wmeta)
    with pytest.raises(ValueError, match="not compatible"):
        exact_extract(v, features_from_wkt(spark, [SQ_WKT]),
                      ["weighted_mean"], weights=w)


def test_finer_weights_disaggregate(spark):
    # finer weights now disaggregate the value raster (RasterView analog);
    # with uniform weights the weighted mean equals the unweighted mean,
    # and count/sum are rejected (ref exact_extract.cpp:329-332)
    v = Raster.from_array(spark, np.arange(1.0, 10.0).reshape(3, 3), meta33("v"))
    wmeta = RasterMeta("w", xmin=0, ymax=3, dx=0.5, dy=0.5, width=6, height=6,
                       tile_w=6, tile_h=6)
    w = Raster.from_array(spark, np.ones((6, 6)), wmeta)
    feats = features_from_wkt(spark, [SQ_WKT])
    got = exact_extract(v, feats, ["weighted_mean"], weights=w).collect()[0]
    plain = exact_extract(v, feats, ["mean"]).collect()[0]
    assert got["weighted_mean"] == pytest.approx(plain["mean"], rel=1e-12)
    with pytest.raises(ValueError, match="disaggregated"):
        exact_extract(v, feats, ["sum"], weights=w)


def test_dense_coverage_crop_and_full(spark):
    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    r = Raster.from_array(spark, arr, meta)
    feats = features_from_wkt(spark, [SQ_WKT])
    dense = coverage_fraction_raster(r, feats).collect()
    assert len(dense) == 1
    got = np.array(dense[0]["cov_px"]).reshape(3, 3)
    want = np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]])
    np.testing.assert_allclose(got, want, atol=1e-14)
    # crop=False over a polygon touching nothing -> zero-filled full tiles
    far = features_from_wkt(spark, ["POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))"])
    dense2 = coverage_fraction_raster(r, far, crop=False).collect()
    assert len(dense2) == 1
    assert np.array(dense2[0]["cov_px"]).sum() == 0.0
