"""Fast unit tests: PNG codec, weighted quantiles, cell index, grid, WKB."""

import numpy as np
import pytest

from exactextractr_spark.core import geom as G
from exactextractr_spark.core.cellindex import CellIndex
from exactextractr_spark.core.grid import Box, Grid
from exactextractr_spark.core.png import (
    decode_tile,
    encode_tile,
    phash64,
    psnr,
)
from exactextractr_spark.core.quantiles import weighted_quantile


def test_png_roundtrip_bit_exact():
    rng = np.random.default_rng(42)
    arr = rng.standard_normal((17, 23)) * 1e6
    arr[3, 4] = np.nan
    out = decode_tile(encode_tile(arr), 23, 17)
    assert np.array_equal(arr, out, equal_nan=True)  # bit-exact
    assert psnr(arr, out) == float("inf")


def test_phash_deterministic():
    a = np.arange(100, dtype=np.float64).reshape(10, 10)
    assert phash64(a) == phash64(a.copy())
    assert phash64(a) != phash64(a.T)
    assert -(1 << 63) <= phash64(a) < (1 << 63)


def test_weighted_quantile_golden():
    # 1..9 with canonical square coverage weights (FIXTURES F1):
    w = np.array([0.25, 0.5, 0.25, 0.5, 1.0, 0.5, 0.25, 0.5, 0.25])
    v = np.arange(1.0, 10.0)
    got = weighted_quantile(v, w, [0.25, 0.5, 0.75])
    np.testing.assert_allclose(got, [3.5, 5.0, 6.5])


def test_weighted_quantile_equal_weights_matches_r_type7():
    # with equal weights the reference formula reduces to R's type-7 quantile
    v = np.array([1.0, 2, 3, 4, 5])
    w = np.ones(5)
    got = weighted_quantile(v, w, [0.0, 0.25, 0.5, 1.0])
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0, 5.0])


def test_weighted_quantile_errors():
    # reference: quantile must be within [0,1] (weighted_quantiles.cpp:43-45)
    with pytest.raises(ValueError):
        weighted_quantile(np.array([1.0]), np.array([1.0]), [1.5])
    with pytest.raises(ValueError):
        weighted_quantile(np.array([1.0]), np.array([1.0]), [float("nan")])


def test_weighted_quantile_merges_duplicates():
    # duplicates merged into the frequency map (raster_stats.h:214-230)
    a = weighted_quantile(np.array([1.0, 1.0, 2.0]), np.array([0.5, 0.5, 1.0]), 0.5)
    b = weighted_quantile(np.array([1.0, 2.0]), np.array([1.0, 1.0]), 0.5)
    assert a[0] == b[0]


def test_cellindex_pack_roundtrip():
    idx = CellIndex(0, 0, 64, 64)
    cid = idx.cell_of(10.5, 20.5, 5)
    res, ix, iy = idx.unpack(cid)
    assert res == 5
    x0, y0, x1, y1 = idx.cell_box(cid)
    assert x0 <= 10.5 <= x1 and y0 <= 20.5 <= y1


def test_cellindex_ring_and_disk():
    idx = CellIndex(0, 0, 64, 64)
    cid = int(idx.cell_of(32.0, 32.0, 4))
    assert len(idx.ring(cid, 0)) == 1
    assert len(idx.ring(cid, 1)) == 8
    assert len(idx.ring(cid, 2)) == 16
    assert len(idx.disk(cid, 2)) == 25
    # ring k == disk k minus disk k-1
    d2 = set(int(c) for c in idx.disk(cid, 2))
    d1 = set(int(c) for c in idx.disk(cid, 1))
    assert set(int(c) for c in idx.ring(cid, 2)) == d2 - d1


def test_cellindex_boundary_clipping():
    idx = CellIndex(0, 0, 64, 64)
    corner = int(idx.cell_of(0.0, 0.0, 4))
    assert len(idx.ring(corner, 1)) == 3  # clipped at the world edge
    assert len(idx.disk(corner, 1)) == 4


def test_grid_crop_and_offsets():
    g = Grid(0, 0, 10, 10, 1, 1)
    sub = g.crop(Box(2.3, 3.1, 5.7, 6.9))
    assert (sub.xmin, sub.ymin, sub.xmax, sub.ymax) == (2, 3, 6, 7)
    assert g.row_col_offset(sub) == (3, 2)


def test_grid_subdivide():
    g = Grid(0, 0, 100, 100, 1, 1)
    parts = g.subdivide(1000)
    assert sum(p.size for p in parts) == g.size
    assert all(p.size <= 1000 for p in parts)


def test_grid_common():
    a = Grid(0, 0, 8, 6, 1, 1)
    b = Grid(0, 0, 8, 6, 2, 2)
    assert a.compatible_with(b)
    cg = a.common_grid(b)
    assert (cg.dx, cg.dy) == (1, 1)
    assert not a.compatible_with(Grid(0.31, 0, 8.31, 6, 2, 2))


def test_wkb_roundtrip():
    wkt = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
    g = G.from_wkt(wkt)
    g2 = G.from_wkb(G.to_wkb(g))
    assert g2.kind == "Polygon"
    assert len(g2.rings) == 2
    np.testing.assert_array_equal(g.rings[0], g2.rings[0])
    assert g.area() == pytest.approx(8.0)


def test_wkb_multipolygon_and_collection():
    wkt = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "MULTIPOLYGON (((2 2, 3 2, 3 3, 2 3, 2 2))), POINT (9 9))"
    )
    g = G.from_wkb(G.to_wkb(G.from_wkt(wkt)))
    assert len(g.polygons()) == 2
    assert g.bounds() == (0.0, 0.0, 9.0, 9.0)


def test_ewkb_srid_and_big_endian():
    import struct

    # hand-build an EWKB point with SRID flag, little endian
    buf = b"\x01" + struct.pack("<I", 1 | 0x20000000) + struct.pack("<i", 4326)
    buf += struct.pack("<2d", 1.5, 2.5)
    g = G.from_wkb(buf)
    assert g.kind == "Point" and g.srid == 4326
    # big endian plain point
    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 1.5, 2.5)
    g = G.from_wkb(buf)
    assert tuple(g.coords) == (1.5, 2.5)
