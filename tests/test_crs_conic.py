"""Conic/azimuthal CRS support: Lambert Conformal Conic (EPSG:2154),
Albers equal-area (EPSG:5070), Lambert azimuthal equal-area (EPSG:3035).

Validation is three-legged, none of it self-referential:
1. Snyder PP1395's published Clarke-1866 worked examples reproduce to the
   0.1 m precision they are printed at (§15 p.296, §14 p.292, §24 p.333).
2. Differential properties hold at random points: the equal-area
   projections' Jacobian equals the ellipsoid area element; LCC's local
   scale is isotropic and exactly 1 on both standard parallels.
3. Forward∘inverse closes below 1e-7 degrees across each CRS's domain.

The reference transforms any pair via PROJ (R/exact_extract.R:360-377).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import exactextractr_spark.core.crs as crs
from exactextractr_spark.core.crs import can_transform, transform_xy

# Snyder's examples use Clarke 1866
_A_CLARKE, _E2_CLARKE = 6378206.4, 0.00676866
_F_CLARKE = 1.0 - math.sqrt(1.0 - _E2_CLARKE)


@pytest.fixture()
def snyder_registry(monkeypatch):
    reg = dict(crs._NAMED_CONIC)
    reg["TEST:LCC"] = ("lcc", _A_CLARKE, _F_CLARKE, 33.0, 45.0, 23.0, -96.0,
                       0.0, 0.0)
    reg["TEST:ALB"] = ("albers", _A_CLARKE, _F_CLARKE, 29.5, 45.5, 23.0,
                       -96.0, 0.0, 0.0)
    reg["TEST:LAEA"] = ("laea", _A_CLARKE, _F_CLARKE, None, None, 40.0,
                        -100.0, 0.0, 0.0)
    monkeypatch.setattr(crs, "_NAMED_CONIC", reg)


def test_snyder_lcc_worked_example(snyder_registry):
    # Snyder PP1395 §15 numerical example: phi=35N lam=75W
    x, y = crs._conic_from_lonlat(np.array([-75.0]), np.array([35.0]),
                                  "TEST:LCC")
    assert x[0] == pytest.approx(1_894_410.9, abs=0.1)
    assert y[0] == pytest.approx(1_564_649.5, abs=0.1)
    lon, lat = crs._conic_to_lonlat(x, y, "TEST:LCC")
    assert lon[0] == pytest.approx(-75.0, abs=1e-9)
    assert lat[0] == pytest.approx(35.0, abs=1e-9)


def test_snyder_albers_worked_example(snyder_registry):
    # Snyder PP1395 §14 numerical example: phi=35N lam=75W
    x, y = crs._conic_from_lonlat(np.array([-75.0]), np.array([35.0]),
                                  "TEST:ALB")
    assert x[0] == pytest.approx(1_885_472.7, abs=0.1)
    assert y[0] == pytest.approx(1_535_925.0, abs=0.1)
    lon, lat = crs._conic_to_lonlat(x, y, "TEST:ALB")
    assert lon[0] == pytest.approx(-75.0, abs=1e-7)
    assert lat[0] == pytest.approx(35.0, abs=1e-7)


def test_snyder_laea_worked_example(snyder_registry):
    # Snyder PP1395 §24 oblique ellipsoidal example: phi=30N lam=110W
    x, y = crs._conic_from_lonlat(np.array([-110.0]), np.array([30.0]),
                                  "TEST:LAEA")
    assert x[0] == pytest.approx(-965_932.1, abs=0.1)
    assert y[0] == pytest.approx(-1_056_814.9, abs=0.1)
    lon, lat = crs._conic_to_lonlat(x, y, "TEST:LAEA")
    assert lon[0] == pytest.approx(-110.0, abs=1e-7)
    assert lat[0] == pytest.approx(30.0, abs=1e-7)


_DOMAINS = {
    "EPSG:2154": ((-5.0, 9.0), (41.0, 51.0)),
    "EPSG:5070": ((-124.0, -67.0), (25.0, 49.0)),
    "EPSG:3035": ((-10.0, 30.0), (35.0, 70.0)),
    "EPSG:3577": ((113.0, 154.0), (-44.0, -10.0)),
}


@pytest.mark.parametrize("code", sorted(_DOMAINS))
def test_conic_roundtrip(code):
    (lo0, lo1), (la0, la1) = _DOMAINS[code]
    rng = np.random.default_rng(hash(code) % 2**32)
    lon = rng.uniform(lo0, lo1, 3000)
    lat = rng.uniform(la0, la1, 3000)
    x, y = transform_xy(lon, lat, "EPSG:4326", code)
    lon2, lat2 = transform_xy(x, y, code, "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def _jacobian_per_rad2(code, lon, lat, h=1e-6):
    x0, y0 = crs._from_lonlat(lon, lat, code)
    xl, yl = crs._from_lonlat(lon + h, lat, code)
    xp, yp = crs._from_lonlat(lon, lat + h, code)
    det = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (h * h)
    return det * (180.0 / math.pi) ** 2


@pytest.mark.parametrize("code", ["EPSG:5070", "EPSG:3035", "EPSG:3577"])
def test_equal_area_jacobian(code):
    """|d(E,N)/d(lam,phi)| must equal the ellipsoid area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 — the defining property
    of an equal-area projection, checked numerically."""
    a, f = crs._GRS80_A, crs._GRS80_F
    e2 = f * (2.0 - f)
    (lo0, lo1), (la0, la1) = _DOMAINS[code]
    rng = np.random.default_rng(5)
    lon = rng.uniform(lo0, lo1, 300)
    lat = rng.uniform(la0, la1, 300)
    J = _jacobian_per_rad2(code, lon, lat)
    phi = np.radians(lat)
    want = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
    np.testing.assert_allclose(J, want, rtol=1e-6)


def test_lcc_conformal_and_secant():
    """LCC: local scale is isotropic everywhere (conformality) and equals
    1 exactly on both standard parallels (44N, 49N for Lambert-93)."""
    a, f = crs._GRS80_A, crs._GRS80_F
    e2 = f * (2.0 - f)
    code = "EPSG:2154"
    rng = np.random.default_rng(6)
    lon = rng.uniform(-4, 8, 300)
    lat = rng.uniform(42, 50, 300)
    h = 1e-6
    x0, y0 = crs._from_lonlat(lon, lat, code)
    xl, yl = crs._from_lonlat(lon + h, lat, code)
    xp, yp = crs._from_lonlat(lon, lat + h, code)
    phi = np.radians(lat)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    rho_m = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    k_par = np.hypot(xl - x0, yl - y0) / (np.radians(h) * nu * np.cos(phi))
    k_mer = np.hypot(xp - x0, yp - y0) / (np.radians(h) * rho_m)
    np.testing.assert_allclose(k_par, k_mer, rtol=1e-6)
    for sp in (44.0, 49.0):
        x0, y0 = crs._from_lonlat(np.array([3.0]), np.array([sp]), code)
        xl, yl = crs._from_lonlat(np.array([3.0 + h]), np.array([sp]), code)
        p = math.radians(sp)
        nu1 = a / math.sqrt(1 - e2 * math.sin(p) ** 2)
        k = math.hypot(xl[0] - x0[0], yl[0] - y0[0]) / (
            math.radians(h) * nu1 * math.cos(p)
        )
        assert k == pytest.approx(1.0, abs=1e-7)


def test_laea_origin_maps_to_false_origin():
    x, y = transform_xy(np.array([10.0]), np.array([52.0]),
                        "EPSG:4326", "EPSG:3035")
    assert x[0] == pytest.approx(4_321_000.0, abs=1e-6)
    assert y[0] == pytest.approx(3_210_000.0, abs=1e-6)
    lon, lat = transform_xy(np.array([4_321_000.0]), np.array([3_210_000.0]),
                            "EPSG:3035", "EPSG:4326")
    # inverse closes to the authalic-series truncation (~0.3 mm)
    assert lon[0] == pytest.approx(10.0, abs=1e-8)
    assert lat[0] == pytest.approx(52.0, abs=1e-8)


def test_conic_composes_with_family():
    """Any pair composes through lon/lat: Lambert-93 <-> UTM31N over
    France must agree with the two-leg route bit-tightly."""
    assert can_transform("EPSG:2154", "EPSG:32631")
    rng = np.random.default_rng(7)
    lon = rng.uniform(0.5, 5.5, 500)
    lat = rng.uniform(43, 49, 500)
    e93, n93 = transform_xy(lon, lat, "EPSG:4326", "EPSG:2154")
    eu, nu_ = transform_xy(e93, n93, "EPSG:2154", "EPSG:32631")
    eu2, nu2 = transform_xy(lon, lat, "EPSG:4326", "EPSG:32631")
    np.testing.assert_allclose(eu, eu2, atol=1e-5)
    np.testing.assert_allclose(nu_, nu2, atol=1e-5)


def test_zonal_auto_transform_conic(spark):
    """e2e: raster gridded in EPSG:2154, features in EPSG:4326 — the
    auto-transform must give the same stats as pre-transformed features."""
    from exactextractr_spark.operators.zonal import exact_extract
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    # 8x8 raster at 1 km cells near the Lambert-93 false origin (in range
    # for France): xmin=700000, ymax=6606000
    vals = np.arange(1.0, 65.0).reshape(8, 8)
    meta = RasterMeta("v", xmin=700_000, ymax=6_606_000, dx=1000, dy=1000,
                      width=8, height=8, tile_w=4, tile_h=4, crs="EPSG:2154")
    r = Raster.from_array(spark, vals, meta)
    # a polygon covering the center, expressed in lon/lat
    corners_e = np.array([701_500.0, 706_500.0, 706_500.0, 701_500.0])
    corners_n = np.array([6_599_500.0, 6_599_500.0, 6_604_500.0, 6_604_500.0])
    lon, lat = transform_xy(corners_e, corners_n, "EPSG:2154", "EPSG:4326")
    ring = ", ".join(f"{x} {y}" for x, y in zip(lon, lat))
    ring += f", {lon[0]} {lat[0]}"
    feats_ll = features_from_wkt(spark, [f"POLYGON (({ring}))"],
                                 crs="EPSG:4326")
    ring_m = ", ".join(
        f"{x} {y}" for x, y in zip(corners_e, corners_n)
    ) + f", {corners_e[0]} {corners_n[0]}"
    feats_m = features_from_wkt(spark, [f"POLYGON (({ring_m}))"],
                                crs="EPSG:2154")
    with pytest.warns(UserWarning, match="transform"):
        got = exact_extract(r, feats_ll, ["count", "sum", "mean"]).collect()[0]
    want = exact_extract(r, feats_m, ["count", "sum", "mean"]).collect()[0]
    assert got["count"] == pytest.approx(want["count"], rel=1e-6)
    assert got["sum"] == pytest.approx(want["sum"], rel=1e-6)
    assert got["mean"] == pytest.approx(want["mean"], rel=1e-9)


# ---------------------------------------------------------------------------
# polar stereographic
# ---------------------------------------------------------------------------


def test_snyder_polar_stereographic_worked_example(monkeypatch):
    """Snyder PP1395 §21 south-polar ellipsoidal example (International
    1924, phi_c=-71, lam0=-100; point phi=-75, lam=150)."""
    a_i, e2_i = 6378388.0, 0.00672267
    f_i = 1.0 - math.sqrt(1.0 - e2_i)
    reg = dict(crs._NAMED_POLAR)
    reg["TEST:PSS"] = (a_i, f_i, -71.0, None, -100.0, 0.0, 0.0, True)
    monkeypatch.setattr(crs, "_NAMED_POLAR", reg)
    x, y = crs._polar_from_lonlat(np.array([150.0]), np.array([-75.0]),
                                  "TEST:PSS")
    assert x[0] == pytest.approx(-1_540_033.6, abs=0.1)
    assert y[0] == pytest.approx(-560_526.4, abs=0.1)
    lon, lat = crs._polar_to_lonlat(x, y, "TEST:PSS")
    assert lon[0] == pytest.approx(150.0, abs=1e-7)
    assert lat[0] == pytest.approx(-75.0, abs=1e-7)


@pytest.mark.parametrize("code,lat_rng", [
    ("EPSG:3413", (60.0, 89.9)),
    ("EPSG:3031", (-89.9, -60.0)),
    ("EPSG:5041", (80.0, 89.99)),
    ("EPSG:5042", (-89.99, -80.0)),
])
def test_polar_roundtrip(code, lat_rng):
    rng = np.random.default_rng(abs(hash(code)) % 2**32)
    lon = rng.uniform(-180.0, 180.0, 2000)
    lat = rng.uniform(*lat_rng, 2000)
    x, y = transform_xy(lon, lat, "EPSG:4326", code)
    lon2, lat2 = transform_xy(x, y, code, "EPSG:4326")
    dl = np.abs((lon2 - lon + 180.0) % 360.0 - 180.0)
    assert dl.max() < 1e-7
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_polar_conformal_and_std_parallel():
    """Isotropic local scale everywhere; k=1 exactly on the standard
    parallel; the pole maps to the false origin (UPS: 2e6, 2e6)."""
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2.0 - f)
    h = 1e-6
    rng = np.random.default_rng(9)
    for code, sp, lat_rng in [("EPSG:3413", 70.0, (62, 88)),
                              ("EPSG:3031", -71.0, (-88, -62))]:
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(*lat_rng, 200)
        x0, y0 = crs._from_lonlat(lon, lat, code)
        xl, yl = crs._from_lonlat(lon + h, lat, code)
        xp, yp = crs._from_lonlat(lon, lat + h, code)
        phi = np.radians(lat)
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        rho_m = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        k_par = np.hypot(xl - x0, yl - y0) / (
            np.radians(h) * nu * np.abs(np.cos(phi))
        )
        k_mer = np.hypot(xp - x0, yp - y0) / (np.radians(h) * rho_m)
        np.testing.assert_allclose(k_par, k_mer, rtol=1e-5)
        x0, y0 = crs._from_lonlat(np.array([10.0]), np.array([sp]), code)
        xl, yl = crs._from_lonlat(np.array([10.0 + h]), np.array([sp]), code)
        p = math.radians(abs(sp))
        nu1 = a / math.sqrt(1 - e2 * math.sin(p) ** 2)
        k = math.hypot(xl[0] - x0[0], yl[0] - y0[0]) / (
            math.radians(h) * nu1 * math.cos(p)
        )
        assert k == pytest.approx(1.0, abs=1e-7)
    x, y = transform_xy(np.array([37.0]), np.array([90.0]),
                        "EPSG:4326", "EPSG:5041")
    assert x[0] == pytest.approx(2_000_000.0, abs=1e-6)
    assert y[0] == pytest.approx(2_000_000.0, abs=1e-6)
    # legacy UPS codes alias the 504x definitions exactly
    rng2 = np.random.default_rng(12)
    la = rng2.uniform(-180, 180, 50)
    ph = rng2.uniform(84, 89, 50)
    xa, ya = transform_xy(la, ph, "EPSG:4326", "EPSG:32661")
    xb, yb = transform_xy(la, ph, "EPSG:4326", "EPSG:5041")
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(ya, yb)
