"""World Mercator (EPSG:3395), sinusoidal (MODIS grid / ESRI:54008) and
the '+proj=...' parameterized-CRS family.

Validation, none of it self-referential:
1. Snyder PP1395's published Mercator ellipsoid worked example (Appendix,
   Clarke 1866) reproduces to the 0.1 m precision it is printed at.
2. EPSG Guidance Note 7-2's LCC-1SP worked example (Jamaica 1969 National
   Grid) reproduces to the cm it is printed at — validating the a*k0
   reduction of 1SP to the 2SP code path.
3. The sinusoidal meridian-arc series (Snyder eq. 3-21/3-26) cross-checks
   against the independent Krüger n^4 series already validated for UTM.
4. Proj strings must be bit-compatible with their registry twins.

The reference transforms any pair via PROJ (R/exact_extract.R:360-377).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import exactextractr_spark.core.crs as crs
from exactextractr_spark.core.crs import can_transform, crs_wkt, transform_xy

_A_CLARKE, _E2_CLARKE = 6378206.4, 0.00676866
_F_CLARKE = 1.0 - math.sqrt(1.0 - _E2_CLARKE)


def test_snyder_mercator_worked_example():
    # Snyder PP1395 Appendix, Mercator ellipsoid: Clarke 1866, lam0=-180,
    # phi=35N lam=75W -> x=11,688,673.7  y=4,139,145.6
    dfn = (_A_CLARKE, _F_CLARKE, None, 1.0, -180.0, 0.0, 0.0)
    x, y = crs._merc_from_lonlat(np.array([-75.0]), np.array([35.0]), dfn)
    assert x[0] == pytest.approx(11_688_673.7, abs=0.1)
    assert y[0] == pytest.approx(4_139_145.6, abs=0.1)
    lon, lat = crs._merc_to_lonlat(x, y, dfn)
    assert lon[0] == pytest.approx(-75.0, abs=1e-9)
    assert lat[0] == pytest.approx(35.0, abs=1e-9)


def test_epsg3395_roundtrip_and_vs_3857():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.0, 179.0, 2000)
    lat = rng.uniform(-80.0, 80.0, 2000)
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:3395")
    lo, la = transform_xy(x, y, "EPSG:3395", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)
    # same x as spherical web-mercator (identical a*lambda), smaller |y|
    # (the ellipsoidal correction shrinks northings; ~0.7% at mid-lat)
    x_sph, y_sph = transform_xy(lon, lat, "EPSG:4326", "EPSG:3857")
    np.testing.assert_allclose(x, x_sph, atol=1e-6)
    mid = np.abs(lat) > 10.0
    assert np.all(np.abs(y[mid]) < np.abs(y_sph[mid]))


def test_epsg_gn7_lcc_1sp_worked_example():
    # EPSG GN 7-2, Lambert Conic Conformal 1SP example (Jamaica 1969
    # National Grid): Clarke 1866, lat0=18N lon0=77W k0=1, FE=250000
    # FN=150000; phi=17°55'55.80"N lam=76°56'37.26"W
    # -> E=255,966.58  N=142,493.51
    ps = ("+proj=lcc +lat_0=18 +lon_0=-77 +k_0=1 +x_0=250000 +y_0=150000 "
          "+ellps=clrk66")
    lat = 17.0 + 55.0 / 60.0 + 55.80 / 3600.0
    lon = -(76.0 + 56.0 / 60.0 + 37.26 / 3600.0)
    x, y = transform_xy(np.array([lon]), np.array([lat]), "EPSG:4326", ps)
    assert x[0] == pytest.approx(255_966.58, abs=0.01)
    assert y[0] == pytest.approx(142_493.51, abs=0.01)
    lo, la = transform_xy(x, y, ps, "EPSG:4326")
    assert lo[0] == pytest.approx(lon, abs=1e-9)
    assert la[0] == pytest.approx(lat, abs=1e-9)


def test_modis_sinusoidal_sphere():
    # MODIS grid facts: sphere R=6371007.181; the grid's x half-extent is
    # pi*R = 20,015,109.354 m (the published MODIS tile-grid extent)
    R = 6371007.181
    x, y = transform_xy(np.array([179.999999]), np.array([0.0]),
                        "EPSG:4326", "MODIS")
    assert x[0] == pytest.approx(math.pi * R, rel=1e-6)
    assert y[0] == 0.0
    # y is linear in latitude on the sphere: y(30N) = R*pi/6
    _, y30 = transform_xy(np.array([0.0]), np.array([30.0]),
                          "EPSG:4326", "SR-ORG:6974")
    assert y30[0] == pytest.approx(R * math.pi / 6.0, rel=1e-12)
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.0, 179.0, 2000)
    lat = rng.uniform(-89.0, 89.0, 2000)
    x, y = transform_xy(lon, lat, "EPSG:4326", "MODIS")
    lo, la = transform_xy(x, y, "SR-ORG:6974", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_sinusoidal_ellipsoidal_roundtrip_and_meridian_arc():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-179.0, 179.0, 2000)
    lat = rng.uniform(-89.0, 89.0, 2000)
    x, y = transform_xy(lon, lat, "EPSG:4326", "ESRI:54008")
    lo, la = transform_xy(x, y, "ESRI:54008", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-6)
    np.testing.assert_allclose(la, lat, atol=1e-7)
    # meridian-arc series vs the independent Krüger series: M(phi) equals
    # the TM northing on the central meridian (sub-mm agreement)
    phi = np.radians(np.linspace(-89.0, 89.0, 500))
    M = crs._merid_arc(phi, crs._R, crs._F * (2.0 - crs._F))
    _, an = crs._tm_forward(np.zeros(500), np.degrees(phi), 0.0)
    assert np.abs(M - an).max() < 1e-3


def test_sinusoidal_equal_area_jacobian():
    # sinusoidal is equal-area: |J| must equal the ellipsoid area element
    # a^2(1-e2)cos(phi)/(1-e2 sin^2 phi)^2 at random points
    rng = np.random.default_rng(17)
    lon = rng.uniform(-170.0, 170.0, 200)
    lat = rng.uniform(-85.0, 85.0, 200)
    h = 1e-6
    dfn = crs._NAMED_SINU["ESRI:54008"]
    a, f = dfn[0], dfn[1]
    e2 = f * (2.0 - f)
    xe, yn = crs._sinu_from_lonlat(lon + h, lat, dfn)
    xw, yw = crs._sinu_from_lonlat(lon - h, lat, dfn)
    xn, ynn = crs._sinu_from_lonlat(lon, lat + h, dfn)
    xs, ys = crs._sinu_from_lonlat(lon, lat - h, dfn)
    dxdl = (xe - xw) / (2 * h)
    dydl = (yn - yw) / (2 * h)
    dxdp = (xn - xs) / (2 * h)
    dydp = (ynn - ys) / (2 * h)
    J = np.abs(dxdl * dydp - dxdp * dydl) * (180.0 / math.pi) ** 2
    phi = np.radians(lat)
    s = np.sin(phi)
    area_elem = a * a * (1.0 - e2) * np.cos(phi) / (1.0 - e2 * s * s) ** 2
    np.testing.assert_allclose(J, area_elem, rtol=1e-4)


def test_projstr_matches_registry_twins():
    rng = np.random.default_rng(3)
    lon = rng.uniform(6.0, 18.0, 500)
    lat = rng.uniform(-80.0, 84.0, 500)
    ps_utm = ("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 "
              "+y_0=0 +ellps=WGS84")
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:32633")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", ps_utm)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)

    lonf = rng.uniform(-4.0, 8.0, 300)
    latf = rng.uniform(42.0, 50.0, 300)
    ps_lcc = ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
              "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    x1, y1 = transform_xy(lonf, latf, "EPSG:4326", "EPSG:2154")
    x2, y2 = transform_xy(lonf, latf, "EPSG:4326", ps_lcc)
    np.testing.assert_array_equal(x2, x1)
    np.testing.assert_array_equal(y2, y1)

    lonp = rng.uniform(-180.0, 180.0, 300)
    latp = rng.uniform(60.0, 89.0, 300)
    ps_ps = "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84"
    x1, y1 = transform_xy(lonp, latp, "EPSG:4326", "EPSG:3413")
    x2, y2 = transform_xy(lonp, latp, "EPSG:4326", ps_ps)
    np.testing.assert_array_equal(x2, x1)
    np.testing.assert_array_equal(y2, y1)


def test_projstr_canonicalization_and_support():
    a = "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80"
    b = "+ellps=GRS80 +y_0=6.6e6 +x_0=700000.0 +lon_0=3 +lat_0=46.5 +lat_2=49 +lat_1=44 +proj=lcc"
    assert crs._norm(a) == crs._norm(b)
    assert can_transform(a, "EPSG:4326")
    assert can_transform("EPSG:3395", "MODIS")
    # oblique stereographic stays a loud error
    with pytest.raises(ValueError, match="polar"):
        transform_xy(np.zeros(1), np.zeros(1), "EPSG:4326",
                     "+proj=stere +lat_0=52 +lon_0=5")
    with pytest.raises(ValueError, match="not supported"):
        transform_xy(np.zeros(1), np.zeros(1), "EPSG:4326", "+proj=cass")


def test_crs_wkt_real_parameters():
    # every registry CRS emits WKT with real PROJECTION/PARAMETER nodes
    # (or a GEOGCS for 4326); brackets balance; unknown codes emit None
    for code in ["EPSG:3857", "EPSG:32633", "EPSG:27700", "EPSG:2154",
                 "EPSG:5070", "EPSG:3035", "EPSG:3413", "EPSG:3395",
                 "MODIS", "ESRI:54008"]:
        w = crs_wkt(code)
        assert w is not None and w.count("[") == w.count("]")
        assert "PROJECTION[" in w and "PARAMETER[" in w, code
    w4326 = crs_wkt("EPSG:4326")
    assert w4326.startswith('GEOGCS["WGS 84"')
    assert crs_wkt("EPSG:99999") is None
    # the OSGB definition carries the published TOWGS84 (local->WGS84)
    assert "TOWGS84[446.448,-125.157,542.06" in crs_wkt("EPSG:27700")


def test_projstr_towgs84_matches_osgb_registry():
    """A proj string spelling out OSGB (Airy axes + the PUBLISHED towgs84
    local->WGS84 parameters) must match the EPSG:27700 registry entry
    bit-for-bit — validating both the towgs84 sign convention and the
    generalized-ellipsoid TM path."""
    ps = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
          "+y_0=-100000 +a=6377563.396 +b=6356256.909 "
          "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    lon = np.array([-6.0, -2.0, 0.5, 1.7])
    lat = np.array([50.1, 52.0, 54.0, 57.5])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", ps)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", "EPSG:27700")
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_hotine_omerc_timbalai_worked_example():
    """EPSG GN 7-2 Hotine Oblique Mercator variant B worked example
    (Timbalai 1948 / RSO Borneo (m)): Everest 1830 (1967), latc=4N,
    lonc=115E, azimuth 53°18'56.9537", grid angle 53°07'48.3685",
    k0=0.99984, Ec=590476.87, Nc=442857.65; the test point
    phi=5°23'14.1129"N lam=115°48'19.8196"E -> E=679,245.73
    N=596,562.78. Identity datum: inputs are Timbalai geographic."""
    def dms(d, m, s):
        return d + m / 60.0 + s / 3600.0

    ps = ("+proj=omerc +lat_0=4 +lonc=115 "
          f"+alpha={dms(53, 18, 56.9537)!r} "
          f"+gamma={dms(53, 7, 48.3685)!r} "
          "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 "
          "+a=6377298.556 +rf=300.8017")
    lon = np.array([dms(115, 48, 19.8196)])
    lat = np.array([dms(5, 23, 14.1129)])
    x, y = transform_xy(lon, lat, "EPSG:4326", ps)
    assert x[0] == pytest.approx(679_245.73, abs=0.01)
    assert y[0] == pytest.approx(596_562.78, abs=0.01)
    lo, la = transform_xy(x, y, ps, "EPSG:4326")
    assert lo[0] == pytest.approx(lon[0], abs=1e-9)
    assert la[0] == pytest.approx(lat[0], abs=1e-9)


def test_swiss_lv95_lv03():
    """EPSG:2056 (LV95) and EPSG:21781 (LV03) via the alpha=90 Hotine
    case (PROJ-documented somerc equivalence ~1 mm over Switzerland).
    Checks: the projection center in LOCAL (CH1903) geographic
    coordinates maps exactly to the false origin; LV95 and LV03 differ
    by exactly (2,000,000, 1,000,000); round-trips close; conformality
    (Cauchy-Riemann) holds at random Swiss points."""
    ch_lat0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
    ch_lon0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0
    # helm-free twin: local geographic -> grid
    ps_local = (f"+proj=somerc +lat_0={ch_lat0!r} +lon_0={ch_lon0!r} "
                "+k_0=1 +x_0=2600000 +y_0=1200000 "
                "+a=6377397.155 +rf=299.1528128")
    x, y = transform_xy(np.array([ch_lon0]), np.array([ch_lat0]),
                        "EPSG:4326", ps_local)
    assert x[0] == pytest.approx(2_600_000.0, abs=1e-6)
    assert y[0] == pytest.approx(1_200_000.0, abs=1e-6)

    rng = np.random.default_rng(21)
    lon = rng.uniform(6.0, 10.5, 400)
    lat = rng.uniform(45.8, 47.8, 400)
    e95, n95 = transform_xy(lon, lat, "EPSG:4326", "EPSG:2056")
    lo, la = transform_xy(e95, n95, "EPSG:2056", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-7)
    np.testing.assert_allclose(la, lat, atol=1e-7)
    e03, n03 = transform_xy(lon, lat, "EPSG:4326", "EPSG:21781")
    np.testing.assert_allclose(e95 - e03, 2_000_000.0, atol=1e-6)
    np.testing.assert_allclose(n95 - n03, 1_000_000.0, atol=1e-6)
    # conformality: numeric Jacobian satisfies Cauchy-Riemann (the Swiss
    # projection is conformal by construction)
    h = 1e-7
    xe, ye = transform_xy(lon + h, lat, "EPSG:4326", "EPSG:2056")
    xw, yw = transform_xy(lon - h, lat, "EPSG:4326", "EPSG:2056")
    xn, yn = transform_xy(lon, lat + h, "EPSG:4326", "EPSG:2056")
    xs, ys = transform_xy(lon, lat - h, "EPSG:4326", "EPSG:2056")
    dx_dl = (xe - xw) / (2 * h)
    dy_dl = (ye - yw) / (2 * h)
    dx_dp = (xn - xs) / (2 * h)
    dy_dp = (yn - ys) / (2 * h)
    # on the ellipsoid, conformal <=> dx/dl = m*dy/dp and dy/dl = -m*dx/dp
    # with m = cos(phi)/( (1-e2 sin^2) ... ) ratio of metric factors
    import math as _m

    f = 1.0 / 299.1528128
    e2 = f * (2.0 - f)
    phi = np.radians(lat)
    mfac = np.cos(phi) * (1.0 - e2 * np.sin(phi) ** 2) / (1.0 - e2)
    # atol covers finite-difference truncation near zero-crossings
    # (derivative magnitudes are ~1e5 m/deg)
    np.testing.assert_allclose(dx_dl, mfac * dy_dp, rtol=5e-4, atol=1.0)
    np.testing.assert_allclose(dy_dl, -mfac * dx_dp, rtol=5e-4, atol=1.0)
    # the WKT carries the real Hotine parameter set
    w = crs_wkt("EPSG:2056")
    assert 'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"]' in w
    assert 'PARAMETER["azimuth",90]' in w and "TOWGS84[674.374" in w


def test_ease_grid2_cylindrical_equal_area():
    """EPSG:6933 (NSIDC EASE-Grid 2.0 Global, cylindrical equal-area,
    lat_ts=30): the map half-width must equal the published EASE2
    constant 17,367,530.44 m (= a·k0·pi with k0 at the standard
    parallel); equal-area Jacobian and round-trips hold; the proj-string
    twin is bit-exact."""
    x, _ = transform_xy(np.array([179.999999999]), np.array([0.0]),
                        "EPSG:4326", "EPSG:6933")
    assert x[0] == pytest.approx(17_367_530.44, abs=0.1)
    rng = np.random.default_rng(31)
    lon = rng.uniform(-179.0, 179.0, 1000)
    lat = rng.uniform(-85.0, 85.0, 1000)
    x, y = transform_xy(lon, lat, "EPSG:4326", "EPSG:6933")
    lo, la = transform_xy(x, y, "EPSG:6933", "EPSG:4326")
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-7)
    h = 1e-6
    e2 = crs._F * (2.0 - crs._F)
    xe, _ = transform_xy(lon + h, lat, "EPSG:4326", "EPSG:6933")
    xw, _ = transform_xy(lon - h, lat, "EPSG:4326", "EPSG:6933")
    _, yn = transform_xy(lon, lat + h, "EPSG:4326", "EPSG:6933")
    _, ys = transform_xy(lon, lat - h, "EPSG:4326", "EPSG:6933")
    J = np.abs((xe - xw) * (yn - ys)) / (4 * h * h) * (180 / math.pi) ** 2
    phi = np.radians(lat)
    s = np.sin(phi)
    area = crs._R ** 2 * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
    np.testing.assert_allclose(J, area, rtol=1e-5)
    x2, y2 = transform_xy(lon, lat, "EPSG:4326",
                          "+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84")
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    # towgs84 on a non-helmert family stays loud, not silent
    with pytest.raises(ValueError, match="towgs84"):
        transform_xy(np.zeros(1), np.zeros(1), "EPSG:4326",
                     "+proj=cea +lat_ts=30 +towgs84=100,0,0")


# ---------------------------------------------------------------------------
# WKT1 ingestion (wkt_to_projstr + _norm hook)
# ---------------------------------------------------------------------------


def test_wkt_roundtrip_vs_registry():
    """crs_wkt's emission with AUTHORITY tags stripped (forcing the
    PROJECTION/PARAMETER path) must transform identically to the registry
    code it came from — one loop over the whole projected family."""
    import re

    rng = np.random.default_rng(9)
    samples = {
        "EPSG:32633": (rng.uniform(9, 21, 50), rng.uniform(-75, 80, 50)),
        "EPSG:27700": (rng.uniform(-6, 1.5, 50), rng.uniform(50, 59, 50)),
        "EPSG:2154": (rng.uniform(-4, 8, 50), rng.uniform(42, 50, 50)),
        "EPSG:5070": (rng.uniform(-120, -75, 50), rng.uniform(25, 48, 50)),
        "EPSG:3035": (rng.uniform(-10, 30, 50), rng.uniform(35, 68, 50)),
        "EPSG:3413": (rng.uniform(-180, 180, 50), rng.uniform(62, 88, 50)),
        "EPSG:3395": (rng.uniform(-179, 179, 50), rng.uniform(-80, 80, 50)),
        "ESRI:54008": (rng.uniform(-179, 179, 50), rng.uniform(-85, 85, 50)),
        "EPSG:6933": (rng.uniform(-179, 179, 50), rng.uniform(-85, 85, 50)),
    }
    for code, (lon, lat) in samples.items():
        w = crs_wkt(code)
        assert w is not None, code
        bare = re.sub(r',AUTHORITY\["EPSG","\d+"\]', "", w)
        assert "AUTHORITY" not in bare
        x1, y1 = transform_xy(lon, lat, "EPSG:4326", code)
        x2, y2 = transform_xy(lon, lat, "EPSG:4326", bare)
        np.testing.assert_allclose(x2, x1, atol=1e-6, err_msg=code)
        np.testing.assert_allclose(y2, y1, atol=1e-6, err_msg=code)
        # and back through the inverse (1e-7 deg ~ 1 cm: the WKT emission
        # prints rounded ellipsoid/Helmert constants, so mm-level drift vs
        # the registry's exact values is inherent to the text round-trip)
        lon2, lat2 = transform_xy(x2, y2, bare, "EPSG:4326")
        np.testing.assert_allclose(lon2, lon, atol=1e-7, err_msg=code)
        np.testing.assert_allclose(lat2, lat, atol=1e-7, err_msg=code)


def test_wkt_esri_flavor_and_authority_preference():
    """ESRI-style naming resolves through parameters; an AUTHORITY tag on a
    supported code short-circuits to the registry entry."""
    esri_utm33 = (
        'PROJCS["WGS_1984_UTM_Zone_33N",GEOGCS["GCS_WGS_1984",'
        'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",15.0],'
        'PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
    )
    lon = np.array([12.0, 15.0, 17.5])
    lat = np.array([40.0, 55.0, 70.0])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:32633")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", esri_utm33)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)

    with_auth = crs_wkt("EPSG:2154")
    assert 'AUTHORITY["EPSG","2154"]' in with_auth
    assert crs.wkt_to_projstr(with_auth) == "EPSG:2154"


def test_wkt_foot_units_rejected_loudly():
    """A PROJCS authored in US survey feet (typical State Plane .prj)
    scales the projected COORDINATES, not just the parameter values; the
    engine's transform pipeline is meters-only, so such a CRS must be a
    loud ValueError — not a silently-meters misread that would shift every
    coordinate by ~3.28x."""
    ftus = 1200.0 / 3937.0
    wkt_ft = (
        'PROJCS["ft_tm",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",1640416.666666667],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",15.0],'
        'PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0.0],'
        f'UNIT["Foot_US",{ftus!r}]]'
    )
    with pytest.raises(ValueError, match="linear unit"):
        crs.wkt_to_projstr(wkt_ft)
    lon, lat = np.array([15.5]), np.array([45.0])
    with pytest.raises(ValueError):
        transform_xy(lon, lat, "EPSG:4326", wkt_ft)
    # meters-authored equivalent still transforms
    wkt_m = wkt_ft.replace(
        'PARAMETER["False_Easting",1640416.666666667]',
        'PARAMETER["False_Easting",500000.0]',
    ).replace(f'UNIT["Foot_US",{ftus!r}]', 'UNIT["Meter",1.0]')
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:32633")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", wkt_m)
    np.testing.assert_allclose(x2, x1, atol=1e-5)
    np.testing.assert_allclose(y2, y1, atol=1e-5)


def test_wkt_geogcs_and_failure_modes():
    assert crs.wkt_to_projstr(crs_wkt("EPSG:4326")) == "EPSG:4326"
    # NAD83 GEOGCS (GRS80 ellipsoid) treated as WGS84-coincident
    nad83 = ('GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
             'SPHEROID["GRS_1980",6378137.0,298.257222101]],'
             'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')
    assert crs.wkt_to_projstr(nad83) == "EPSG:4326"
    with pytest.raises(ValueError, match="not supported"):
        crs.wkt_to_projstr(
            'PROJCS["x",GEOGCS["g",DATUM["d",SPHEROID["s",6378137.0,'
            '298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["Degree",0.0174532925199433]],'
            'PROJECTION["Krovak"],UNIT["Meter",1.0]]'
        )
    # a malformed / non-WGS84 geographic WKT is a clean False, not a crash
    assert not can_transform('GEOGCS["Tokyo",DATUM["Tokyo",'
                             'SPHEROID["Bessel 1841",6377397.155,'
                             '299.1528128]],PRIMEM["Greenwich",0],'
                             'UNIT["degree",0.0174532925199433]]',
                             "EPSG:4326")
    assert not can_transform("PROJCS[garbage", "EPSG:4326")


def test_prj_parameter_only_file_resolves(tmp_path):
    """A .prj with parameters but no AUTHORITY tag keeps a working CRS."""
    import re

    from exactextractr_spark.sources.shapefile import _crs_from_prj

    bare = re.sub(r',AUTHORITY\["EPSG","\d+"\]', "", crs_wkt("EPSG:2154"))
    p = tmp_path / "t.prj"
    p.write_text(bare)
    got = _crs_from_prj(str(p))
    assert got is not None
    lon, lat = np.array([3.0]), np.array([46.0])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:2154")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", got)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)


def test_wkt_mercator_auxiliary_sphere_is_3857():
    """ESRI web-mercator WKT (Mercator_Auxiliary_Sphere, type 0) runs on
    the SPHERE of the semi-major axis — must match EPSG:3857, not
    ellipsoidal Mercator (a ~30 km northing error)."""
    esri = (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],'
        'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'
    )
    lon = np.array([10.0, -120.0, 170.0])
    lat = np.array([45.0, -30.0, 80.0])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:3857")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", esri)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    with pytest.raises(ValueError, match="Auxiliary_Sphere_Type"):
        crs.wkt_to_projstr(esri.replace(
            '"Auxiliary_Sphere_Type",0.0', '"Auxiliary_Sphere_Type",1.0'))


def test_wkt_esri_polar_names_and_gdal_axis_nodes():
    """Stereographic_South_Pole takes its pole from the NAME and its
    standard parallel from Standard_Parallel_1 (no Latitude_Of_Origin in
    NSIDC-style WKTs); bare AXIS enum keywords parse; plain
    Hotine_Oblique_Mercator (variant A) is a loud error, not a silent
    center-offset."""
    south = (
        'PROJCS["South_Pole_Stereographic",GEOGCS["GCS_WGS_1984",'
        'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Stereographic_South_Pole"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",-71.0],UNIT["Meter",1.0]]'
    )
    lon = np.array([0.0, 90.0, -135.0])
    lat = np.array([-75.0, -80.0, -65.0])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:3031")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", south)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)

    # GDAL WKT1 carries bare AXIS keywords after the parameters
    gdal = (
        'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",'
        'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",15],'
        'PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1],'
        'AXIS["Easting",EAST],AXIS["Northing",NORTH],'
        'AUTHORITY["EPSG","32633"]]'
    )
    assert crs.wkt_to_projstr(gdal) == "EPSG:32633"

    hotine_a = (
        'PROJCS["x",GEOGCS["g",DATUM["d",SPHEROID["s",6378137.0,'
        '298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Hotine_Oblique_Mercator"],'
        'PARAMETER["Azimuth",53.0],UNIT["Meter",1.0]]'
    )
    with pytest.raises(ValueError, match="not supported"):
        crs.wkt_to_projstr(hotine_a)

    # Paris-meridian GEOGCS with a WGS84-sized ellipsoid must NOT resolve
    # to EPSG:4326 (longitudes would silently shift ~2.34 deg)
    paris = ('GEOGCS["NTF (Paris)-ish",DATUM["D",SPHEROID["S",6378137.0,'
             '298.257223563]],PRIMEM["Paris",2.33722917],'
             'UNIT["Degree",0.0174532925199433]]')
    with pytest.raises(ValueError, match="prime meridian"):
        crs.wkt_to_projstr(paris)
    assert not can_transform(paris, "EPSG:4326")
