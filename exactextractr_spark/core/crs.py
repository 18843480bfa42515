"""Minimal CRS reconciliation — the reference auto-transforms the polygons
to the raster CRS with a warning (R/exact_extract.R:360-377, via sf/PROJ).

No PROJ exists in this environment, so transforms are implemented closed-
form for the families that need no datum math (all WGS84-based):

- geographic WGS84 (EPSG:4326)
- spherical web-mercator (EPSG:3857)
- WGS84 / UTM zones (EPSG:326xx north, EPSG:327xx south) via the
  Karney–Krüger transverse-mercator series to n^4 (sub-mm over a zone;
  the same series GeographicLib/PROJ's tmerc uses)
- Helmert-shifted named TM CRSs (EPSG:27700 OSGB, EPSG:2193 NZTM,
  ETRS89/UTM EPSG:258xx)
- conic/azimuthal CRSs on WGS84-equivalent datums: Lambert conformal
  conic 2SP (EPSG:2154 Lambert-93), Albers equal-area (EPSG:5070 CONUS),
  Lambert azimuthal equal-area (EPSG:3035 Europe) — Snyder PP1395
  closed forms, validated against its published worked examples and by
  numeric conformality/equal-area Jacobian checks (test_crs_conic.py)
- polar stereographic (EPSG:3413 Arctic NSIDC, EPSG:3031 Antarctic,
  EPSG:5041/5042 UPS) — Snyder §21 ellipsoidal forms, the §21 south-polar
  worked example reproduced to 0.1 m
- normal-aspect Mercator (EPSG:3395 World Mercator) and sinusoidal (the
  MODIS grid SR-ORG:6974, ESRI:54008) — Snyder §7/§30
- Hotine oblique Mercator variant B (Snyder §9 / EPSG 9815; the EPSG
  GN7-2 Timbalai worked example to the mm), whose alpha=90 case is the
  Swiss projection: EPSG:2056 LV95 / EPSG:21781 LV03 on Bessel+Helmert
- cylindrical equal-area (EPSG:6933 NSIDC EASE-Grid 2.0; the published
  map half-width constant reproduces exactly) — Snyder §10
- ANY '+proj=tmerc|merc|lcc|aea|laea|stere|sinu|omerc|somerc|cea ...'
  parameter string (the GeoTIFF user-defined-GeoKey escape hatch)

Any pair within this family composes through lon/lat. Every other
mismatched pair raises with the reference's guidance — never a silent
wrong answer.
"""

from __future__ import annotations

import math

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis (web-mercator sphere radius)
_MAX_LAT = 85.051128779806604  # atan(sinh(pi)) — web-mercator clamp

# WGS84 ellipsoid + Krüger series constants (third flattening n)
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_A_BAR = _R / (1.0 + _N) * (1.0 + _N * _N / 4.0 + _N ** 4 / 64.0)
_K0 = 0.9996  # UTM scale on the central meridian
# forward series (conformal -> TM), Krüger alpha to n^4
_ALPHA = (
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 5.0 / 16.0 * _N ** 3 + 41.0 / 180.0 * _N ** 4,
    13.0 / 48.0 * _N ** 2 - 3.0 / 5.0 * _N ** 3 + 557.0 / 1440.0 * _N ** 4,
    61.0 / 240.0 * _N ** 3 - 103.0 / 140.0 * _N ** 4,
    49561.0 / 161280.0 * _N ** 4,
)
# inverse series (TM -> conformal), Krüger beta to n^4
_BETA = (
    _N / 2.0 - 2.0 / 3.0 * _N ** 2 + 37.0 / 96.0 * _N ** 3 - 1.0 / 360.0 * _N ** 4,
    _N ** 2 / 48.0 + _N ** 3 / 15.0 - 437.0 / 1440.0 * _N ** 4,
    17.0 / 480.0 * _N ** 3 - 37.0 / 840.0 * _N ** 4,
    4397.0 / 161280.0 * _N ** 4,
)
# conformal latitude -> geographic latitude series (delta) to n^4
_DELTA = (
    2.0 * _N - 2.0 / 3.0 * _N ** 2 - 2.0 * _N ** 3 + 116.0 / 45.0 * _N ** 4,
    7.0 / 3.0 * _N ** 2 - 8.0 / 5.0 * _N ** 3 - 227.0 / 45.0 * _N ** 4,
    56.0 / 15.0 * _N ** 3 - 136.0 / 35.0 * _N ** 4,
    4279.0 / 630.0 * _N ** 4,
)
_E_SQRTN = 2.0 * math.sqrt(_N) / (1.0 + _N)


def _series_consts(a: float, f: float):
    """(A̅, alpha, beta, delta, e_sqrtn) Krüger-series constants for an
    arbitrary ellipsoid — same formulas as the WGS84 module constants."""
    n = f / (2.0 - f)
    a_bar = a / (1.0 + n) * (1.0 + n * n / 4.0 + n ** 4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 / 3.0 * n ** 2 + 5.0 / 16.0 * n ** 3 + 41.0 / 180.0 * n ** 4,
        13.0 / 48.0 * n ** 2 - 3.0 / 5.0 * n ** 3 + 557.0 / 1440.0 * n ** 4,
        61.0 / 240.0 * n ** 3 - 103.0 / 140.0 * n ** 4,
        49561.0 / 161280.0 * n ** 4,
    )
    beta = (
        n / 2.0 - 2.0 / 3.0 * n ** 2 + 37.0 / 96.0 * n ** 3 - 1.0 / 360.0 * n ** 4,
        n ** 2 / 48.0 + n ** 3 / 15.0 - 437.0 / 1440.0 * n ** 4,
        17.0 / 480.0 * n ** 3 - 37.0 / 840.0 * n ** 4,
        4397.0 / 161280.0 * n ** 4,
    )
    delta = (
        2.0 * n - 2.0 / 3.0 * n ** 2 - 2.0 * n ** 3 + 116.0 / 45.0 * n ** 4,
        7.0 / 3.0 * n ** 2 - 8.0 / 5.0 * n ** 3 - 227.0 / 45.0 * n ** 4,
        56.0 / 15.0 * n ** 3 - 136.0 / 35.0 * n ** 4,
        4279.0 / 630.0 * n ** 4,
    )
    return a_bar, alpha, beta, delta, 2.0 * math.sqrt(n) / (1.0 + n)


_WGS84_CONSTS = (_A_BAR, _ALPHA, _BETA, _DELTA, _E_SQRTN)


def _norm(crs: str) -> str:
    raw = (crs or "").strip()
    head = raw[:16].upper().replace(" ", "")
    if head.startswith(("PROJCS[", "GEOGCS[")):
        # WKT1 parameter CRS (.prj sidecars, GeoTIFF citations): resolve to
        # an EPSG code or proj parameter string, then normalize that
        raw = wkt_to_projstr(raw)
    c = raw.strip().upper().replace(" ", "")
    if c in ("EPSG:4326", "WGS84", "CRS:84", "OGC:CRS84"):
        return "EPSG:4326"
    if c in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    if c in ("MODIS", "MODIS-SINUSOIDAL"):
        return "SR-ORG:6974"
    if "+PROJ=" in c:
        return _canon_projstr(c)
    return c


def _utm_zone(crs: str) -> "tuple[int, bool] | None":
    """(zone, south) for WGS84/UTM EPSG codes, else None."""
    c = _norm(crs)
    if not c.startswith("EPSG:"):
        return None
    try:
        code = int(c.split(":", 1)[1])
    except ValueError:
        return None
    if 32601 <= code <= 32660:
        return code - 32600, False
    if 32701 <= code <= 32760:
        return code - 32700, True
    if 25828 <= code <= 25838:
        # ETRS89 / UTM zones 28N-38N: ETRS89 == WGS84 to well under the
        # closed-form accuracy here (no grid/time-dependent datum math,
        # the same equivalence PROJ assumes without a deformation model)
        return code - 25800, False
    return None


def _supported(crs: str) -> bool:
    try:
        c = _norm(crs)
    except ValueError:
        return False  # WKT this module can't interpret
    if (
        c in ("EPSG:4326", "EPSG:3857")
        or _utm_zone(c) is not None
        or c in _NAMED_TM
        or c in _NAMED_CONIC
        or c in _NAMED_POLAR
        or c in _NAMED_MERC
        or c in _NAMED_SINU
        or c in _NAMED_OMERC
        or c in _NAMED_CEA
    ):
        return True
    try:
        return _projstr_def(c) is not None
    except ValueError:
        return False


def can_transform(src: str, dst: str) -> bool:
    try:
        a, b = _norm(src), _norm(dst)
    except ValueError:
        return False  # WKT this module can't interpret
    return a == b or (_supported(a) and _supported(b))


def _tm_forward(
    lon: np.ndarray, lat: np.ndarray, lon0_deg: float, consts=_WGS84_CONSTS
) -> tuple[np.ndarray, np.ndarray]:
    """Krüger-series transverse mercator, unscaled (returns A̅·η, A̅·ξ)."""
    a_bar, alpha, _beta, _delta, e_sqrtn = consts
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0_deg)
    s = np.sin(phi)
    # conformal latitude via tau' (Karney 2011 eq. 7-8)
    t = np.sinh(np.arctanh(s) - e_sqrtn * np.arctanh(e_sqrtn * s))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.sqrt(t * t + np.cos(dlam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a_j in enumerate(alpha, start=1):
        xi += a_j * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a_j * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return a_bar * eta, a_bar * xi


def _tm_inverse(
    x: np.ndarray, y: np.ndarray, lon0_deg: float, consts=_WGS84_CONSTS
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``_tm_forward`` (input is unscaled A̅·η, A̅·ξ)."""
    a_bar, _alpha, beta, delta, _e = consts
    eta = np.asarray(x, dtype=np.float64) / a_bar
    xi = np.asarray(y, dtype=np.float64) / a_bar
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b_j in enumerate(beta, start=1):
        xi_p -= b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    dlam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # conformal latitude chi, then geographic latitude by series
    chi = np.arctan2(np.sin(xi_p), np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2))
    phi = chi.copy()
    for j, d_j in enumerate(delta, start=1):
        phi += d_j * np.sin(2 * j * chi)
    return lon0_deg + np.degrees(dlam), np.degrees(phi)


# ---------------------------------------------------------------------------
# non-WGS84 datums: generalized named-TM projections + Helmert shifts
# ---------------------------------------------------------------------------

#: named TM projections on other datums:
#: code -> (a, f, lat0, lon0, k0, FE, FN, helmert)
#: ``helmert`` = (tx, ty, tz [m], rx, ry, rz [arc-sec], s [ppm]) taking
#: WGS84 geocentric coordinates TO the local datum (position-vector
#: convention) — the same single-step transformation PROJ applies when no
#: correction grid is installed (~5 m accuracy for OSGB36, which is the
#: published accuracy of the 7-parameter shift itself).
_NAMED_TM = {
    # British National Grid on Airy 1830 (OS "A guide to coordinate
    # systems in Great Britain", appendix; EPSG:27700)
    "EPSG:27700": (
        6377563.396, 1.0 - 6356256.909 / 6377563.396,  # Airy 1830
        49.0, -2.0, 0.9996012717, 400_000.0, -100_000.0,
        (-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894),
    ),
    # NZTM2000 (EPSG:2193): GRS80 on NZGD2000, which is WGS84-equivalent
    # at this accuracy — identity Helmert
    "EPSG:2193": (
        6378137.0, 1.0 / 298.257222101,  # GRS80
        0.0, 173.0, 0.9996, 1_600_000.0, 10_000_000.0,
        (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    ),
    # further Helmert-shifted TM CRSs register the same way
}


def _helmert_matrix(params):
    tx, ty, tz, rx, ry, rz, s_ppm = params
    to_rad = math.pi / (180.0 * 3600.0)
    rx, ry, rz = rx * to_rad, ry * to_rad, rz * to_rad
    scale = 1.0 + s_ppm * 1e-6
    # position-vector small-angle rotation matrix (not linearized away:
    # we invert it EXACTLY so round-trips close to fp precision)
    R = np.array(
        [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]], dtype=np.float64
    )
    t = np.array([tx, ty, tz], dtype=np.float64)
    return scale, R, t


def _geodetic_to_geocentric(lon, lat, a, f):
    e2 = f * (2.0 - f)
    phi = np.radians(lat)
    lam = np.radians(lon)
    nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
    x = nu * np.cos(phi) * np.cos(lam)
    y = nu * np.cos(phi) * np.sin(lam)
    z = nu * (1.0 - e2) * np.sin(phi)
    return x, y, z


def _geocentric_to_geodetic(x, y, z, a, f):
    """Bowring's method + 2 Newton refinements (sub-nm convergence)."""
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.hypot(x, y)
    theta = np.arctan2(z * a, p * b)
    phi = np.arctan2(
        z + ep2 * b * np.sin(theta) ** 3, p - e2 * a * np.cos(theta) ** 3
    )
    for _ in range(2):
        nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        phi = np.arctan2(z + e2 * nu * np.sin(phi), p)
    lam = np.arctan2(y, x)
    return np.degrees(lam), np.degrees(phi)


def _named_tm_from_lonlat(lon, lat, dfn):
    """WGS84 lon/lat -> projected E/N of a generalized TM CRS
    (a, f, lat0, lon0, k0, FE, FN, helmert)."""
    if isinstance(dfn, str):
        dfn = _NAMED_TM[dfn]
    a, f, lat0, lon0, k0, fe, fn, helm = dfn
    # datum shift: WGS84 geodetic -> geocentric -> local -> local geodetic
    x, y, z = _geodetic_to_geocentric(
        np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64),
        _R, _F,
    )
    scale, R, t = _helmert_matrix(helm)
    XYZ = scale * (R @ np.vstack([x, y, z])) + t[:, None]
    llon, llat = _geocentric_to_geodetic(XYZ[0], XYZ[1], XYZ[2], a, f)
    # projection on the local ellipsoid, false origin at (lat0, lon0)
    consts = _series_consts(a, f)
    ae, an = _tm_forward(llon, llat, lon0, consts)
    _z = np.zeros(1)
    _, an0 = _tm_forward(np.array([lon0]), np.array([lat0]), lon0, consts)
    e = fe + k0 * ae
    n = fn + k0 * (an - an0[0])
    return e, n


def _named_tm_to_lonlat(e, n, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_TM[dfn]
    a, f, lat0, lon0, k0, fe, fn, helm = dfn
    consts = _series_consts(a, f)
    _, an0 = _tm_forward(np.array([lon0]), np.array([lat0]), lon0, consts)
    ae = (np.asarray(e, dtype=np.float64) - fe) / k0
    an = (np.asarray(n, dtype=np.float64) - fn) / k0 + an0[0]
    llon, llat = _tm_inverse(ae, an, lon0, consts)
    x, y, z = _geodetic_to_geocentric(llon, llat, a, f)
    scale, R, t = _helmert_matrix(helm)
    # exact inverse of X = s*R*x + t
    xyz = np.linalg.solve(scale * R, np.vstack([x, y, z]) - t[:, None])
    return _geocentric_to_geodetic(xyz[0], xyz[1], xyz[2], _R, _F)


# ---------------------------------------------------------------------------
# conic / azimuthal projections: Lambert Conformal Conic (2SP), Albers
# equal-area conic, Lambert azimuthal equal-area — the dominant projected
# CRSs outside the transverse-mercator family (France, CONUS, Europe-wide).
# Formulas: Snyder, "Map Projections — A Working Manual" (USGS PP 1395),
# §15 (LCC, eq. 15-1..15-11), §14 (Albers, eq. 14-1..14-21), §24 (LAEA
# oblique ellipsoidal, eq. 24-2..24-38 with 3-11/3-16/3-18 aux latitudes).
# The reference reprojects ANY pair via PROJ (R/exact_extract.R:360-377);
# this covers the same common cases without a PROJ wheel.
# ---------------------------------------------------------------------------

#: code -> (kind, a, f, lat1, lat2, lat0, lon0, FE, FN); datum for all
#: three is GRS80 on a WGS84-equivalent frame (RGF93 / NAD83 / ETRS89 —
#: identity Helmert at the accuracy of this module, the same equivalence
#: PROJ applies without a deformation grid).
_GRS80_A, _GRS80_F = 6378137.0, 1.0 / 298.257222101
_NAMED_CONIC = {
    # RGF93 / Lambert-93 (France)
    "EPSG:2154": ("lcc", _GRS80_A, _GRS80_F, 44.0, 49.0, 46.5, 3.0,
                  700_000.0, 6_600_000.0),
    # NAD83 / Conus Albers
    "EPSG:5070": ("albers", _GRS80_A, _GRS80_F, 29.5, 45.5, 23.0, -96.0,
                  0.0, 0.0),
    # GDA94 / Australian Albers (GDA94 == WGS84 at this accuracy)
    "EPSG:3577": ("albers", _GRS80_A, _GRS80_F, -18.0, -36.0, 0.0, 132.0,
                  0.0, 0.0),
    # ETRS89-extended / LAEA Europe
    "EPSG:3035": ("laea", _GRS80_A, _GRS80_F, None, None, 52.0, 10.0,
                  4_321_000.0, 3_210_000.0),
    # GDA94 / Geoscience Australia Lambert
    "EPSG:3112": ("lcc", _GRS80_A, _GRS80_F, -18.0, -36.0, 0.0, 134.0,
                  0.0, 0.0),
}

#: cylindrical equal-area, normal aspect (Snyder §10 ellipsoidal,
#: eq. 10-7/10-8 via the authalic-latitude machinery):
#: code -> (a, f, lat_ts, lon0, FE, FN). EPSG:6933 is NSIDC EASE-Grid 2.0
#: Global (WGS84, lat_ts=30) — the passive-microwave/SMAP grid.
_NAMED_CEA = {
    "EPSG:6933": (_R, _F, 30.0, 0.0, 0.0, 0.0),
}


def _cea_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_CEA[dfn]
    a, f, lat_ts, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    k0 = float(_conic_m(np.array(math.radians(lat_ts)), e2))
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlam = np.radians((lon - lon0 + 180.0) % 360.0 - 180.0)
    q = _conic_q(np.radians(lat), e, e2)
    return fe + a * k0 * dlam, fn + a * q / (2.0 * k0)


def _cea_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_CEA[dfn]
    a, f, lat_ts, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    k0 = float(_conic_m(np.array(math.radians(lat_ts)), e2))
    qp = float(_conic_q(np.array(math.pi / 2.0), e, e2))
    q = 2.0 * k0 * (np.asarray(y, dtype=np.float64) - fn) / a
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    phi = _authalic_to_geodetic(beta, e2)
    lon = lon0 + np.degrees(
        (np.asarray(x, dtype=np.float64) - fe) / (a * k0)
    )
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)

#: polar stereographic (Snyder §21 ellipsoidal; EPSG 9829 variant B with a
#: standard parallel, 9810 variant A with k0 at the pole):
#: code -> (a, f, lat_ts | None, k0 | None, lon0, FE, FN, south)
_NAMED_POLAR = {
    # NSIDC Sea Ice Polar Stereographic North (WGS84)
    "EPSG:3413": (_R, _F, 70.0, None, -45.0, 0.0, 0.0, False),
    # Antarctic Polar Stereographic (WGS84)
    "EPSG:3031": (_R, _F, -71.0, None, 0.0, 0.0, 0.0, True),
    # Universal Polar Stereographic North / South (WGS84, k0=0.994);
    # 32661/32761 are the legacy codes for the same definitions
    "EPSG:5041": (_R, _F, None, 0.994, 0.0, 2_000_000.0, 2_000_000.0, False),
    "EPSG:5042": (_R, _F, None, 0.994, 0.0, 2_000_000.0, 2_000_000.0, True),
    "EPSG:32661": (_R, _F, None, 0.994, 0.0, 2_000_000.0, 2_000_000.0, False),
    "EPSG:32761": (_R, _F, None, 0.994, 0.0, 2_000_000.0, 2_000_000.0, True),
}

#: Hotine oblique Mercator, EPSG 9815 variant B (Snyder §9 eq. 9-11..9-48;
#: center-anchored false origin): code -> (a, f, latc, lonc, alpha_c,
#: gamma_c, k0, FE, FN, helmert). The alpha=gamma=90 case is the Swiss
#: projection (PROJ's somerc agrees with omerc+alpha=90 to ~1 mm across
#: Switzerland); validated against the EPSG GN7-2 Timbalai/RSO-Borneo
#: worked example to the mm (test_crs_global.py).
_BESSEL_A, _BESSEL_F = 6377397.155, 1.0 / 299.1528128
_CH_LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
_CH_LON0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0
#: WGS84 -> CH1903(+) is the negation of the published towgs84
#: (674.374, 15.056, 405.346) translation-only shift
_CH_HELM = (-674.374, -15.056, -405.346, 0.0, 0.0, 0.0, 0.0)
_NAMED_OMERC = {
    # CH1903+ / LV95
    "EPSG:2056": (_BESSEL_A, _BESSEL_F, _CH_LAT0, _CH_LON0, 90.0, 90.0,
                  1.0, 2_600_000.0, 1_200_000.0, _CH_HELM),
    # CH1903 / LV03 (same Helmert at this module's accuracy)
    "EPSG:21781": (_BESSEL_A, _BESSEL_F, _CH_LAT0, _CH_LON0, 90.0, 90.0,
                   1.0, 600_000.0, 200_000.0, _CH_HELM),
}


def _omerc_consts(a, f, latc_deg, lonc_deg, alpha_deg, k0):
    """(B, A, E, gamma0, lam0, uc) — Snyder §9 eq. 9-11..9-24 /
    EPSG 9815 setup constants."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    latc = math.radians(latc_deg)
    lonc = math.radians(lonc_deg)
    alphac = math.radians(alpha_deg)
    B = math.sqrt(1.0 + e2 * math.cos(latc) ** 4 / (1.0 - e2))
    A = a * B * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(latc) ** 2)
    t0 = float(_conic_t(np.array(latc), e))
    D = B * math.sqrt(1.0 - e2) / (
        math.cos(latc) * math.sqrt(1.0 - e2 * math.sin(latc) ** 2)
    )
    D2 = max(D * D, 1.0)
    F_ = D + math.copysign(math.sqrt(D2 - 1.0), latc)
    E_ = F_ * t0 ** B
    G = (F_ - 1.0 / F_) / 2.0
    gamma0 = math.asin(math.sin(alphac) / D)
    lam0 = lonc - math.asin(G * math.tan(gamma0)) / B
    uc = abs(A / B * math.atan2(math.sqrt(D2 - 1.0), math.cos(alphac)))
    uc = math.copysign(uc, latc)
    return B, A, E_, gamma0, lam0, uc, e


def _omerc_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_OMERC[dfn]
    a, f, latc, lonc, alpha, gamma, k0, fe, fn, helm = dfn
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if any(helm):
        x, y, z = _geodetic_to_geocentric(lon, lat, _R, _F)
        scale, Rm, t = _helmert_matrix(helm)
        XYZ = scale * (Rm @ np.vstack([x, y, z])) + t[:, None]
        lon, lat = _geocentric_to_geodetic(XYZ[0], XYZ[1], XYZ[2], a, f)
    B, A, E_, gamma0, lam0, uc, e = _omerc_consts(a, f, latc, lonc, alpha, k0)
    phi = np.radians(lat)
    t = _conic_t(phi, e)
    Q = E_ / t ** B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    dl = (np.radians(lon) - lam0 + math.pi) % (2.0 * math.pi) - math.pi
    V = np.sin(B * dl)
    U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * np.arctan2(
        S * math.cos(gamma0) + V * math.sin(gamma0), np.cos(B * dl)
    ) / B - uc
    gc = math.radians(gamma)
    return (fe + v * math.cos(gc) + u * math.sin(gc),
            fn + u * math.cos(gc) - v * math.sin(gc))


def _omerc_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_OMERC[dfn]
    a, f, latc, lonc, alpha, gamma, k0, fe, fn, helm = dfn
    B, A, E_, gamma0, lam0, uc, e = _omerc_consts(a, f, latc, lonc, alpha, k0)
    gc = math.radians(gamma)
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    v = xr * math.cos(gc) - yr * math.sin(gc)
    u = yr * math.cos(gc) + xr * math.sin(gc) + uc
    Q = np.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    U = (V * math.cos(gamma0) + S * math.sin(gamma0)) / T
    t = (E_ / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    chi = math.pi / 2.0 - 2.0 * np.arctan(t)
    phi = _conformal_to_geodetic(chi, a, f)
    lam = lam0 - np.arctan2(
        S * math.cos(gamma0) - V * math.sin(gamma0), np.cos(B * u / A)
    ) / B
    lon = (np.degrees(lam) + 180.0) % 360.0 - 180.0
    lat = np.degrees(phi)
    if any(helm):
        X, Y, Z = _geodetic_to_geocentric(lon, lat, a, f)
        scale, Rm, tvec = _helmert_matrix(helm)
        xyz = np.linalg.solve(scale * Rm, np.vstack([X, Y, Z]) - tvec[:, None])
        lon, lat = _geocentric_to_geodetic(xyz[0], xyz[1], xyz[2], _R, _F)
    return lon, lat


#: normal-aspect Mercator (Snyder §7 ellipsoidal, eq. 7-6..7-8 / 7-9..7-10):
#: code -> (a, f, lat_ts | None, k0 | None, lon0, FE, FN). EPSG:3395 is
#: "World Mercator" (WGS84 ellipsoid, k0=1) — the most common global-raster
#: projected CRS after web-mercator.
_NAMED_MERC = {
    "EPSG:3395": (_R, _F, None, 1.0, 0.0, 0.0, 0.0),
}

#: sinusoidal (Snyder §30; spherical eq. 30-1..30-5, ellipsoidal
#: 30-8..30-11): code -> (a, f, lon0, FE, FN).
#: SR-ORG:6974 is the MODIS sinusoidal grid — sphere R=6371007.181 m
#: (the radius in every MOD* HDF's mapprojection struct); ESRI:54008 is
#: World_Sinusoidal on the WGS84 ellipsoid.
_NAMED_SINU = {
    "SR-ORG:6974": (6371007.181, 0.0, 0.0, 0.0, 0.0),
    "ESRI:54008": (_R, _F, 0.0, 0.0, 0.0),
}


def _merc_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_MERC[dfn]
    a, f, lat_ts, k0, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    if lat_ts is not None:  # k0 from the standard parallel (Snyder 7-8)
        k0 = float(_conic_m(np.array(math.radians(abs(lat_ts))), e2))
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians((lon - lon0 + 180.0) % 360.0 - 180.0)
    x = fe + a * k0 * dlam
    # y = -a*k0*ln t(phi) (Snyder 7-7 via the isometric-colatitude t)
    y = fn - a * k0 * np.log(_conic_t(phi, e))
    return x, y


def _merc_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_MERC[dfn]
    a, f, lat_ts, k0, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    if lat_ts is not None:
        k0 = float(_conic_m(np.array(math.radians(abs(lat_ts))), e2))
    t = np.exp((fn - np.asarray(y, dtype=np.float64)) / (a * k0))
    chi = math.pi / 2.0 - 2.0 * np.arctan(t)
    phi = _conformal_to_geodetic(chi, a, f)
    lon = lon0 + np.degrees((np.asarray(x, dtype=np.float64) - fe) / (a * k0))
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)


def _merid_arc(phi, a, e2):
    """Meridian distance M(phi) (Snyder eq. 3-21)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * (
        (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0)
        * np.sin(2.0 * phi)
        + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
        - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi)
    )


def _merid_arc_inverse(M, a, e2):
    """phi from meridian distance via the rectifying latitude mu and
    Snyder's series eq. 3-26 (e1 = (1-sqrt(1-e2))/(1+sqrt(1-e2)))."""
    se = math.sqrt(1.0 - e2)
    e1 = (1.0 - se) / (1.0 + se)
    mu = M / (a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0
                   - 5.0 * e2 ** 3 / 256.0))
    return (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
    )


def _sinu_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_SINU[dfn]
    a, f, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians((lon - lon0 + 180.0) % 360.0 - 180.0)
    if e2 == 0.0:  # sphere (Snyder 30-1/30-2) — the MODIS grid
        return fe + a * dlam * np.cos(phi), fn + a * phi
    s = np.sin(phi)
    x = a * dlam * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)  # Snyder 30-8
    return fe + x, fn + _merid_arc(phi, a, e2)  # Snyder 30-9


def _sinu_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_SINU[dfn]
    a, f, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    if e2 == 0.0:
        phi = y / a
    else:
        phi = _merid_arc_inverse(y, a, e2)  # Snyder 30-10
    cphi = np.cos(phi)
    # at the poles every x maps to lon0 (cos(phi)=0 — guard the 0/0)
    safe = np.where(np.abs(cphi) < 1e-12, 1.0, cphi)
    if e2 == 0.0:
        dlam = x / (a * safe)
    else:
        s = np.sin(phi)
        dlam = x * np.sqrt(1.0 - e2 * s * s) / (a * safe)  # Snyder 30-11
    dlam = np.where(np.abs(cphi) < 1e-12, 0.0, dlam)
    lon = lon0 + np.degrees(dlam)
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)


def _ps_rho_factor(a, e, e2, lat_ts, k0):
    """a*m1/t1 (variant B) or 2*a*k0/sqrt((1+e)^(1+e)(1-e)^(1-e)) (A)."""
    if lat_ts is not None:
        p1 = math.radians(abs(lat_ts))
        m1 = float(_conic_m(np.array(p1), e2))
        t1 = float(_conic_t(np.array(p1), e))
        return a * m1 / t1
    return 2.0 * a * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))


def _polar_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_POLAR[dfn]
    a, f, lat_ts, k0, lon0, fe, fn, south = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    sgn = -1.0 if south else 1.0
    # south aspect: all of (lambda-lambda0, phi, x, y) negate (Snyder §21)
    phi = np.radians(sgn * lat)
    dlam = np.radians(sgn * ((lon - lon0 + 180.0) % 360.0 - 180.0))
    rho = _ps_rho_factor(a, e, e2, lat_ts, k0) * _conic_t(phi, e)
    x = rho * np.sin(dlam)
    y = -rho * np.cos(dlam)
    return fe + sgn * x, fn + sgn * y


def _polar_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_POLAR[dfn]
    a, f, lat_ts, k0, lon0, fe, fn, south = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    sgn = -1.0 if south else 1.0
    x = sgn * (np.asarray(x, dtype=np.float64) - fe)
    y = sgn * (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(x, y)
    t = rho / _ps_rho_factor(a, e, e2, lat_ts, k0)
    chi = math.pi / 2.0 - 2.0 * np.arctan(t)
    phi = _conformal_to_geodetic(chi, a, f)
    lam = np.arctan2(x, -y)
    lam = np.where(rho == 0.0, 0.0, lam)
    lon = lon0 + sgn * np.degrees(lam)
    return (lon + 180.0) % 360.0 - 180.0, sgn * np.degrees(phi)


def _conic_m(phi, e2):
    """Snyder eq. 14-15: radius of a parallel / a."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _conic_t(phi, e):
    """Snyder eq. 15-9: isometric colatitude function,
    t = tan(pi/4 - chi/2) with chi the conformal latitude."""
    s = np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)


def _conic_q(phi, e, e2):
    """Snyder eq. 3-12: authalic-latitude function q."""
    s = np.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def _authalic_to_geodetic(beta, e2):
    """Snyder eq. 3-18: series from authalic latitude beta to geodetic."""
    return (
        beta
        + (e2 / 3.0 + 31.0 * e2**2 / 180.0 + 517.0 * e2**3 / 5040.0)
        * np.sin(2.0 * beta)
        + (23.0 * e2**2 / 360.0 + 251.0 * e2**3 / 3780.0) * np.sin(4.0 * beta)
        + (761.0 * e2**3 / 45360.0) * np.sin(6.0 * beta)
    )


def _conformal_to_geodetic(chi, a, f):
    """chi -> phi via the Krüger delta series for the given ellipsoid."""
    _ab, _al, _be, delta, _es = _series_consts(a, f)
    phi = chi.copy()
    for j, d_j in enumerate(delta, start=1):
        phi += d_j * np.sin(2 * j * chi)
    return phi


def _conic_from_lonlat(lon, lat, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_CONIC[dfn]
    kind, a, f, lat1, lat2, lat0, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    # wrap the longitude difference into (-180, 180] so cones cut at the
    # antimeridian of the central meridian, like PROJ
    dlam = np.radians((lon - lon0 + 180.0) % 360.0 - 180.0)
    p0 = math.radians(lat0)
    if kind == "lcc":
        p1, p2 = math.radians(lat1), math.radians(lat2)
        m1, m2 = _conic_m(p1, e2), _conic_m(p2, e2)
        t0, t1, t2 = (_conic_t(p, e) for p in (p0, p1, p2))
        n = (
            math.sin(p1)
            if abs(lat1 - lat2) < 1e-12
            else (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        )
        F_ = m1 / (n * t1**n)
        rho0 = a * F_ * t0**n
        rho = a * F_ * _conic_t(phi, e) ** n
        th = n * dlam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)
    if kind == "albers":
        p1, p2 = math.radians(lat1), math.radians(lat2)
        m1, m2 = _conic_m(p1, e2), _conic_m(p2, e2)
        q0, q1, q2 = (_conic_q(p, e, e2) for p in (p0, p1, p2))
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + n * q1
        rho0 = a * math.sqrt(C - n * q0) / n
        rho = a * np.sqrt(C - n * _conic_q(phi, e, e2)) / n
        th = n * dlam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)
    # laea (oblique, Snyder eq. 24-2..24-19 with qp from eq. 3-12 at 90°)
    qp = _conic_q(np.array(math.pi / 2.0), e, e2)
    q0 = _conic_q(np.array(p0), e, e2)
    q = _conic_q(phi, e, e2)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    beta0 = math.asin(min(1.0, max(-1.0, float(q0 / qp))))
    rq = a * math.sqrt(float(qp) / 2.0)
    m0 = _conic_m(np.array(p0), e2)
    d = a * float(m0) / (rq * math.cos(beta0))
    cb, sb = np.cos(beta), np.sin(beta)
    denom = 1.0 + math.sin(beta0) * sb + math.cos(beta0) * cb * np.cos(dlam)
    b = rq * np.sqrt(2.0 / denom)
    x = b * d * cb * np.sin(dlam)
    y = (b / d) * (math.cos(beta0) * sb - math.sin(beta0) * cb * np.cos(dlam))
    return fe + x, fn + y


def _conic_to_lonlat(x, y, dfn):
    if isinstance(dfn, str):
        dfn = _NAMED_CONIC[dfn]
    kind, a, f, lat1, lat2, lat0, lon0, fe, fn = dfn
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    p0 = math.radians(lat0)
    if kind == "lcc":
        p1, p2 = math.radians(lat1), math.radians(lat2)
        m1, m2 = _conic_m(p1, e2), _conic_m(p2, e2)
        t0, t1, t2 = (_conic_t(p, e) for p in (p0, p1, p2))
        n = (
            math.sin(p1)
            if abs(lat1 - lat2) < 1e-12
            else (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        )
        F_ = m1 / (n * t1**n)
        rho0 = a * F_ * t0**n
        sgn = 1.0 if n >= 0 else -1.0
        rho = sgn * np.hypot(x, rho0 - y)
        th = np.arctan2(sgn * x, sgn * (rho0 - y))
        t = (rho / (a * F_)) ** (1.0 / n)
        chi = math.pi / 2.0 - 2.0 * np.arctan(t)
        phi = _conformal_to_geodetic(chi, a, f)
        return (
            lon0 + np.degrees(th / n),
            np.degrees(phi),
        )
    if kind == "albers":
        p1, p2 = math.radians(lat1), math.radians(lat2)
        m1, m2 = _conic_m(p1, e2), _conic_m(p2, e2)
        q0, q1, q2 = (_conic_q(p, e, e2) for p in (p0, p1, p2))
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + n * q1
        rho0 = a * math.sqrt(C - n * q0) / n
        sgn = 1.0 if n >= 0 else -1.0
        rho = sgn * np.hypot(x, rho0 - y)
        th = np.arctan2(sgn * x, sgn * (rho0 - y))
        q = (C - (rho * n / a) ** 2) / n
        qp = _conic_q(np.array(math.pi / 2.0), e, e2)
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        phi = _authalic_to_geodetic(beta, e2)
        return lon0 + np.degrees(th / n), np.degrees(phi)
    # laea inverse (Snyder eq. 24-26..24-36)
    qp = float(_conic_q(np.array(math.pi / 2.0), e, e2))
    q0 = float(_conic_q(np.array(p0), e, e2))
    beta0 = math.asin(min(1.0, max(-1.0, q0 / qp)))
    rq = a * math.sqrt(qp / 2.0)
    m0 = float(_conic_m(np.array(p0), e2))
    d = a * m0 / (rq * math.cos(beta0))
    rho = np.hypot(x / d, d * y)
    # points at the projection origin: ce=0; guard the 0/0 with a where
    safe_rho = np.where(rho == 0.0, 1.0, rho)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    q = qp * (
        np.cos(ce) * math.sin(beta0)
        + (d * y * np.sin(ce) * math.cos(beta0)) / safe_rho
    )
    q = np.where(rho == 0.0, qp * math.sin(beta0), q)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    phi = _authalic_to_geodetic(beta, e2)
    lam = np.arctan2(
        x * np.sin(ce),
        d * safe_rho * math.cos(beta0) * np.cos(ce)
        - d * d * y * math.sin(beta0) * np.sin(ce),
    )
    lam = np.where(rho == 0.0, 0.0, lam)
    return lon0 + np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# parameterized CRSs: a PROJ-style "+proj=... +key=value" string describing
# any projection family this module implements closed-form. This is the
# escape hatch for rasters whose GeoKeys carry projection PARAMETERS rather
# than an EPSG code (GeoTIFF 1.1 §B.3, ProjCoordTransGeoKey + Proj*GeoKeys)
# — the reference handles those via PROJ (R/exact_extract.R:360-377).
# Recognized: proj=tmerc|merc|lcc|aea|laea|stere (polar aspect)|sinu;
# ellipsoid via a/rf/b/f/R/ellps=WGS84|GRS80|clrk66|sphere (default WGS84);
# params lat_0 lat_1 lat_2 lat_ts lon_0 k_0 x_0 y_0 towgs84.
# ---------------------------------------------------------------------------

_ELLPS = {
    "WGS84": (_R, _F),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "CLRK66": (6378206.4, 1.0 - math.sqrt(1.0 - 0.00676866)),
    "INTL": (6378388.0, 1.0 / 297.0),
    "SPHERE": (6370997.0, 0.0),
}

_IDENT_HELM = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# WKT1 ingestion — PROJCS/GEOGCS parameter WKT (the .prj-sidecar and GeoTIFF
# citation form) converts to the proj-string family above, so files carrying
# projection PARAMETERs instead of an EPSG code resolve like the reference
# does via PROJ (R/exact_extract.R:360-377). Pure plumbing: the projection
# math is the closed-form family already implemented.
# ---------------------------------------------------------------------------


def _wkt_node(s: str, i: int = 0):
    """Parse one WKT1 node ``NAME[arg, ...]`` starting at index i.
    Returns (name, args, next_i); args are str (quoted), float (numeric)
    or nested (name, args) tuples. Tolerant of ESRI spacing."""
    while i < len(s) and s[i] in " \t\r\n,":
        i += 1
    j = i
    while j < len(s) and (s[j].isalnum() or s[j] == "_"):
        j += 1
    name = s[i:j].upper()
    while j < len(s) and s[j] in " \t\r\n":
        j += 1
    if j >= len(s) or s[j] != "[":
        raise ValueError(f"malformed WKT near index {i}: {s[i:i+40]!r}")
    j += 1
    args: list = []
    while True:
        while j < len(s) and s[j] in " \t\r\n,":
            j += 1
        if j >= len(s):
            raise ValueError("unterminated WKT node")
        ch = s[j]
        if ch == "]":
            return name, args, j + 1
        if ch == '"':
            k = s.index('"', j + 1)
            args.append(s[j + 1 : k])
            j = k + 1
        elif ch.isalpha():
            k = j
            while k < len(s) and (s[k].isalnum() or s[k] == "_"):
                k += 1
            m = k
            while m < len(s) and s[m] in " \t\r\n":
                m += 1
            if m < len(s) and s[m] == "[":
                sub_name, sub_args, j = _wkt_node(s, j)
                args.append((sub_name, sub_args))
            else:
                # bare enum keyword (AXIS[...,EAST], GDAL WKT1)
                args.append(s[j:k])
                j = k
        else:
            k = j
            while k < len(s) and s[k] not in ",]":
                k += 1
            args.append(float(s[j:k].strip()))
            j = k
    raise AssertionError  # pragma: no cover


def _wkt_children(args: list, name: str) -> list:
    return [a[1] for a in args if isinstance(a, tuple) and a[0] == name]


def _wkt_authority_epsg(args: list) -> "int | None":
    for auth in _wkt_children(args, "AUTHORITY"):
        if len(auth) >= 2 and str(auth[0]).upper() == "EPSG":
            try:
                return int(str(auth[1]))
            except ValueError:
                pass
    return None


_WKT_PROJ_NAMES = {
    "TRANSVERSE_MERCATOR": "tmerc",
    "GAUSS_KRUGER": "tmerc",
    "MERCATOR": "merc",
    "MERCATOR_1SP": "merc",
    "MERCATOR_2SP": "merc",
    "MERCATOR_AUXILIARY_SPHERE": "merc",
    "LAMBERT_CONFORMAL_CONIC": "lcc",
    "LAMBERT_CONFORMAL_CONIC_1SP": "lcc",
    "LAMBERT_CONFORMAL_CONIC_2SP": "lcc",
    "ALBERS": "aea",
    "ALBERS_CONIC_EQUAL_AREA": "aea",
    "LAMBERT_AZIMUTHAL_EQUAL_AREA": "laea",
    "POLAR_STEREOGRAPHIC": "stere",
    "STEREOGRAPHIC_NORTH_POLE": "stere",
    "STEREOGRAPHIC_SOUTH_POLE": "stere",
    "SINUSOIDAL": "sinu",
    "CYLINDRICAL_EQUAL_AREA": "cea",
    # ONLY the azimuth-center name (EPSG 9815, variant B) — the module's
    # omerc math anchors false origins at the projection center; plain
    # "Hotine_Oblique_Mercator" is variant A (EPSG 9812, natural-origin
    # offsets) and mapping it here would silently shift results by uc
    "HOTINE_OBLIQUE_MERCATOR_AZIMUTH_CENTER": "omerc",
}


def _wkt_validate_geogcs(gargs: list) -> None:
    """Reject geographic axes this module cannot interpret: non-Greenwich
    prime meridians and non-degree angular units."""
    for pm in _wkt_children(gargs, "PRIMEM"):
        if len(pm) >= 2 and abs(float(pm[1])) > 1e-9:
            raise ValueError("non-Greenwich prime meridian not supported")
    for gu in _wkt_children(gargs, "UNIT"):
        if len(gu) >= 2 and abs(float(gu[1]) - math.pi / 180.0) > 1e-12:
            raise ValueError(
                f"angular unit {gu[0]!r} not supported (degrees only)"
            )


def _wkt_geogcs_is_wgs84_family(gargs: list) -> bool:
    """True when the GEOGCS ellipsoid is WGS84/GRS80-sized — the datums
    this module treats as coincident (WGS84/NAD83/ETRS89, the same
    no-deformation-model equivalence PROJ assumes)."""
    for datum in _wkt_children(gargs, "DATUM"):
        for sph in (_wkt_children(datum, "SPHEROID")
                    + _wkt_children(datum, "ELLIPSOID")):
            if len(sph) >= 3:
                a, rf = float(sph[1]), float(sph[2])
                return abs(a - _R) < 0.5 and abs(rf - 298.25) < 0.1
    return False


def wkt_to_projstr(wkt: str) -> str:
    """Convert WKT1 (PROJCS/GEOGCS — OGC or ESRI flavor) to this module's
    CRS vocabulary: the outermost AUTHORITY EPSG code when that code is
    directly supported, else a proj parameter string built from the
    PROJECTION/PARAMETER/SPHEROID nodes. Raises ValueError for WKT this
    module cannot faithfully interpret (unknown projection method,
    non-degree angular units, non-Greenwich prime meridian)."""
    name, args, _ = _wkt_node(wkt)
    epsg = _wkt_authority_epsg(args)
    if epsg is not None and _supported_non_wkt(f"EPSG:{epsg}"):
        return f"EPSG:{epsg}"
    if name in ("GEOGCS", "GEOGCRS"):
        if name == "GEOGCS" and _wkt_geogcs_is_wgs84_family(args):
            _wkt_validate_geogcs(args)  # Paris meridian / grads reject
            return "EPSG:4326"
        raise ValueError(
            "geographic WKT CRS is not in the WGS84/GRS80 family (or is "
            "WKT2); only WGS84-equivalent datums are supported"
        )
    if name != "PROJCS":
        raise ValueError(
            f"unsupported WKT node {name!r} (WKT1 PROJCS/GEOGCS only)"
        )

    geogs = _wkt_children(args, "GEOGCS")
    if not geogs:
        raise ValueError("PROJCS without a GEOGCS node")
    gargs = geogs[0]
    _wkt_validate_geogcs(gargs)
    a = rf = None
    towgs84 = None
    for datum in _wkt_children(gargs, "DATUM"):
        for sph in (_wkt_children(datum, "SPHEROID")
                    + _wkt_children(datum, "ELLIPSOID")):
            if len(sph) >= 3:
                a, rf = float(sph[1]), float(sph[2])
        for tw in _wkt_children(datum, "TOWGS84"):
            vals = [float(v) for v in tw] + [0.0] * (7 - len(tw))
            if any(abs(v) > 1e-12 for v in vals):
                towgs84 = vals
    if a is None:
        raise ValueError("PROJCS without a SPHEROID node")

    projs = _wkt_children(args, "PROJECTION")
    if not projs or not projs[0]:
        raise ValueError("PROJCS without a PROJECTION node")
    pname = str(projs[0][0]).upper().replace(" ", "_")
    if pname not in _WKT_PROJ_NAMES:
        raise ValueError(f"WKT projection method {pname!r} not supported")
    method = _WKT_PROJ_NAMES[pname]

    params = {}
    for p in _wkt_children(args, "PARAMETER"):
        if len(p) >= 2:
            params[str(p[0]).upper()] = float(p[1])

    if pname == "MERCATOR_AUXILIARY_SPHERE":
        # ESRI web-mercator: projection math runs on the SPHERE of the
        # semi-major axis (auxiliary sphere type 0 — the EPSG:3857
        # definition), not the ellipsoid; using the ellipsoid here is a
        # ~30 km northing error at mid-latitudes
        if params.get("AUXILIARY_SPHERE_TYPE", 0.0) != 0.0:
            raise ValueError(
                "Auxiliary_Sphere_Type != 0 (semiminor/authalic spheres) "
                "not supported"
            )
        rf = 0.0
    unit = 1.0
    for u in _wkt_children(args, "UNIT"):
        if len(u) >= 2:
            unit = float(u[1])  # linear unit in meters
    if abs(unit - 1.0) > 1e-9:
        # Non-meter PROJCS units (US survey feet State Plane being the
        # common case) scale the projected COORDINATES themselves, not just
        # the FALSE_EASTING/NORTHING parameters; the transform pipeline
        # works in meters and has no +to_meter plumbing, so accepting the
        # CRS would silently misread every coordinate by the unit factor
        # (~3.28x for feet). Fail loudly instead — mirroring the
        # degrees-only angular-unit rule.
        raise ValueError(
            f"PROJCS linear unit {unit!r} m is not supported: projected "
            "coordinates must be in meters (convert the data or author "
            "the CRS in meters)"
        )

    def g(*names, dflt=0.0):
        for n in names:
            if n in params:
                return params[n]
        return dflt

    lat0 = g("LATITUDE_OF_ORIGIN", "LATITUDE_OF_CENTER")
    lon0 = g("CENTRAL_MERIDIAN", "LONGITUDE_OF_CENTER",
             "LONGITUDE_OF_ORIGIN")
    k0 = g("SCALE_FACTOR", dflt=1.0)
    x0 = g("FALSE_EASTING") * unit
    y0 = g("FALSE_NORTHING") * unit

    toks = [f"+proj={method}"]
    if rf and rf != 0.0:
        toks.append(f"+a={a!r} +rf={rf!r}")
    else:
        toks.append(f"+R={a!r}")
    if method == "tmerc":
        toks.append(f"+lat_0={lat0!r} +lon_0={lon0!r} +k_0={k0!r}")
    elif method == "merc":
        if "STANDARD_PARALLEL_1" in params:
            toks.append(f"+lat_ts={params['STANDARD_PARALLEL_1']!r}"
                        f" +lon_0={lon0!r}")
        else:
            toks.append(f"+k_0={k0!r} +lon_0={lon0!r}")
    elif method in ("lcc", "aea"):
        toks.append(f"+lat_0={lat0!r} +lon_0={lon0!r}")
        if "STANDARD_PARALLEL_1" in params:
            toks.append(f"+lat_1={params['STANDARD_PARALLEL_1']!r}")
        else:
            toks.append(f"+lat_1={lat0!r}")
        if "STANDARD_PARALLEL_2" in params:
            toks.append(f"+lat_2={params['STANDARD_PARALLEL_2']!r}")
        if method == "lcc" and "STANDARD_PARALLEL_1" not in params:
            toks.append(f"+k_0={k0!r}")  # LCC-1SP
    elif method == "laea":
        toks.append(f"+lat_0={lat0!r} +lon_0={lon0!r}")
    elif method == "stere":
        if pname == "STEREOGRAPHIC_NORTH_POLE" or \
                pname == "STEREOGRAPHIC_SOUTH_POLE":
            # ESRI polar names: the pole comes from the NAME; the standard
            # parallel from Standard_Parallel_1 (or a non-polar
            # Latitude_Of_Origin some writers use instead)
            pole = 90.0 if pname == "STEREOGRAPHIC_NORTH_POLE" else -90.0
            ts = params.get("STANDARD_PARALLEL_1", lat0)
            toks.append(f"+lat_0={pole!r} +lat_ts={ts!r} +lon_0={lon0!r}")
        elif abs(abs(lat0) - 90.0) < 1e-9:
            # variant A: lat_0=+/-90 (+ optional k or std parallel)
            toks.append(f"+lat_0={lat0!r} +lon_0={lon0!r}")
            if "STANDARD_PARALLEL_1" in params:
                toks.append(f"+lat_ts={params['STANDARD_PARALLEL_1']!r}")
            else:
                toks.append(f"+k_0={k0!r}")
        else:
            # variant B / ESRI: latitude_of_origin IS the std parallel
            pole = 90.0 if lat0 >= 0.0 else -90.0
            toks.append(f"+lat_0={pole!r} +lat_ts={lat0!r} +lon_0={lon0!r}")
    elif method == "sinu":
        toks.append(f"+lon_0={lon0!r}")
    elif method == "cea":
        toks.append(f"+lat_ts={g('STANDARD_PARALLEL_1')!r} +lon_0={lon0!r}")
    elif method == "omerc":
        alpha = g("AZIMUTH", dflt=90.0)
        gamma = g("RECTIFIED_GRID_ANGLE", dflt=alpha)
        toks.append(
            f"+lat_0={lat0!r} +lonc={lon0!r} +alpha={alpha!r}"
            f" +gamma={gamma!r} +k_0={k0!r}"
        )
    toks.append(f"+x_0={x0!r} +y_0={y0!r}")
    if towgs84 is not None:
        toks.append("+towgs84=" + ",".join(repr(v) for v in towgs84))
    return " ".join(toks)


def _supported_non_wkt(crs: str) -> bool:
    """_supported for a plain (non-WKT) CRS string — used while resolving
    WKT so the AUTHORITY check cannot recurse into WKT parsing."""
    try:
        return _supported(crs)
    except ValueError:
        return False


def _parse_projstr(c: str) -> "dict | None":
    """Token dict from a _norm-normalized (upper, no-space) proj string,
    or None if it isn't one."""
    if "+PROJ=" not in c:
        return None
    d: dict = {}
    for tok in c.split("+"):
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            d[k] = v
        else:
            d[tok] = ""
    return d if "PROJ" in d else None


def _projstr_ellipsoid(d: dict) -> tuple[float, float]:
    if "R" in d:
        return float(d["R"]), 0.0
    if "A" in d:
        a = float(d["A"])
        if "RF" in d:
            return a, 1.0 / float(d["RF"])
        if "B" in d:
            return a, (a - float(d["B"])) / a
        if "F" in d:
            return a, float(d["F"])
        return a, 0.0  # semi-major alone -> sphere of that radius
    name = d.get("ELLPS") or d.get("DATUM") or "WGS84"
    if name not in _ELLPS:
        raise ValueError(f"unknown ellipsoid {name!r} in proj string")
    return _ELLPS[name]


def _projstr_def(c: str):
    """('tm'|'conic'|'polar'|'merc'|'sinu', dfn) for a canonical proj
    string, or None if ``c`` is not a proj string. Raises ValueError for a
    proj string naming an unimplemented projection."""
    d = _parse_projstr(c)
    if d is None:
        return None
    a, f = _projstr_ellipsoid(d)
    g = lambda k, dflt=0.0: float(d[k]) if k in d else dflt  # noqa: E731
    proj = d["PROJ"]
    helm = _IDENT_HELM
    if "TOWGS84" in d:
        # towgs84 is local->WGS84 (position-vector); our tuples run
        # WGS84->local, and the standard inverse of a 7-param Helmert is
        # the sign-flip of all seven parameters
        vals = [float(v) for v in d["TOWGS84"].split(",")]
        vals += [0.0] * (7 - len(vals))
        helm = tuple(-v for v in vals)
    if proj not in ("TMERC", "OMERC", "SOMERC") and any(helm):
        # only the TM/omerc paths run the Helmert pipeline; silently
        # dropping a datum shift would be a silent wrong answer
        raise ValueError(
            f"+towgs84 is not supported with +proj={proj.lower()} "
            "(datum shifts are implemented for tmerc/omerc/somerc); "
            "transform the coordinates to WGS84 first"
        )
    if proj == "TMERC":
        return "tm", (a, f, g("LAT_0"), g("LON_0"), g("K_0", g("K", 1.0)),
                      g("X_0"), g("Y_0"), helm)
    if proj == "MERC":
        lat_ts = float(d["LAT_TS"]) if "LAT_TS" in d else None
        k0 = g("K_0", g("K", 1.0)) if lat_ts is None else None
        return "merc", (a, f, lat_ts, k0, g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "LCC":
        lat1 = g("LAT_1", g("LAT_0"))
        lat2 = g("LAT_2", lat1)
        k0 = g("K_0", g("K", 1.0))
        # LCC-1SP (EPSG 9801) with scale k0 == LCC-2SP with lat1=lat2 on a
        # sphere/ellipsoid scaled by k0: every a in the LCC equations
        # multiplies rho linearly, so a*k0 reproduces the k0 factor exactly
        return "conic", ("lcc", a * k0, f, lat1, lat2, g("LAT_0", lat1),
                         g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "AEA":
        return "conic", ("albers", a, f, g("LAT_1"), g("LAT_2"),
                         g("LAT_0"), g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "LAEA":
        return "conic", ("laea", a, f, None, None, g("LAT_0"),
                         g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "STERE":
        lat0 = g("LAT_0")
        if abs(abs(lat0) - 90.0) > 1e-9:
            raise ValueError(
                "oblique stereographic not supported (only the polar "
                "aspect, lat_0=+/-90)"
            )
        lat_ts = float(d["LAT_TS"]) if "LAT_TS" in d else None
        k0 = g("K_0", g("K", 1.0)) if lat_ts is None else None
        return "polar", (a, f, lat_ts, k0, g("LON_0"), g("X_0"), g("Y_0"),
                         lat0 < 0.0)
    if proj == "SINU":
        return "sinu", (a, f, g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "OMERC":
        alpha = g("ALPHA", 90.0)
        gamma = g("GAMMA", alpha)
        return "omerc", (a, f, g("LAT_0"), g("LONC", g("LON_0")), alpha,
                         gamma, g("K_0", g("K", 1.0)), g("X_0"), g("Y_0"),
                         helm)
    if proj == "CEA":
        return "cea", (a, f, g("LAT_TS"), g("LON_0"), g("X_0"), g("Y_0"))
    if proj == "SOMERC":
        # Swiss oblique Mercator == Hotine omerc with alpha=gamma=90
        # (PROJ-documented equivalence, ~1 mm over Switzerland)
        return "omerc", (a, f, g("LAT_0"), g("LON_0"), 90.0, 90.0,
                         g("K_0", g("K", 1.0)), g("X_0"), g("Y_0"), helm)
    raise ValueError(
        f"proj string projection {proj!r} not supported (supported: tmerc, "
        "merc, lcc, aea, laea, stere polar aspect, sinu, omerc, somerc, cea)"
    )


def _canon_projstr(c: str) -> str:
    """Canonical form of a proj string: parse + re-emit with sorted keys
    and %.17g floats so equivalent spellings compare equal."""
    d = _parse_projstr(c)
    if d is None:
        return c
    out = [f"+PROJ={d.pop('PROJ')}"]
    for k in sorted(d):
        v = d[k]
        if v == "":
            out.append(f"+{k}")
            continue
        try:
            if "," in v:
                v = ",".join("%.17g" % float(p) for p in v.split(","))
            elif k not in ("ELLPS", "DATUM"):
                v = "%.17g" % float(v)
        except ValueError:
            pass
        out.append(f"+{k}={v}")
    return "".join(out)


def _to_lonlat(
    x: np.ndarray, y: np.ndarray, crs: str
) -> tuple[np.ndarray, np.ndarray]:
    c = _norm(crs)
    if c == "EPSG:4326":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if c == "EPSG:3857":
        mx = np.asarray(x, dtype=np.float64)
        my = np.asarray(y, dtype=np.float64)
        lon = np.degrees(mx / _R)
        lat = np.degrees(2.0 * np.arctan(np.exp(my / _R)) - math.pi / 2.0)
        return lon, lat
    utm = _utm_zone(c)
    if utm is not None:
        zone, south = utm
        lon0 = -183.0 + 6.0 * zone
        e = (np.asarray(x, dtype=np.float64) - 500_000.0) / _K0
        n = np.asarray(y, dtype=np.float64)
        if south:
            n = n - 10_000_000.0
        return _tm_inverse(e, n / _K0, lon0)
    if c in _NAMED_TM:
        return _named_tm_to_lonlat(x, y, c)
    if c in _NAMED_CONIC:
        return _conic_to_lonlat(x, y, c)
    if c in _NAMED_POLAR:
        return _polar_to_lonlat(x, y, c)
    if c in _NAMED_MERC:
        return _merc_to_lonlat(x, y, c)
    if c in _NAMED_SINU:
        return _sinu_to_lonlat(x, y, c)
    if c in _NAMED_OMERC:
        return _omerc_to_lonlat(x, y, c)
    if c in _NAMED_CEA:
        return _cea_to_lonlat(x, y, c)
    ps = _projstr_def(c)
    if ps is not None:
        fam, dfn = ps
        return {
            "tm": _named_tm_to_lonlat,
            "conic": _conic_to_lonlat,
            "polar": _polar_to_lonlat,
            "merc": _merc_to_lonlat,
            "sinu": _sinu_to_lonlat,
            "omerc": _omerc_to_lonlat,
            "cea": _cea_to_lonlat,
        }[fam](x, y, dfn)
    raise _unsupported(crs)


def _from_lonlat(
    lon: np.ndarray, lat: np.ndarray, crs: str
) -> tuple[np.ndarray, np.ndarray]:
    c = _norm(crs)
    if c == "EPSG:4326":
        return lon, lat
    if c == "EPSG:3857":
        latc = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_LAT, _MAX_LAT)
        mx = _R * np.radians(np.asarray(lon, dtype=np.float64))
        my = _R * np.log(np.tan(math.pi / 4.0 + np.radians(latc) / 2.0))
        return mx, my
    utm = _utm_zone(c)
    if utm is not None:
        zone, south = utm
        lon0 = -183.0 + 6.0 * zone
        ae, an = _tm_forward(
            np.asarray(lon, dtype=np.float64),
            np.asarray(lat, dtype=np.float64),
            lon0,
        )
        e = 500_000.0 + _K0 * ae
        n = _K0 * an
        if south:
            n = n + 10_000_000.0
        return e, n
    if c in _NAMED_TM:
        return _named_tm_from_lonlat(lon, lat, c)
    if c in _NAMED_CONIC:
        return _conic_from_lonlat(lon, lat, c)
    if c in _NAMED_POLAR:
        return _polar_from_lonlat(lon, lat, c)
    if c in _NAMED_MERC:
        return _merc_from_lonlat(lon, lat, c)
    if c in _NAMED_SINU:
        return _sinu_from_lonlat(lon, lat, c)
    if c in _NAMED_OMERC:
        return _omerc_from_lonlat(lon, lat, c)
    if c in _NAMED_CEA:
        return _cea_from_lonlat(lon, lat, c)
    ps = _projstr_def(c)
    if ps is not None:
        fam, dfn = ps
        return {
            "tm": _named_tm_from_lonlat,
            "conic": _conic_from_lonlat,
            "polar": _polar_from_lonlat,
            "merc": _merc_from_lonlat,
            "sinu": _sinu_from_lonlat,
            "omerc": _omerc_from_lonlat,
            "cea": _cea_from_lonlat,
        }[fam](lon, lat, dfn)
    raise _unsupported(crs)


def _unsupported(crs: str) -> ValueError:
    named = ", ".join(
        sorted(_NAMED_TM) + sorted(_NAMED_CONIC) + sorted(_NAMED_POLAR)
        + sorted(_NAMED_MERC) + sorted(_NAMED_SINU) + sorted(_NAMED_OMERC)
        + sorted(_NAMED_CEA)
    )
    return ValueError(
        f"no transform available for {crs!r}; supported closed-form CRSs: "
        f"EPSG:4326, EPSG:3857, WGS84/UTM EPSG:326xx/327xx, {named} "
        "(Helmert-shifted TM / conic / azimuthal / mercator / sinusoidal), "
        "or a '+proj=tmerc|merc|lcc|aea|laea|stere|sinu|omerc|somerc|cea ...' parameter "
        "string. Transform the features to the raster CRS first (the "
        "reference transforms automatically via PROJ, "
        "R/exact_extract.R:360-377)"
    )


# ---------------------------------------------------------------------------
# WKT1 emission — real PROJECTION/PARAMETER nodes for every CRS this module
# implements, so sinks (.prj sidecars) write files OGR/ArcGIS can parse.
# ---------------------------------------------------------------------------

_WKT_GEOGCS_WGS84 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
    'AUTHORITY["EPSG","4326"]]'
)
_WKT_GEOGCS_ETRS89 = (
    'GEOGCS["ETRS89",DATUM["European_Terrestrial_Reference_System_1989",'
    'SPHEROID["GRS 1980",6378137,298.257222101,'
    'AUTHORITY["EPSG","7019"]],AUTHORITY["EPSG","6258"]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
    'AUTHORITY["EPSG","4258"]]'
)


def _wkt_geogcs(a: float, f: float, name: str = "unknown") -> str:
    generic = name not in ("unknown", "WGS 84", "GRS 1980")
    if not generic and abs(a - _R) < 1e-6 and abs(f - _F) < 1e-15:
        return _WKT_GEOGCS_WGS84
    if not generic and abs(a - _R) < 1e-6 \
            and abs(f - 1.0 / 298.257222101) < 1e-15:
        return _WKT_GEOGCS_ETRS89
    rf = "0" if f == 0.0 else "%.9f" % (1.0 / f)
    return (
        f'GEOGCS["{name}",DATUM["{name}",SPHEROID["{name}",%.4f,{rf}]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]' % a
    )


def _wkt_projcs(name, geogcs, projection, params, epsg=None) -> str:
    body = ",".join(
        f'PARAMETER["{k}",%.10g]' % v for k, v in params
    )
    auth = f',AUTHORITY["EPSG","{epsg}"]' if epsg else ""
    return (
        f'PROJCS["{name}",{geogcs},PROJECTION["{projection}"],{body},'
        f'UNIT["metre",1,AUTHORITY["EPSG","9001"]]{auth}]'
    )


def crs_wkt(crs: str) -> "str | None":
    """OGC WKT1 for a supported CRS, with real PROJECTION/PARAMETER nodes
    (parseable by OGR/ArcGIS), or None when no faithful definition exists —
    callers should then omit the .prj rather than write a misleading one."""
    c = _norm(crs)
    if c == "EPSG:4326":
        return _WKT_GEOGCS_WGS84
    if c == "EPSG:3857":
        return _wkt_projcs(
            "WGS 84 / Pseudo-Mercator", _WKT_GEOGCS_WGS84, "Mercator_1SP",
            [("central_meridian", 0), ("scale_factor", 1),
             ("false_easting", 0), ("false_northing", 0)], 3857,
        )
    utm = _utm_zone(c)
    if utm is not None:
        zone, south = utm
        code = int(c.split(":")[1])
        etrs = 25800 <= code <= 25899
        geog = _WKT_GEOGCS_ETRS89 if etrs else _WKT_GEOGCS_WGS84
        datum = "ETRS89" if etrs else "WGS 84"
        return _wkt_projcs(
            f"{datum} / UTM zone {zone}{'S' if south else 'N'}", geog,
            "Transverse_Mercator",
            [("latitude_of_origin", 0), ("central_meridian", -183 + 6 * zone),
             ("scale_factor", 0.9996), ("false_easting", 500000),
             ("false_northing", 10000000 if south else 0)], code,
        )
    epsg = int(c.split(":")[1]) if c.startswith("EPSG:") else None
    if c in _NAMED_TM:
        a, f, lat0, lon0, k0, fe, fn, helm = _NAMED_TM[c]
        geog = _wkt_geogcs(a, f, "OSGB 1936" if c == "EPSG:27700" else
                           "NZGD2000" if c == "EPSG:2193" else "unknown")
        if any(helm):
            # TOWGS84 runs local->WGS84: the negation of our WGS84->local
            # params, inserted inside DATUM right after SPHEROID
            towgs = ",".join("%.6g" % -v for v in helm)
            geog = geog.replace(
                "]],PRIMEM", f"],TOWGS84[{towgs}]],PRIMEM", 1
            )
        name = {"EPSG:27700": "OSGB36 / British National Grid",
                "EPSG:2193": "NZGD2000 / New Zealand Transverse Mercator"}\
            .get(c, c)
        return _wkt_projcs(
            name, geog, "Transverse_Mercator",
            [("latitude_of_origin", lat0), ("central_meridian", lon0),
             ("scale_factor", k0), ("false_easting", fe),
             ("false_northing", fn)], epsg,
        )
    if c in _NAMED_CONIC:
        kind, a, f, lat1, lat2, lat0, lon0, fe, fn = _NAMED_CONIC[c]
        geog = _wkt_geogcs(a, f, "GRS 1980")
        names = {"EPSG:2154": "RGF93 / Lambert-93",
                 "EPSG:5070": "NAD83 / Conus Albers",
                 "EPSG:3577": "GDA94 / Australian Albers",
                 "EPSG:3035": "ETRS89-extended / LAEA Europe"}
        if kind == "lcc":
            return _wkt_projcs(
                names.get(c, c), geog, "Lambert_Conformal_Conic_2SP",
                [("standard_parallel_1", lat1), ("standard_parallel_2", lat2),
                 ("latitude_of_origin", lat0), ("central_meridian", lon0),
                 ("false_easting", fe), ("false_northing", fn)], epsg,
            )
        if kind == "albers":
            return _wkt_projcs(
                names.get(c, c), geog, "Albers_Conic_Equal_Area",
                [("standard_parallel_1", lat1), ("standard_parallel_2", lat2),
                 ("latitude_of_center", lat0), ("longitude_of_center", lon0),
                 ("false_easting", fe), ("false_northing", fn)], epsg,
            )
        return _wkt_projcs(
            names.get(c, c), geog, "Lambert_Azimuthal_Equal_Area",
            [("latitude_of_center", lat0), ("longitude_of_center", lon0),
             ("false_easting", fe), ("false_northing", fn)], epsg,
        )
    if c in _NAMED_POLAR:
        a, f, lat_ts, k0, lon0, fe, fn, south = _NAMED_POLAR[c]
        geog = _wkt_geogcs(a, f)
        params = [("latitude_of_origin",
                   lat_ts if lat_ts is not None else (-90 if south else 90)),
                  ("central_meridian", lon0),
                  ("scale_factor", k0 if k0 is not None else 1.0),
                  ("false_easting", fe), ("false_northing", fn)]
        return _wkt_projcs(c, geog, "Polar_Stereographic", params, epsg)
    if c in _NAMED_MERC:
        a, f, lat_ts, k0, lon0, fe, fn = _NAMED_MERC[c]
        return _wkt_projcs(
            "WGS 84 / World Mercator", _wkt_geogcs(a, f), "Mercator_1SP",
            [("central_meridian", lon0),
             ("scale_factor", k0 if k0 is not None else 1.0),
             ("false_easting", fe), ("false_northing", fn)], epsg,
        )
    if c in _NAMED_SINU:
        a, f, lon0, fe, fn = _NAMED_SINU[c]
        return _wkt_projcs(
            "MODIS Sinusoidal" if c == "SR-ORG:6974" else "World_Sinusoidal",
            _wkt_geogcs(a, f, "unnamed ellipse" if f == 0 else "WGS 84"),
            "Sinusoidal",
            [("longitude_of_center", lon0), ("false_easting", fe),
             ("false_northing", fn)],
        )
    if c in _NAMED_OMERC:
        a, f, latc, lonc, alpha, gamma, k0, fe, fn, helm = _NAMED_OMERC[c]
        geog = _wkt_geogcs(a, f, "CH1903" if c in
                           ("EPSG:2056", "EPSG:21781") else "unknown")
        if any(helm):
            towgs = ",".join("%.6g" % -v for v in helm)
            geog = geog.replace(
                "]],PRIMEM", f"],TOWGS84[{towgs}]],PRIMEM", 1
            )
        names = {"EPSG:2056": "CH1903+ / LV95", "EPSG:21781": "CH1903 / LV03"}
        return _wkt_projcs(
            names.get(c, c), geog,
            "Hotine_Oblique_Mercator_Azimuth_Center",
            [("latitude_of_center", latc), ("longitude_of_center", lonc),
             ("azimuth", alpha), ("rectified_grid_angle", gamma),
             ("scale_factor", k0), ("false_easting", fe),
             ("false_northing", fn)], epsg,
        )
    if c in _NAMED_CEA:
        a, f, lat_ts, lon0, fe, fn = _NAMED_CEA[c]
        return _wkt_projcs(
            "WGS 84 / NSIDC EASE-Grid 2.0 Global" if c == "EPSG:6933" else c,
            _wkt_geogcs(a, f), "Cylindrical_Equal_Area",
            [("standard_parallel_1", lat_ts), ("central_meridian", lon0),
             ("false_easting", fe), ("false_northing", fn)], epsg,
        )
    ps = None
    try:
        ps = _projstr_def(c)
    except ValueError:
        return None
    if ps is not None:
        fam, dfn = ps
        if fam == "tm":
            a, f, lat0, lon0, k0, fe, fn, _h = dfn
            return _wkt_projcs(
                "unnamed", _wkt_geogcs(a, f), "Transverse_Mercator",
                [("latitude_of_origin", lat0), ("central_meridian", lon0),
                 ("scale_factor", k0), ("false_easting", fe),
                 ("false_northing", fn)],
            )
        if fam == "conic":
            kind, a, f, lat1, lat2, lat0, lon0, fe, fn = dfn
            proj, latk, lonk = {
                "lcc": ("Lambert_Conformal_Conic_2SP", "latitude_of_origin",
                        "central_meridian"),
                "albers": ("Albers_Conic_Equal_Area", "latitude_of_center",
                           "longitude_of_center"),
                "laea": ("Lambert_Azimuthal_Equal_Area", "latitude_of_center",
                         "longitude_of_center"),
            }[kind]
            params = []
            if lat1 is not None:
                params += [("standard_parallel_1", lat1),
                           ("standard_parallel_2", lat2)]
            params += [(latk, lat0), (lonk, lon0),
                       ("false_easting", fe), ("false_northing", fn)]
            return _wkt_projcs("unnamed", _wkt_geogcs(a, f), proj, params)
        if fam == "polar":
            a, f, lat_ts, k0, lon0, fe, fn, south = dfn
            return _wkt_projcs(
                "unnamed", _wkt_geogcs(a, f), "Polar_Stereographic",
                [("latitude_of_origin",
                  lat_ts if lat_ts is not None else (-90 if south else 90)),
                 ("central_meridian", lon0),
                 ("scale_factor", k0 if k0 is not None else 1.0),
                 ("false_easting", fe), ("false_northing", fn)],
            )
        if fam == "merc":
            a, f, lat_ts, k0, lon0, fe, fn = dfn
            params = [("central_meridian", lon0)]
            if lat_ts is not None:
                params.append(("standard_parallel_1", lat_ts))
            else:
                params.append(("scale_factor", k0))
            params += [("false_easting", fe), ("false_northing", fn)]
            return _wkt_projcs("unnamed", _wkt_geogcs(a, f),
                               "Mercator_1SP" if lat_ts is None
                               else "Mercator_2SP", params)
        if fam == "sinu":
            a, f, lon0, fe, fn = dfn
            return _wkt_projcs(
                "unnamed", _wkt_geogcs(a, f), "Sinusoidal",
                [("longitude_of_center", lon0), ("false_easting", fe),
                 ("false_northing", fn)],
            )
    return None


def transform_xy(
    x: np.ndarray, y: np.ndarray, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform between supported CRSs (any pair in
    the WGS84 family composes through lon/lat). Raises ValueError for
    unsupported pairs."""
    a, b = _norm(src), _norm(dst)
    if a == b:
        return x, y
    for norm_c, orig in ((a, src), (b, dst)):
        if not _supported(norm_c):
            # a proj string naming an unimplemented projection carries a
            # specific message — surface it rather than the generic one
            _projstr_def(norm_c)
            raise _unsupported(orig)
    lon, lat = _to_lonlat(x, y, a)
    return _from_lonlat(lon, lat, b)


def _dst_srid(dst: str) -> "int | None":
    """EPSG code of the destination CRS, or None — a transformed geometry
    must not keep its SOURCE srid (a stale EWKB SRID would contradict the
    restamped crs column)."""
    c = _norm(dst)
    if c.startswith("EPSG:"):
        try:
            return int(c.split(":", 1)[1])
        except ValueError:
            return None
    return None


def transform_geometry(geom, src: str, dst: str):
    """Deep-transform every coordinate of a parsed Geometry. The embedded
    SRID is restamped to the destination CRS (or dropped if it has no EPSG
    code) so re-encoded EWKB matches the new coordinates."""
    from .geom import Geometry

    def tx(arr: np.ndarray) -> np.ndarray:
        a = np.asarray(arr, dtype=np.float64)
        x, y = transform_xy(a[..., 0], a[..., 1], src, dst)
        return np.stack([x, y], axis=-1)

    return Geometry(
        kind=geom.kind,
        coords=(
            tx(geom.coords)
            if geom.coords is not None and np.size(geom.coords)
            else geom.coords
        ),
        rings=[tx(r) for r in geom.rings],
        parts=[transform_geometry(p, src, dst) for p in geom.parts],
        srid=_dst_srid(dst) if geom.srid is not None else None,
    )
