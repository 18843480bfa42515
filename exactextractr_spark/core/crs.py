"""Minimal CRS reconciliation — the reference auto-transforms the polygons
to the raster CRS with a warning (R/exact_extract.R:360-377, via sf/PROJ).

No PROJ exists in this environment, so transforms are implemented closed-
form for the families that need no datum math (all WGS84-based):

- geographic WGS84 (EPSG:4326)
- spherical web-mercator (EPSG:3857)
- WGS84 / UTM zones (EPSG:326xx north, EPSG:327xx south) via the
  Karney–Krüger transverse-mercator series to n^4 (sub-mm over a zone;
  the same series GeographicLib/PROJ's tmerc uses)

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


def _norm(crs: str) -> str:
    c = (crs or "").strip().upper().replace(" ", "")
    if c in ("EPSG:4326", "WGS84", "CRS:84", "OGC:CRS84"):
        return "EPSG:4326"
    if c in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
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
    return None


def _supported(crs: str) -> bool:
    c = _norm(crs)
    return c in ("EPSG:4326", "EPSG:3857") or _utm_zone(c) is not None


def can_transform(src: str, dst: str) -> bool:
    a, b = _norm(src), _norm(dst)
    return a == b or (_supported(a) and _supported(b))


def _tm_forward(
    lon: np.ndarray, lat: np.ndarray, lon0_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """Krüger-series transverse mercator, unscaled (returns A̅·η, A̅·ξ)."""
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0_deg)
    s = np.sin(phi)
    # conformal latitude via tau' (Karney 2011 eq. 7-8)
    t = np.sinh(np.arctanh(s) - _E_SQRTN * np.arctanh(_E_SQRTN * s))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.sqrt(t * t + np.cos(dlam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a_j in enumerate(_ALPHA, start=1):
        xi += a_j * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a_j * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return _A_BAR * eta, _A_BAR * xi


def _tm_inverse(
    x: np.ndarray, y: np.ndarray, lon0_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``_tm_forward`` (input is unscaled A̅·η, A̅·ξ)."""
    eta = np.asarray(x, dtype=np.float64) / _A_BAR
    xi = np.asarray(y, dtype=np.float64) / _A_BAR
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b_j in enumerate(_BETA, start=1):
        xi_p -= b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    dlam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # conformal latitude chi, then geographic latitude by series
    chi = np.arctan2(np.sin(xi_p), np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2))
    phi = chi.copy()
    for j, d_j in enumerate(_DELTA, start=1):
        phi += d_j * np.sin(2 * j * chi)
    return lon0_deg + np.degrees(dlam), np.degrees(phi)


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
    raise _unsupported(crs)


def _unsupported(crs: str) -> ValueError:
    return ValueError(
        f"no transform available for {crs!r}; supported closed-form CRSs: "
        "EPSG:4326, EPSG:3857, WGS84/UTM EPSG:326xx/327xx. "
        "Transform the features to the raster CRS first (the reference "
        "transforms automatically via PROJ, R/exact_extract.R:360-377)"
    )


def transform_xy(
    x: np.ndarray, y: np.ndarray, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform between supported CRSs (any pair in
    the WGS84 family composes through lon/lat). Raises ValueError for
    unsupported pairs."""
    a, b = _norm(src), _norm(dst)
    if a == b:
        return x, y
    if not _supported(a):
        raise _unsupported(src)
    if not _supported(b):
        raise _unsupported(dst)
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
