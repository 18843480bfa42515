"""Minimal CRS reconciliation — the reference auto-transforms the polygons
to the raster CRS with a warning (R/exact_extract.R:360-377, via sf/PROJ).

No PROJ exists in this environment, so transforms are implemented closed-
form for the pairs that need no datum math: geographic WGS84 (EPSG:4326)
↔ spherical web-mercator (EPSG:3857). Every other mismatched pair raises
with the reference's guidance — never a silent wrong answer.
"""

from __future__ import annotations

import math

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis (web-mercator sphere radius)
_MAX_LAT = 85.051128779806604  # atan(sinh(pi)) — web-mercator clamp


def _norm(crs: str) -> str:
    c = (crs or "").strip().upper().replace(" ", "")
    if c in ("EPSG:4326", "WGS84", "CRS:84", "OGC:CRS84"):
        return "EPSG:4326"
    if c in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    return c


def can_transform(src: str, dst: str) -> bool:
    a, b = _norm(src), _norm(dst)
    return a == b or {a, b} == {"EPSG:4326", "EPSG:3857"}


def transform_xy(
    x: np.ndarray, y: np.ndarray, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform between the supported CRS pair.
    Raises ValueError for unsupported pairs."""
    a, b = _norm(src), _norm(dst)
    if a == b:
        return x, y
    if (a, b) == ("EPSG:4326", "EPSG:3857"):
        lat = np.clip(np.asarray(y, dtype=np.float64), -_MAX_LAT, _MAX_LAT)
        lon = np.asarray(x, dtype=np.float64)
        mx = _R * np.radians(lon)
        my = _R * np.log(np.tan(math.pi / 4.0 + np.radians(lat) / 2.0))
        return mx, my
    if (a, b) == ("EPSG:3857", "EPSG:4326"):
        mx = np.asarray(x, dtype=np.float64)
        my = np.asarray(y, dtype=np.float64)
        lon = np.degrees(mx / _R)
        lat = np.degrees(2.0 * np.arctan(np.exp(my / _R)) - math.pi / 2.0)
        return lon, lat
    raise ValueError(
        f"no transform available from {src!r} to {dst!r}; supported pairs: "
        "EPSG:4326 <-> EPSG:3857 (closed-form spherical mercator). "
        "Transform the features to the raster CRS first (the reference "
        "transforms automatically via PROJ, R/exact_extract.R:360-377)"
    )


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
