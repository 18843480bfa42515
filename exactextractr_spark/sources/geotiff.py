"""GeoTIFF source — pure-numpy reader, no GDAL required.

The reference ingests any GDAL raster (``gdal_raster_wrapper.h:25-51``,
``R/exact_extract.R:450`` via terra); this environment has no GDAL, so the
subset that covers the reference's own sample data and the dominant
cloud-optimized layouts is implemented from the TIFF 6.0 / OGC GeoTIFF
specs directly:

- classic TIFF and BigTIFF, little- and big-endian
- strip and tile organization (tiled == the COG layout)
- compression: none (1), LZW (5), deflate/zlib (8 and 32946), PackBits
  (32773); horizontal-differencing predictor (2)
- sample formats: unsigned/signed int (8/16/32 bit), IEEE float (32/64)
- single- or multi-band chunky (PlanarConfiguration=1) with band select
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint, EPSG code from
  the GeoKey directory (2048 geographic / 3072 projected), GDAL nodata tag

Spark shape: the driver parses ONLY the header/IFD (a few KB), builds a
chunk-descriptor table (one row per output tile: byte offsets + counts),
and the decode runs distributed in ``mapInPandas`` — each task reads just
its own byte ranges, which is exactly the COG range-request access pattern
an object store wants at 100 TB. Pixel payloads never touch the driver.

Reference parity check: ``tests/test_geotiff.py`` reproduces the
reference vignette numbers (``vignettes/vig1_population.Rmd``) on the
bundled ``inst/sao_miguel`` rasters.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .tiles import DECODED_SCHEMA, Raster, RasterMeta

# TIFF tag ids
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMPRESSION = 256, 257, 258, 259
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR, _T_SAMPLE_FORMAT = 284, 317, 339
_T_TILE_W, _T_TILE_H, _T_TILE_OFFSETS, _T_TILE_COUNTS = 322, 323, 324, 325
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEO_KEYS = 33550, 33922, 34735
_T_TRANSFORM = 34264
_T_GDAL_NODATA = 42113

_TYPE_FMT = {
    1: "B", 2: "s", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
    11: "f", 12: "d", 16: "Q", 17: "q",
}
_TYPE_SIZE = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
    11: 4, 12: 8, 16: 8, 17: 8,
}


@dataclass(frozen=True)
class TiffInfo:
    """Parsed header of one TIFF image (first IFD)."""

    width: int
    height: int
    bps: int
    sample_format: int  # 1 uint, 2 int, 3 float
    spp: int
    compression: int
    predictor: int
    tiled: bool
    chunk_w: int  # tile width, or image width for strips
    chunk_h: int  # tile length / rows-per-strip
    offsets: tuple
    counts: tuple
    xmin: float
    ymax: float
    dx: float
    dy: float
    crs: str
    nodata: float | None
    big_endian: bool
    planar: int = 1  # 1 chunky, 2 separate planes
    photometric: int = 1  # 1 gray, 2 RGB, 3 palette, 6 YCbCr (JPEG)
    jpeg_tables: "bytes | None" = None  # tag 347 (abbreviated JPEG streams)
    colormap: "tuple | None" = None  # tag 320 (palette, 3 * 2^bps uint16)


def _read_ifd(f, index: int = 0) -> dict:
    """Parse the ``index``-th IFD with BOUNDED, seek-based reads — a COG
    header is a few KB at the front of a file that may be 100s of GB; the
    driver must never pull the payload. ``f`` is a seekable binary file
    object. ``index > 0`` follows the next-IFD chain (COG overview levels
    / multi-page TIFFs)."""
    f.seek(0)
    head = f.read(16)
    if head[:2] == b"II":
        bo = "<"
    elif head[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file (bad byte-order mark)")
    magic = struct.unpack(bo + "H", head[2:4])[0]
    if magic == 42:  # classic
        off = struct.unpack(bo + "I", head[4:8])[0]
        n_fmt, entry_sz, cnt_fmt, inline = "H", 12, "I", 4
    elif magic == 43:  # BigTIFF
        off = struct.unpack(bo + "Q", head[8:16])[0]
        n_fmt, entry_sz, cnt_fmt, inline = "Q", 20, "Q", 8
    else:
        raise ValueError(f"bad TIFF magic {magic}")
    n_sz = struct.calcsize(n_fmt)
    for _ in range(index):  # follow the chain to the requested IFD
        f.seek(off)
        n_here = struct.unpack(bo + n_fmt, f.read(n_sz))[0]
        f.seek(off + n_sz + n_here * entry_sz)
        off = struct.unpack(bo + cnt_fmt, f.read(struct.calcsize(cnt_fmt)))[0]
        if off == 0:
            raise ValueError(f"TIFF has no IFD #{index}")
    f.seek(off)
    n_entries = struct.unpack(bo + n_fmt, f.read(n_sz))[0]
    entries = f.read(n_entries * entry_sz)
    cnt_sz = struct.calcsize(cnt_fmt)
    tags: dict = {"_bo": bo}
    # first pass: inline values; collect out-of-line (tag, typ, cnt, off)
    deferred = []
    for i in range(n_entries):
        e = entries[i * entry_sz : (i + 1) * entry_sz]
        tag, typ = struct.unpack(bo + "HH", e[:4])
        cnt = struct.unpack(bo + cnt_fmt, e[4 : 4 + cnt_sz])[0]
        sz = _TYPE_SIZE.get(typ, 1) * cnt
        val_field = e[4 + cnt_sz :]
        if sz <= inline:
            tags[tag] = (typ, cnt, val_field[:sz])
        else:
            o = struct.unpack(bo + cnt_fmt, val_field[:cnt_sz])[0]
            deferred.append((tag, typ, cnt, o, sz))
    # second pass: bounded range-read per out-of-line tag (offset order)
    for tag, typ, cnt, o, sz in sorted(deferred, key=lambda d: d[3]):
        f.seek(o)
        tags[tag] = (typ, cnt, f.read(sz))

    out: dict = {"_bo": bo}
    for tag, val in tags.items():
        if tag == "_bo":
            continue
        typ, cnt, data = val
        if typ in (5, 10):  # rationals
            raw = struct.unpack(bo + ("I" if typ == 5 else "i") * 2 * cnt, data)
            out[tag] = tuple(raw[i] / raw[i + 1] for i in range(0, 2 * cnt, 2))
        elif typ == 2:
            out[tag] = data
        elif typ in _TYPE_FMT:
            out[tag] = struct.unpack(bo + _TYPE_FMT[typ] * cnt, data)
        else:
            out[tag] = data
    return out


#: ProjCoordTransGeoKey (3075) values -> proj-string projection names
#: (GeoTIFF 1.1 spec annex; only families core/crs.py implements)
_CT_PROJ = {
    1: "tmerc",   # CT_TransverseMercator
    7: "merc",    # CT_Mercator
    8: "lcc",     # CT_LambertConfConic_2SP
    9: "lcc",     # CT_LambertConfConic_1SP (Helmert)
    10: "laea",   # CT_LambertAzimEqualArea
    11: "aea",    # CT_AlbersEqualArea
    15: "stere",  # CT_PolarStereographic
    24: "sinu",   # CT_Sinusoidal
    28: "cea",    # CT_CylindricalEqualArea
}

#: GeographicTypeGeoKey (2048) / GeogEllipsoidGeoKey (2056) -> ellipsoid
_GEOG_ELLPS = {
    4326: "WGS84", 4269: "GRS80", 4258: "GRS80", 4283: "GRS80",
    4267: "clrk66", 4171: "GRS80", 4617: "GRS80",
}
_ELLIPSOID_ELLPS = {7030: "WGS84", 7019: "GRS80", 7008: "clrk66",
                    7022: "intl"}


def _epsg_from_geokeys(
    keys: tuple, doubles: tuple = (), ascii_params: bytes = b""
) -> str:
    """GeoKeyDirectory: (ver, rev, minor, nkeys) then 4-tuples of
    (KeyID, TagLocation, Count, Value). EPSG from ProjectedCSType (3072)
    if present, else GeographicType (2048). When the CRS is user-defined
    (32767) but the file carries projection PARAMETERS
    (ProjCoordTransGeoKey 3075 + Proj*GeoKeys in GeoDoubleParams), build a
    proj-parameter string that core/crs.py evaluates closed-form — the
    long tail of real files the reference handles via PROJ
    (R/exact_extract.R:360-377)."""
    if not keys or len(keys) < 4:
        return ""
    nkeys = keys[3]
    found: dict[int, float] = {}
    cites: dict[int, str] = {}
    for i in range(nkeys):
        kid, loc, cnt, val = keys[4 + 4 * i : 8 + 4 * i]
        if loc == 0:
            found[kid] = val
        elif loc == 34736 and doubles and val + cnt <= len(doubles):
            # value(s) live in the GeoDoubleParams tag; all the projection
            # parameter keys are single doubles
            found[kid] = doubles[val]
        elif loc == 34737 and ascii_params:
            cites[kid] = ascii_params[val : val + cnt].decode(
                "latin-1"
            ).rstrip("|\x00")
    code = found.get(3072) or found.get(2048)
    if code and code != 32767:  # 32767 == user-defined
        return f"EPSG:{int(code)}"
    ct = found.get(3075)
    proj = _CT_PROJ.get(int(ct)) if ct is not None else None
    if proj is None:
        # last resort: a WKT1 string embedded in the PCS/GT citation key
        # (ESRI "PE String" files carry the full PROJCS here)
        for kid in (3073, 1026, 2049):
            cite = cites.get(kid, "")
            at = cite.find("PROJCS[")
            if at < 0:
                at = cite.find("GEOGCS[")
            if at >= 0:
                from ..core.crs import wkt_to_projstr

                try:
                    return wkt_to_projstr(cite[at:])
                except ValueError:
                    pass
        return ""
    parts = [f"+proj={proj}"]
    # ellipsoid: explicit axes first, then ellipsoid code, then the
    # geographic CRS code, default WGS84
    if 2057 in found:  # GeogSemiMajorAxisGeoKey
        parts.append("+a=%.17g" % found[2057])
        if 2059 in found:  # GeogInvFlatteningGeoKey
            if found[2059] > 0:
                parts.append("+rf=%.17g" % found[2059])
        elif 2058 in found:  # GeogSemiMinorAxisGeoKey
            parts.append("+b=%.17g" % found[2058])
    else:
        ellps = _ELLIPSOID_ELLPS.get(int(found.get(2056, 0))) or \
            _GEOG_ELLPS.get(int(found.get(2048, 0))) or "WGS84"
        parts.append(f"+ellps={ellps}")
    # parameter keys: natural origin (3080/3081) or false origin
    # (3084/3085) or projection center (3088/3089) spellings all occur
    lon0 = found.get(3080, found.get(3084, found.get(3088)))
    lat0 = found.get(3081, found.get(3085, found.get(3089)))
    if proj == "stere" and 3094 in found:  # straight vertical pole lon
        lon0 = found[3094]
    std1 = found.get(3078)  # ProjStdParallel1GeoKey
    if proj == "stere" and (lat0 is None or abs(abs(lat0) - 90.0) > 1e-9):
        # polar files sometimes carry only the standard parallel (in 3078,
        # or as a non-polar NatOriginLat): the pole is implied by its
        # hemisphere
        if std1 is None and lat0 is not None:
            std1 = lat0
        if std1 is not None:
            lat0 = 90.0 if std1 >= 0 else -90.0
    if lon0 is not None:
        parts.append("+lon_0=%.17g" % lon0)
    if lat0 is not None:
        parts.append("+lat_0=%.17g" % lat0)
    if std1 is not None:
        parts.append(
            ("+lat_ts=%.17g" if proj in ("merc", "stere", "cea")
             else "+lat_1=%.17g")
            % std1
        )
    if 3079 in found:
        parts.append("+lat_2=%.17g" % found[3079])
    k0 = found.get(3092, found.get(3093))  # scale at origin / center
    if k0 is not None:
        parts.append("+k_0=%.17g" % k0)
    fe = found.get(3082, found.get(3086, 0.0))
    fn = found.get(3083, found.get(3087, 0.0))
    parts.append("+x_0=%.17g" % fe)
    parts.append("+y_0=%.17g" % fn)
    return " ".join(parts)


def _geokeys_for_projstr(crs: str) -> "tuple[tuple, list[float]]":
    """Inverse of the parameter branch of :func:`_epsg_from_geokeys`:
    GeoKeyDirectory + GeoDoubleParams for a '+proj=...' CRS string, so
    :func:`write_geotiff` can emit user-defined-CRS files that round-trip
    through this reader (and through GDAL, which reads the same keys)."""
    from ..core import crs as crs_mod

    d = crs_mod._parse_projstr(crs_mod._norm(crs))
    if d is None:
        raise ValueError(f"not a proj parameter string: {crs!r}")
    crs_mod._projstr_def(crs_mod._norm(crs))  # validate early, loud
    proj = d["PROJ"]
    ct_map = {"TMERC": 1, "MERC": 7, "LCC": 8, "LAEA": 10, "AEA": 11,
              "STERE": 15, "SINU": 24, "CEA": 28}
    if proj not in ct_map:
        # oblique Mercator has no rectified-grid-angle GeoKey in the spec
        # — refuse rather than write keys this (or any) reader can't
        # reconstruct faithfully
        raise ValueError(
            f"cannot encode +proj={proj.lower()} as GeoTIFF parameter "
            "GeoKeys; use an EPSG-coded CRS for this output"
        )
    ct = ct_map[proj]
    a, f = crs_mod._projstr_ellipsoid(d)
    doubles: list[float] = []
    keys: "list[tuple[int, int, int, int]]" = [
        (1024, 0, 1, 1),      # GTModelType: projected
        (1025, 0, 1, 1),      # GTRasterType: PixelIsArea
        (3072, 0, 1, 32767),  # ProjectedCSType: user-defined
        (3074, 0, 1, 32767),  # Projection: user-defined
        (3075, 0, 1, ct),     # ProjCoordTransGeoKey
        (3076, 0, 1, 9001),   # ProjLinearUnits: metre
    ]

    def add_d(kid: int, val: float):
        keys.append((kid, 34736, 1, len(doubles)))
        doubles.append(float(val))

    add_d(2057, a)  # semi-major; alone it means a sphere to this reader
    if f > 0.0:
        add_d(2059, 1.0 / f)
    g = lambda k, dflt=0.0: float(d[k]) if k in d else dflt  # noqa: E731
    add_d(3080, g("LON_0"))
    add_d(3081, g("LAT_0"))
    if "LAT_TS" in d:
        add_d(3078, float(d["LAT_TS"]))
    elif "LAT_1" in d:
        add_d(3078, float(d["LAT_1"]))
    if "LAT_2" in d:
        add_d(3079, float(d["LAT_2"]))
    if "K_0" in d or "K" in d:
        add_d(3092, g("K_0", g("K", 1.0)))
    add_d(3082, g("X_0"))
    add_d(3083, g("Y_0"))
    keys.sort()  # the GeoKey spec requires ascending key IDs
    header = (1, 1, 0, len(keys))
    flat = header + tuple(v for key in keys for v in key)
    return flat, doubles


def read_tiff_info(path: str, ifd: int = 0) -> TiffInfo:
    """Driver-side header parse — bounded seek-based reads of the IFD only
    (a few KB even for a 100-GB COG); pixel chunks are later range-read by
    executors. ``ifd`` selects an overview level (COG next-IFD chain)."""
    with open(path, "rb") as f:
        t = _read_ifd(f, ifd)
    bo = t["_bo"]
    tiled = _T_TILE_OFFSETS in t
    if tiled:
        offsets, counts = t[_T_TILE_OFFSETS], t[_T_TILE_COUNTS]
        chunk_w, chunk_h = t[_T_TILE_W][0], t[_T_TILE_H][0]
    else:
        offsets, counts = t[_T_STRIP_OFFSETS], t[_T_STRIP_COUNTS]
        chunk_w = t[_T_WIDTH][0]
        chunk_h = t.get(_T_ROWS_PER_STRIP, (t[_T_HEIGHT][0],))[0]
    planar = t.get(_T_PLANAR, (1,))[0]
    if planar not in (1, 2):
        raise ValueError(f"invalid PlanarConfiguration {planar}")
    photometric = t.get(262, (1,))[0]
    compression_ = t.get(_T_COMPRESSION, (1,))[0]
    if photometric == 6 and compression_ != 7:
        raise ValueError(
            "YCbCr photometric is only supported inside JPEG-compressed "
            "TIFFs (the JPEG decoder performs the color transform)"
        )
    jpeg_tables = None
    if 347 in t:
        jt = t[347]
        jpeg_tables = bytes(jt) if isinstance(jt, (bytes, bytearray)) else bytes(jt)
    colormap = t.get(320)
    scale = t.get(_T_PIXEL_SCALE)
    tie = t.get(_T_TIEPOINT)
    if scale is None or tie is None:
        if _T_TRANSFORM in t:
            m = t[_T_TRANSFORM]
            if m[1] != 0 or m[4] != 0:
                raise ValueError("rotated ModelTransformation not supported")
            dx, dy = m[0], -m[5]
            xmin, ymax = m[3], m[7]
        else:
            # ungeoreferenced: pixel grid
            dx = dy = 1.0
            xmin, ymax = 0.0, float(t[_T_HEIGHT][0])
    else:
        dx, dy = scale[0], scale[1]
        # tiepoint maps raster (i,j) -> world (x,y): world = tie_xy - ij*scale
        xmin = tie[3] - tie[0] * dx
        ymax = tie[4] + tie[1] * dy
    nodata = None
    if _T_GDAL_NODATA in t:
        try:
            nodata = float(t[_T_GDAL_NODATA].split(b"\x00")[0].strip())
        except ValueError:
            nodata = None
    return TiffInfo(
        width=t[_T_WIDTH][0],
        height=t[_T_HEIGHT][0],
        bps=t[_T_BPS][0],
        sample_format=t.get(_T_SAMPLE_FORMAT, (1,))[0],
        spp=t.get(_T_SPP, (1,))[0],
        compression=t.get(_T_COMPRESSION, (1,))[0],
        predictor=t.get(_T_PREDICTOR, (1,))[0],
        tiled=tiled,
        chunk_w=chunk_w,
        chunk_h=chunk_h,
        offsets=tuple(int(o) for o in offsets),
        counts=tuple(int(c) for c in counts),
        xmin=float(xmin),
        ymax=float(ymax),
        dx=float(dx),
        dy=float(dy),
        crs=_epsg_from_geokeys(
            t.get(_T_GEO_KEYS, ()), t.get(34736, ()),
            t.get(34737) if isinstance(t.get(34737), bytes) else b"",
        ),
        nodata=nodata,
        big_endian=(bo == ">"),
        planar=planar,
        photometric=photometric,
        jpeg_tables=jpeg_tables,
        colormap=tuple(colormap) if colormap is not None else None,
    )


def palette_rgb(info: TiffInfo) -> np.ndarray:
    """The palette as a (2^bps, 3) uint8 array (R, G, B columns). TIFF
    stores the ColorMap as three 16-bit planes (all reds, all greens, all
    blues, values 0..65535); GDAL's convention of dividing by 257 maps
    them back to 8-bit. Raises for non-palette images."""
    if info.photometric != 3 or info.colormap is None:
        raise ValueError("not a palette TIFF (photometric 3 with ColorMap)")
    n = 1 << info.bps
    cm = np.asarray(info.colormap, dtype=np.uint32)
    if len(cm) != 3 * n:
        raise ValueError(f"ColorMap has {len(cm)} entries, expected {3 * n}")
    return np.stack(
        [cm[:n], cm[n : 2 * n], cm[2 * n :]], axis=1
    ).astype(np.uint32).__floordiv__(257).astype(np.uint8)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, early code-width change)."""
    out = bytearray()
    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = list(base)
                next_code = 258
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            else:  # KwKwK case
                entry = prev + prev[:1]
            if prev is not None:
                table.append(prev + entry[:1])
                next_code += 1
            # TIFF's "early change": the code width bumps when the next
            # code to assign reaches 2^width - 1 (511/1023/2047), one code
            # earlier than vanilla LZW.  Threshold validated byte-exact
            # against JDK-ImageIO-written LZW TIFFs (tests/fixtures/
            # jdk_lzw_*.tif), which follow libtiff semantics.
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            out += entry
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first codes, early change: the writer
    widens at 2^width because its table runs one entry ahead of the
    decoder's 2^width - 1 threshold; dictionary reset before 4094).
    Streams verified readable by JDK ImageIO (external decoder test)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    CLEAR, EOI = 256, 257
    table: "dict[bytes, int]" = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):  # deflate (Adobe & old code)
        import zlib

        return zlib.decompress(raw)
    if compression == 5:
        return _lzw_decode(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    raise ValueError(
        f"TIFF compression {compression} not supported "
        "(supported: none, LZW, deflate, PackBits)"
    )


def _np_dtype(info_bps: int, fmt: int, big_endian: bool) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise ValueError(f"TIFF sample format {fmt} not supported")
    if kind == "f" and info_bps not in (32, 64):
        raise ValueError(f"float{info_bps} TIFF samples not supported")
    return np.dtype(("<" if not big_endian else ">") + kind + str(info_bps // 8))


def _decode_chunk(
    raw: bytes, info_dict: dict, nrows: int, ncols: int
) -> np.ndarray:
    """bytes -> float64 (nrows, ncols) for the selected band, nodata→NaN."""
    if info_dict["compression"] == 7:
        # JPEG-in-TIFF (new-style, tag 259=7): each chunk is a JPEG stream,
        # abbreviated when a JPEGTables tag supplies the shared DQT/DHT —
        # splice the tables between the chunk's SOI and its first marker.
        from ..core.jpeg import decode_jpeg

        tables = info_dict.get("jpeg_tables")
        data = raw
        if tables and len(tables) > 4 and raw[:2] == b"\xff\xd8":
            data = raw[:2] + tables[2:-2] + raw[2:]
        # photometric=2 means the 3 JPEG components are stored RGB (libtiff
        # PHOTOMETRIC_RGB + COMPRESSION_JPEG): skip the JFIF YCbCr transform.
        px = decode_jpeg(
            data, color_transform=(info_dict.get("photometric") != 2)
        )
        if px.ndim == 2:
            px = px[:, :, None]
        if info_dict["band"] >= px.shape[2]:
            raise ValueError(
                f"band {info_dict['band']} out of range for "
                f"{px.shape[2]}-channel JPEG chunk"
            )
        band = px[:nrows, :ncols, info_dict["band"]]
        nodata = info_dict["nodata"]
        if nodata is not None and not math.isnan(nodata):
            band = np.where(band == nodata, np.nan, band)
        return band
    data = _decompress(raw, info_dict["compression"])
    dt = _np_dtype(
        info_dict["bps"], info_dict["sample_format"], info_dict["big_endian"]
    )
    spp = info_dict["spp"]
    # a chunk stores FULL chunk_h x chunk_w rows even at image edges
    full_rows = info_dict["chunk_h"] if info_dict["tiled"] else nrows
    full_cols = info_dict["chunk_w"]
    n_expect = full_rows * full_cols * spp
    arr = np.frombuffer(data, dtype=dt, count=min(n_expect, len(data) // dt.itemsize))
    if len(arr) < n_expect:  # edge strips may be truncated to actual rows
        full_rows = len(arr) // (full_cols * spp)
        arr = arr[: full_rows * full_cols * spp]
    arr = arr.reshape(full_rows, full_cols, spp)
    if info_dict["predictor"] == 2:
        if dt.kind == "f":
            raise ValueError("floating-point predictor not supported")
        arr = np.cumsum(arr, axis=1, dtype=dt)
    elif info_dict["predictor"] not in (1, 2):
        raise ValueError(f"TIFF predictor {info_dict['predictor']} not supported")
    if (
        info_dict["sample_format"] == 1
        and info_dict["bps"] == 8
        and info_dict["nodata"] is not None
        and info_dict["nodata"] < 0
    ):
        # GDAL's legacy signed-byte convention: uint8 samples + negative
        # nodata means the band is really int8 (PIXELTYPE=SIGNEDBYTE)
        arr = arr.view(np.int8)
    band = arr[:nrows, :ncols, info_dict["band"]].astype(np.float64)
    nodata = info_dict["nodata"]
    if nodata is not None and not math.isnan(nodata):
        band = np.where(band == nodata, np.nan, band)
    return band


def read_geotiff(
    spark,
    path: str,
    *,
    layer: str | None = None,
    band: int = 0,
    rows_per_tile: int | None = None,
    overview: int = 0,
) -> Raster:
    """Open a GeoTIFF as a distributed :class:`Raster`.

    The driver parses the IFD only; a chunk-descriptor table (one row per
    output tile: byte offsets + counts) fans the range-reads + decode out
    to executors via ``mapInPandas``. For strip TIFFs, output tiles are
    full-width groups of strips (``rows_per_tile`` rounds up to a strip
    multiple); for tiled TIFFs (the COG layout) output tiles are the
    native TIFF tiles. ``overview=N`` reads the N-th COG overview level
    (next-IFD chain); GDAL overviews usually carry no geo tags, so the
    georeferencing is taken from the full-resolution IFD with the cell
    size scaled by the decimation factor.
    """
    info = read_tiff_info(path, ifd=overview)
    if overview > 0:
        base = read_tiff_info(path)
        from dataclasses import replace as _replace

        info = _replace(
            info,
            xmin=base.xmin,
            ymax=base.ymax,
            dx=base.dx * base.width / info.width,
            dy=base.dy * base.height / info.height,
            crs=info.crs or base.crs,
            nodata=info.nodata if info.nodata is not None else base.nodata,
        )
    if not 0 <= band < info.spp:
        raise ValueError(f"band {band} out of range (samples: {info.spp})")
    layer = layer or path.rsplit("/", 1)[-1].rsplit(".", 1)[0]

    n_cx = math.ceil(info.width / info.chunk_w)  # chunks across
    if info.tiled:
        tile_w, tile_h = info.chunk_w, info.chunk_h
        strips_per_tile = 1
    else:
        tile_w = info.width
        want = rows_per_tile or max(info.chunk_h, 512)
        strips_per_tile = max(1, want // info.chunk_h)
        tile_h = strips_per_tile * info.chunk_h

    meta = RasterMeta(
        layer=layer,
        xmin=info.xmin,
        ymax=info.ymax,
        dx=info.dx,
        dy=info.dy,
        width=info.width,
        height=info.height,
        tile_w=tile_w,
        tile_h=tile_h,
        crs=info.crs,
        nodata=info.nodata,
    )

    # chunk descriptors: per output tile, the TIFF chunk indices it covers.
    # PlanarConfiguration=2 stores each sample plane's chunks contiguously
    # (chunk k of plane s lives at index s*chunks_per_plane + k, TIFF 6.0
    # §"PlanarConfiguration") — selecting a band is pure index arithmetic,
    # and executors range-read ONLY the requested plane's bytes.
    chunks_per_plane = (
        len(info.offsets) // info.spp if info.planar == 2 else len(info.offsets)
    )
    plane_base = band * chunks_per_plane if info.planar == 2 else 0
    recs = []
    for tr in range(meta.n_tile_rows):
        for tc in range(meta.n_tile_cols):
            if info.tiled:
                idx = [plane_base + tr * n_cx + tc]
            else:
                s0 = tr * strips_per_tile
                idx = [
                    plane_base + s
                    for s in range(s0, s0 + strips_per_tile)
                    if s < chunks_per_plane
                ]
            recs.append(
                (
                    tr,
                    tc,
                    [info.offsets[i] for i in idx],
                    [info.counts[i] for i in idx],
                )
            )
    desc = spark.createDataFrame(
        pd.DataFrame(
            {
                "tile_row": pd.Series([r[0] for r in recs], dtype="int32"),
                "tile_col": pd.Series([r[1] for r in recs], dtype="int32"),
                "offs": [r[2] for r in recs],
                "cnts": [r[3] for r in recs],
            }
        )
    )
    n_part = min(len(recs), spark.sparkContext.defaultParallelism)
    desc = desc.repartition(n_part)

    info_dict = {
        "compression": info.compression,
        "bps": info.bps,
        "sample_format": info.sample_format,
        # planar chunks carry ONE sample each; band selection happened in
        # the chunk-index arithmetic above
        "spp": 1 if info.planar == 2 else info.spp,
        "predictor": info.predictor,
        "big_endian": info.big_endian,
        "chunk_h": info.chunk_h,
        "chunk_w": info.chunk_w,
        "tiled": info.tiled,
        "nodata": info.nodata,
        "band": 0 if info.planar == 2 else band,
        "jpeg_tables": info.jpeg_tables,
        "photometric": info.photometric,
    }
    strip_h = info.chunk_h

    def _read(batches):
        with open(path, "rb") as f:
            for pdf in batches:
                rows = {k: [] for k in (
                    "layer", "tile_row", "tile_col", "xmin", "ymin", "xmax",
                    "ymax", "dx", "dy", "nrows", "ncols", "px",
                )}
                for row in pdf.itertuples(index=False):
                    tr, tc = int(row.tile_row), int(row.tile_col)
                    g = meta.tile_grid(tr, tc)
                    blocks = []
                    rows_left = g.nrows
                    for off, cnt in zip(row.offs, row.cnts):
                        f.seek(int(off))
                        raw = f.read(int(cnt))
                        nr = min(strip_h, rows_left) if not info_dict["tiled"] else g.nrows
                        blocks.append(_decode_chunk(raw, info_dict, nr, g.ncols))
                        rows_left -= nr
                    px = blocks[0] if len(blocks) == 1 else np.vstack(blocks)
                    rows["layer"].append(layer)
                    rows["tile_row"].append(tr)
                    rows["tile_col"].append(tc)
                    rows["xmin"].append(g.xmin)
                    rows["ymin"].append(g.ymin)
                    rows["xmax"].append(g.xmax)
                    rows["ymax"].append(g.ymax)
                    rows["dx"].append(meta.dx)
                    rows["dy"].append(meta.dy)
                    rows["nrows"].append(g.nrows)
                    rows["ncols"].append(g.ncols)
                    rows["px"].append(px.ravel())
                if rows["layer"]:
                    yield pd.DataFrame(rows)

    df = desc.mapInPandas(_read, DECODED_SCHEMA)
    return Raster(df, meta, decoded=True)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _tiff_dtype_tags(arr: np.ndarray) -> "tuple[int, int]":
    """(bits-per-sample, sample-format) for the array dtype."""
    if arr.dtype.kind == "f":
        if arr.dtype.itemsize not in (4, 8):
            raise ValueError(f"unsupported float size {arr.dtype}")
        return arr.dtype.itemsize * 8, 3
    if arr.dtype.kind == "u":
        return arr.dtype.itemsize * 8, 1
    if arr.dtype.kind == "i":
        return arr.dtype.itemsize * 8, 2
    raise ValueError(f"unsupported dtype {arr.dtype}")


def write_geotiff(
    path: str,
    arr: np.ndarray,
    *,
    xmin: float,
    ymax: float,
    dx: float,
    dy: float | None = None,
    crs: str = "EPSG:4326",
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int = 64,
    overviews: "list[np.ndarray] | None" = None,
    tile_size: int | None = None,
    bigtiff: "bool | None" = None,
) -> None:
    """Write a single-band GeoTIFF (little-endian, strip or tile layout,
    deflate/LZW or uncompressed) — the raster-sink analog of the
    reference CLI's GDAL writer (``gdal_writer.h:25-54``). NaNs are
    written as ``nodata`` when given (and the GDAL nodata tag is set).
    ``overviews`` appends decimated levels as a next-IFD chain (the COG
    overview shape, readable back via ``read_geotiff(overview=N)``).

    ``tile_size`` switches to the tiled layout (tags 322-325, square
    tiles, edge tiles padded — the COG interior shape; must be a multiple
    of 16 per TIFF 6.0 §15). ``bigtiff`` forces the BigTIFF container
    (version 43, 8-byte offsets); the default ``None`` auto-selects it
    when the uncompressed payload could push offsets past the classic
    4-byte limit, so a >4 GiB resample output writes correctly instead of
    silently wrapping offsets.

    Driver-side by design: the natural inputs are ``exact_resample`` /
    ``rasterize_polygons`` destination grids, which are small relative to
    their sources (a distributed sharded writer would need compressed
    strip sizes before offsets can be laid out)."""
    import zlib

    comp_code = {"none": 1, "deflate": 8, "lzw": 5}.get(compression)
    if comp_code is None:
        raise ValueError("compression must be 'none', 'deflate' or 'lzw'")
    if tile_size is not None and (tile_size <= 0 or tile_size % 16):
        raise ValueError("tile_size must be a positive multiple of 16")
    dy = dx if dy is None else dy

    if bigtiff is None:
        # worst-case payload estimate from shapes alone (compression can
        # only shrink; 'none' is exact): classic offsets die at 4 GiB
        def _est(a) -> int:
            if isinstance(a, tuple):
                _it, h, w, np_dtype = a
                return h * w * np.dtype(np_dtype).itemsize
            a = np.asarray(a)
            return a.nbytes

        est = _est(arr) + sum(_est(o) for o in (overviews or []))
        bigtiff = est > (0xFFFFFFFF - (64 << 10))

    # GeoKeys: geographic vs projected EPSG, or user-defined parameter
    # keys for a '+proj=...' string
    epsg = None
    geo_doubles: "list[float] | None" = None
    c = crs.strip().upper()
    if c.startswith("EPSG:"):
        try:
            epsg = int(c.split(":")[1])
        except ValueError:
            epsg = None
    if epsg is not None and (epsg == 4326 or 4000 <= epsg < 5000):
        geokeys = (1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, epsg)
    elif epsg is not None:
        geokeys = (1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, epsg)
    elif "+PROJ=" in c.replace(" ", ""):
        geokeys, geo_doubles = _geokeys_for_projstr(crs)
    else:
        geokeys = (1, 1, 0, 1, 1024, 0, 1, 0)

    type_fmt = {3: "H", 4: "I", 12: "d", 16: "Q"}
    # container geometry: classic (42) vs BigTIFF (43) — the reader
    # handles both (read_tiff_info magic branch)
    if bigtiff:
        header_sz, inline, off_fmt, ifd_n_fmt = 16, 8, "Q", "Q"
        off_type = 16  # LONG8
    else:
        header_sz, inline, off_fmt, ifd_n_fmt = 8, 4, "I", "H"
        off_type = 4  # LONG
    base_w, base_h = None, None

    def _prep_strip(s: np.ndarray) -> bytes:
        if nodata is not None and s.dtype.kind == "f":
            s = np.where(np.isnan(s), nodata, s)
        if s.dtype.byteorder == ">":
            s = s.astype(s.dtype.newbyteorder("<"))
        raw = np.ascontiguousarray(s).tobytes()
        if comp_code == 8:
            return zlib.compress(raw)
        if comp_code == 5:
            return _lzw_encode(raw)
        return raw

    def build_section(
        a, base_off: int, is_base: bool
    ) -> "tuple[bytes, int]":
        """(section bytes, IFD offset within section) for one image, laid
        out at absolute offset ``base_off``. The IFD's next pointer is 0 —
        the caller patches it (the section's last 4 bytes).

        ``a`` is a 2-D array OR a lazy strip source tuple
        ``(strip_iter, h, w, np_dtype)`` whose strips (rows_per_strip rows
        each, last one shorter) are consumed ONE AT A TIME — only the
        compressed bytes accumulate, never the dense image."""
        nonlocal base_w, base_h
        if isinstance(a, tuple):
            if tile_size is not None:
                raise ValueError(
                    "tile layout requires a dense array (the lazy strip "
                    "source streams row bands)"
                )
            strip_iter, h, w, np_dtype = a
            bps, fmt = _tiff_dtype_tags(np.empty(0, dtype=np_dtype))
            chunks = [_prep_strip(s) for s in strip_iter]
        else:
            a = np.asarray(a)
            if a.ndim != 2:
                raise ValueError("write_geotiff takes 2-D single-band arrays")
            bps, fmt = _tiff_dtype_tags(a)
            h, w = a.shape
            if tile_size is not None:
                # full (ts, ts) chunks row-major; edge tiles padded (the
                # reader decodes the full chunk and crops)
                ts = tile_size
                pad = nodata if nodata is not None else 0
                chunks = []
                for r0 in range(0, h, ts):
                    for c0 in range(0, w, ts):
                        blk = a[r0 : r0 + ts, c0 : c0 + ts]
                        if blk.shape != (ts, ts):
                            full = np.full((ts, ts), pad, dtype=a.dtype)
                            full[: blk.shape[0], : blk.shape[1]] = blk
                            blk = full
                        chunks.append(_prep_strip(blk))
            else:
                chunks = [
                    _prep_strip(a[r0 : r0 + rows_per_strip])
                    for r0 in range(0, h, rows_per_strip)
                ]

        entries: "list[tuple[int, int, object]]" = []

        def add(tag, typ, vals):
            entries.append((tag, typ, vals))

        # dimension tags: SHORT while they fit, LONG above 65535
        dim_t = 4 if max(w, h, rows_per_strip) > 0xFFFF else 3
        add(_T_WIDTH, dim_t, [w])
        add(_T_HEIGHT, dim_t, [h])
        add(_T_BPS, 3, [bps])
        add(_T_COMPRESSION, 3, [comp_code])
        add(262, 3, [1])  # photometric: BlackIsZero
        if tile_size is None:
            add(_T_ROWS_PER_STRIP, dim_t, [rows_per_strip])
        else:
            add(_T_TILE_W, 3, [tile_size])
            add(_T_TILE_H, 3, [tile_size])
        add(_T_SPP, 3, [1])
        add(_T_SAMPLE_FORMAT, 3, [fmt])
        if is_base:
            base_w, base_h = w, h
            add(_T_PIXEL_SCALE, 12, [dx, dy, 0.0])
            add(_T_TIEPOINT, 12, [0.0, 0.0, 0.0, xmin, ymax, 0.0])
            add(_T_GEO_KEYS, 3, list(geokeys))
            if geo_doubles:
                add(34736, 12, list(geo_doubles))  # GeoDoubleParams
        else:
            add(254, 4, [1])  # NewSubfileType: reduced-resolution image
        if nodata is not None:
            nod = np.format_float_positional(float(nodata), trim="-")
            add(_T_GDAL_NODATA, 2, nod.encode() + b"\x00")

        body = bytearray()
        offsets = []
        for ch in chunks:
            offsets.append(base_off + len(body))
            body += ch
        off_tag = _T_TILE_OFFSETS if tile_size is not None else _T_STRIP_OFFSETS
        cnt_tag = _T_TILE_COUNTS if tile_size is not None else _T_STRIP_COUNTS
        add(off_tag, off_type, offsets)
        add(cnt_tag, off_type, [len(ch) for ch in chunks])
        entries.sort(key=lambda e: e[0])

        payloads = []
        for tag, typ, vals in entries:
            if typ == 2:
                pay, cnt = bytes(vals), len(vals)
            else:
                pay = struct.pack("<" + type_fmt[typ] * len(vals), *vals)
                cnt = len(vals)
            payloads.append((tag, typ, cnt, pay))
        ext_base = base_off + len(body)
        ext = bytearray()
        ifd_entries = []
        cnt_fmt = off_fmt  # IFD entry count field: 4 bytes classic, 8 big
        for tag, typ, cnt, pay in payloads:
            if len(pay) <= inline:
                val = pay + b"\x00" * (inline - len(pay))
            else:
                val = struct.pack("<" + off_fmt, ext_base + len(ext))
                ext += pay
            ifd_entries.append(
                struct.pack("<HH" + cnt_fmt, tag, typ, cnt) + val
            )
        ifd = struct.pack("<" + ifd_n_fmt, len(ifd_entries))
        ifd += b"".join(ifd_entries)
        # next-IFD pointer, patched by caller
        ifd += struct.pack("<" + off_fmt, 0)
        section = bytes(body) + bytes(ext) + ifd
        return section, len(body) + len(ext)

    images = [arr] + list(overviews or [])
    sections: "list[tuple[bytes, int]]" = []
    starts: list[int] = []
    cursor = header_sz
    for i, a in enumerate(images):
        starts.append(cursor)
        sec, ifd_pos = build_section(a, cursor, is_base=(i == 0))
        sections.append((sec, ifd_pos))
        cursor += len(sec)
    # patch next-IFD pointers (each section's last pointer-width bytes)
    ptr_sz = struct.calcsize(off_fmt)
    patched = []
    for i, (sec, _pos) in enumerate(sections):
        if i + 1 < len(sections):
            nxt = starts[i + 1] + sections[i + 1][1]
            sec = sec[:-ptr_sz] + struct.pack("<" + off_fmt, nxt)
        patched.append(sec)
    ifd0 = starts[0] + sections[0][1]
    with open(path, "wb") as f:
        if bigtiff:
            # BigTIFF header: version 43, offset size 8, reserved 0
            f.write(b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd0))
        else:
            f.write(b"II" + struct.pack("<HI", 42, ifd0))
        for sec in patched:
            f.write(sec)


def resample_to_geotiff(
    facts: "DataFrame",
    dst_meta: RasterMeta,
    path: str,
    *,
    fill: float = float("nan"),
    dtype: str = "float64",
    compression: str = "deflate",
) -> None:
    """Materialize an ``exact_resample`` result (dst_row, dst_col, value)
    onto ``dst_meta``'s grid and write it as a GeoTIFF — the full
    read-tif → resample → write-tif round the reference performs through
    GDAL.

    Driver memory is bounded by ONE strip of dense pixels (rows_per_strip
    × width) plus the compressed output: the facts stream through
    ``toLocalIterator`` sorted by (dst_row, dst_col), and each completed
    strip is compressed immediately — the dense destination array is
    never materialized."""
    H, W = dst_meta.height, dst_meta.width
    rows_per_strip = 64
    np_dtype = np.dtype(dtype)

    def strip_source():
        it = (
            facts.select("dst_row", "dst_col", "value")
            .orderBy("dst_row", "dst_col")
            .toLocalIterator()
        )
        base = 0
        strip = np.full((min(rows_per_strip, H), W), fill, dtype=np_dtype)
        for r in it:
            row, col = int(r["dst_row"]), int(r["dst_col"])
            if not (0 <= row < H and 0 <= col < W):
                raise ValueError(
                    f"fact at (dst_row={row}, dst_col={col}) outside the "
                    f"destination grid {H}x{W}"
                )
            while row >= base + strip.shape[0]:
                yield strip
                base += strip.shape[0]
                strip = np.full(
                    (min(rows_per_strip, H - base), W), fill, dtype=np_dtype
                )
            strip[row - base, col] = r["value"]
        while base < H:
            yield strip
            base += strip.shape[0]
            if base < H:
                strip = np.full(
                    (min(rows_per_strip, H - base), W), fill, dtype=np_dtype
                )

    nodata = None if np.isnan(fill) else float(fill)
    write_geotiff(
        path,
        (strip_source(), H, W, np_dtype),
        xmin=dst_meta.xmin,
        ymax=dst_meta.ymax,
        dx=dst_meta.dx,
        dy=dst_meta.dy,
        crs=dst_meta.crs or "EPSG:4326",
        nodata=nodata,
        compression=compression,
        rows_per_strip=rows_per_strip,
    )
