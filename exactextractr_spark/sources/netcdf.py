"""NetCDF-3 classic sink (and reader for verification) — pure stdlib.

The reference CLI writes netCDF through GDALWriter (``gdal_writer.h:
25-54``); no netCDF library exists in this environment, so the classic
(CDF-1/CDF-2) on-disk format is implemented from the NetCDF spec
directly: header = magic | numrecs | dim_list | gatt_list | var_list,
then the data block. Enough of the format for raster sinks: one 2-D
variable over (y, x) dimension coordinates plus CF-style attributes
(``_FillValue``, ``units``, CRS as a global attribute) — the shape
``ncdump`` and xarray/netCDF4 readers expect for a single-band grid.

Like the GeoTIFF writer, this is a driver-side sink for DESTINATION
grids (resample / rasterize outputs), which are small relative to their
sources.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPE_NC = {
    np.dtype("int8"): (_NC_BYTE, 1, ">i1"),
    np.dtype("int16"): (_NC_SHORT, 2, ">i2"),
    np.dtype("int32"): (_NC_INT, 4, ">i4"),
    np.dtype("float32"): (_NC_FLOAT, 4, ">f4"),
    np.dtype("float64"): (_NC_DOUBLE, 8, ">f8"),
}
_NC_DTYPE = {v[0]: v[2] for v in _DTYPE_NC.values()}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    e = s.encode()
    return struct.pack(">I", len(e)) + _pad4(e)


def _attr_value(v) -> bytes:
    if isinstance(v, str):
        e = v.encode()
        return struct.pack(">II", _NC_CHAR, len(e)) + _pad4(e)
    # numpy scalar: encode with ITS nc type — CF requires e.g. _FillValue to
    # match the variable's type (a float32 var with an NC_DOUBLE fill is
    # flagged by strict readers and ignored by netCDF-C's fill machinery)
    if isinstance(v, np.generic) and v.dtype in _DTYPE_NC:
        nc_type, _, fmt = _DTYPE_NC[v.dtype]
        return (
            struct.pack(">II", nc_type, 1)
            + _pad4(np.asarray([v], dtype=fmt).tobytes())
        )
    if isinstance(v, (int, np.integer)):
        return struct.pack(">IIi", _NC_INT, 1, int(v))
    return struct.pack(">IId", _NC_DOUBLE, 1, float(v))


def _attr_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        out += _name(k) + _attr_value(v)
    return out


def write_netcdf_grid(
    path: str,
    arr: np.ndarray,
    *,
    xmin: float,
    ymax: float,
    dx: float,
    dy: float | None = None,
    var_name: str = "value",
    crs: str = "EPSG:4326",
    fill_value: float | None = None,
    units: str | None = None,
) -> None:
    """Write a 2-D grid as a classic NetCDF-3 file with ``y``/``x``
    coordinate variables (cell-center coordinates, y descending like the
    raster row order) and CF attributes."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("write_netcdf_grid takes a 2-D array")
    if arr.dtype not in _DTYPE_NC:
        arr = arr.astype(np.float64)
    dy = dx if dy is None else dy
    h, w = arr.shape
    if fill_value is not None and arr.dtype.kind == "f":
        arr = np.where(np.isnan(arr), fill_value, arr)
    ys = ymax - (np.arange(h) + 0.5) * dy
    xs = xmin + (np.arange(w) + 0.5) * dx

    dims = [("y", h), ("x", w)]
    gatts = {"Conventions": "CF-1.6", "crs": crs,
             "history": "exactextractr-spark netcdf sink"}

    main_attrs: dict = {}
    if fill_value is not None:
        # cast to the variable's dtype so the attribute's NC type matches
        main_attrs["_FillValue"] = arr.dtype.type(fill_value)
    if units:
        main_attrs["units"] = units
    variables = [
        ("y", [0], {"standard_name": "projection_y_coordinate"},
         np.asarray(ys, dtype=np.float64)),
        ("x", [1], {"standard_name": "projection_x_coordinate"},
         np.asarray(xs, dtype=np.float64)),
        (var_name, [0, 1], main_attrs, arr),
    ]

    # header layout first (sizes), then data offsets
    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs = 0 (no record dim)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm, ln in dims:
        header += _name(nm) + struct.pack(">I", ln)
    header += _attr_list(gatts)

    # variable entries need begin offsets — compute with a two-pass layout
    def var_entry(nm, dimids, attrs, data, begin):
        nc_type, _, _ = _DTYPE_NC[data.dtype]
        vsize = len(_pad4(data.astype(_DTYPE_NC[data.dtype][2]).tobytes()))
        e = _name(nm)
        e += struct.pack(">I", len(dimids))
        for d in dimids:
            e += struct.pack(">I", d)
        e += _attr_list(attrs)
        e += struct.pack(">III", nc_type, vsize, begin)
        return e, vsize

    # pass 1: entry sizes with begin=0
    probe = struct.pack(">II", _NC_VARIABLE, len(variables))
    sizes = []
    for nm, dimids, attrs, data in variables:
        e, vsize = var_entry(nm, dimids, attrs, data, 0)
        probe += e
        sizes.append(vsize)
    header_len = len(header) + len(probe)
    begins = []
    cur = header_len
    for vsize in sizes:
        begins.append(cur)
        cur += vsize
    # pass 2: real entries
    vlist = struct.pack(">II", _NC_VARIABLE, len(variables))
    for (nm, dimids, attrs, data), begin in zip(variables, begins):
        e, _ = var_entry(nm, dimids, attrs, data, begin)
        vlist += e
    with open(path, "wb") as f:
        f.write(header)
        f.write(vlist)
        for nm, dimids, attrs, data in variables:
            f.write(_pad4(data.astype(_DTYPE_NC[data.dtype][2]).tobytes()))


def read_netcdf_grid(path: str) -> dict:
    """Parse a classic NetCDF-3 file written by :func:`write_netcdf_grid`
    (or any fixed-size classic file with non-record variables). Returns
    {"dims": {...}, "gatts": {...}, "vars": {name: (attrs, ndarray)}}."""
    buf = open(path, "rb").read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF-3 file")
    pos = 8  # skip magic + numrecs

    def u32():
        nonlocal pos
        v = struct.unpack(">I", buf[pos : pos + 4])[0]
        pos += 4
        return v

    def name():
        nonlocal pos
        n = u32()
        s = buf[pos : pos + n].decode()
        pos += n + (-n % 4)
        return s

    def attrs():
        nonlocal pos
        tag, cnt = u32(), u32()
        out = {}
        for _ in range(cnt):
            k = name()
            typ = u32()
            n = u32()
            if typ == _NC_CHAR:
                out[k] = buf[pos : pos + n].decode()
                pos += n + (-n % 4)
            else:
                fmt = _NC_DTYPE[typ]
                sz = np.dtype(fmt).itemsize
                out[k] = np.frombuffer(buf[pos : pos + n * sz], dtype=fmt)
                pos += n * sz + (-(n * sz) % 4)
                if n == 1:
                    out[k] = out[k][0]
        return out

    tag, ndims = u32(), u32()
    dims = []
    for _ in range(ndims):
        dims.append((name(), u32()))
    gatts = attrs()
    tag, nvars = u32(), u32()
    out_vars = {}
    for _ in range(nvars):
        nm = name()
        nd = u32()
        dimids = [u32() for _ in range(nd)]
        vatts = attrs()
        typ, vsize, begin = u32(), u32(), u32()
        shape = tuple(dims[d][1] for d in dimids)
        n = int(np.prod(shape)) if shape else 1
        if typ == _NC_CHAR:
            raw = np.frombuffer(buf[begin : begin + n], dtype="S1").reshape(shape)
            if len(shape) == 2:  # fixed-width strings over a length dim
                data = np.array(
                    [b"".join(row).rstrip(b"\x00").decode() for row in raw]
                )
            else:
                data = raw
        else:
            fmt = _NC_DTYPE[typ]
            data = np.frombuffer(
                buf[begin : begin + n * np.dtype(fmt).itemsize], dtype=fmt
            ).reshape(shape)
        out_vars[nm] = (vatts, data)
    return {"dims": dict(dims), "gatts": gatts, "vars": out_vars}


def write_netcdf_table(path: str, pdf, *, dim_name: str = "record") -> None:
    """Write a per-feature result table (pandas DataFrame) as classic
    NetCDF-3: one shared dimension, one 1-D variable per column — the
    shape the reference CLI produces when pointed at a netCDF output
    through GDAL (gdal_writer.h:25-54). String columns become fixed-width
    char arrays over an extra string-length dimension."""
    import pandas as pd  # noqa: F401  (type context only)

    n = len(pdf)
    dims = [(dim_name, n)]
    variables = []
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype.kind in "iu":
            v = s.to_numpy()
            if len(v) and (v.max() > 2**31 - 1 or v.min() < -(2**31)):
                # classic NetCDF-3 has no int64 type
                variables.append((str(col), [0], {}, v.astype(np.float64)))
            else:
                variables.append((str(col), [0], {}, v.astype(np.int32)))
        elif s.dtype.kind == "f":
            variables.append((str(col), [0], {}, s.to_numpy(np.float64)))
        else:
            strs = ["" if v is None else str(v) for v in s]
            width = max(1, max((len(x.encode()) for x in strs), default=1))
            dims.append((f"{col}_len", width))
            block = np.zeros((n, width), dtype="S1")
            for i, x in enumerate(strs):
                e = x.encode()[:width]
                block[i, : len(e)] = np.frombuffer(e, dtype="S1")
            variables.append((str(col), [0, len(dims) - 1], {}, block))
    gatts = {"Conventions": "CF-1.6",
             "history": "exactextractr-spark netcdf sink"}

    header = b"CDF\x01" + struct.pack(">I", 0)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm, ln in dims:
        header += _name(nm) + struct.pack(">I", ln)
    header += _attr_list(gatts)

    def _enc(data: np.ndarray) -> bytes:
        if data.dtype.kind == "S":
            return _pad4(data.tobytes())
        return _pad4(data.astype(_DTYPE_NC[data.dtype][2]).tobytes())

    def var_entry(nm, dimids, attrs, data, begin):
        if data.dtype.kind == "S":
            nc_type = _NC_CHAR
        else:
            nc_type = _DTYPE_NC[data.dtype][0]
        vsize = len(_enc(data))
        e = _name(nm)
        e += struct.pack(">I", len(dimids))
        for d in dimids:
            e += struct.pack(">I", d)
        e += _attr_list(attrs)
        e += struct.pack(">III", nc_type, vsize, begin)
        return e, vsize

    probe = struct.pack(">II", _NC_VARIABLE, len(variables))
    sizes = []
    for nm, dimids, attrs, data in variables:
        e, vsize = var_entry(nm, dimids, attrs, data, 0)
        probe += e
        sizes.append(vsize)
    begins = []
    cur = len(header) + len(probe)
    for vsize in sizes:
        begins.append(cur)
        cur += vsize
    vlist = struct.pack(">II", _NC_VARIABLE, len(variables))
    for (nm, dimids, attrs, data), begin in zip(variables, begins):
        e, _ = var_entry(nm, dimids, attrs, data, begin)
        vlist += e
    with open(path, "wb") as f:
        f.write(header)
        f.write(vlist)
        for nm, dimids, attrs, data in variables:
            f.write(_enc(data))
