"""Shapefile source: an independent spec-driven writer in this file is the
oracle (ESRI Shapefile Technical Description, July 1998) — ring winding,
multi-part records, null shapes, dBASE attributes, .prj CRS detection,
and e2e zonal equivalence against the same geometry given as WKT."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _ring(coords):
    a = np.asarray(coords, dtype="<f8")
    if not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])
    return a


def _cw(coords):
    """Force clockwise (shapefile outer-ring convention)."""
    a = _ring(coords)
    area = 0.5 * np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1])
    return a[::-1] if area > 0 else a


def _ccw(coords):
    a = _ring(coords)
    area = 0.5 * np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1])
    return a[::-1] if area < 0 else a


def _write_shp(path_base, records, shape_type=5):
    """records: list of None (null shape) or list-of-rings (polygons) /
    list-of-lines (polylines). Writes .shp only (+ caller writes .dbf)."""
    recs = []
    for i, rings in enumerate(records, start=1):
        if rings is None:
            content = struct.pack("<i", 0)
        else:
            pts = np.vstack(rings)
            parts = []
            off = 0
            for r in rings:
                parts.append(off)
                off += len(r)
            content = struct.pack("<i", shape_type)
            content += struct.pack(
                "<4d", pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max(),
            )
            content += struct.pack("<ii", len(rings), len(pts))
            content += struct.pack("<" + "i" * len(parts), *parts)
            content += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        recs.append(struct.pack(">ii", i, len(content) // 2) + content)
    body = b"".join(recs)
    all_pts = np.vstack(
        [np.vstack(r) for r in records if r is not None]
    )
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, shape_type)
    header += struct.pack(
        "<4d", all_pts[:, 0].min(), all_pts[:, 1].min(),
        all_pts[:, 0].max(), all_pts[:, 1].max(),
    )
    header += struct.pack("<4d", 0, 0, 0, 0)  # Z/M ranges
    open(path_base + ".shp", "wb").write(header + body)


def _write_dbf(path_base, fields, rows):
    """fields: [(name, 'C'|'N', length, dec)]; rows: list of tuples."""
    fdesc = b""
    rec_size = 1
    for name, ftype, flen, fdec in fields:
        fdesc += (
            name.encode().ljust(11, b"\x00")
            + ftype.encode()
            + b"\x00" * 4
            + bytes([flen, fdec])
            + b"\x00" * 14
        )
        rec_size += flen
    hdr_size = 32 + len(fdesc) + 1
    header = (
        bytes([3, 96, 1, 1])
        + struct.pack("<IHH", len(rows), hdr_size, rec_size)
        + b"\x00" * 20
    )
    body = b""
    for row in rows:
        body += b" "
        for (name, ftype, flen, fdec), v in zip(fields, row):
            if ftype == "N":
                txt = (f"%{flen}.{fdec}f" % v) if fdec else str(int(v))
                body += txt.rjust(flen)[:flen].encode()
            else:
                body += str(v).ljust(flen)[:flen].encode()
    open(path_base + ".dbf", "wb").write(
        header + fdesc + b"\x0d" + body + b"\x1a"
    )


SQ = [(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5)]


def test_polygon_with_hole_and_null(spark, tmp_path):
    from exactextractr_spark.core.geom import from_wkb
    from exactextractr_spark.sources.shapefile import read_shapefile

    base = str(tmp_path / "t")
    outer = _cw([(0, 0), (4, 0), (4, 4), (0, 4)])
    hole = _ccw([(1, 1), (2, 1), (2, 2), (1, 2)])
    _write_shp(base, [[outer, hole], None, [_cw(SQ)]])
    _write_dbf(base, [("NAME", "C", 8, 0), ("VAL", "N", 10, 2)],
               [("withhole", 1.5), ("nullrec", 0.0), ("square", 2.25)])
    feats, attrs = read_shapefile(spark, base + ".shp", keep_cols=["NAME", "VAL"])
    rows = {r["feature_id"]: r for r in feats.collect()}
    # null shape dropped -> records 1 and 3 remain
    assert set(rows) == {1, 3}
    g = from_wkb(bytes(rows[1]["geom"]))
    assert g.kind == "Polygon"
    polys = g.polygons()
    assert len(polys) == 1
    assert len(polys[0]) == 2  # exterior + one hole
    assert rows[1]["fxmin"] == 0.0 and rows[1]["fymax"] == 4.0
    a = {r["feature_id"]: r for r in attrs.collect()}
    assert a[1]["NAME"] == "withhole" and a[3]["VAL"] == pytest.approx(2.25)


def test_multi_outer_hole_assignment(spark, tmp_path):
    """Two disjoint outers + one hole: the hole must attach to the outer
    that contains it (point-in-ring), producing a MultiPolygon whose area
    semantics match the equivalent WKT under the zonal kernel."""
    from exactextractr_spark.operators.zonal import exact_extract
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.shapefile import read_shapefile
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    base = str(tmp_path / "m")
    o1 = _cw([(0, 0), (3, 0), (3, 3), (0, 3)])
    hole = _ccw([(1, 1), (2, 1), (2, 2), (1, 2)])
    o2 = _cw([(4, 0), (6, 0), (6, 2), (4, 2)])
    _write_shp(base, [[o1, o2, hole]])
    feats = read_shapefile(spark, base + ".shp")

    meta = RasterMeta("v", xmin=0, ymax=6, dx=1, dy=1, width=6, height=6,
                      tile_w=6, tile_h=6)
    r = Raster.from_array(spark, np.ones((6, 6)), meta)
    got = exact_extract(r, feats, ["count"]).collect()[0]["count"]
    wkt = ("MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0), "
           "(1 1, 1 2, 2 2, 2 1, 1 1)), "
           "((4 0, 6 0, 6 2, 4 2, 4 0)))")
    want = exact_extract(
        r, features_from_wkt(spark, [wkt]), ["count"]
    ).collect()[0]["count"]
    assert got == pytest.approx(want)  # 9 - 1 + 4 = 12
    assert got == pytest.approx(12.0)


def test_polyline_and_id_col(spark, tmp_path):
    from exactextractr_spark.core.geom import from_wkb
    from exactextractr_spark.sources.shapefile import read_shapefile

    base = str(tmp_path / "l")
    line = np.array([(0.0, 0.0), (3.0, 3.0)])
    two = [np.array([(0.0, 1.0), (2.0, 1.0)]), np.array([(0.0, 2.0), (2.0, 2.0)])]
    _write_shp(base, [[line], two], shape_type=3)
    _write_dbf(base, [("FID", "N", 6, 0)], [(101,), (202,)])
    feats = read_shapefile(spark, base + ".shp", id_col="FID")
    rows = {r["feature_id"]: r for r in feats.collect()}
    assert set(rows) == {101, 202}
    assert from_wkb(bytes(rows[101]["geom"])).kind == "LineString"
    assert from_wkb(bytes(rows[202]["geom"])).kind == "MultiLineString"


def test_prj_crs_detection(spark, tmp_path):
    from exactextractr_spark.sources.shapefile import read_shapefile

    base = str(tmp_path / "p")
    _write_shp(base, [[_cw(SQ)]])
    open(base + ".prj", "w").write(
        'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
        'AUTHORITY["EPSG","6326"]],AUTHORITY["EPSG","4326"]],'
        'UNIT["metre",1],AUTHORITY["EPSG","32633"]]'
    )
    feats = read_shapefile(spark, base + ".shp")
    assert feats.collect()[0]["crs"] == "EPSG:32633"
    # ESRI-style GCS name without AUTHORITY
    base2 = str(tmp_path / "p2")
    _write_shp(base2, [[_cw(SQ)]])
    open(base2 + ".prj", "w").write(
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["Degree",0.0174532925199433]]'
    )
    feats2 = read_shapefile(spark, base2 + ".shp")
    assert feats2.collect()[0]["crs"] == "EPSG:4326"


def test_zonal_equivalence_vs_wkt(spark, tmp_path):
    """The reference testthat square through a shapefile == the same
    square as WKT, bit-for-bit."""
    from exactextractr_spark.operators.zonal import exact_extract
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.shapefile import read_shapefile
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    base = str(tmp_path / "z")
    _write_shp(base, [[_cw(SQ)]])
    feats = read_shapefile(spark, base + ".shp")
    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    r = Raster.from_array(
        spark, np.arange(1.0, 10.0).reshape(3, 3), meta
    )
    got = exact_extract(r, feats, ["count", "sum", "mean"]).collect()[0]
    want = exact_extract(
        r,
        features_from_wkt(
            spark, ["POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"]
        ),
        ["count", "sum", "mean"],
    ).collect()[0]
    for c in ("count", "sum", "mean"):
        assert got[c] == want[c]


def test_write_shapefile_roundtrip_and_byteparity(spark, tmp_path):
    """write_shapefile -> read_shapefile round-trip preserves geometry
    semantics and attributes; and re-writing a file produced by the
    INDEPENDENT test writer reproduces its .shp byte-for-byte (same
    winding, closure and part order)."""
    import pandas as pd

    from exactextractr_spark.sources.shapefile import (
        _parse_shp,
        read_shapefile,
        write_shapefile,
    )

    base = str(tmp_path / "orig")
    outer = _cw([(0, 0), (4, 0), (4, 4), (0, 4)])
    hole = _ccw([(1, 1), (2, 1), (2, 2), (1, 2)])
    _write_shp(base, [[outer, hole], [_cw(SQ)]])
    recs = _parse_shp(base + ".shp")
    geoms = {rn: wkb for rn, wkb in recs}
    attrs = pd.DataFrame(
        {"feature_id": [1, 2], "mean": [1.5, 2.5], "label": ["a", "b"]}
    )
    out_base = str(tmp_path / "ours")
    write_shapefile(out_base, attrs, geoms, crs="EPSG:4326")
    # byte parity of the geometry stream with the independent writer
    assert (
        open(out_base + ".shp", "rb").read()
        == open(base + ".shp", "rb").read()
    )
    # .shx exists and indexes both records
    import struct as _s

    shx = open(out_base + ".shx", "rb").read()
    assert len(shx) == 100 + 8 * 2
    off0, len0 = _s.unpack(">ii", shx[100:108])
    assert off0 == 50  # first record right after the header
    # round-trip through the reader: attrs + crs + zonal-relevant fields
    feats, battrs = read_shapefile(
        spark, out_base + ".shp", keep_cols=["mean", "label"]
    )
    rows = {r["feature_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["crs"] == "EPSG:4326"
    assert rows[1]["fxmax"] == 4.0 and rows[2]["fxmin"] == 0.5
    a = {r["feature_id"]: r for r in battrs.collect()}
    assert a[1]["label"] == "a" and a[2]["mean"] == pytest.approx(2.5)


def test_cli_shp_sink(spark, tmp_path):
    from exactextractr_spark.cli import main
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.shapefile import read_shapefile
    from exactextractr_spark.sources.tiles import (
        RasterMeta,
        tile_table_from_array,
    )

    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    tiles_path = str(tmp_path / "tiles")
    tile_table_from_array(spark, arr, meta).write.parquet(tiles_path)
    feats_path = str(tmp_path / "feats")
    features_from_wkt(
        spark, ["POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"]
    ).select("feature_id", "geom").write.parquet(feats_path)
    out = str(tmp_path / "res.shp")
    main(["--polys", feats_path, "--tiles", tiles_path,
          "--stat", "m=mean(v)", "--format", "shp", "-o", out])
    feats, attrs = read_shapefile(spark, out, id_col="FID", keep_cols=["m"])
    assert feats.count() == 1
    assert attrs.collect()[0]["m"] == pytest.approx(5.0)


def _make_dbf(fields, rows):
    """Hand-built dBASE III file: fields = [(name, type, len, dec)],
    rows = list of (deleted: bool, [raw field strings])."""
    import struct as _s

    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    out = bytearray(
        bytes([3, 96, 1, 1]) + _s.pack("<IHH", len(rows), hdr_size, rec_size)
        + b"\x00" * 20
    )
    for name, ftype, flen, fdec in fields:
        out += (name.encode().ljust(11, b"\x00") + ftype.encode()
                + b"\x00" * 4 + bytes([flen, fdec]) + b"\x00" * 14)
    out += b"\x0d"
    for deleted, vals in rows:
        out += b"*" if deleted else b" "
        for (name, ftype, flen, fdec), v in zip(fields, vals):
            out += v.rjust(flen)[:flen].encode()
    out += b"\x1a"
    return bytes(out)


def test_dbf_exponent_notation_and_deleted_rows(tmp_path):
    """Wide N fields some writers fill with exponent notation ('1E+10')
    must parse (as float), and deleted records must stay as null
    placeholders so record-number alignment with the .shp holds."""
    from exactextractr_spark.sources.shapefile import _parse_dbf

    fields = [("BIGNUM", "N", 18, 0), ("PLAIN", "N", 8, 0)]
    rows = [
        (False, ["1E+10", "7"]),
        (True, ["999", "999"]),          # deleted
        (False, ["12345", "8"]),
    ]
    p = str(tmp_path / "t.dbf")
    open(p, "wb").write(_make_dbf(fields, rows))
    df = _parse_dbf(p)
    assert len(df) == 3                   # deleted row kept as placeholder
    assert df["BIGNUM"][0] == 1e10        # exponent fallback -> float
    assert df["PLAIN"][0] == 7
    assert df["BIGNUM"][1] is None or df["BIGNUM"][1] != df["BIGNUM"][1]
    assert df["BIGNUM"][2] == 12345


def test_prj_real_wkt_roundtrip(spark, tmp_path):
    """The sink's .prj now carries real PROJECTION/PARAMETER WKT; our own
    AUTHORITY-based reader recovers the EPSG code, and the WKT contains
    the actual projection parameters (not a hollow PROJCS)."""
    import pandas as pd

    from exactextractr_spark.sources.shapefile import (
        _crs_from_prj,
        write_shapefile,
    )

    import os

    from exactextractr_spark.sources.shapefile import _parse_shp

    base = str(tmp_path / "utm")
    attrs = pd.DataFrame({"feature_id": [1]})
    _write_shp(base, [[_cw(SQ)]])
    geoms = {rn: wkb for rn, wkb in _parse_shp(base + ".shp")}
    out = str(tmp_path / "out")
    write_shapefile(out, attrs, geoms, crs="EPSG:32633")
    wkt = open(out + ".prj").read()
    assert 'PROJECTION["Transverse_Mercator"]' in wkt
    assert 'PARAMETER["central_meridian",15]' in wkt
    assert 'PARAMETER["scale_factor",0.9996]' in wkt
    assert _crs_from_prj(out + ".prj") == "EPSG:32633"
    # a CRS with no faithful WKT definition omits the .prj entirely
    out2 = str(tmp_path / "none")
    write_shapefile(out2, attrs, geoms, crs="EPSG:99999")
    assert not os.path.exists(out2 + ".prj")
