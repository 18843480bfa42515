"""GeoPackage (.gpkg) vector source AND sink — stdlib sqlite3, no GDAL/OGR.

The reference reads features through sf/OGR (``R/exact_extract.R:450``,
vignettes read ``inst/sao_miguel/concelhos.gpkg``). A GeoPackage is a
SQLite database (OGC GeoPackage 1.x): feature tables are registered in
``gpkg_geometry_columns``/``gpkg_contents`` and each geometry value is a
GPB blob — an 8-byte header (magic ``GP``, version, flags, srs_id) plus an
optional envelope, followed by standard WKB — which the existing WKB
parser consumes directly.

The sqlite read happens on the driver (feature tables are the small side
of a zonal join; the reference also materializes them in memory via sf)
and lands in Spark as ONE Arrow-backed LocalTableScan — no python-RDD
slices, same rule as ``features_from_wkt``.
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .features import prepare_features


def _strip_gpb(blob: bytes) -> bytes:
    """GPB header -> the WKB payload (GeoPackage spec §2.1.3)."""
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (bad GP magic)")
    flags = blob[3]
    env = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env)
    if env_len is None:
        raise ValueError(f"invalid GPB envelope indicator {env}")
    if flags & 0x20:
        raise ValueError("extended GPB geometries not supported")
    return blob[8 + env_len :]


def list_feature_tables(path: str) -> "list[tuple[str, str, int]]":
    """(table, geometry_column, srs_id) for every feature table."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [
            (t, g, int(s))
            for t, g, s in con.execute(
                "SELECT table_name, column_name, srs_id FROM gpkg_geometry_columns"
            )
        ]
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    *,
    id_col: str | None = None,
    keep_cols: "list[str] | None" = None,
) -> DataFrame:
    """Read a GeoPackage feature table into the normalized feature shape
    (feature_id, geom WKB, fxmin..fymax, crs) ready for ``exact_extract``.

    ``id_col`` defaults to the table's integer primary key (``fid``).
    With ``keep_cols`` the return is a tuple ``(features, attrs)`` where
    ``attrs`` is (feature_id, *keep_cols) for ``append_cols`` /
    ``include_cols`` joins.
    """
    tables = list_feature_tables(path)
    if not tables:
        raise ValueError(f"{path}: no feature tables in gpkg_geometry_columns")
    if table is None:
        if len(tables) > 1:
            raise ValueError(
                f"{path} has multiple feature tables "
                f"{[t for t, _, _ in tables]}; pass table="
            )
        table, geom_col, srs = tables[0]
    else:
        match = [t for t in tables if t[0] == table]
        if not match:
            raise ValueError(f"{path}: no feature table {table!r}")
        _, geom_col, srs = match[0]

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if id_col is None:
            # the declared integer primary key (GPKG requires one)
            pk = [
                r[1]
                for r in con.execute(f'PRAGMA table_info("{table}")')
                if r[5] == 1
            ]
            id_col = pk[0] if pk else "fid"
        cols = f'"{id_col}", "{geom_col}"'
        if keep_cols:
            cols += ", " + ", ".join(f'"{c}"' for c in keep_cols)
        rows = con.execute(f'SELECT {cols} FROM "{table}"').fetchall()
    finally:
        con.close()

    pdf = pd.DataFrame(
        {
            "feature_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "geom": [_strip_gpb(r[1]) for r in rows],
        }
    )
    if keep_cols:
        for i, c in enumerate(keep_cols, start=2):
            pdf[c] = [r[i] for r in rows]
    df = spark.createDataFrame(pdf)
    crs = f"EPSG:{srs}" if srs > 0 else None
    feats = prepare_features(df, "feature_id", "geom", crs=crs)
    if keep_cols:
        attrs = df.select("feature_id", *keep_cols)
        return feats, attrs
    return feats


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

_WGS84_DEF = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)

_WKB_TYPE_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON",
    4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def _wkb_geom_type(wkb: bytes) -> int:
    if len(wkb) < 5:
        return 0
    import struct as _s

    little = wkb[0] == 1
    (t,) = _s.unpack("<I" if little else ">I", wkb[1:5])
    return int(t & 0xFF)  # mask EWKB SRID/Z/M flag bits


def _gpb_wrap(wkb: bytes, srs_id: int, env: "tuple | None") -> bytes:
    """WKB -> GPB blob (GeoPackage spec §2.1.3): little-endian header,
    32-byte XY envelope when provided."""
    flags = 0x01 | ((0x01 if env is not None else 0x00) << 1)
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    if env is not None:
        xmin, ymin, xmax, ymax = env
        head += struct.pack("<4d", xmin, xmax, ymin, ymax)
    return head + wkb


def _sql_type(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u", "b"):
        return "INTEGER"
    if k == "f":
        return "REAL"
    return "TEXT"


def write_gpkg(
    path: str,
    attrs: pd.DataFrame,
    geoms: "dict[int, bytes]",
    *,
    table: str = "features",
    srs_id: int = 4326,
    envelopes: "dict[int, tuple] | None" = None,
) -> None:
    """Write a GeoPackage feature table (reference parity: the CLI writes
    any OGR format through GDALWriter, src/exactextract/src/gdal_writer.h:
    25-54; GPKG is the natural round-trip sink for the GPKG source above).

    ``attrs`` must contain ``feature_id``; every other column becomes an
    attribute (INTEGER/REAL/TEXT by dtype). ``geoms`` maps feature_id ->
    WKB. Envelope per feature is taken from ``envelopes`` or computed from
    the parsed geometry. Creates the required gpkg_spatial_ref_sys,
    gpkg_contents and gpkg_geometry_columns entries and stamps the GPKG
    application_id, so external readers recognize the file."""
    import os

    from ..core.geom import from_wkb

    if "feature_id" not in attrs.columns:
        raise ValueError("attrs must contain a feature_id column")
    if os.path.exists(path):
        os.remove(path)
    ids = list(attrs["feature_id"])
    missing = [i for i in ids if i not in geoms]
    if missing:
        raise ValueError(f"no geometry for feature_id(s) {missing[:5]}")
    envs = {}
    for i in ids:
        if envelopes is not None and i in envelopes:
            envs[i] = tuple(envelopes[i])
        else:
            envs[i] = from_wkb(geoms[i]).bounds()
    gtypes = {_wkb_geom_type(geoms[i]) for i in ids}
    gname = (
        _WKB_TYPE_NAMES[next(iter(gtypes))]
        if len(gtypes) == 1 and next(iter(gtypes)) in _WKB_TYPE_NAMES
        else "GEOMETRY"
    )
    attr_cols = [c for c in attrs.columns if c != "feature_id"]
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")  # GeoPackage 1.3
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        srs_rows = [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            ("WGS 84", 4326, "EPSG", 4326, _WGS84_DEF, None),
        ]
        if srs_id not in (-1, 0, 4326):
            srs_rows.append(
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, "undefined", None)
            )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", srs_rows
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY "
            "KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
            "description TEXT DEFAULT '', last_change DATETIME NOT NULL "
            "DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, "
            "min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
            "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
            "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT "
            "NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, "
            "column_name))"
        )
        col_defs = "".join(
            f', "{c}" {_sql_type(attrs[c].dtype)}' for c in attr_cols
        )
        con.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT,'
            f" geom BLOB{col_defs})"
        )
        rows = []
        for _, r in attrs.iterrows():
            fid = int(r["feature_id"])
            vals = []
            for c in attr_cols:
                v = r[c]
                if v is None or (isinstance(v, float) and v != v):
                    vals.append(None)
                elif _sql_type(attrs[c].dtype) == "INTEGER":
                    vals.append(int(v))
                elif _sql_type(attrs[c].dtype) == "REAL":
                    vals.append(float(v))
                else:
                    vals.append(str(v))
            rows.append(
                (fid, _gpb_wrap(geoms[fid], srs_id, envs[fid]), *vals)
            )
        ph = ",".join("?" * (2 + len(attr_cols)))
        con.executemany(f'INSERT INTO "{table}" VALUES ({ph})', rows)
        xs0 = min(envs[i][0] for i in ids) if ids else None
        ys0 = min(envs[i][1] for i in ids) if ids else None
        xs1 = max(envs[i][2] for i in ids) if ids else None
        ys1 = max(envs[i][3] for i in ids) if ids else None
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (table, "features", table, xs0, ys0, xs1, ys1, srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (table, "geom", gname, srs_id),
        )
        con.commit()
    finally:
        con.close()
