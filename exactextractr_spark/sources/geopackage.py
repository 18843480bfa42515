"""GeoPackage (.gpkg) vector source — stdlib sqlite3, no GDAL/OGR.

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
