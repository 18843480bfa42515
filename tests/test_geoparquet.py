"""GeoParquet source: footer 'geo' metadata (primary column, WKB encoding,
PROJJSON CRS) written by pyarrow directly per the OGC spec — then the
ordinary distributed parquet scan + WKB normalization."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SQ_WKT = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"


def _wkb_square(x0, y0, x1, y1):
    import struct

    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    out = struct.pack("<BIII", 1, 3, 1, len(ring))
    for x, y in ring:
        out += struct.pack("<dd", x, y)
    return out


def _write_geoparquet(path, ids, wkbs, crs_json, extra=None,
                      geom_col="geometry"):
    cols = {"feature_id": pa.array(ids, pa.int64()),
            geom_col: pa.array(wkbs, pa.binary())}
    if extra:
        for k, v in extra.items():
            cols[k] = pa.array(v)
    geo = {
        "version": "1.0.0",
        "primary_column": geom_col,
        "columns": {geom_col: {"encoding": "WKB", "crs": crs_json,
                               "geometry_types": ["Polygon"]}},
    }
    t = pa.table(cols)
    t = t.replace_schema_metadata({b"geo": json.dumps(geo).encode()})
    pq.write_table(t, path)


def test_read_geoparquet_crs_and_zonal_parity(spark, tmp_path):
    from exactextractr_spark.operators.zonal import exact_extract
    from exactextractr_spark.sources.features import (
        features_from_wkt,
        read_geoparquet,
    )
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    p = str(tmp_path / "f.parquet")
    crs = {"id": {"authority": "EPSG", "code": 4326}}
    _write_geoparquet(p, [7], [_wkb_square(0.5, 0.5, 2.5, 2.5)], crs,
                      extra={"name": ["sq"]})
    feats, attrs = read_geoparquet(spark, p, keep_cols=["name"])
    row = feats.collect()[0]
    assert row["feature_id"] == 7 and row["crs"] == "EPSG:4326"
    assert attrs.collect()[0]["name"] == "sq"

    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    r = Raster.from_array(spark, np.arange(1.0, 10.0).reshape(3, 3), meta)
    got = exact_extract(r, feats, ["count", "sum"]).collect()[0]
    want = exact_extract(
        r, features_from_wkt(spark, [SQ_WKT]), ["count", "sum"]
    ).collect()[0]
    assert got["count"] == want["count"] and got["sum"] == want["sum"]


def test_geoparquet_crs84_default_and_errors(spark, tmp_path):
    from exactextractr_spark.sources.features import read_geoparquet

    # null crs -> spec default OGC:CRS84 == EPSG:4326
    p = str(tmp_path / "d.parquet")
    _write_geoparquet(p, [1], [_wkb_square(0, 0, 1, 1)], None)
    assert read_geoparquet(spark, p).collect()[0]["crs"] == "EPSG:4326"
    # OGC:CRS84 explicit
    p2 = str(tmp_path / "c.parquet")
    _write_geoparquet(p2, [1], [_wkb_square(0, 0, 1, 1)],
                      {"id": {"authority": "OGC", "code": "CRS84"}})
    assert read_geoparquet(spark, p2).collect()[0]["crs"] == "EPSG:4326"
    # non-geo parquet refuses with guidance
    import pandas as pd

    plain = str(tmp_path / "plain.parquet")
    pd.DataFrame({"a": [1]}).to_parquet(plain)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(spark, plain)


def test_cli_geoparquet_autodetect(spark, tmp_path):
    from exactextractr_spark.cli import main
    from exactextractr_spark.sources.tiles import (
        RasterMeta,
        tile_table_from_array,
    )

    arr = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
    meta = RasterMeta("v", xmin=0, ymax=3, dx=1, dy=1, width=3, height=3,
                      tile_w=3, tile_h=3)
    tiles_path = str(tmp_path / "tiles")
    tile_table_from_array(spark, arr, meta).write.parquet(tiles_path)
    polys = str(tmp_path / "polys.parquet")
    _write_geoparquet(polys, [1], [_wkb_square(0.5, 0.5, 2.5, 2.5)],
                      {"id": {"authority": "EPSG", "code": 4326}})
    out = str(tmp_path / "out")
    main(["--polys", polys, "--tiles", tiles_path,
          "--stat", "m=mean(v)", "-o", out])
    row = spark.read.parquet(out).collect()[0]
    assert row["m"] == pytest.approx(5.0)
