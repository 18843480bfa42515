"""NetCDF-3 classic sink: grid + table round-trips and the CLI path
(reference parity: the CLI writes netCDF through GDAL, gdal_writer.h:25-54)."""

from __future__ import annotations

import numpy as np
import pytest


def test_netcdf_grid_roundtrip(tmp_path):
    from exactextractr_spark.sources.netcdf import (
        read_netcdf_grid,
        write_netcdf_grid,
    )

    arr = np.arange(24, dtype=np.float64).reshape(4, 6)
    arr[1, 2] = np.nan
    p = str(tmp_path / "g.nc")
    write_netcdf_grid(p, arr, xmin=10, ymax=4, dx=0.5, fill_value=-999.0,
                      units="m", crs="EPSG:3857")
    d = read_netcdf_grid(p)
    assert d["dims"] == {"y": 4, "x": 6}
    assert d["gatts"]["crs"] == "EPSG:3857"
    va, vd = d["vars"]["value"]
    assert va["_FillValue"] == -999.0 and va["units"] == "m"
    want = arr.copy()
    want[1, 2] = -999.0
    np.testing.assert_array_equal(vd, want)
    # cell-center coordinates, y descending
    np.testing.assert_allclose(d["vars"]["y"][1], [3.75, 3.25, 2.75, 2.25])
    np.testing.assert_allclose(d["vars"]["x"][1][:2], [10.25, 10.75])


def test_netcdf_fillvalue_matches_var_type(tmp_path):
    """CF: _FillValue must carry the variable's own NC type — a float32 var
    gets an NC_FLOAT (type 5) fill attribute, not NC_DOUBLE."""
    from exactextractr_spark.sources.netcdf import (
        read_netcdf_grid,
        write_netcdf_grid,
    )

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    arr[0, 1] = np.nan
    p = str(tmp_path / "f32.nc")
    write_netcdf_grid(p, arr, xmin=0, ymax=3, dx=1.0, fill_value=-9.5)
    d = read_netcdf_grid(p)
    va, vd = d["vars"]["value"]
    assert va["_FillValue"].dtype.kind == "f"
    assert va["_FillValue"].dtype.itemsize == 4
    assert float(va["_FillValue"]) == -9.5
    assert vd.dtype.str.endswith("f4")
    assert vd[0, 1] == np.float32(-9.5)
    # raw bytes: the attr's NC type id must be NC_FLOAT(5); scan the header
    # for the attribute name followed by the type word
    buf = open(p, "rb").read()
    i = buf.index(b"_FillValue")
    import struct as _s

    typ = _s.unpack(">I", buf[i + 12 : i + 16])[0]  # name padded to 12
    assert typ == 5  # NC_FLOAT


def test_netcdf_table_roundtrip(tmp_path):
    import pandas as pd

    from exactextractr_spark.sources.netcdf import (
        read_netcdf_grid,
        write_netcdf_table,
    )

    pdf = pd.DataFrame({
        "feature_id": [1, 2, 3],
        "mean": [1.5, 2.5, np.nan],
        "name": ["a", "bb", "ccc"],
        "big": [2**40, 0, 1],  # int64 -> double (no int64 in classic nc3)
    })
    p = str(tmp_path / "t.nc")
    write_netcdf_table(p, pdf)
    d = read_netcdf_grid(p)
    assert d["dims"]["record"] == 3
    assert list(d["vars"]["feature_id"][1]) == [1, 2, 3]
    assert d["vars"]["mean"][1][1] == 2.5 and np.isnan(d["vars"]["mean"][1][2])
    assert d["vars"]["name"][1].tolist() == ["a", "bb", "ccc"]
    assert d["vars"]["big"][1].dtype.kind == "f"
    assert d["vars"]["big"][1][0] == float(2**40)


def test_cli_netcdf_sink(spark, tmp_path):
    from exactextractr_spark.cli import main
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.netcdf import read_netcdf_grid
    from exactextractr_spark.sources.tiles import RasterMeta, tile_table_from_array

    arr = np.arange(1.0, 37.0).reshape(6, 6)
    meta = RasterMeta("v", xmin=0, ymax=6, dx=1, dy=1, width=6, height=6,
                      tile_w=3, tile_h=3)
    tiles_path = str(tmp_path / "tiles")
    tile_table_from_array(spark, arr, meta).write.parquet(tiles_path)
    feats_path = str(tmp_path / "feats")
    features_from_wkt(
        spark, ["POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"]
    ).select("feature_id", "geom").write.parquet(feats_path)
    out_path = str(tmp_path / "out.nc")
    main(["--polys", feats_path, "--tiles", tiles_path,
          "--stat", "m=mean(v)", "--format", "netcdf", "-o", out_path])
    d = read_netcdf_grid(out_path)
    assert d["dims"]["record"] == 1
    assert d["vars"]["m"][1][0] == pytest.approx(26.0)
