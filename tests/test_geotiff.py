"""GeoTIFF + GeoPackage sources: synthetic round-trips (every supported
compression/layout, written by an independent encoder in this file) and
parity against the reference's bundled rasters/vectors
(``inst/sao_miguel``, the vignette vig1_population.Rmd inputs)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

SAO = "/root/reference/inst/sao_miguel"


# ---------------------------------------------------------------------------
# minimal independent TIFF writer (test-side oracle for the reader)
# ---------------------------------------------------------------------------

def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW encoder (MSB-first, early change)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w], width)
            table[wc] = next_code
            next_code += 1
            # Early change, encoder side: the encoder's table is one entry
            # ahead of the decoder's, so it widens at 2^width where the
            # decoder widens at 2^width - 1 (libtiff/JDK parity — our
            # streams decode under the JDK-validated decoder threshold).
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code >= 4094:  # reset before overflow
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


def _packbits_encode(data: bytes) -> bytes:
    # trivial literal-only encoding (runs of <=128 literals) — valid stream
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _write_tiff(
    path: str,
    arr: np.ndarray,
    *,
    compression: int = 1,
    tiled: bool = False,
    tile: int = 16,
    rows_per_strip: int = 4,
    big: bool = False,
    nodata: float | None = None,
    xmin: float = 10.0,
    ymax: float = 20.0,
    scale: float = 0.5,
    epsg: int = 4326,
    planar: int = 1,
):
    """Strip/tile single-band float64->float32 or int writer, classic or
    BigTIFF, little-endian. A 3-D (bands, h, w) array with ``planar=2``
    writes PlanarConfiguration=2: all of plane 0's strips, then plane 1's
    (TIFF 6.0 §PlanarConfiguration)."""
    if arr.dtype == np.float64:
        arr = arr.astype(np.float32)
    nbands = 1
    if arr.ndim == 3:
        assert planar == 2 and not tiled
        nbands, h, w = arr.shape
    else:
        h, w = arr.shape
    if arr.dtype == np.float32:
        bps, fmt = 32, 3
    elif arr.dtype == np.uint8:
        bps, fmt = 8, 1
    elif arr.dtype == np.int16:
        bps, fmt = 16, 2
    else:
        raise ValueError(arr.dtype)

    def compress(b: bytes) -> bytes:
        if compression == 1:
            return b
        if compression == 8:
            return zlib.compress(b)
        if compression == 5:
            return _lzw_encode(b)
        if compression == 32773:
            return _packbits_encode(b)
        raise ValueError(compression)

    chunks = []
    if tiled:
        tw = th = tile
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                block = np.zeros((th, tw), dtype=arr.dtype)
                sub = arr[r0 : r0 + th, c0 : c0 + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(compress(block.tobytes()))
    elif planar == 2:
        for b in range(nbands):  # all of plane b's strips, then plane b+1
            for r0 in range(0, h, rows_per_strip):
                chunks.append(compress(arr[b, r0 : r0 + rows_per_strip].tobytes()))
    else:
        for r0 in range(0, h, rows_per_strip):
            chunks.append(compress(arr[r0 : r0 + rows_per_strip].tobytes()))

    geokeys = (1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, epsg)
    nod = f"{nodata}".encode() + b"\x00" if nodata is not None else None

    entries = []  # (tag, type, count, payload bytes or ints)
    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(256, 3, [w])
    add(257, 3, [h])
    add(258, 3, [bps])
    add(259, 3, [compression])
    add(262, 3, [1])
    if tiled:
        add(322, 3, [tile])
        add(323, 3, [tile])
    else:
        add(278, 3, [rows_per_strip])
    add(277, 3, [nbands])
    if planar == 2:
        add(284, 3, [2])
    add(339, 3, [fmt])
    add(33550, 12, [scale, scale, 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, xmin, ymax, 0.0])
    add(34735, 3, list(geokeys))
    if nod is not None:
        add(42113, 2, nod)

    bo = "<"
    if big:
        header_sz = 16
        entry_sz, cnt_fmt, inline, magic = 20, "Q", 8, 43
    else:
        header_sz = 8
        entry_sz, cnt_fmt, inline, magic = 12, "I", 4, 42

    # layout: header | chunk data | external tag data | IFD
    data_off = header_sz
    chunk_offsets = []
    body = bytearray()
    for c in chunks:
        chunk_offsets.append(data_off + len(body))
        body += c
    add(324 if tiled else 273, 16 if big else 4, chunk_offsets)
    add(325 if tiled else 279, 16 if big else 4, [len(c) for c in chunks])
    entries.sort(key=lambda e: e[0])

    TYPE_FMT = {3: "H", 4: "I", 12: "d", 16: "Q", 2: None}
    ext = bytearray()
    ifd_entries = []
    ifd_off_guess = None  # two-pass: first compute sizes
    # serialize payloads
    payloads = []
    for tag, typ, vals in entries:
        if typ == 2:
            pay = bytes(vals)
            cnt = len(pay)
        else:
            f = TYPE_FMT[typ]
            pay = struct.pack(bo + f * len(vals), *vals)
            cnt = len(vals)
        payloads.append((tag, typ, cnt, pay))
    ext_base = data_off + len(body)
    ext_cursor = 0
    for tag, typ, cnt, pay in payloads:
        if len(pay) <= inline:
            val_field = pay + b"\x00" * (inline - len(pay))
        else:
            val_field = struct.pack(bo + cnt_fmt, ext_base + ext_cursor)
            ext += pay
            ext_cursor += len(pay)
        ifd_entries.append(
            struct.pack(bo + "HH" + cnt_fmt, tag, typ, cnt) + val_field
        )
    ifd_off = ext_base + len(ext)
    with open(path, "wb") as f:
        if big:
            f.write(b"II" + struct.pack(bo + "HHHQ", 43, 8, 0, ifd_off))
        else:
            f.write(b"II" + struct.pack(bo + "HI", 42, ifd_off))
        f.write(body)
        f.write(ext)
        if big:
            f.write(struct.pack(bo + "Q", len(ifd_entries)))
        else:
            f.write(struct.pack(bo + "H", len(ifd_entries)))
        for e in ifd_entries:
            f.write(e)
        f.write(struct.pack(bo + cnt_fmt, 0))  # next IFD


def _collect_array(raster) -> np.ndarray:
    """Reassemble the full pixel array from a distributed Raster."""
    m = raster.meta
    out = np.full((m.height, m.width), np.nan)
    for row in raster.tiles.collect():
        r0 = row["tile_row"] * m.tile_h
        c0 = row["tile_col"] * m.tile_w
        px = np.asarray(row["px"]).reshape(row["nrows"], row["ncols"])
        out[r0 : r0 + row["nrows"], c0 : c0 + row["ncols"]] = px
    return out


@pytest.mark.parametrize(
    "compression,tiled,big",
    [
        (1, False, False),
        (8, False, False),
        (5, False, False),
        (32773, False, False),
        (8, True, False),
        (5, True, False),
        (8, False, True),
    ],
    ids=["none", "deflate", "lzw", "packbits", "tiled-deflate", "tiled-lzw",
         "bigtiff"],
)
def test_geotiff_roundtrip(spark, tmp_path, compression, tiled, big):
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    rng = np.random.default_rng(3)
    arr = np.round(rng.uniform(0, 100, (37, 53)), 2).astype(np.float32)
    p = str(tmp_path / "t.tif")
    _write_tiff(p, arr, compression=compression, tiled=tiled, big=big)
    info = read_tiff_info(p)
    assert (info.width, info.height) == (53, 37)
    assert info.crs == "EPSG:4326"
    assert info.dx == 0.5 and info.xmin == 10.0 and info.ymax == 20.0
    r = read_geotiff(spark, p)
    got = _collect_array(r)
    np.testing.assert_array_equal(got, arr.astype(np.float64))


def test_geotiff_nodata_and_int(spark, tmp_path):
    from exactextractr_spark.sources.geotiff import read_geotiff

    arr = (np.arange(64, dtype=np.int64) % 7).reshape(8, 8).astype(np.uint8)
    p = str(tmp_path / "n.tif")
    _write_tiff(p, arr, compression=8, nodata=5.0)
    r = read_geotiff(spark, p)
    got = _collect_array(r)
    want = arr.astype(np.float64)
    want[want == 5.0] = np.nan
    np.testing.assert_array_equal(got, want)
    assert r.meta.nodata == 5.0


def test_lzw_against_reference_bitstreams():
    """Decoder vs the independent encoder on adversarial inputs (KwKwK
    pattern, width changes, dictionary reset)."""
    from exactextractr_spark.sources.geotiff import _lzw_decode

    cases = [
        b"",
        b"a",
        b"ababababababab" * 50,  # KwKwK chains
        bytes(range(256)) * 30,  # forces width growth + reset
        np.random.default_rng(1).integers(0, 4, 20000).astype(np.uint8).tobytes(),
    ]
    for c in cases:
        assert _lzw_decode(_lzw_encode(c)) == c
    # random bytes large enough to force a dictionary reset mid-stream
    rnd = np.random.default_rng(2).integers(0, 256, 20000).astype(np.uint8)
    assert _lzw_decode(_lzw_encode(rnd.tobytes())) == rnd.tobytes()


def test_lzw_external_writer_fixtures():
    """Decode LZW TIFFs produced by an EXTERNAL writer (JDK ImageIO, libtiff
    semantics), pinned in tests/fixtures (generator: fixtures/WriteLzw.java).
    Guards the early-change width-bump threshold: the table crosses
    511/1023/2047 entries and (lcg case) the 4094-entry dictionary reset —
    a decoder that bumps one code early fails all non-constant cases."""
    import os

    from exactextractr_spark.sources.geotiff import (
        _decompress,
        read_tiff_info,
    )

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")

    def decode_all(path, info):
        rows = []
        with open(path, "rb") as f:
            for i, (off, cnt) in enumerate(zip(info.offsets, info.counts)):
                f.seek(off)
                data = _decompress(f.read(cnt), info.compression)
                nr = min(info.chunk_h, info.height - i * info.chunk_h)
                rows.append(
                    np.frombuffer(data, dtype=np.uint8)[: nr * info.width]
                    .reshape(nr, info.width)
                )
        return np.vstack(rows)

    # same LCG as WriteLzw.java
    def lcg(w, h):
        s = 12345
        out = np.empty(w * h, dtype=np.uint8)
        for i in range(w * h):
            s = (s * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
            out[i] = (s >> 33) & 0xFF
        return out.reshape(h, w)

    cases = {
        "jdk_lzw_lcg.tif": lcg(101, 73),
        "jdk_lzw_ramp.tif": (np.arange(64 * 40) % 256)
        .astype(np.uint8)
        .reshape(40, 64),
        "jdk_lzw_const.tif": np.full((30, 50), 7, np.uint8),
    }
    for name, expected in cases.items():
        path = os.path.join(fixdir, name)
        info = read_tiff_info(path)
        assert info.compression == 5
        np.testing.assert_array_equal(decode_all(path, info), expected)


def test_lzw_stream_readable_by_external_decoder(tmp_path):
    """Our test encoder's streams must decode under an external decoder
    (JDK ImageIO) — guards against a mirrored encoder/decoder off-by-one
    validating itself. Skipped when no JDK is on PATH."""
    import shutil
    import struct as _struct
    import subprocess

    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("no JDK available")
    rng = np.random.default_rng(7)
    arr = np.round(rng.uniform(0, 100, (83, 97)), 2).astype(np.float32)
    tif = str(tmp_path / "ours_lzw.tif")
    _write_tiff(tif, arr, compression=5)
    src = tmp_path / "ReadTiff.java"
    src.write_text(
        "import javax.imageio.*;import java.awt.image.*;import java.io.*;"
        "public class ReadTiff{public static void main(String[]a)throws Exception{"
        "BufferedImage i=ImageIO.read(new File(a[0]));Raster r=i.getRaster();"
        "int w=r.getWidth(),h=r.getHeight();DataOutputStream o=new DataOutputStream("
        "new BufferedOutputStream(new FileOutputStream(a[1])));"
        "o.writeInt(w);o.writeInt(h);for(int y=0;y<h;y++)for(int x=0;x<w;x++)"
        "o.writeDouble(r.getSampleDouble(x,y,0));o.close();}}"
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path)
    out = str(tmp_path / "px.raw")
    subprocess.run(
        ["java", "-cp", str(tmp_path), "ReadTiff", tif, out], check=True
    )
    raw = open(out, "rb").read()
    w, h = _struct.unpack(">ii", raw[:8])
    assert (w, h) == (97, 83)
    got = np.frombuffer(raw[8:], dtype=">f8").reshape(h, w)
    np.testing.assert_array_equal(got, arr.astype(np.float64))


@pytest.mark.skipif(not os.path.isdir(SAO), reason="reference data not present")
def test_reference_rasters_parse():
    """Header parity on the reference's bundled rasters
    (inst/sao_miguel, read by vignettes/vig1_population.Rmd)."""
    from exactextractr_spark.sources.geotiff import read_tiff_info

    clc = read_tiff_info(f"{SAO}/clc2018_v2020_20u1.tif")
    assert (clc.width, clc.height) == (3840, 1920)
    assert clc.crs == "EPSG:4326"
    assert clc.nodata == -128.0
    dem = read_tiff_info(f"{SAO}/eu_dem_v11.tif")
    assert (dem.width, dem.height) == (384, 192)
    assert dem.sample_format == 3 and dem.bps == 32
    pop = read_tiff_info(f"{SAO}/gpw_v411_2020_count_2020.tif")
    assert (pop.width, pop.height) == (96, 48)
    assert pop.xmin == pytest.approx(-25.9, abs=1e-9)
    assert pop.ymax == pytest.approx(38.0, abs=1e-9)


@pytest.mark.skipif(not os.path.isdir(SAO), reason="reference data not present")
def test_reference_raster_decode_independent(spark):
    """Distributed decode == an independent driver-side zlib+frombuffer
    decode of the same strips (no shared code path beyond the header)."""
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    path = f"{SAO}/gpw_v411_2020_count_2020.tif"
    info = read_tiff_info(path)
    with open(path, "rb") as f:
        strips = []
        rows_left = info.height
        for off, cnt in zip(info.offsets, info.counts):
            f.seek(off)
            raw = zlib.decompress(f.read(cnt))
            nr = min(info.chunk_h, rows_left)
            rows_left -= nr
            strips.append(
                np.frombuffer(raw, dtype="<f4").reshape(nr, info.width)
            )
    want = np.vstack(strips).astype(np.float64)
    want[want == info.nodata] = np.nan
    got = _collect_array(read_geotiff(spark, path))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isdir(SAO), reason="reference data not present")
def test_gpkg_read(spark):
    from exactextractr_spark.sources.geopackage import (
        list_feature_tables,
        read_gpkg,
    )

    assert list_feature_tables(f"{SAO}/concelhos.gpkg") == [
        ("concelhos", "geom", 4326)
    ]
    feats, attrs = read_gpkg(
        spark, f"{SAO}/concelhos.gpkg", keep_cols=["name"]
    )
    rows = feats.collect()
    assert len(rows) == 6  # the six concelhos of São Miguel
    names = {r["name"] for r in attrs.collect()}
    assert "Ponta Delgada" in names
    # bboxes live on São Miguel
    assert all(-26.0 < r["fxmin"] < -25.0 for r in rows)
    assert all(37.6 < r["fymin"] < 38.0 for r in rows)
    assert all(r["crs"] == "EPSG:4326" for r in rows)


@pytest.mark.skipif(not os.path.isdir(SAO), reason="reference data not present")
def test_vignette_population_end_to_end(spark):
    """vignettes/vig1_population.Rmd on the real files: concelho population
    sums (exact_extract(pop_count, concelhos, 'sum')) vs the raster total
    (cellStats equivalent), and the population-weighted mean elevation
    (exact_extract(elev, concelhos, 'weighted_mean', weights=pop_density))
    bracketed by the unweighted mean as in the vignette's conclusion."""
    from exactextractr_spark.operators.zonal import exact_extract
    from exactextractr_spark.sources.geopackage import read_gpkg
    from exactextractr_spark.sources.geotiff import read_geotiff

    feats = read_gpkg(spark, f"{SAO}/concelhos.gpkg")
    pop = read_geotiff(spark, f"{SAO}/gpw_v411_2020_count_2020.tif")
    sums = exact_extract(pop, feats, ["sum"]).collect()
    assert len(sums) == 6
    total = sum(r["sum"] for r in sums)
    cellstats = np.nansum(_collect_array(pop))
    # the vignette's point: concelho sums missed a few % of the raster
    # total (coastline cells whose centers fall outside polygons get
    # PARTIAL coverage here, so the gap is smaller than terra's, but the
    # total can never exceed the raster total)
    assert 0.9 * cellstats < total <= cellstats * (1 + 1e-9)
    # pinned from the independent driver-side decode of the GPW raster
    # (the vignette's cellStats(pop_count, 'sum'))
    assert cellstats == pytest.approx(145_602.965, abs=0.01)

    elev = read_geotiff(spark, f"{SAO}/eu_dem_v11.tif")
    dens = read_geotiff(spark, f"{SAO}/gpw_v411_2020_density_2020.tif")
    both = exact_extract(
        elev, feats, ["mean", "weighted_mean"], weights=dens
    ).collect()
    assert len(both) == 6
    for r in both:
        assert np.isfinite(r["mean"]) and np.isfinite(r["weighted_mean"])
        # population concentrates along the coast (low elevation): the
        # weighted mean sits below the unweighted mean in every concelho
        assert r["weighted_mean"] < r["mean"]


def test_write_geotiff_roundtrip(spark, tmp_path):
    """Package writer -> package reader round-trip, incl. nodata<->NaN."""
    from exactextractr_spark.sources.geotiff import (
        read_geotiff,
        read_tiff_info,
        write_geotiff,
    )

    rng = np.random.default_rng(5)
    arr = rng.uniform(-5, 5, (41, 29))
    arr[3, 7] = np.nan
    p = str(tmp_path / "w.tif")
    write_geotiff(p, arr, xmin=-10.0, ymax=50.0, dx=0.25, crs="EPSG:32633",
                  nodata=-9999.0)
    info = read_tiff_info(p)
    assert (info.width, info.height) == (29, 41)
    assert info.crs == "EPSG:32633"
    assert info.nodata == -9999.0
    got = _collect_array(read_geotiff(spark, p))
    want = arr.copy()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_array_equal(got[~np.isnan(want)], want[~np.isnan(want)])


@pytest.mark.skipif(not os.path.isdir(SAO), reason="reference data not present")
def test_reference_raster_rewrite_identical(spark, tmp_path):
    """read reference tif -> write -> re-read: pixel-identical."""
    from exactextractr_spark.sources.geotiff import read_geotiff, write_geotiff

    src = read_geotiff(spark, f"{SAO}/gpw_v411_2020_density_2020.tif")
    arr = _collect_array(src)
    p = str(tmp_path / "re.tif")
    write_geotiff(p, arr, xmin=src.meta.xmin, ymax=src.meta.ymax,
                  dx=src.meta.dx, dy=src.meta.dy, crs=src.meta.crs,
                  nodata=-3.4028230607370965e+38)
    back = _collect_array(read_geotiff(spark, p))
    np.testing.assert_array_equal(np.isnan(back), np.isnan(arr))
    np.testing.assert_array_equal(back[~np.isnan(arr)], arr[~np.isnan(arr)])


def test_resample_to_geotiff(spark, tmp_path):
    """tif -> exact_resample -> tif: sum preserved on aligned grids
    (the reference round-trip through GDAL, test_exact_resample.R:16-43)."""
    from exactextractr_spark.operators.resample import exact_resample
    from exactextractr_spark.sources.geotiff import (
        read_geotiff,
        resample_to_geotiff,
        write_geotiff,
    )
    from exactextractr_spark.sources.tiles import RasterMeta

    arr = np.arange(1.0, 65.0).reshape(8, 8)
    src_p = str(tmp_path / "src.tif")
    write_geotiff(src_p, arr, xmin=0.0, ymax=8.0, dx=1.0)
    src = read_geotiff(spark, src_p)
    dst_meta = RasterMeta("d", xmin=0, ymax=8, dx=2, dy=2, width=4, height=4,
                          tile_w=4, tile_h=4, crs="EPSG:4326")
    facts = exact_resample(src, dst_meta, "sum")
    out_p = str(tmp_path / "dst.tif")
    resample_to_geotiff(facts, dst_meta, out_p)
    back = _collect_array(read_geotiff(spark, out_p))
    assert np.nansum(back) == pytest.approx(arr.sum())
    assert back[0, 0] == pytest.approx(arr[0:2, 0:2].sum())
    # byte-identity: the strip-streamed writer must produce EXACTLY the
    # file the dense-array writer would (same strips, same layout)
    dense = np.full((4, 4), np.nan)
    for r in facts.collect():
        dense[int(r["dst_row"]), int(r["dst_col"])] = r["value"]
    ref_p = str(tmp_path / "dense.tif")
    write_geotiff(ref_p, dense, xmin=0.0, ymax=8.0, dx=2.0, dy=2.0,
                  crs="EPSG:4326")
    assert open(out_p, "rb").read() == open(ref_p, "rb").read()


def test_resample_to_geotiff_multi_strip(spark, tmp_path):
    """A destination spanning several strips (rows_per_strip=64) streams
    through toLocalIterator: strips with no facts stay at fill, values land
    on the right rows, and the dense-writer byte-identity holds."""
    import pandas as pd

    from exactextractr_spark.sources.geotiff import (
        read_geotiff,
        resample_to_geotiff,
        write_geotiff,
    )
    from exactextractr_spark.sources.tiles import RasterMeta

    H, W = 200, 30  # 4 strips at 64 rows/strip, last partial
    rng = np.random.default_rng(11)
    rows = rng.choice(H * W, size=500, replace=False)
    pdf = pd.DataFrame(
        {
            "dst_row": (rows // W).astype("int32"),
            "dst_col": (rows % W).astype("int32"),
            "value": rng.uniform(0, 50, 500),
        }
    )
    facts = spark.createDataFrame(pdf)
    dst_meta = RasterMeta("d", xmin=0, ymax=H, dx=1, dy=1, width=W, height=H,
                          tile_w=W, tile_h=H, crs="EPSG:4326")
    out_p = str(tmp_path / "big.tif")
    resample_to_geotiff(facts, dst_meta, out_p)
    dense = np.full((H, W), np.nan)
    dense[pdf["dst_row"], pdf["dst_col"]] = pdf["value"]
    ref_p = str(tmp_path / "big_dense.tif")
    write_geotiff(ref_p, dense, xmin=0.0, ymax=float(H), dx=1.0, dy=1.0,
                  crs="EPSG:4326")
    assert open(out_p, "rb").read() == open(ref_p, "rb").read()
    back = _collect_array(read_geotiff(spark, out_p))
    np.testing.assert_allclose(back, dense, equal_nan=True)


def test_cog_overviews_roundtrip(spark, tmp_path):
    """write_geotiff(overviews=...) emits a next-IFD chain; read back at
    each level, georeferencing scaled from the base IFD."""
    from exactextractr_spark.sources.geotiff import (
        read_geotiff,
        read_tiff_info,
        write_geotiff,
    )

    full = np.arange(1024, dtype=np.float64).reshape(32, 32)
    ov1 = full.reshape(16, 2, 16, 2).mean(axis=(1, 3))  # 2x block mean
    ov2 = ov1.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    p = str(tmp_path / "cog.tif")
    write_geotiff(p, full, xmin=0.0, ymax=32.0, dx=1.0, overviews=[ov1, ov2])
    assert read_tiff_info(p, ifd=0).width == 32
    assert read_tiff_info(p, ifd=1).width == 16
    assert read_tiff_info(p, ifd=2).width == 8
    with pytest.raises(ValueError, match="no IFD"):
        read_tiff_info(p, ifd=3)
    # base reads unchanged
    np.testing.assert_array_equal(_collect_array(read_geotiff(spark, p)), full)
    # overview levels: values exact, cell size scaled, origin preserved
    r1 = read_geotiff(spark, p, overview=1)
    assert r1.meta.dx == 2.0 and r1.meta.xmin == 0.0 and r1.meta.ymax == 32.0
    np.testing.assert_array_equal(_collect_array(r1), ov1)
    r2 = read_geotiff(spark, p, overview=2)
    assert r2.meta.dx == 4.0
    np.testing.assert_array_equal(_collect_array(r2), ov2)


def test_gpkg_write_read_roundtrip(spark, tmp_path):
    """write_gpkg -> read_gpkg round-trip: WKB bytes, bboxes, srs and
    attribute values survive; required GPKG metadata tables exist with the
    GPKG application_id so external readers recognize the file."""
    import sqlite3

    import pandas as pd

    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.geopackage import (
        list_feature_tables,
        read_gpkg,
        write_gpkg,
    )

    feats = features_from_wkt(
        spark,
        ["POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))",
         "POLYGON ((3 3, 5 3, 5 6, 3 6, 3 3))"],
        crs="EPSG:4326",
    )
    rows = feats.collect()
    geoms = {r["feature_id"]: bytes(r["geom"]) for r in rows}
    attrs = pd.DataFrame(
        {
            "feature_id": [r["feature_id"] for r in rows],
            "mean": [12.5, 7.25],
            "label": ["a", "b"],
            "n": [4, 6],
        }
    )
    p = str(tmp_path / "out.gpkg")
    write_gpkg(p, attrs, geoms, table="stats", srs_id=4326)

    assert list_feature_tables(p) == [("stats", "geom", 4326)]
    back, battrs = read_gpkg(spark, p, keep_cols=["mean", "label", "n"])
    brows = {r["feature_id"]: r for r in back.collect()}
    assert set(brows) == set(geoms)
    for fid, r in brows.items():
        assert bytes(r["geom"]) == geoms[fid]  # WKB byte-identical
        assert r["crs"] == "EPSG:4326"
    arows = {r["feature_id"]: r for r in battrs.collect()}
    assert arows[1]["mean"] == 12.5 and arows[1]["label"] == "a"
    assert arows[2]["n"] == 6
    con = sqlite3.connect(p)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == 0x47504B47  # 'GPKG'
        (cnt,) = con.execute(
            "SELECT COUNT(*) FROM gpkg_spatial_ref_sys WHERE srs_id IN "
            "(-1, 0, 4326)"
        ).fetchone()
        assert cnt == 3
        row = con.execute(
            "SELECT data_type, srs_id, min_x, max_y FROM gpkg_contents "
            "WHERE table_name='stats'"
        ).fetchone()
        assert row[0] == "features" and row[1] == 4326
        assert row[2] == 0.5 and row[3] == 6.0
        gname = con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns"
        ).fetchone()[0]
        assert gname == "POLYGON"
    finally:
        con.close()


def test_cli_gpkg_sink(spark, tmp_path):
    import numpy as np

    from exactextractr_spark.cli import main
    from exactextractr_spark.sources.features import features_from_wkt
    from exactextractr_spark.sources.geopackage import read_gpkg
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
    out = str(tmp_path / "out.gpkg")
    main(
        [
            "--polys", feats_path, "--tiles", tiles_path,
            "--stat", "m=mean(v)", "--stat", "s=sum(v)",
            "--format", "gpkg", "-o", out,
        ]
    )
    feats, attrs = read_gpkg(spark, out, keep_cols=["m", "s"])
    assert feats.count() == 1
    row = attrs.collect()[0]
    assert row["m"] == pytest.approx(5.0)
    assert row["s"] == pytest.approx(20.0)


def test_planar_configuration_band_select(spark, tmp_path):
    """PlanarConfiguration=2: each band's strips are contiguous; selecting
    a band range-reads ONLY that plane's chunks and decodes exactly."""
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    rng = np.random.default_rng(21)
    planes = rng.integers(0, 250, (3, 23, 17)).astype(np.uint8)
    p = str(tmp_path / "planar.tif")
    _write_tiff(p, planes, planar=2, rows_per_strip=5)
    info = read_tiff_info(p)
    assert info.planar == 2 and info.spp == 3
    assert len(info.offsets) == 3 * 5  # ceil(23/5)=5 strips per plane
    for b in range(3):
        got = _collect_array(read_geotiff(spark, p, band=b))
        np.testing.assert_array_equal(got, planes[b].astype(np.float64))


def test_jpeg_in_tiff_external_fixtures(spark):
    """Compression 7 (JPEG-in-TIFF, JDK-written fixtures): grayscale and
    YCbCr multi-strip streams decode through core/jpeg.py with >=50 dB
    PSNR against the original samples."""
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    fix = os.path.join(os.path.dirname(__file__), "fixtures")

    def psnr(a, b):
        mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)

    p = os.path.join(fix, "jdk_tiff_jpeggray.tif")
    assert read_tiff_info(p).compression == 7
    got = _collect_array(read_geotiff(spark, p))
    orig = np.frombuffer(
        open(os.path.join(fix, "jdk_tiff_jpeggray.raw"), "rb").read(),
        np.uint8,
    ).reshape(50, 70)
    assert psnr(got, orig) >= 50.0

    p = os.path.join(fix, "jdk_tiff_jpegrgb.tif")
    info = read_tiff_info(p)
    assert info.compression == 7 and info.photometric == 6 and info.spp == 3
    assert len(info.offsets) >= 2  # multi-strip: one JPEG stream per strip
    orig = np.frombuffer(
        open(os.path.join(fix, "jdk_tiff_jpegrgb.raw"), "rb").read(),
        np.uint8,
    ).reshape(48, 72, 3)
    for b in range(3):
        got = _collect_array(read_geotiff(spark, p, band=b))
        assert psnr(got, orig[..., b]) >= 45.0, b


def test_jpeg_tables_splice():
    """Abbreviated JPEG-in-TIFF streams (JPEGTables tag 347): stripping the
    DQT/DHT segments into a tables stream and splicing them back must
    decode identically to the original full stream."""
    from exactextractr_spark.sources.geotiff import _decode_chunk

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    full = open(os.path.join(fix, "jdk_gray.jpg"), "rb").read()
    # split: move every DQT (FFDB) / DHT (FFC4) segment into the tables
    segs, rest = [], bytearray(full[:2])
    i = 2
    while i + 4 <= len(full):
        if full[i] != 0xFF:
            rest += full[i:]
            break
        marker = full[i + 1]
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            rest += full[i:]
            break
        ln = int.from_bytes(full[i + 2 : i + 4], "big")
        seg = full[i : i + 2 + ln]
        if marker in (0xDB, 0xC4):
            segs.append(seg)
        else:
            rest += seg
        i += 2 + ln
    tables = b"\xff\xd8" + b"".join(segs) + b"\xff\xd9"
    idict = {
        "compression": 7,
        "jpeg_tables": tables,
        "band": 0,
        "nodata": None,
    }
    got = _decode_chunk(bytes(rest), idict, 53, 67)
    idict_full = {
        "compression": 7,
        "jpeg_tables": None,
        "band": 0,
        "nodata": None,
    }
    want = _decode_chunk(full, idict_full, 53, 67)
    np.testing.assert_array_equal(got, want)


def test_palette_tiff_returns_indices(spark):
    """Photometric=3 (palette): the band carries the palette INDICES
    exactly (GDAL parity — the color table is metadata, the band is the
    index raster). JDK-written fixture."""
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    p = os.path.join(fix, "jdk_tiff_palette.tif")
    info = read_tiff_info(p)
    assert info.photometric == 3
    got = _collect_array(read_geotiff(spark, p))
    orig = np.frombuffer(
        open(os.path.join(fix, "jdk_tiff_palette.raw"), "rb").read(),
        np.uint8,
    ).reshape(30, 40)
    np.testing.assert_array_equal(got, orig.astype(np.float64))


def test_ycbcr_without_jpeg_rejected(tmp_path):
    """Photometric=6 outside JPEG compression must refuse loudly (the
    subsampled-YCbCr layout needs the JPEG decoder's color machinery)."""
    from exactextractr_spark.sources.geotiff import read_tiff_info

    arr = np.zeros((8, 8), dtype=np.uint8)
    p = str(tmp_path / "y.tif")
    _write_tiff(p, arr)
    # patch the photometric tag (262) value to 6 in place
    data = bytearray(open(p, "rb").read())
    i = data.find(struct.pack("<HH", 262, 3))
    assert i > 0
    data[i + 8 : i + 10] = struct.pack("<H", 6)
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="YCbCr"):
        read_tiff_info(p)


def test_write_geotiff_lzw_jdk_readable(spark, tmp_path):
    """write_geotiff(compression='lzw'): our reader round-trips it AND an
    external decoder (JDK ImageIO) reads it byte-exactly — guards the
    encoder's early-change threshold against self-consistent-but-wrong
    pairs. Skipped without a JDK."""
    import shutil
    import struct as _s
    import subprocess

    from exactextractr_spark.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(31)
    arr = np.round(rng.uniform(0, 100, (90, 75)), 2).astype(np.float32)
    p = str(tmp_path / "lzw_out.tif")
    write_geotiff(p, arr, xmin=0.0, ymax=90.0, dx=1.0, compression="lzw")
    got = _collect_array(read_geotiff(spark, p))
    np.testing.assert_array_equal(got, arr.astype(np.float64))
    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("no JDK available")
    src = tmp_path / "ReadTiff2.java"
    src.write_text(
        "import javax.imageio.*;import java.awt.image.*;import java.io.*;"
        "public class ReadTiff2{public static void main(String[]a)throws Exception{"
        "BufferedImage i=ImageIO.read(new File(a[0]));Raster r=i.getRaster();"
        "int w=r.getWidth(),h=r.getHeight();DataOutputStream o=new DataOutputStream("
        "new BufferedOutputStream(new FileOutputStream(a[1])));"
        "o.writeInt(w);o.writeInt(h);for(int y=0;y<h;y++)for(int x=0;x<w;x++)"
        "o.writeDouble(r.getSampleDouble(x,y,0));o.close();}}"
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path)
    out = str(tmp_path / "px.raw")
    subprocess.run(
        ["java", "-cp", str(tmp_path), "ReadTiff2", p, out], check=True
    )
    raw = open(out, "rb").read()
    w, h = _s.unpack(">ii", raw[:8])
    assert (w, h) == (75, 90)
    jdk = np.frombuffer(raw[8:], dtype=">f8").reshape(h, w)
    np.testing.assert_array_equal(jdk, arr.astype(np.float64))


def test_palette_rgb_helper():
    """ColorMap tag -> (2^bps, 3) uint8 palette, matching the colors the
    JDK fixture was generated with (WriteTiffVariants.java: r=i*16,
    g=255-i*16, b=i*8+64 for the first 16 slots)."""
    from exactextractr_spark.sources.geotiff import palette_rgb, read_tiff_info

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    info = read_tiff_info(os.path.join(fix, "jdk_tiff_palette.tif"))
    pal = palette_rgb(info)
    assert pal.shape == (256, 3) and pal.dtype == np.uint8
    for i in range(16):
        assert tuple(pal[i]) == ((i * 16) & 255, (255 - i * 16) & 255,
                                 (i * 8 + 64) & 255), i


def test_jpeg_in_tiff_rgb_photometric_skips_color_transform(spark, tmp_path):
    """PhotometricInterpretation=2 + JPEG compression means the three JPEG
    components are stored RGB (libtiff PHOTOMETRIC_RGB): the JFIF
    YCbCr->RGB transform must NOT be applied. Fabricated by patching the
    photometric tag of the pinned YCbCr fixture — band 0 of the patched
    file must equal the raw first component plane of each strip's JPEG
    stream, not the color-transformed red channel."""
    import shutil
    import struct as _s

    from exactextractr_spark.core.jpeg import decode_jpeg as _dj
    from exactextractr_spark.sources.geotiff import read_geotiff, read_tiff_info

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    src = os.path.join(fix, "jdk_tiff_jpegrgb.tif")
    dst = str(tmp_path / "rgbjpeg.tif")
    shutil.copy(src, dst)
    buf = bytearray(open(dst, "rb").read())
    bo = "<" if buf[:2] == b"II" else ">"
    ifd_off = _s.unpack(bo + "I", buf[4:8])[0]
    n = _s.unpack(bo + "H", buf[ifd_off : ifd_off + 2])[0]
    patched = False
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if _s.unpack(bo + "H", buf[e : e + 2])[0] == 262:
            buf[e + 8 : e + 12] = _s.pack(bo + "HH", 2, 0)
            patched = True
    assert patched
    open(dst, "wb").write(bytes(buf))

    info = read_tiff_info(dst)
    assert info.photometric == 2 and info.compression == 7
    got = _collect_array(read_geotiff(spark, dst, band=0))

    # expected: raw component plane 0 of each strip's (table-spliced) JPEG
    raw = open(src, "rb").read()
    rows = []
    for off, cnt in zip(info.offsets, info.counts):
        chunk = raw[off : off + cnt]
        if info.jpeg_tables and len(info.jpeg_tables) > 4:
            chunk = chunk[:2] + info.jpeg_tables[2:-2] + chunk[2:]
        rows.append(_dj(chunk, color_transform=False)[..., 0])
    want = np.concatenate(rows, axis=0)[: info.height, : info.width]
    np.testing.assert_array_equal(got, want)


def test_geokey_parameter_crs_fallback(tmp_path):
    """A GeoTIFF whose GeoKeys carry ProjCoordTransGeoKey + projection
    PARAMETERS (user-defined CRS, no EPSG code) must resolve to a working
    transform — the same numbers as its EPSG-coded twin (the reference
    gets this via PROJ, R/exact_extract.R:360-377)."""
    from exactextractr_spark.core import crs as crs_mod
    from exactextractr_spark.sources.geotiff import read_tiff_info, write_geotiff

    cases = [
        ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +ellps=GRS80", "EPSG:2154",
         (-4.0, 8.0, 42.0, 50.0)),
        ("+proj=tmerc +lat_0=0 +lon_0=15 +k_0=0.9996 +x_0=500000 +y_0=0 "
         "+ellps=WGS84", "EPSG:32633", (9.0, 21.0, -75.0, 80.0)),
        ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
         "+ellps=WGS84", "EPSG:3413", (-180.0, 180.0, 60.0, 89.0)),
        ("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181", "MODIS",
         (-179.0, 179.0, -85.0, 85.0)),
    ]
    rng = np.random.default_rng(23)
    arr = np.zeros((4, 4))
    for i, (ps, epsg_twin, (lo0, lo1, la0, la1)) in enumerate(cases):
        p = str(tmp_path / f"param{i}.tif")
        write_geotiff(p, arr, xmin=0.0, ymax=4.0, dx=1.0, crs=ps)
        back = read_tiff_info(p).crs
        assert "+proj=" in back, back  # parameter string, not an EPSG code
        lon = rng.uniform(lo0, lo1, 200)
        lat = rng.uniform(la0, la1, 200)
        x1, y1 = crs_mod.transform_xy(lon, lat, "EPSG:4326", epsg_twin)
        x2, y2 = crs_mod.transform_xy(lon, lat, "EPSG:4326", back)
        np.testing.assert_allclose(x2, x1, atol=1e-6)
        np.testing.assert_allclose(y2, y1, atol=1e-6)


def test_tiled_and_bigtiff_writing(tmp_path):
    """Tiled layout (tags 322-325, padded edge tiles) and BigTIFF
    container (version 43, 8-byte offsets) round-trip through the
    existing reader paths, alone and combined, with overviews."""
    from exactextractr_spark.sources.geotiff import read_tiff_info, write_geotiff

    rng = np.random.default_rng(5)
    a = rng.uniform(0, 100, (70, 90))
    p = str(tmp_path / "tiled.tif")
    write_geotiff(p, a, xmin=0, ymax=70, dx=1, tile_size=32)
    info = read_tiff_info(p)
    assert info.tiled and info.chunk_w == 32 and info.chunk_h == 32
    np.testing.assert_array_equal(_decode_dense(p), a)

    p2 = str(tmp_path / "big.tif")
    write_geotiff(p2, a, xmin=0, ymax=70, dx=1, bigtiff=True,
                  compression="lzw")
    assert open(p2, "rb").read(4) == b"II+\x00"  # version 43
    np.testing.assert_array_equal(_decode_dense(p2), a)

    p3 = str(tmp_path / "bigtiled.tif")
    a2 = a.copy()
    a2[0, 0] = np.nan
    write_geotiff(p3, a2, xmin=0, ymax=70, dx=1, tile_size=16, bigtiff=True,
                  nodata=-9999.0, overviews=[a2[::2, ::2]])
    back = _decode_dense(p3)
    assert np.isnan(back[0, 0])
    mask = ~np.isnan(a2)
    np.testing.assert_array_equal(back[mask], a2[mask])
    ov = read_tiff_info(p3, ifd=1)
    assert (ov.width, ov.height) == (45, 35)

    with pytest.raises(ValueError, match="multiple of 16"):
        write_geotiff(str(tmp_path / "x.tif"), a, xmin=0, ymax=70, dx=1,
                      tile_size=30)


def _decode_dense(path) -> np.ndarray:
    """Driver-side reassembly through the production chunk decoder."""
    from exactextractr_spark.sources.geotiff import _decode_chunk, read_tiff_info

    info = read_tiff_info(path)
    raw = open(path, "rb").read()
    d = {
        "compression": info.compression, "bps": info.bps,
        "sample_format": info.sample_format, "spp": info.spp,
        "predictor": info.predictor, "big_endian": info.big_endian,
        "chunk_h": info.chunk_h, "chunk_w": info.chunk_w,
        "tiled": info.tiled, "nodata": info.nodata, "band": 0,
        "jpeg_tables": None, "photometric": info.photometric,
    }
    out = np.full((info.height, info.width), np.nan)
    ncc = -(-info.width // info.chunk_w)
    for idx, (off, cnt) in enumerate(zip(info.offsets, info.counts)):
        if info.tiled:
            tr, tc = divmod(idx, ncc)
            r0, c0 = tr * info.chunk_h, tc * info.chunk_w
        else:
            r0, c0 = idx * info.chunk_h, 0
        nr = min(info.chunk_h, info.height - r0)
        nc = min(info.chunk_w, info.width - c0)
        blk = _decode_chunk(raw[off : off + cnt], d, nr, nc)
        out[r0 : r0 + nr, c0 : c0 + nc] = blk[:nr, :nc]
    return out


@pytest.mark.skipif(
    not os.environ.get("RUN_HUGE_TESTS"),
    reason="writes a real 4.4 GB file (~150 s); run with RUN_HUGE_TESTS=1 "
           "(verified green in round 5)",
)
def test_bigtiff_auto_switch_past_4gib(tmp_path):
    """A raster whose uncompressed payload exceeds the classic 4-byte
    offset space auto-selects BigTIFF, and chunks whose offsets lie PAST
    4 GiB read back correctly (real file, no mocks; ~4.4 GB on disk)."""
    from exactextractr_spark.sources.geotiff import read_tiff_info, write_geotiff

    h = w = 66_000  # uint8 payload 4.36e9 > 2^32
    a = np.zeros((h, w), dtype=np.uint8)
    a[0, :5] = [1, 2, 3, 4, 5]
    a[-1, -5:] = [9, 8, 7, 6, 5]
    p = str(tmp_path / "huge.tif")
    write_geotiff(p, a, xmin=0.0, ymax=float(h), dx=1.0,
                  compression="none", rows_per_strip=8192)
    assert open(p, "rb").read(4) == b"II+\x00"  # auto-switched
    info = read_tiff_info(p)
    assert info.offsets[-1] > 0xFFFFFFFF  # genuinely past classic range
    raw = open(p, "rb")
    raw.seek(info.offsets[-1])
    last = np.frombuffer(
        raw.read(info.counts[-1]), dtype=np.uint8
    ).reshape(-1, w)
    np.testing.assert_array_equal(last[-1, -5:], [9, 8, 7, 6, 5])
    raw.seek(info.offsets[0])
    first = np.frombuffer(raw.read(w), dtype=np.uint8)
    np.testing.assert_array_equal(first[:5], [1, 2, 3, 4, 5])


def test_geokey_citation_wkt_fallback():
    """A user-defined CRS whose GeoKeys carry no projection parameters but
    embed WKT1 in the PCS citation (ESRI 'PE String' files) resolves via
    wkt_to_projstr; garbage citations stay a clean ''."""
    import numpy as np

    from exactextractr_spark.core.crs import crs_wkt, transform_xy
    from exactextractr_spark.sources.geotiff import _epsg_from_geokeys

    import re
    bare = re.sub(r',AUTHORITY\["EPSG","\d+"\]', "", crs_wkt("EPSG:5070"))
    cite = ("ESRI PE String = " + bare + "|").encode("latin-1")
    keys = (
        1, 1, 0, 3,
        3072, 0, 1, 32767,          # ProjectedCSType: user-defined
        3073, 34737, len(cite), 0,  # PCSCitation -> ascii params
        3076, 0, 1, 9001,           # linear units: meter
    )
    got = _epsg_from_geokeys(keys, (), cite)
    assert got.startswith("+proj=aea"), got
    lon, lat = np.array([-96.0, -105.5]), np.array([23.0, 41.0])
    x1, y1 = transform_xy(lon, lat, "EPSG:4326", "EPSG:5070")
    x2, y2 = transform_xy(lon, lat, "EPSG:4326", got)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)

    junk = b"just a name|"
    keys2 = (1, 1, 0, 2,
             3072, 0, 1, 32767,
             1026, 34737, len(junk), 0)
    assert _epsg_from_geokeys(keys2, (), junk) == ""
