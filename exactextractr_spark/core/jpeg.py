"""JPEG decoder in pure numpy (no codec library): baseline AND progressive.

Implements the ITU-T T.81 / JFIF baseline process — marker parse, DQT/DHT
tables, Huffman entropy decode (flat 16-bit lookup table per Huffman
table), dequantize, de-zigzag, batched 8x8 inverse DCT (one einsum over
all blocks of a component), triangular chroma upsampling, and the JFIF
full-range YCbCr->RGB transform — plus the progressive process (SOF2,
T.81 Annex G): spectral selection and successive approximation scans
(DC first/refine, AC first with EOB runs, AC refinement with correction
bits) accumulated in a per-component coefficient store and finished
through the same IDCT tail. Restart intervals (DRI/RSTn) are honored in
both modes. Hierarchical/arithmetic streams are rejected with a clear
error.

Entropy decoding is inherently sequential within one scan — parallelism
comes from Spark partitioning across images (mapInPandas over the image
table), never from threads inside a single payload.

Reference parity: the reference pipelines decode images through whatever
codecs GDAL/R provide; this covers the `fmt='jpeg'` rows of the
BASELINE.json image-table shape with the PSNR>=40dB invariant (lossy).
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffLUT:
    """Flat 16-bit-peek lookup: lut_sym[peek] = symbol, lut_len[peek] =
    code length. Canonical codes from the DHT counts/symbols lists."""

    __slots__ = ("sym", "ln")

    def __init__(self, counts, symbols):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.ln = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                s = symbols[k]
                k += 1
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.sym[lo:hi] = s
                self.ln[lo:hi] = length
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("data", "n", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte : byte + 4]
        v = int.from_bytes(chunk + b"\x00" * (4 - len(chunk)), "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def skip(self, nbits: int) -> None:
        self.pos += nbits

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        v = self.peek16() >> (16 - nbits)
        self.pos += nbits
        return v


def _extend(v: int, nbits: int) -> int:
    """T.81 F.12: map the magnitude bits to a signed value."""
    if nbits == 0:
        return 0
    if v < (1 << (nbits - 1)):
        return v - (1 << nbits) + 1
    return v


def _destuff(data: bytes) -> "tuple[list[bytes], int]":
    """Split the entropy-coded bytes at restart markers and remove 0xFF00
    stuffing. Returns (segments, bytes_consumed_including_terminator)."""
    segments = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker terminates the scan
            break
    segments.append(bytes(cur))
    return segments, i


def _upsample_axis(plane: np.ndarray, factor: int, axis: int) -> np.ndarray:
    if factor == 1:
        return plane
    if factor != 2:
        return np.repeat(plane, factor, axis=axis)
    p = np.moveaxis(plane, axis, 0)
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    out = np.empty((p.shape[0] * 2,) + p.shape[1:], dtype=plane.dtype)
    out[0::2] = 0.75 * p + 0.25 * prev
    out[1::2] = 0.75 * p + 0.25 * nxt
    return np.moveaxis(out, 0, axis)


def decode_jpeg(data: bytes, color_transform: bool | None = None) -> np.ndarray:
    """Decode a baseline or progressive JPEG. Returns float64 (h, w) for 1-component
    streams or (h, w, 3) RGB for 3-component (JFIF YCbCr) streams, values
    in [0, 255].

    ``color_transform``: apply the JFIF YCbCr->RGB transform to 3-component
    streams. ``None`` (default) means the JFIF convention (always transform);
    pass ``False`` for streams whose components are already RGB — e.g.
    JPEG-in-TIFF chunks written with PhotometricInterpretation=2, where
    libtiff stores raw RGB without the YCbCr step (TIFF 6.0 §22)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffLUT] = {}
    huff_ac: dict[int, _HuffLUT] = {}
    comps = None  # list of (cid, h, v, tq)
    width = height = None
    restart_interval = 0
    progressive = False
    scans: list = []
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.float64)
                    p += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                lut = _HuffLUT(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = lut
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 prog
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(
                    f"{nc}-component JPEG not supported (only grayscale and "
                    "3-component streams; Adobe CMYK/YCCK is out of scope)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                f"are supported; got SOF marker 0x{marker:02X} "
                "(hierarchical/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ent_start = i + 2 + seg_len
            if not progressive:
                return _decode_scan(
                    data[ent_start:], comps, scan_sel, qt, huff_dc, huff_ac,
                    width, height, restart_interval, color_transform,
                )
            segments, consumed = _destuff(data[ent_start:])
            scans.append(
                {
                    "sel": scan_sel,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 15,
                    "dc": dict(huff_dc),
                    "ac": dict(huff_ac),
                    "ri": restart_interval,
                    "segments": segments,
                }
            )
            i = ent_start + consumed
            continue
        i += 2 + seg_len
    if progressive and scans:
        return _decode_progressive(
            scans, comps, qt, width, height, color_transform
        )
    raise ValueError("no SOS marker found (truncated JPEG)")


def _decode_scan(
    ent: bytes, comps, scan_sel, qt, huff_dc, huff_ac, width, height,
    restart_interval, color_transform=None,
) -> np.ndarray:
    if comps is None or width is None:
        raise ValueError("SOS before SOF (malformed JPEG)")
    if len(scan_sel) != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG not supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # per component: block grid + coefficient store
    sel_by_cid = {cs: (td, ta) for cs, td, ta in scan_sel}
    plan = []
    for cid, h, v, tq in comps:
        td, ta = sel_by_cid[cid]
        nblocks = n_mcus * h * v
        plan.append(
            {
                "h": h,
                "v": v,
                "dc": huff_dc[td],
                "ac": huff_ac[ta],
                "coef": np.zeros((nblocks, 64), dtype=np.float64),
                "k": 0,
                "pred": 0,
            }
        )
    segments, _ = _destuff(ent)
    seg_idx = 0
    br = _BitReader(segments[0])
    mcus_in_seg = 0
    for _m in range(n_mcus):
        if restart_interval and mcus_in_seg == restart_interval:
            seg_idx += 1
            br = _BitReader(segments[seg_idx])
            mcus_in_seg = 0
            for p in plan:
                p["pred"] = 0
        mcus_in_seg += 1
        for p in plan:
            dc_lut, ac_lut = p["dc"], p["ac"]
            for _b in range(p["h"] * p["v"]):
                coef = p["coef"][p["k"]]
                p["k"] += 1
                # DC
                peek = br.peek16()
                s = int(dc_lut.sym[peek])
                br.skip(int(dc_lut.ln[peek]))
                diff = _extend(br.read(s), s)
                p["pred"] += diff
                coef[0] = p["pred"]
                # AC
                k = 1
                while k < 64:
                    peek = br.peek16()
                    rs = int(ac_lut.sym[peek])
                    br.skip(int(ac_lut.ln[peek]))
                    if rs == 0:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    sz = rs & 15
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    coef[k] = _extend(br.read(sz), sz)
                    k += 1
    # MCU-ordered flat blocks -> (bh, bw, 64) component grids, then the
    # shared finish tail
    grids = {}
    for p, (cid, h, v, tq) in zip(plan, comps):
        bw, bh = mcus_x * h, mcus_y * v
        grids[cid] = (
            p["coef"].reshape(mcus_y, mcus_x, v, h, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bh, bw, 64)
        )
    return _finish(grids, comps, qt, width, height, hmax, vmax, color_transform)


def _finish(
    grids, comps, qt, width, height, hmax, vmax, color_transform=None
) -> np.ndarray:
    """Shared decode tail for baseline and progressive: dequantize +
    de-zigzag + one batched IDCT per component, plane assembly, chroma
    upsampling (factor-2 uses the triangular filter — libjpeg "fancy
    upsampling": 3/4 near + 1/4 far with edge replication; plain
    replication costs several dB of chroma PSNR), crop, and the JFIF
    YCbCr->RGB transform. ``grids[cid]`` is (bh, bw, 64) zigzag-ordered
    raw coefficients."""
    planes = []
    for cid, h, v, tq in comps:
        g = grids[cid]
        bh, bw = g.shape[0], g.shape[1]
        blocks = g.reshape(-1, 64).astype(np.float64)
        deq = np.empty_like(blocks)
        deq[:, _ZIGZAG] = blocks * qt[tq][None, :]
        F8 = deq.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, F8, _A) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        plane = _upsample_axis(plane, vmax // v, axis=0)
        plane = _upsample_axis(plane, hmax // h, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return np.clip(planes[0], 0.0, 255.0)
    if color_transform is False:  # components are already RGB (TIFF RGB JPEG)
        return np.clip(np.stack(planes, axis=-1), 0.0, 255.0)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0)


# ---------------------------------------------------------------------------
# progressive mode (T.81 Annex G): spectral selection + successive
# approximation over a persistent per-component coefficient store, then the
# same dequant/IDCT/upsample tail as baseline. Refinement algorithms follow
# G.1.2.1 (DC) and G.1.2.3 (AC), matching libjpeg's decode_mcu_AC_refine
# semantics (a correction bit only sets a magnitude bit that is not yet
# set). Validated against JDK-ImageIO-encoded progressive fixtures.
# ---------------------------------------------------------------------------


def _decode_progressive(
    scans, comps, qt, width, height, color_transform=None
) -> np.ndarray:
    if comps is None or width is None:
        raise ValueError("SOS before SOF (malformed JPEG)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    store: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) int32, zigzag
    dims: dict[int, tuple] = {}
    for cid, h, v, tq in comps:
        bw, bh = mcus_x * h, mcus_y * v
        store[cid] = np.zeros((bh, bw, 64), dtype=np.int32)
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        # non-interleaved scans iterate the ACTUAL block grid (T.81 A.2.2)
        dims[cid] = (bw, bh, -(-cw // 8), -(-ch // 8))

    for scan in scans:
        sel = scan["sel"]
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        segments = scan["segments"]
        ri = scan["ri"]
        comp_by_cid = {c[0]: c for c in comps}
        if ss == 0:
            _prog_dc_scan(
                scan, comps, store, dims, mcus_x, mcus_y, ah, al, segments,
                ri,
            )
        else:
            if len(sel) != 1:
                raise ValueError("progressive AC scan must be single-component")
            cid, _td, ta = sel[0]
            _prog_ac_scan(
                store[cid], dims[cid], scan["ac"][ta], ss, se, ah, al,
                segments, ri,
            )

    return _finish(store, comps, qt, width, height, hmax, vmax, color_transform)


def _prog_dc_scan(scan, comps, store, dims, mcus_x, mcus_y, ah, al,
                  segments, ri):
    """DC scans are (usually) interleaved over all scan components in MCU
    order; Ah==0 decodes shifted diffs, Ah>0 appends one bit per block."""
    sel_by_cid = {cs: (td, ta) for cs, td, ta in scan["sel"]}
    members = [c for c in comps if c[0] in sel_by_cid]
    single = len(members) == 1
    if single:
        cid, h, v, tq = members[0]
        # non-interleaved DC scan iterates the component's ACTUAL block
        # grid (T.81 A.2.2), not the MCU-padded one — same rule as AC scans
        _bw, _bh, abx, aby = dims[cid]
        order = [(cid, by, bx) for by in range(aby) for bx in range(abx)]
    else:
        order = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, h, v, tq in members:
                    for by in range(v):
                        for bx in range(h):
                            order.append((cid, my * v + by, mx * h + bx))
    br = _BitReader(segments[0])
    seg_idx = 0
    preds = {c[0]: 0 for c in members}
    done_in_seg = 0
    # restart interval counts MCUs (or blocks when non-interleaved)
    unit = 1 if single else max(1, len(order) // (mcus_x * mcus_y))
    for n_idx, (cid, by, bx) in enumerate(order):
        if ri and n_idx and (n_idx // unit) % ri == 0 and n_idx % unit == 0:
            if done_in_seg:  # only advance when this segment consumed units
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                preds = {c[0]: 0 for c in members}
                done_in_seg = 0
        done_in_seg += 1
        coef = store[cid][by, bx]
        if ah == 0:
            lut = scan["dc"][sel_by_cid[cid][0]]
            peek = br.peek16()
            s = int(lut.sym[peek])
            br.skip(int(lut.ln[peek]))
            diff = _extend(br.read(s), s)
            preds[cid] += diff
            coef[0] = preds[cid] << al
        else:
            if br.read(1):
                coef[0] = int(coef[0]) | (1 << al)


def _prog_ac_scan(store, dims, lut, ss, se, ah, al, segments, ri):
    """Single-component AC scan over the component's ACTUAL block grid in
    raster order. Ah==0: first pass with EOB runs; Ah>0: refinement."""
    bw, bh, abx, aby = dims
    br = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al
    n_done = 0
    for by in range(aby):
        for bx in range(abx):
            if ri and n_done and n_done % ri == 0:
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                eobrun = 0
            n_done += 1
            coef = store[by, bx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    peek = br.peek16()
                    rs = int(lut.sym[peek])
                    br.skip(int(lut.ln[peek]))
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1 + br.read(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow (progressive)")
                    coef[k] = _extend(br.read(s), s) << al
                    k += 1
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        peek = br.peek16()
                        rs = int(lut.sym[peek])
                        br.skip(int(lut.ln[peek]))
                        r, s = rs >> 4, rs & 15
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) + br.read(r)
                                break
                            # ZRL: skip 16 zero-history coefficients
                        else:
                            newval = p1 if br.read(1) else m1
                        # advance over r zero-history coeffs, refining any
                        # nonzero coefficient passed on the way
                        while k <= se:
                            c = int(coef[k])
                            if c != 0:
                                if br.read(1) and (c & p1) == 0:
                                    coef[k] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            coef[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        c = int(coef[k])
                        if c != 0 and br.read(1) and (c & p1) == 0:
                            coef[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1
