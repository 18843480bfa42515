"""Lossless WebP (VP8L) decoder — pure Python/numpy, no codec libraries.

Implements the public "WebP Lossless Bitstream Specification" (Google,
2012-2023, spec at datatracker.ietf.org/doc/draft-zern-webp): RIFF
container, LSB-first bitstream, canonical prefix codes (simple and
code-length-coded), meta-prefix groups, color cache, LZ77 backward
references with the 2-D distance map, and all four inverse transforms
(predictor — 14 modes, color, subtract-green, color-indexing with pixel
bundling). Lossy VP8 chunks are rejected loudly (out of scope — DCT +
boolean arithmetic coder).

Environment note: this container has no external WebP encoder (no cwebp /
PIL / ffmpeg / ImageIO plugin), so parity fixtures cannot be generated the
way the PNG/JPEG decoders used JDK ImageIO. Validation instead rests on
(a) hand-assembled bitstreams built bit-by-bit from the spec in the tests
(independent of this module's bit-writer), and (b) lossless round-trips
through :func:`encode_webp_lossless`, a deliberately minimal but
spec-valid encoder (literals only, flat prefix codes, no transforms) —
lossless means round-trips must be BIT-exact, which pins the whole
huffman/bitstream layer. The 2-D distance map is generated from the
spec's ordering rule (ascending x²+y², ties by |x| then positive-x first,
x ∈ [-7, 8] from the 4-bit xoffset packing); streams that use short
distances decode through it.

The reference reads rasters via GDAL and so inherits every GDAL codec
(gdal_raster_wrapper.h); this module plays the same role for the image
tile table's ``fmt='webp'`` rows.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "decode_vp8l", "encode_webp_lossless"]


# ---------------------------------------------------------------------------
# bit I/O (LSB-first within each byte, per spec §2)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("d", "pos", "buf", "bits", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.n = len(d)
        self.pos = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            b = self.d[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.buf |= b << self.bits
            self.bits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.buf & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.buf >>= n
        self.bits -= n


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """n bits of value, LSB first."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code, MSB of the code first (spec §3.4)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

_MAX_CODE_LEN = 15


class _Huff:
    """Flat peek-table decoder: table[rev_bits] = (symbol << 4) | length.
    ``single`` short-circuits zero-length single-symbol codes."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, lengths):
        lengths = np.asarray(lengths, dtype=np.int64)
        used = np.nonzero(lengths)[0]
        if used.size == 0:
            raise ValueError("empty prefix code")
        if used.size == 1:
            self.single = int(used[0])
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        maxlen = int(lengths.max())
        if maxlen > _MAX_CODE_LEN:
            raise ValueError(f"prefix code length {maxlen} > 15")
        # canonical assignment (RFC1951 shape): codes ordered by
        # (length, symbol); completeness check via Kraft sum
        bl_count = np.bincount(lengths[used], minlength=maxlen + 1)
        kraft = int((bl_count[1:] * (1 << (maxlen - np.arange(1, maxlen + 1)))).sum())
        if kraft != (1 << maxlen):
            raise ValueError("prefix code is not complete")
        next_code = np.zeros(maxlen + 1, dtype=np.int64)
        code = 0
        for l in range(1, maxlen + 1):
            code = (code + int(bl_count[l - 1])) << 1
            next_code[l] = code
        self.maxlen = maxlen
        table = np.zeros(1 << maxlen, dtype=np.int64)
        for sym in used:
            l = int(lengths[sym])
            c = int(next_code[l])
            next_code[l] += 1
            # stream delivers the code MSB-first from LSB-first bits:
            # low l bits of the peek value are the bit-reversed code
            rev = int(f"{c:0{l}b}"[::-1], 2)
            step = 1 << l
            table[rev::step] = (int(sym) << 4) | l
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        e = int(self.table[br.peek(self.maxlen)])
        br.skip(e & 0xF)
        return e >> 4


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code(br: _BitReader, alphabet: int) -> _Huff:
    """One prefix code: 'simple' (1-2 symbols) or code-length-coded
    (spec §3.4.1)."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if num == 1:  # zero-bit single-symbol code
            h = _Huff.__new__(_Huff)
            h.single = int(s0)
            h.table = None
            h.maxlen = 0
            return h
        lengths = np.zeros(alphabet, dtype=np.int64)
        s1 = br.read(8)
        if s0 == s1:
            raise ValueError("simple code with duplicate symbols")
        lengths[s0] = 1
        lengths[s1] = 1
        return _Huff(lengths)
    # code-length code
    cl_lens = np.zeros(19, dtype=np.int64)
    num_codes = br.read(4) + 4
    for i in range(num_codes):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lens)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = np.zeros(alphabet, dtype=np.int64)
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_huff.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = prev
            i += rep
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet:
        raise ValueError("code length repeat overruns alphabet")
    return _Huff(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _lz77_value(br: _BitReader, prefix: int) -> int:
    """Prefix-coded LZ77 length/distance value (spec §3.5.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _build_distance_map() -> np.ndarray:
    """The 120 closest (dx, dy) neighbor offsets, ordered by ascending
    x²+y², ties by |x| ascending then positive x first; x ∈ [-7, 8]
    (the 4-bit xoffset packing), y ≥ 0, excluding (x<=0, y=0)."""
    cands = []
    for y in range(0, 16):
        for x in range(-7, 9):
            if y == 0 and x <= 0:
                continue
            cands.append((x * x + y * y, abs(x), 0 if x >= 0 else 1, x, y))
    cands.sort()
    out = np.zeros((120, 2), dtype=np.int64)
    for i, (_d, _ax, _s, x, y) in enumerate(cands[:120]):
        out[i] = (x, y)
    return out


_DIST_MAP = _build_distance_map()


def _plane_code_to_distance(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = int(dy) * w + int(dx)
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# the entropy-coded image (spec §3.5) — returns flat uint32 ARGB
# ---------------------------------------------------------------------------


def _read_entropy_image(br: _BitReader, w: int, h: int, level0: bool):
    """Returns (argb flat uint32 array, transforms list). ``transforms``
    is non-empty only for the level-0 (spatially-coded) image."""
    transforms = []
    xsize = w
    if level0:
        while br.read(1):
            t = br.read(2)
            if any(tt[0] == t for tt in transforms):
                raise ValueError("duplicate transform")
            if t == 0:  # predictor
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _read_entropy_image(br, bw, bh, False)[0]
                # xsize recorded: a transform reads/applies at the image
                # width in effect at its position in the chain
                transforms.append((0, size_bits, sub, xsize))
            elif t == 1:  # color transform
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _read_entropy_image(br, bw, bh, False)[0]
                transforms.append((1, size_bits, sub, xsize))
            elif t == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _read_entropy_image(br, n_colors, 1, False)[0]
                # palette entries are delta-summed per channel (mod 256)
                pal = pal.view(np.uint8).reshape(-1, 4)
                pal = np.cumsum(pal.astype(np.uint32), axis=0).astype(
                    np.uint8
                )
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, xsize))
                xsize = -(-xsize // (1 << width_bits))

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"invalid color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix groups (level 0 only)
    meta = None
    hbits = 0
    num_groups = 1
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        ew = -(-xsize // (1 << hbits))
        eh = -(-h // (1 << hbits))
        ent = _read_entropy_image(br, ew, eh, False)[0]
        meta = ((ent >> np.uint32(8)) & np.uint32(0xFFFF)).astype(np.int64)
        num_groups = int(meta.max()) + 1
        meta = meta.reshape(eh, ew)

    groups = []
    for _ in range(num_groups):
        g = _read_code(br, 256 + 24 + cache_size)
        r = _read_code(br, 256)
        b = _read_code(br, 256)
        a = _read_code(br, 256)
        d = _read_code(br, 40)
        groups.append((g, r, b, a, d))

    npix = xsize * h
    out = np.zeros(npix, dtype=np.uint32)
    cache = np.zeros(cache_size, dtype=np.uint32) if cache_size else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    pos = 0
    gx = gy = 0  # current pixel coords for meta lookup
    group = groups[0]
    single_group = meta is None
    while pos < npix:
        if not single_group:
            group = groups[int(meta[gy >> hbits, gx >> hbits])]
        gcode, rcode, bcode, acode, dcode = group
        s = gcode.decode(br)
        if s < 256:
            red = rcode.decode(br)
            blue = bcode.decode(br)
            alpha = acode.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(px * 0x1E35A7BD) % (1 << 32) >> cache_shift] = px
            pos += 1
            gx += 1
            if gx >= xsize:
                gx = 0
                gy += 1
        elif s < 256 + 24:
            length = _lz77_value(br, s - 256)
            dist_prefix = dcode.decode(br)
            dist = _plane_code_to_distance(
                xsize, _lz77_value(br, dist_prefix)
            )
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            if pos + length > npix:
                raise ValueError("LZ77 copy past image end")
            for k in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[(px * 0x1E35A7BD) % (1 << 32) >> cache_shift] = px
                pos += 1
            gx += length
            while gx >= xsize:
                gx -= xsize
                gy += 1
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a color cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
            gx += 1
            if gx >= xsize:
                gx = 0
                gy += 1

    return out, transforms


# ---------------------------------------------------------------------------
# inverse transforms (spec §4), applied in reverse read order
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b) >> 1


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _apply_predictor_inverse(px: np.ndarray, w: int, h: int,
                             size_bits: int, modes_img: np.ndarray) -> None:
    """In-place: px is (h*w, 4) uint8 channels [A, R, G, B] residuals ->
    actual values. Linear-buffer neighbor semantics (top-right of the
    last column wraps to the current row's first pixel), matching the
    spec's contiguous-ARGB formulation."""
    bw = -(-w // (1 << size_bits))
    modes = ((modes_img >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64)
    p = px.astype(np.int64)
    for y in range(h):
        row_mode_base = (y >> size_bits) * bw
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(p[i - 1])
            elif x == 0:
                pred = tuple(p[i - w])
            else:
                mode = int(modes[row_mode_base + (x >> size_bits)])
                L = p[i - 1]
                T = p[i - w]
                TR = p[i - w + 1]
                TL = p[i - w - 1]
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = tuple(L)
                elif mode == 2:
                    pred = tuple(T)
                elif mode == 3:
                    pred = tuple(TR)
                elif mode == 4:
                    pred = tuple(TL)
                elif mode == 5:
                    pred = tuple(_avg2(_avg2(L, TR), T))
                elif mode == 6:
                    pred = tuple(_avg2(L, TL))
                elif mode == 7:
                    pred = tuple(_avg2(L, T))
                elif mode == 8:
                    pred = tuple(_avg2(TL, T))
                elif mode == 9:
                    pred = tuple(_avg2(T, TR))
                elif mode == 10:
                    pred = tuple(_avg2(_avg2(L, TL), _avg2(T, TR)))
                elif mode == 11:
                    # Select(T, L, TL)
                    if int(np.abs(L - TL).sum()) <= int(np.abs(T - TL).sum()):
                        pred = tuple(T)
                    else:
                        pred = tuple(L)
                elif mode == 12:
                    pred = tuple(
                        _clamp255(int(L[c]) + int(T[c]) - int(TL[c]))
                        for c in range(4)
                    )
                elif mode == 13:
                    pr = []
                    for c in range(4):
                        ave = (int(L[c]) + int(T[c])) >> 1
                        d = ave - int(TL[c])
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        pr.append(_clamp255(ave + half))
                    pred = tuple(pr)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            for c in range(4):
                p[i, c] = (p[i, c] + int(pred[c])) & 0xFF
    px[:] = p.astype(np.uint8)


def _apply_color_inverse(px: np.ndarray, w: int, h: int, size_bits: int,
                         cte_img: np.ndarray) -> None:
    """In-place inverse color transform (spec §4.2): per-block signed
    multipliers green→red, green→blue, red→blue."""
    bw = -(-w // (1 << size_bits))
    cte = cte_img.view(np.uint8).reshape(-1, 4)  # [B=g2r, G=g2b, R=r2b, A]
    g2r = cte[:, 0].astype(np.int8).astype(np.int64)
    g2b = cte[:, 1].astype(np.int8).astype(np.int64)
    r2b = cte[:, 2].astype(np.int8).astype(np.int64)
    a = px[:, 1].astype(np.int64)  # R channel (px layout [A, R, G, B])
    g = px[:, 2].astype(np.int64)
    b = px[:, 3].astype(np.int64)
    ys, xs = np.divmod(np.arange(w * h), w)
    block = (ys >> size_bits) * bw + (xs >> size_bits)
    gs = g.astype(np.int8).astype(np.int64)  # deltas use signed 8-bit args

    def delta(t, c):
        return (t * c) >> 5

    red = (a + delta(g2r[block], gs)) & 0xFF
    rs = red.astype(np.uint8).astype(np.int8).astype(np.int64)
    blue = (b + delta(g2b[block], gs) + delta(r2b[block], rs)) & 0xFF
    px[:, 1] = red.astype(np.uint8)
    px[:, 3] = blue.astype(np.uint8)


def decode_vp8l(d: bytes) -> np.ndarray:
    """Decode a raw VP8L stream -> (h, w, 4) uint8 RGBA."""
    if len(d) < 5 or d[0] != 0x2F:
        raise ValueError("not a VP8L stream (missing 0x2f signature)")
    br = _BitReader(d[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    _alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    argb, transforms = _read_entropy_image(br, w, h, True)

    # channel view [B, G, R, A] little-endian; reorder to [A, R, G, B]
    def chans(arr: np.ndarray) -> np.ndarray:
        v = arr.view(np.uint8).reshape(-1, 4)
        return v[:, [3, 2, 1, 0]].copy()

    px = chans(argb)
    for t in reversed(transforms):
        if t[0] == 3:  # color indexing
            _k, width_bits, pal, orig_w = t
            idx = px[:, 2].astype(np.int64)  # green channel
            if width_bits:
                packed_w = -(-orig_w // (1 << width_bits))
                bpp = 8 >> width_bits
                mask = (1 << bpp) - 1
                rows = idx.reshape(h, packed_w)
                # unpack little-end-first: pixel j sits in packed column
                # j // pixels_per_byte at bit offset (j % ppb) * bpp
                sub = np.arange(orig_w)
                ppb = 1 << width_bits
                cols = sub // ppb
                shifts = (sub % ppb) * bpp
                idx = (rows[:, cols] >> shifts[None, :]) & mask
                idx = idx.reshape(-1)
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("palette index out of range")
            bgra = pal[idx]  # pal rows are [B, G, R, A]
            px = bgra[:, [3, 2, 1, 0]].copy()
        elif t[0] == 2:  # subtract green: r += g, b += g
            g = px[:, 2].astype(np.int64)
            px[:, 1] = ((px[:, 1].astype(np.int64) + g) & 0xFF).astype(np.uint8)
            px[:, 3] = ((px[:, 3].astype(np.int64) + g) & 0xFF).astype(np.uint8)
        elif t[0] == 1:
            _apply_color_inverse(px, t[3], h, t[1], t[2])
        elif t[0] == 0:
            _apply_predictor_inverse(px, t[3], h, t[1], t[2])

    rgba = px[:, [1, 2, 3, 0]].reshape(h, w, 4)
    return rgba


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a .webp container -> (h, w, 4) uint8 RGBA. Only lossless
    (VP8L) payloads are supported; lossy VP8/VP8X-wrapped-VP8 raises."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container (missing RIFF/WEBP)")
    i = 12
    n = len(data)
    saw = []
    while i + 8 <= n:
        tag = data[i : i + 4]
        sz = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if tag == b"VP8L":
            return decode_vp8l(data[i + 8 : i + 8 + sz])
        saw.append(tag.decode("latin-1").strip())
        i += 8 + sz + (sz & 1)
    raise ValueError(
        f"no VP8L chunk (found {saw}); lossy VP8 decode is out of scope "
        "(DCT + boolean arithmetic coder; no codec library in this "
        "environment)"
    )


# ---------------------------------------------------------------------------
# minimal spec-valid lossless encoder: literals only, flat 8-bit prefix
# codes, no transforms, no cache. ~25 bits/pixel — built for bit-exact
# round-trip validation and for writing valid .webp files, not for ratio.
# ---------------------------------------------------------------------------


def _write_flat256_code(bw: _BitWriter, trailing: int) -> None:
    """Emit a code-length-coded prefix code: symbols 0..255 all length 8,
    then ``trailing`` zero-length symbols (the +24/+cache green tail)."""
    bw.write(0, 1)  # not simple
    # code-length code: symbols {0 (len 1), 8 (len 1)}; order indices:
    # 17,18,0,1,2,3,4,5,16,6,7,8 -> need 12 entries
    bw.write(12 - 4, 4)
    lens = {0: 1, 8: 1}
    for k in _CL_ORDER[:12]:
        bw.write(lens.get(k, 0), 3)
    if trailing:
        # explicit max symbol = 256: use_length=1, length_nbits=8 (3-bit
        # field value 3), value 254
        bw.write(1, 1)
        bw.write(3, 3)
        bw.write(254, 8)
    else:
        bw.write(0, 1)
    # cl code canonical: symbol 0 -> code 0, symbol 8 -> code 1 (len 1)
    for _ in range(256):
        bw.write_code(1, 1)  # emit '8' 256 times


def _write_single_symbol_code(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if sym >= 2:
        bw.write(1, 1)
        bw.write(sym, 8)
    else:
        bw.write(0, 1)
        bw.write(sym, 1)


def encode_webp_lossless(rgba: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> .webp bytes (VP8L, literal-coded)."""
    a = np.asarray(rgba)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[-1] == 3:
        alpha = np.full(a.shape[:2] + (1,), 255, dtype=np.uint8)
        a = np.concatenate([a, alpha], axis=-1)
    if a.dtype != np.uint8:
        raise ValueError("encode_webp_lossless takes uint8 samples")
    h, w = a.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("image dimensions out of VP8L range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if bool((a[..., 3] != 255).any()) else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    _write_flat256_code(bw, 24)  # green
    _write_flat256_code(bw, 0)  # red
    _write_flat256_code(bw, 0)  # blue
    alpha_plane = a[..., 3]
    single_alpha = bool((alpha_plane == alpha_plane.reshape(-1)[0]).all())
    if single_alpha:
        _write_single_symbol_code(bw, int(alpha_plane.reshape(-1)[0]))
    else:
        _write_flat256_code(bw, 0)
    _write_single_symbol_code(bw, 0)  # distance (never used)
    flat = a.reshape(-1, 4)
    # flat canonical 8-bit code: symbol s -> code s
    for r, g, b, al in flat:
        bw.write_code(int(g), 8)
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
        if not single_alpha:
            bw.write_code(int(al), 8)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
