"""Lossless WebP (VP8L) decoder tests.

No external WebP encoder exists in this container (no cwebp / PIL /
ffmpeg; JDK ImageIO has no WebP plugin), so the usual external-fixture
strategy (as used for PNG/JPEG/TIFF via JDK) is unavailable. Validation
therefore rests on two independent legs:

1. HAND-ASSEMBLED bitstreams: built bit-by-bit below from the published
   spec with a bit-writer written in this file (independent of
   core/webp.py's), with expected pixels derived BY HAND in the comments.
   These cover the paths the minimal encoder never emits: simple 2-symbol
   codes, code-length-coded sparse alphabets, subtract-green, the
   predictor transform, color-indexing with pixel bundling, LZ77
   backward references through the 2-D distance map, and the color cache.
2. Lossless round-trips through encode_webp_lossless: bit-exactness is
   the format's own invariant and pins the huffman/bitstream layer.
"""

from __future__ import annotations

import numpy as np
import pytest

from exactextractr_spark.core.webp import (
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


class BW:
    """LSB-first bit writer (independent of core/webp.py's)."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def code(self, c: int, length: int):
        """Canonical prefix code, MSB first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((c >> i) & 1)
        return self

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                v |= bit << j
            out.append(v)
        return bytes(out)


def _header(bw: BW, w: int, h: int, alpha=0):
    bw.b(0x2F, 8).b(w - 1, 14).b(h - 1, 14).b(alpha, 1).b(0, 3)


def _simple2(bw: BW, s0: int, s1: int):
    """Simple prefix code, two symbols (both 8-bit), s0 < s1 so the
    canonical assignment (code 0 -> smaller symbol) is unambiguous."""
    assert s0 < s1
    bw.b(1, 1).b(1, 1).b(1, 1).b(s0, 8).b(s1, 8)


def _single(bw: BW, sym: int):
    bw.b(1, 1).b(0, 1)
    if sym >= 2:
        bw.b(1, 1).b(sym, 8)
    else:
        bw.b(0, 1).b(sym, 1)


def test_subtract_green_simple_codes():
    # 4x2, alternating two colors, subtract-green transform.
    # Final colors C1=(r120,g100,b90), C2=(r10,g200,b5); stored residuals:
    # C1: g=100 r=(120-100)%256=20  b=(90-100)%256=246
    # C2: g=200 r=(10-200)%256=66   b=(5-200)%256=61
    bw = BW()
    _header(bw, 4, 2)
    bw.b(1, 1).b(2, 2)  # transform: subtract green
    bw.b(0, 1)  # no more transforms
    bw.b(0, 1)  # no color cache
    bw.b(0, 1)  # no meta prefix
    _simple2(bw, 100, 200)  # green: 0->100, 1->200
    _simple2(bw, 20, 66)    # red:   0->20,  1->66
    _simple2(bw, 61, 246)   # blue:  0->61,  1->246
    _single(bw, 255)        # alpha
    _single(bw, 0)          # distance (unused)
    for i in range(8):
        c2 = i % 2  # even pixels C1, odd C2
        bw.b(c2, 1)            # green bit
        bw.b(c2, 1)            # red bit (20 vs 66)
        bw.b(1 - c2, 1)        # blue bit (246 is code 1, 61 is code 0)
    img = decode_vp8l(bw.bytes())
    assert img.shape == (2, 4, 4)
    flat = img.reshape(-1, 4)
    np.testing.assert_array_equal(flat[0::2], [[120, 100, 90, 255]] * 4)
    np.testing.assert_array_equal(flat[1::2], [[10, 200, 5, 255]] * 4)


def test_predictor_transform_modes_black_L_T_and_12():
    # 2x2, predictor transform with one block (size_bits=2), mode 12.
    # Residual (a,r,g,b)=(0,10,20,30) for every pixel. By the spec's edge
    # rules: (0,0) predicts opaque black -> (255,10,20,30); (0,1) uses L
    # -> (255,20,40,60); (1,0) uses T -> (255,20,40,60); (1,1) uses mode
    # 12 ClampAddSubtractFull: pred = L+T-TL = (255,30,60,90), +res ->
    # (255,40,80,120).
    bw = BW()
    _header(bw, 2, 2)
    bw.b(1, 1).b(0, 2)  # transform: predictor
    bw.b(0, 3)  # size_bits - 2 = 0 -> 4x4 blocks -> one block
    # 1x1 mode subimage (entropy-coded, not level0): no cache, codes
    bw.b(0, 1)  # no cache
    _single(bw, 12)   # green = predictor mode 12
    _single(bw, 0)    # red
    _single(bw, 0)    # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)    # dist
    # (single-symbol codes: the one subimage pixel costs zero data bits)
    bw.b(0, 1)  # no more transforms
    bw.b(0, 1)  # no cache
    bw.b(0, 1)  # no meta
    _single(bw, 20)   # green residuals all 20
    _single(bw, 10)   # red residuals all 10
    _single(bw, 30)   # blue
    _single(bw, 0)    # alpha residual 0
    _single(bw, 0)    # dist
    img = decode_vp8l(bw.bytes())
    np.testing.assert_array_equal(
        img.reshape(-1, 4),
        [[10, 20, 30, 255], [20, 40, 60, 255],
         [20, 40, 60, 255], [40, 80, 120, 255]],
    )


def test_color_indexing_with_pixel_bundling():
    # 8x1, 2-color palette -> width_bits=3 (8 px/byte), packed width 1.
    # Palette: entry0 raw (a255,r10,g20,b30); entry1 stored as DELTA
    # (0,40,40,40) -> resolves to (255,50,60,70).
    # Pattern [0,1,0,1,1,0,1,0] little-end-first -> green byte 0b01011010
    # = 90.
    bw = BW()
    _header(bw, 8, 1)
    bw.b(1, 1).b(3, 2)  # transform: color indexing
    bw.b(1, 8)  # n_colors - 1 = 1
    # palette subimage (2x1): no cache, simple codes
    bw.b(0, 1)
    _simple2(bw, 20, 40)  # greens: e0=20, e1(delta)=40
    _simple2(bw, 10, 40)  # reds
    _simple2(bw, 30, 40)  # blues
    _simple2(bw, 0, 255)  # alphas: e0=255 -> code 1; e1 delta 0 -> code 0
    _single(bw, 0)
    bw.b(0, 1).b(0, 1).b(0, 1).b(1, 1)  # e0: g=20,r=10,b=30,a=255
    bw.b(1, 1).b(1, 1).b(1, 1).b(0, 1)  # e1: g=40,r=40,b=40,a=0
    bw.b(0, 1)  # no more transforms
    bw.b(0, 1)  # no cache
    bw.b(0, 1)  # no meta
    _single(bw, 90)   # green: the packed byte
    _single(bw, 0)    # red
    _single(bw, 0)    # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)    # dist
    img = decode_vp8l(bw.bytes())
    pat = [0, 1, 0, 1, 1, 0, 1, 0]
    pal = [(10, 20, 30, 255), (50, 60, 70, 255)]
    np.testing.assert_array_equal(
        img.reshape(-1, 4), [pal[p] for p in pat]
    )


def test_lz77_distance_map_and_color_cache():
    # 9x1: one literal (r1,g2,b3,a255), LZ77 copy length 7 distance
    # plane-code 2 (= map entry (1,0) -> distance 1), then a color-cache
    # hit of the same color. Exercises: code-length-coded sparse green
    # alphabet (incl. symbols > 255), LZ77 prefix values, the 2-D
    # distance map, and cache insert/lookup.
    cache_bits = 1
    argb = (255 << 24) | (1 << 16) | (2 << 8) | 3
    idx = ((argb * 0x1E35A7BD) % (1 << 32)) >> (32 - cache_bits)
    green_cache_sym = 256 + 24 + idx
    # green code lengths: {2: 1, 261: 2, green_cache_sym: 2} — emitted
    # via the code-length code with symbols {0(len2),1(len2),2(len2),
    # 17(len3),18(len3)}; canonical: 0->00,1->01,2->10,17->110,18->111
    bw = BW()
    _header(bw, 9, 1)
    bw.b(0, 1)  # no transforms
    bw.b(1, 1).b(cache_bits, 4)  # color cache, 2 slots
    bw.b(0, 1)  # no meta
    # ---- green code (code-length-coded) ----
    bw.b(0, 1)  # not simple
    bw.b(12 - 4, 4)  # 12 code-length entries (through order index of 8)
    cl_lens = {0: 2, 1: 2, 2: 2, 17: 3, 18: 3}
    for k in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8):
        bw.b(cl_lens.get(k, 0), 3)
    # explicit max symbol = green_cache_sym + 1
    n_syms = green_cache_sym + 1
    bw.b(1, 1)
    bw.b(4, 3)  # length_nbits = 2 + 2*4 = 10
    bw.b(n_syms - 2, 10)
    CL = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2),
          17: (0b110, 3), 18: (0b111, 3)}

    def cl(sym):
        c, ln = CL[sym]
        bw.code(c, ln)

    cl(0); cl(0)          # positions 0,1 zero
    cl(1)                  # position 2: length 1
    cl(18); bw.b(127, 7)   # 138 zeros (3..140)
    cl(18); bw.b(109, 7)   # 120 zeros (141..260)
    cl(2)                  # position 261 (the length-7 LZ77 symbol): len 2
    # zeros up to green_cache_sym, then its length
    gap = green_cache_sym - 262
    for _ in range(gap):
        cl(0)
    cl(2)                  # green_cache_sym: len 2
    # canonical green: 2 -> 0 (len1); 261 -> 10, cache_sym -> 11 (len2)
    # ---- red/blue/alpha/dist codes ----
    _single(bw, 1)    # red
    _single(bw, 3)    # blue
    _single(bw, 255)  # alpha
    _single(bw, 1)    # dist: always plane-code prefix 1 -> value 2
    # ---- data ----
    bw.code(0b0, 1)    # literal green=2 (r/b/a cost no bits)
    bw.code(0b10, 2)   # LZ77 length symbol 261 = 256 + prefix 5
    bw.b(0, 1)         # extra bit for length prefix 5 -> length 7
    # dist code single-symbol -> plane code value 2 -> map[1] = (1,0)
    bw.code(0b11, 2)   # color-cache hit
    img = decode_vp8l(bw.bytes())
    np.testing.assert_array_equal(
        img.reshape(-1, 4), [[1, 2, 3, 255]] * 9
    )


def test_distance_map_head_matches_spec():
    # the first entries of the 2-D distance map as printed in the spec
    from exactextractr_spark.core.webp import _DIST_MAP

    head = [tuple(r) for r in _DIST_MAP[:14]]
    assert head == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        (0, 3), (3, 0),
    ]
    assert len(_DIST_MAP) == 120
    xs, ys = _DIST_MAP[:, 0], _DIST_MAP[:, 1]
    assert xs.min() >= -7 and xs.max() <= 8 and ys.min() >= 0
    d2 = xs * xs + ys * ys
    assert (np.diff(d2) >= 0).all()  # sorted by distance


def test_roundtrip_lossless_bit_exact():
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (5, 9, 3), (32, 17, 4), (64, 64, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_webp(encode_webp_lossless(img))
        want = (
            img if shape[-1] == 4
            else np.concatenate(
                [img, np.full(shape[:2] + (1,), 255, np.uint8)], axis=-1
            )
        )
        np.testing.assert_array_equal(dec, want)
    # non-opaque alpha round-trips too (alpha plane gets a full code)
    img = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    img[..., 3] = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    np.testing.assert_array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOPE")
    with pytest.raises(ValueError, match="VP8L"):
        # container with only a lossy VP8 chunk
        import struct

        chunk = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        riff = b"WEBP" + chunk
        decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x00\x00\x00\x00")


def test_image_features_webp_e2e(spark):
    """fmt='webp' rows flow through the image_features operator."""
    import pandas as pd

    from exactextractr_spark.operators.multimodal import image_features

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)]
    pdf = pd.DataFrame(
        {
            "image_id": [f"w{i}" for i in range(3)],
            "bytes": [encode_webp_lossless(im) for im in imgs],
            "w": [16] * 3,
            "h": [16] * 3,
            "fmt": ["webp"] * 3,
        }
    )
    out = image_features(spark.createDataFrame(pdf)).collect()
    assert len(out) == 3
    for row in out:
        im = imgs[int(row["image_id"][1])]
        luma = 0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]
        assert row["mean_px"] == pytest.approx(float(luma.mean()), rel=1e-12)
        assert row["std_px"] == pytest.approx(float(luma.std()), rel=1e-12)
