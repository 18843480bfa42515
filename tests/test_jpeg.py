"""Baseline JPEG decoder (core/jpeg.py) against externally-encoded
fixtures: JDK-ImageIO JPEGs pinned in tests/fixtures (generator:
fixtures/WriteJpeg.java, deterministic pixel patterns; .raw = original
pixels, .dec = JDK's own decode of the same file).

Two invariants:
- PSNR(our decode, original) >= 40 dB at quality 0.95+ (the input_hint's
  lossy-decode bar);
- PSNR(our decode, JDK's decode) >= 50 dB — the two decoders agree to
  rounding, so residual vs the original is encoder loss, not ours.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from exactextractr_spark.core.jpeg import decode_jpeg

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _raw(name, h, w, ch):
    a = np.frombuffer(open(os.path.join(FIX, name), "rb").read(), np.uint8)
    return a.reshape(h, w, ch) if ch == 3 else a.reshape(h, w)


def test_grayscale_psnr():
    got = decode_jpeg(open(os.path.join(FIX, "jdk_gray.jpg"), "rb").read())
    assert got.shape == (53, 67)
    assert _psnr(got, _raw("jdk_gray.raw", 53, 67, 1)) >= 40.0


def test_grayscale_odd_dims():
    """Non-multiple-of-8 dimensions exercise the MCU-padding crop."""
    got = decode_jpeg(
        open(os.path.join(FIX, "jdk_gray_odd.jpg"), "rb").read()
    )
    assert got.shape == (21, 33)
    assert _psnr(got, _raw("jdk_gray_odd.raw", 21, 33, 1)) >= 40.0


def test_color_420_psnr():
    """3-component YCbCr 4:2:0: >=40 dB vs the original and >=50 dB vs the
    JDK's own decode (decoder parity modulo rounding)."""
    got = decode_jpeg(
        open(os.path.join(FIX, "jdk_rgb_smooth.jpg"), "rb").read()
    )
    assert got.shape == (64, 96, 3)
    assert _psnr(got, _raw("jdk_rgb_smooth.raw", 64, 96, 3)) >= 40.0
    assert _psnr(got, _raw("jdk_rgb_smooth.dec", 64, 96, 3)) >= 50.0


def test_restart_intervals():
    """DRI/RSTn: DC predictors reset per restart segment."""
    got = decode_jpeg(
        open(os.path.join(FIX, "jdk_rgb_rst.jpg"), "rb").read()
    )
    assert got.shape == (48, 80, 3)
    assert _psnr(got, _raw("jdk_rgb_rst.dec", 48, 80, 3)) >= 50.0


def test_unsupported_sof_rejected():
    """Progressive now decodes; lossless/arithmetic SOFs still refuse."""
    data = bytearray(open(os.path.join(FIX, "jdk_gray.jpg"), "rb").read())
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless sequential)
    with pytest.raises(ValueError, match="SOF marker 0xC3"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_and_truncated():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    data = open(os.path.join(FIX, "jdk_gray.jpg"), "rb").read()
    sos = data.find(b"\xff\xda")
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(data[:sos])


def test_image_features_jpeg_e2e(spark):
    """The multimodal feature pass over fmt='jpeg' rows decodes for real:
    mean/std of the features match the fixture's original pixels."""
    from exactextractr_spark.operators.multimodal import image_features

    data = open(os.path.join(FIX, "jdk_gray.jpg"), "rb").read()
    orig = _raw("jdk_gray.raw", 53, 67, 1)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "image_id": ["g1"],
            "bytes": [data],
            "w": np.array([67], dtype=np.int32),
            "h": np.array([53], dtype=np.int32),
            "fmt": ["jpeg"],
        }
    )
    df = spark.createDataFrame(pdf)
    row = image_features(df).collect()[0]
    assert row["mean_px"] == pytest.approx(float(orig.mean()), abs=1.0)
    assert row["std_px"] == pytest.approx(float(orig.std()), abs=1.0)
    assert row["h"] == 53 and row["w"] == 67


def test_progressive_grayscale():
    """SOF2 progressive (JDK scan script: DC successive approximation +
    spectral AC bands + refinement scans)."""
    got = decode_jpeg(
        open(os.path.join(FIX, "jdk_prog_gray.jpg"), "rb").read()
    )
    assert got.shape == (53, 67)
    assert _psnr(got, _raw("jdk_prog_gray.raw", 53, 67, 1)) >= 40.0


def test_progressive_color_parity():
    data = open(os.path.join(FIX, "jdk_prog_rgb.jpg"), "rb").read()
    assert b"\xff\xc2" in data  # really SOF2
    got = decode_jpeg(data)
    assert got.shape == (64, 96, 3)
    assert _psnr(got, _raw("jdk_prog_rgb.raw", 64, 96, 3)) >= 40.0
    assert _psnr(got, _raw("jdk_prog_rgb.dec", 64, 96, 3)) >= 50.0


def test_progressive_restart_intervals():
    got = decode_jpeg(
        open(os.path.join(FIX, "jdk_prog_rst.jpg"), "rb").read()
    )
    assert got.shape == (48, 80, 3)
    assert _psnr(got, _raw("jdk_prog_rst.dec", 48, 80, 3)) >= 50.0


def test_four_component_rejected():
    # Adobe CMYK/YCCK (4-component SOF) must fail loudly at parse time,
    # not crash deep in the decode tail
    sof = (b"\xff\xd8\xff\xc0" + (8 + 3 * 4 + 1).to_bytes(2, "big")
           + b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
           + b"\x04"
           + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00\x04\x11\x00")
    with pytest.raises(ValueError, match="4-component"):
        decode_jpeg(sof)


def test_color_transform_flag_linear_relation():
    # decode(color_transform=False) must return the raw component planes;
    # applying the JFIF YCbCr->RGB matrix to them reproduces the default
    # decode exactly (same dequant/IDCT path, transform is the only delta)
    data = open(os.path.join(FIX, "jdk_rgb_smooth.jpg"), "rb").read()
    rgb = decode_jpeg(data)
    ycc = decode_jpeg(data, color_transform=False)
    assert ycc.shape == rgb.shape
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    manual = np.clip(
        np.stack(
            [y + 1.402 * cr,
             y - 0.344136 * cb - 0.714136 * cr,
             y + 1.772 * cb], axis=-1),
        0.0, 255.0,
    )
    np.testing.assert_array_equal(manual, rgb)
    # grayscale is unaffected by the flag
    g = open(os.path.join(FIX, "jdk_gray.jpg"), "rb").read()
    np.testing.assert_array_equal(
        decode_jpeg(g), decode_jpeg(g, color_transform=False)
    )
