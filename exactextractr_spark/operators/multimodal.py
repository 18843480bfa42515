"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with typed metadata
(w, h, fmt, caption — the BASELINE.json input shape). The Spark-side
plumbing (schema, partitioning, Arrow batch shape, UDF signatures) is real
and tested; PNG decode is fully real (core/png.py). Decoders for formats
whose codecs aren't in this container (jpeg/webp/audio/video) are stubbed
behind ``NotImplementedError`` with a deterministic fake available for
pipeline testing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.png import decode_tile, phash64

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("thumb8", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_any(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Dispatch by format. PNG (our float-packed tiles) decodes for real;
    other codecs are not available in this container."""
    if fmt == "png":
        return decode_tile(data, w, h)
    if fmt == "fake":
        # deterministic fake decode: pixels from the payload hash, so the
        # pipeline shape (batching, schema, feature extraction) is testable
        seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.uniform(0, 255, (h, w))
    raise NotImplementedError(
        f"decoder for {fmt!r} not available in this environment; "
        "only 'png' (real) and 'fake' (deterministic stub) are supported"
    )


def image_features(images: DataFrame) -> DataFrame:
    """Decode → feature-extract (mean/std, perceptual hash, 8x8 thumbnail)
    in one Arrow-batched pass. Input: the image table shape
    (image_id, bytes, w, h, fmt, ...)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = _decode_any(bytes(data), str(fmt), int(w), int(h))
                finite = px[~np.isnan(px)]
                # 8x8 block-mean thumbnail (resize stub, pure numpy)
                ph, pw = (-px.shape[0]) % 8, (-px.shape[1]) % 8
                padded = np.pad(
                    np.nan_to_num(px), ((0, ph), (0, pw)), mode="edge"
                )
                th = padded.reshape(
                    8, padded.shape[0] // 8, 8, padded.shape[1] // 8
                ).mean(axis=(1, 3))
                rows.append(
                    {
                        "image_id": iid,
                        "h": int(h),
                        "w": int(w),
                        "mean_px": float(finite.mean()) if len(finite) else float("nan"),
                        "std_px": float(finite.std()) if len(finite) else float("nan"),
                        "phash": phash64(px),
                        "thumb8": th.ravel(),
                    }
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _feat, FEATURES_SCHEMA
    )


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (video_id, frame_idx) rows for
    frames to decode. Decode itself is stubbed (no video codec here), but
    the fan-out/partitioning shape is the real one: explode frame indexes
    JVM-side, decode-in-mapInPandas downstream."""
    return videos.select(
        F.col("image_id").alias("video_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
