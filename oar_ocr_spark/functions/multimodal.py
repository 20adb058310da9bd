"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The container has no
image/audio codecs, so the *codec* call is stubbed behind
``_decode_payload`` — a deterministic fake for synthetic refs (the
engine's renderer) and ``NotImplementedError`` for real formats — while
everything Spark-side (schema, batching, partitioning, UDF signature,
batch shapes) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_SCHEMA", "decode_media_df", "image_features_df", "frame_sample_df"]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.FloatType()),
        T.StructField("ink_ratio", T.FloatType()),
        T.StructField("n_regions", T.IntegerType()),
    ]
)


def _decode_payload(media_ref: str, media_type: str) -> np.ndarray:
    """Codec seam. Synthetic refs decode via the deterministic renderer;
    real formats (PNG/JPEG/WAV/MP4) would dispatch to PIL/ffmpeg here.
    """
    if media_type == "image":
        from ..fixtures.render import render_page

        return render_page(media_ref)
    raise NotImplementedError(
        f"codec for media_type={media_type!r} not available in this environment"
    )


def decode_media_df(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """(media_ref) → decoded metadata row per media item."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                img = _decode_payload(ref, "image")
                rows.append((ref, "image", img.shape[1], img.shape[0], img.nbytes))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return refs.select(F.col(ref_col).alias("media_ref")).mapInPandas(
        it, schema=MEDIA_META_SCHEMA
    )


def image_features_df(refs: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Decode + feature-extract: dims, mean intensity, ink ratio, region
    count (via the detection operators) per media item."""
    from ..local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                img = _decode_payload(ref, "image")
                upright, _ = preprocess_page(img, cfg)
                boxes, _ = detect_page(upright, cfg)
                rows.append(
                    (
                        ref,
                        img.shape[1],
                        img.shape[0],
                        float(img.mean()),
                        float((img < 200).mean()),
                        int(len(boxes)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURES_SCHEMA.fields])

    return refs.select(F.col(ref_col).alias("media_ref")).mapInPandas(
        it, schema=_FEATURES_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
    ]
)


def frame_sample_df(
    refs: DataFrame, n_frames: int = 4, ref_col: str = "media_ref"
) -> DataFrame:
    """Frame-sampling plumbing for video-like media: emits n_frames
    evenly-spaced "frames" per ref (here: horizontal strips of the
    decoded page — the real sampler would seek the container). Shows
    the 1→N explode shape + binary payload batching."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf[ref_col]:
                img = _decode_payload(ref, "image")
                h = img.shape[0]
                for i in range(n_frames):
                    y0 = (h * i) // n_frames
                    y1 = (h * (i + 1)) // n_frames
                    strip = np.ascontiguousarray(img[y0:y1])
                    rows.append(
                        (ref, i, strip.tobytes(), strip.shape[0], strip.shape[1])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return refs.select(F.col(ref_col).alias("media_ref")).mapInPandas(
        it, schema=_FRAME_SCHEMA
    )
