"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern: media rides as a ``binary`` column with sidecar metadata columns
(codec/mime, dimensions, duration); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so payload bytes
cross the JVM<->Python boundary once per batch, never per row.

AUDIO is the real implementation in this repo (operators/audio.py uses
functions/audio_codec). IMAGE decode is REAL for uncompressed formats —
PPM (P6) and 24-bit BMP are parsed byte-for-byte in numpy
(functions/image_codec.py), and resize/feature-extract operate on the
actual pixels. PNG/JPEG decoding needs an imaging lib the container
lacks; those payloads surface as decode_ok=False with a clear reason
(PIL is picked up automatically when present). VIDEO decode is REAL for
uncompressed 24-bit DIB AVI (functions/video_codec.py parses the RIFF
container byte-for-byte); compressed codecs need ffmpeg/pyav and are
skipped with the same decode_ok=False policy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.image_codec import decode_image, encode_ppm, luminance_feature, resize_nearest

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
) -> DataFrame:
    """decode -> feature-extract, one Arrow pass over REAL pixels (PPM/
    BMP parsed in numpy; Rec.601 luminance mean-pooled to a
    sqrt(feature_dim)^2 grid). Undecodable payloads yield decode_ok=False
    rows (never task failures) — same policy as the audio decode gate.
    """
    grid = int(round(feature_dim ** 0.5))
    if grid * grid != feature_dim:
        raise ValueError("feature_dim must be a perfect square (grid feature)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, feats, oks = [], [], [], [], []
            for i in range(len(pdf)):
                ids.append(str(pdf[id_col].iat[i]))
                try:
                    img = decode_image(pdf[payload_col].iat[i])
                    ws.append(img.shape[1]); hs.append(img.shape[0])
                    feats.append(luminance_feature(img, grid).tolist())
                    oks.append(True)
                except (ValueError, TypeError):
                    ws.append(None); hs.append(None); feats.append(None); oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "feature": feats, "decode_ok": oks}
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode (PPM), one Arrow
    pass. Real pixel work end-to-end for PPM/BMP inputs; undecodable
    payloads come back decode_ok=False with a null payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, oks = [], [], []
            for i in range(len(pdf)):
                ids.append(str(pdf[id_col].iat[i]))
                try:
                    img = decode_image(pdf[payload_col].iat[i])
                    outs.append(encode_ppm(resize_nearest(img, width, height)))
                    oks.append(True)
                except (ValueError, TypeError):
                    outs.append(None); oks.append(False)
            yield pd.DataFrame({"media_id": ids, "payload": outs, "decode_ok": oks})

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
    raw_chunk_fallback: bool = False,
) -> DataFrame:
    """Video frame sampling: one input row -> multiple frame rows (1:N
    mapInPandas — the batch iterator contract allows output cardinality
    != input). REAL decode for uncompressed 24-bit DIB AVI payloads
    (functions/video_codec.py parses the RIFF container byte-for-byte);
    every ``every_n``-th frame is re-encoded as PPM so sampled frames
    feed straight into :func:`image_features` / :func:`resize_images`.

    Payloads the byte-level parser cannot read (compressed codecs need
    ffmpeg/pyav) are SKIPPED — same decode_ok=False policy as audio and
    images. ``raw_chunk_fallback=True`` restores round-2's pseudo-frame
    chunking for opaque payloads (fixed 256-byte slices), for pipelines
    that only exercise the 1:N plumbing."""
    from ..functions.video_codec import decode_avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = 256
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iat[i]
                if payload is None:
                    continue
                mid = str(pdf[id_col].iat[i])
                try:
                    _fps, decoded = decode_avi(bytes(payload))
                    for f in range(0, len(decoded), every_n):
                        ids.append(mid)
                        idxs.append(f)
                        frames.append(encode_ppm(decoded[f]))
                except ValueError:
                    if not raw_chunk_fallback:
                        continue
                    n_frames = max(1, len(payload) // chunk)
                    for f in range(0, n_frames, every_n):
                        ids.append(mid)
                        idxs.append(f)
                        frames.append(bytes(payload[f * chunk:(f + 1) * chunk]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, FRAME_SCHEMA)
