"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern: media rides as a ``binary`` column with sidecar metadata columns
(codec/mime, dimensions, duration); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so payload bytes
cross the JVM<->Python boundary once per batch, never per row.

AUDIO is the real implementation in this repo (operators/audio.py uses
functions/audio_codec). IMAGE/VIDEO decode is STUBBED — the container has
no imaging libs — behind clearly-marked functions: the Spark-side
plumbing (schema, batch shape, partitioning, UDF signatures) is real and
tested; the stub "decode" produces a deterministic fake so tests can
assert the full pipeline shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

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


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB decode: no PIL/opencv in this image. Deterministic fake —
    the md5 of the payload seeds a small 'pixel' array, so downstream
    stages (resize/feature) operate on real ndarray shapes. Replace with
    ``PIL.Image.open(io.BytesIO(payload))`` in production."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    digest = hashlib.md5(payload).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _feature_of(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic fake feature: channel-mean + downsampled grid,
    padded/truncated to ``dim``. Shape contract matches a real embedding
    extractor (array<float> of fixed dim)."""
    flat = img.astype(np.float32).mean(axis=2).ravel()
    out = np.resize(flat / 255.0, dim)
    return out.astype(np.float32)


def image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
) -> DataFrame:
    """decode -> feature-extract, one Arrow pass. Undecodable payloads
    yield decode_ok=False rows (never task failures) — same policy as the
    audio decode gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, feats, oks = [], [], [], [], []
            for i in range(len(pdf)):
                ids.append(str(pdf[id_col].iat[i]))
                try:
                    img = _fake_decode_image(pdf[payload_col].iat[i])
                    ws.append(img.shape[1]); hs.append(img.shape[0])
                    feats.append(_feature_of(img, feature_dim).tolist())
                    oks.append(True)
                except Exception:
                    ws.append(None); hs.append(None); feats.append(None); oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "feature": feats, "decode_ok": oks}
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one input row ->
    multiple frame rows (1:N mapInPandas — the batch iterator contract
    allows output cardinality != input). STUB 'video' = payload chunked
    into fixed-size pseudo-frames; a real build swaps in pyav/ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = 256
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iat[i]
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // chunk)
                for f in range(0, n_frames, every_n):
                    ids.append(str(pdf[id_col].iat[i]))
                    idxs.append(f)
                    frames.append(bytes(payload[f * chunk:(f + 1) * chunk]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, FRAME_SCHEMA)
