"""Audio quality features for training-data pipelines — the audio-payload
analog of ``text.quality_features`` (Gopher/C4-style keep/drop signals,
but for clips): RMS level, zero-crossing rate, clipping ratio, silence
ratio, duration.

One Arrow-batched ``mapInPandas`` pass over the clips scan (payload
bytes cross JVM->Python once per batch and are dropped immediately —
the same zero-shuffle shape as the validator's decode gate,
operators/audio.py). Undecodable payloads yield decode_ok=False rows,
never task failures.

Filter recipes these feed (downstream ``where`` on the feature frame):
- dead air: silence_ratio > 0.9 or rms_db < -55
- clipped/distorted capture: clip_ratio > 0.01
- tone/beep artifacts: zcr outside [0.01, 0.35] at speech sample rates
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.audio_codec import decode

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("dur_s", T.DoubleType(), True),
        T.StructField("rms_db", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("clip_ratio", T.DoubleType(), True),
        T.StructField("silence_ratio", T.DoubleType(), True),
    ]
)

_FULL_SCALE = 32768.0
_CLIP_LEVEL = 32760          # within 8 LSB of int16 rails
_SILENCE_LEVEL = 327         # ~ -40 dBFS


def _features_of(samples: np.ndarray, sr_hz: int) -> tuple[float, float, float, float, float]:
    n = len(samples)
    if n == 0:
        return 0.0, float("-inf"), 0.0, 0.0, 1.0
    f = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(f * f)))
    rms_db = 20.0 * np.log10(rms / _FULL_SCALE) if rms > 0 else float("-inf")
    zcr = float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))) if n > 1 else 0.0
    absf = np.abs(f)
    clip_ratio = float(np.mean(absf >= _CLIP_LEVEL))
    silence_ratio = float(np.mean(absf < _SILENCE_LEVEL))
    return n / sr_hz, rms_db, zcr, clip_ratio, silence_ratio


def audio_quality_features(
    clips: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """-> (clip_id, decode_ok, dur_s, rms_db, zcr, clip_ratio,
    silence_ratio); one decode pass, zero shuffle, O(keys) output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("clip_id", "decode_ok", "dur_s", "rms_db",
                                   "zcr", "clip_ratio", "silence_ratio")}
            for i in range(len(pdf)):
                out["clip_id"].append(str(pdf[id_col].iat[i]))
                try:
                    sr, samples = decode(
                        bytes(pdf[bytes_col].iat[i]), str(pdf[codec_col].iat[i])
                    )
                    if sr <= 0:  # decoders validate this; belt-and-braces
                        raise ValueError(f"invalid sample rate {sr}")
                    dur, rms_db, zcr, clip_r, sil_r = _features_of(samples, sr)
                    out["decode_ok"].append(True)
                    out["dur_s"].append(dur)
                    out["rms_db"].append(rms_db)
                    out["zcr"].append(zcr)
                    out["clip_ratio"].append(clip_r)
                    out["silence_ratio"].append(sil_r)
                except (ValueError, TypeError):
                    out["decode_ok"].append(False)
                    for k in ("dur_s", "rms_db", "zcr", "clip_ratio", "silence_ratio"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return clips.select(
        F.col(id_col), F.col(bytes_col), F.col(codec_col)
    ).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
