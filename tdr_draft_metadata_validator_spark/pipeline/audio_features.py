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


# ---------------------------------------------------------------------------
# audio near-dup: energy-envelope fingerprint + Hamming bucket join
# ---------------------------------------------------------------------------

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("afp", T.LongType(), True),
    ]
)

_FP_FRAMES = 64  # -> 63 delta bits, fits a non-negative int64


def envelope_fingerprint(samples: np.ndarray) -> int | None:
    """63-bit energy-delta fingerprint: split the clip into 64 equal
    windows, RMS each, bit i = (rms[i+1] > rms[i]) — the classic
    robust-audio-hash shape (Haitsma-Kalker energy deltas, simplified to
    one band). Invariant to uniform GAIN (deltas compare, not measure)
    and robust to lossy requantization (mu-law barely moves window RMS);
    different program material flips ~half the bits.

    Returns ``None`` for a FLAT envelope (silence / constant tone /
    empty): a flat clip carries no delta signal, and mapping every
    dead-air clip to fp=0 would both report distinct recordings as
    hamming-0 "duplicates" AND make the fp=0 bucket join O(k^2) — route
    those through the silence_ratio quality filter instead.
    """
    n = len(samples)
    if n < _FP_FRAMES:
        samples = np.pad(samples.astype(np.float64), (0, _FP_FRAMES - n))
        n = _FP_FRAMES
    f = samples.astype(np.float64)
    edges = np.linspace(0, n, _FP_FRAMES + 1, dtype=np.int64)
    # vectorized per-window mean square: one reduceat + one sqrt (this
    # sits on the Arrow hot path — no per-window python calls)
    sq = np.add.reduceat(f * f, edges[:-1])
    widths = np.diff(edges)
    rms = np.sqrt(sq / np.maximum(widths, 1))
    bits = rms[1:] > rms[:-1]
    if not bits.any() and not (rms[1:] < rms[:-1]).any():
        return None  # flat envelope: no signal to fingerprint
    # 63 shifts of python int — negligible next to the decode above
    return sum(1 << i for i, b in enumerate(bits) if b)


def audio_fingerprints(
    clips: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """-> (clip_id, decode_ok, afp): one Arrow decode pass, zero shuffle —
    the audio analog of text fingerprinting. md5 exact fingerprints
    (operators/audio.py) catch bit-identical dups; THIS catches
    re-encoded / gain-adjusted copies of the same recording."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, oks, fps = [], [], []
            for i in range(len(pdf)):
                ids.append(str(pdf[id_col].iat[i]))
                try:
                    _sr, samples = decode(
                        bytes(pdf[bytes_col].iat[i]), str(pdf[codec_col].iat[i])
                    )
                    fps.append(envelope_fingerprint(samples))  # None if flat
                    oks.append(True)
                except (ValueError, TypeError):
                    fps.append(None)
                    oks.append(False)
            # nullable Int64, NOT a plain list: one None would coerce the
            # column to float64 and clip fingerprints above 2^53 (silent
            # bit corruption breaking the exact-recall guarantee)
            yield pd.DataFrame({
                "clip_id": ids, "decode_ok": oks,
                "afp": pd.array(fps, dtype="Int64"),
            })

    return clips.select(
        F.col(id_col), F.col(bytes_col), F.col(codec_col)
    ).mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_near_dups(
    clips: DataFrame,
    max_hamming: int = 3,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Audio near-dup pairs by Hamming distance on the envelope
    fingerprint — the pyspark x audio dedup the text SimHash path can't
    provide. Candidate generation: 4-way fingerprint chunking -> bucket
    equi-join -> exact popcount filter. Pigeonhole guarantees EXACT
    recall only for ``max_hamming <= 3`` (4 chunks: <= 3 bit errors
    leave >= 1 chunk untouched); a larger radius may miss pairs whose
    errors spread across all chunks — raise the chunk count for exact
    recall at higher radii. Payload bytes never ride the join — only
    (id, 8-byte fp).

    -> (id_a, id_b, hamming).
    """
    from .dedup import hamming_near_pairs

    if max_hamming > 3:
        raise ValueError(
            "audio_near_dups guarantees exact recall only for "
            f"max_hamming <= 3 under 4-chunk pigeonhole (got {max_hamming}); "
            "use dedup.hamming_near_pairs with more chunks for larger radii"
        )
    fps = audio_fingerprints(clips, id_col, bytes_col, codec_col).where(
        F.col("decode_ok") & F.col("afp").isNotNull()  # flat-envelope clips excluded
    )
    return hamming_near_pairs(
        fps, max_hamming=max_hamming, bits=63, chunks=4,
        id_col="clip_id", fp_col="afp",
    )
