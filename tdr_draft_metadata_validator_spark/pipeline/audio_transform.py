"""Audio transforms for training-data pipelines: resample, segment,
loudness-normalize — the audio analogs of document chunking and text
normalization, each one Arrow-batched ``mapInPandas`` pass (payload
bytes cross JVM<->Python once per batch; undecodable payloads surface
as decode_ok=False / are skipped, never task failures — the package's
uniform decode policy).

All transforms re-encode to RIFF/WAVE PCM16 (the package's canonical
interchange codec): a pipeline normalizing a mixed-codec corpus to one
sample rate and level emits clips any downstream stage can decode.

Resampling is windowed-sinc-free by design: LINEAR interpolation is the
honest baseline a validator/pipeline ships without a DSP dependency —
alias-free only when downsampling band-limited material; the docstring
says so rather than pretending to be libsamplerate. Swap in
``scipy.signal.resample_poly`` behind the same signature when scipy is
available (import-try, like PIL/soundfile elsewhere).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.audio_codec import decode, encode_wav_pcm16

try:  # backs the EXPLICIT method='poly' path only — never auto-selected
    from scipy.signal import resample_poly as _resample_poly
except ImportError:  # pragma: no cover - environment-dependent
    _resample_poly = None

TRANSFORMED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("segment_idx", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("dur_ms", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)


def resample_linear(samples: np.ndarray, sr_from: int, sr_to: int,
                    method: str = "linear") -> np.ndarray:
    """Resample int16 -> int16. ``method`` is EXPLICIT — it never switches
    on what happens to be importable, because the output bytes (and the
    envelope fingerprints derived from them) must be bit-reproducible
    across environments:

    - ``"linear"`` (default): np.interp — pure numpy, identical bytes
      everywhere; adequate for speech-rate conversions, aliases on
      downsample of full-band content (documented, not hidden).
    - ``"poly"``: scipy's polyphase filter (better anti-aliasing); raises
      ImportError when scipy is absent rather than silently degrading.
    """
    if method not in ("linear", "poly"):
        raise ValueError(f"unknown resample method {method!r}; 'linear' or 'poly'")
    if sr_from == sr_to or len(samples) == 0:
        # empty is a VALID clip (0-byte data chunk): pass through so the
        # caller reports decode_ok=True, consistent with the same-rate
        # short-circuit (np.interp would raise on empty sample points and
        # the shared pass would mislabel the clip as undecodable)
        return samples
    if method == "poly":
        if _resample_poly is None:
            raise ImportError(
                "resample method='poly' needs scipy.signal.resample_poly; "
                "use method='linear' (the reproducible default) instead"
            )
        out = _resample_poly(samples.astype(np.float64), sr_to, sr_from)
        return np.clip(np.round(out), -32768, 32767).astype(np.int16)
    n_out = max(1, int(round(len(samples) * sr_to / sr_from)))
    x_out = np.arange(n_out, dtype=np.float64) * (len(samples) - 1) / max(n_out - 1, 1)
    out = np.interp(x_out, np.arange(len(samples), dtype=np.float64),
                    samples.astype(np.float64))
    return np.clip(np.round(out), -32768, 32767).astype(np.int16)


def _transform_pass(clips: DataFrame, fn, id_col: str, bytes_col: str,
                    codec_col: str) -> DataFrame:
    """Shared decode -> fn(clip_id, sr, samples) -> (sr', samples') -> WAV
    re-encode pass for the 1:1 transforms (clip_id is threaded so
    per-row-deterministic transforms like add_noise can seed from it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms",
                                   "codec", "decode_ok")}
            for i in range(len(pdf)):
                cid = str(pdf[id_col].iat[i])
                out["clip_id"].append(cid)
                try:
                    sr, samples = decode(
                        bytes(pdf[bytes_col].iat[i]), str(pdf[codec_col].iat[i])
                    )
                    sr2, samples2 = fn(cid, sr, samples)
                    out["bytes"].append(encode_wav_pcm16(samples2, sr2))
                    out["sr_hz"].append(sr2)
                    out["dur_ms"].append(int(round(len(samples2) * 1000 / sr2)))
                    out["codec"].append("pcm_s16le")
                    out["decode_ok"].append(True)
                except (ValueError, TypeError):
                    for k in ("bytes", "sr_hz", "dur_ms", "codec"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame({
                **{k: out[k] for k in ("clip_id", "bytes")},
                "sr_hz": pd.array(out["sr_hz"], dtype="Int32"),
                "dur_ms": pd.array(out["dur_ms"], dtype="Int32"),
                "codec": out["codec"],
                "decode_ok": out["decode_ok"],
            })

    return clips.select(
        F.col(id_col), F.col(bytes_col), F.col(codec_col)
    ).mapInPandas(run, TRANSFORMED_SCHEMA)


def resample_clips(
    clips: DataFrame,
    target_sr: int = 16000,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    method: str = "linear",
) -> DataFrame:
    """Normalize a mixed-rate corpus to one sample rate — the standard
    pre-training step for speech models. ``method`` picks the resampler
    explicitly (:func:`resample_linear`) so output bytes are reproducible
    across environments. -> canonical clips columns (clip_id, bytes
    WAV/PCM16 @ target_sr, sr_hz, dur_ms, codec, decode_ok)."""
    if target_sr <= 0:
        raise ValueError("target_sr must be > 0")
    return _transform_pass(
        clips,
        lambda _cid, sr, s: (target_sr, resample_linear(s, sr, target_sr, method)),
        id_col, bytes_col, codec_col,
    )


def normalize_loudness(
    clips: DataFrame,
    target_rms_db: float = -20.0,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Scale each clip to a target RMS level (dBFS) — level-normalized
    corpora train more stably. Pure gain (no compression/limiting beyond
    the int16 clip), silent clips pass through unscaled (no gain can fix
    silence; the quality filter owns them)."""
    target = 32768.0 * (10.0 ** (target_rms_db / 20.0))

    def fn(_cid, sr, samples):
        f = samples.astype(np.float64)
        rms = float(np.sqrt(np.mean(f * f))) if len(f) else 0.0
        if rms <= 0:
            return sr, samples
        out = np.clip(np.round(f * (target / rms)), -32768, 32767)
        return sr, out.astype(np.int16)

    return _transform_pass(clips, fn, id_col, bytes_col, codec_col)


def segment_clips(
    clips: DataFrame,
    segment_ms: int = 10_000,
    overlap_ms: int = 0,
    min_tail_ms: int = 1_000,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Split long clips into fixed-duration segments (1:N mapInPandas —
    the audio analog of document chunking): stride = segment - overlap;
    a trailing remainder shorter than ``min_tail_ms`` is dropped (a
    50 ms orphan is noise, not data). Undecodable inputs are skipped
    (decode_ok policy). -> (clip_id, segment_idx, bytes WAV @ source sr,
    sr_hz, dur_ms, codec)."""
    if overlap_ms >= segment_ms:
        raise ValueError("overlap_ms must be < segment_ms (stride must advance)")
    if min_tail_ms > segment_ms:
        # segment 1..N would each be "shorter than min_tail" the moment the
        # clip ends, silently discarding everything after segment 0
        raise ValueError("min_tail_ms must be <= segment_ms")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("clip_id", "segment_idx", "bytes",
                                   "sr_hz", "dur_ms", "codec")}
            for i in range(len(pdf)):
                try:
                    sr, samples = decode(
                        bytes(pdf[bytes_col].iat[i]), str(pdf[codec_col].iat[i])
                    )
                except (ValueError, TypeError):
                    continue
                # per-row clamps: sr comes from the DECODED payload, so a
                # valid-but-odd clip (sr=1) can truncate seg/stride to 0 —
                # range(..., 0) raising OUTSIDE the try would kill the task
                seg = max(1, int(sr * segment_ms / 1000))
                stride = max(1, seg - int(sr * overlap_ms / 1000))
                min_tail = int(sr * min_tail_ms / 1000)
                idx = 0
                for start in range(0, max(len(samples), 1), stride):
                    piece = samples[start:start + seg]
                    if len(piece) == 0 or (len(piece) < min_tail and idx > 0):
                        break
                    out["clip_id"].append(str(pdf[id_col].iat[i]))
                    out["segment_idx"].append(idx)
                    out["bytes"].append(encode_wav_pcm16(piece, sr))
                    out["sr_hz"].append(sr)
                    out["dur_ms"].append(int(round(len(piece) * 1000 / sr)))
                    out["codec"].append("pcm_s16le")
                    idx += 1
                    if start + seg >= len(samples):
                        break
            yield pd.DataFrame(out)

    return clips.select(
        F.col(id_col), F.col(bytes_col), F.col(codec_col)
    ).mapInPandas(run, SEGMENT_SCHEMA)


# ---------------------------------------------------------------------------
# training augmentation: speed perturbation + deterministic noise injection
# ---------------------------------------------------------------------------

def trim_silence(
    clips: DataFrame,
    threshold_db: float = -40.0,
    pad_ms: int = 100,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """Strip leading/trailing silence (standard speech-corpus prep —
    recordings carry dead air that wastes tokens and skews duration
    stats): keep [first, last] samples whose |amplitude| exceeds the
    dBFS threshold, padded by ``pad_ms`` on each side so onsets aren't
    clipped. Deterministic (pure threshold scan, no model). An
    ALL-silent clip trims to zero samples — still decode_ok=True; the
    quality gate (silence_ratio / dur_s) owns dropping it, same
    separation of concerns as normalize_loudness. Same fused
    decode->encode Arrow pass as every 1:1 transform."""
    if pad_ms < 0:
        raise ValueError("pad_ms must be >= 0")
    thr = 32768.0 * (10.0 ** (threshold_db / 20.0))

    def fn(_cid, sr, samples):
        idx = np.flatnonzero(np.abs(samples.astype(np.float64)) > thr)
        if len(idx) == 0:
            return sr, samples[:0]
        pad = int(sr * pad_ms / 1000)
        lo = max(0, int(idx[0]) - pad)
        hi = min(len(samples), int(idx[-1]) + 1 + pad)
        return sr, samples[lo:hi]

    return _transform_pass(clips, fn, id_col, bytes_col, codec_col)


def speed_perturb(
    clips: DataFrame,
    factor: float = 1.1,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    method: str = "linear",
) -> DataFrame:
    """Classic speech augmentation (Ko et al. 2015 "Audio augmentation
    for speech recognition"): resample the samples by 1/factor while
    KEEPING the declared rate, so playback runs ``factor`` x faster —
    duration and pitch scale together (0.9/1.0/1.1 is the standard
    trio). Deterministic (``method`` is explicit — resample_linear);
    same decode_ok policy as every transform."""
    if factor <= 0:
        raise ValueError("factor must be > 0")

    def fn(_cid, sr, samples):
        return sr, resample_linear(
            samples, sr, max(1, int(round(sr / factor))), method
        )

    return _transform_pass(clips, fn, id_col, bytes_col, codec_col)


def add_noise(
    clips: DataFrame,
    snr_db: float = 20.0,
    seed: int = 42,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """White-noise augmentation at a target SNR. DETERMINISTIC per
    (clip_id, seed): the noise stream is seeded from a hash of the id,
    so re-running the pipeline (or resuming a partition) regenerates the
    SAME augmented audio — the reproducibility property random()-seeded
    augmentation lacks under repartitioning. Silent clips pass through
    (no signal, no SNR to target)."""
    import zlib

    def fn(clip_id, sr, samples):
        f = samples.astype(np.float64)
        sig_p = float(np.mean(f * f)) if len(f) else 0.0
        if sig_p <= 0:
            return sr, samples
        noise_p = sig_p / (10.0 ** (snr_db / 10.0))
        rng = np.random.RandomState(
            (zlib.crc32(clip_id.encode()) ^ seed) & 0x7FFFFFFF
        )
        noisy = f + rng.randn(len(f)) * np.sqrt(noise_p)
        return sr, np.clip(np.round(noisy), -32768, 32767).astype(np.int16)

    return _transform_pass(clips, fn, id_col, bytes_col, codec_col)

