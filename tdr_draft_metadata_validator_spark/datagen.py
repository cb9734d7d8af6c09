"""Deterministic synthetic clips + reference tables (seed=42, no external
data).

Every field is a pure function of (row index, seed) so the same table is
produced regardless of partitioning or parallelism — required both for
golden tests and for the local[8]-vs-local[32] scaling bench to run on
identical input (BASELINE.md sandbox evidence plan).

Generation rules follow FIXTURES.md §1-2 (which transplants the reference
test corpus, /root/reference/lambdas/tdr-draft-metadata-checks/src/test/
resources/sample*.csv, onto the audio-table shape):

- ``clip_id``   = f"clip/{i:08d}.wav"
- ``bytes``     = RIFF PCM16 mono WAV, sine at ``220 + 13*(i%40)`` Hz
- ``sr_hz``     in {8000, 16000, 22050, 44100}
- ``dur_ms``    in [dur_min, dur_max) (default 200..2000 to keep local
                 volumes sane; FIXTURES allows up to 15000)
- ``codec``     in {pcm_s16le, flac, opus}: pcm payloads are RIFF,
                 flac payloads are REAL FLAC streams (verbatim frames,
                 functions.flac_codec), opus payloads are REAL Ogg/Opus
                 containers (spec pages + CRC + OpusHead) around the
                 documented FPCM sandbox packet payload (r6; see
                 functions.ogg_opus).
                 Opt-in ``ulaw_every`` adds true-lossy mu-law slots;
                 ``extended_every`` adds alaw / ima_adpcm / pcm_s24le /
                 pcm_f32le slots (r6 extended codecs)
- ``transcript``= 3..20 words from a fixed 64-word lexicon

Distributed generation goes through ``mapInPandas`` over ``spark.range``
so a 200k-clip bench table is built by the executors, not the driver.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .functions.audio_codec import (
    encode_alaw,
    encode_flac,
    encode_ogg_fake_opus,
    encode_ulaw,
    encode_wav_f32,
    encode_wav_ima_adpcm,
    encode_wav_pcm16,
    encode_wav_pcm24,
)
from .models import CLIPS_SCHEMA, REF_CLIPS_SCHEMA

SEED = 42
SR_DOMAIN = (8000, 16000, 22050, 44100)
CODECS = ("pcm_s16le", "flac", "opus")

_LEXICON = [
    f"{a}{b}"
    for a in ("au", "di", "ko", "ma", "ne", "or", "pe", "ru")
    for b in ("ba", "del", "fin", "gor", "lith", "mon", "san", "tec")
]  # 64 deterministic pseudo-words
_NS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 NAMESPACE_DNS


# -- pure per-index field functions (no RNG objects: cheap + order-free) ----

def _mix(i: int, seed: int, salt: int) -> int:
    x = (i * 2654435761 + seed * 40503 + salt * 97) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x


def clip_id_of(i: int) -> str:
    return f"clip/{i:08d}.wav"


def sr_of(i: int, seed: int = SEED) -> int:
    return SR_DOMAIN[_mix(i, seed, 1) % 4]


def dur_of(i: int, seed: int = SEED, dur_min: int = 200, dur_max: int = 2000) -> int:
    return dur_min + _mix(i, seed, 2) % (dur_max - dur_min)


def codec_of(i: int, seed: int = SEED) -> str:
    # pcm dominates (matches a realistic corpus; also keeps decode honest)
    r = _mix(i, seed, 3) % 10
    return CODECS[0] if r < 8 else CODECS[1 + (r & 1)]


def freq_of(i: int) -> float:
    return 220.0 + 13.0 * (i % 40)


def transcript_of(i: int, seed: int = SEED) -> str:
    n_words = 3 + _mix(i, seed, 4) % 18  # 3..20
    return " ".join(
        _LEXICON[_mix(i, seed, 5 + w) % 64] for w in range(n_words)
    )


def pcm_of(i: int, seed: int = SEED, dur_min: int = 200, dur_max: int = 2000) -> np.ndarray:
    """The canonical int16 samples for clip i (shared by clips and ref)."""
    sr = sr_of(i, seed)
    dur = dur_of(i, seed, dur_min, dur_max)
    n = sr * dur // 1000
    t = np.arange(n, dtype=np.float64) / sr
    wave = 0.5 * np.sin(2 * np.pi * freq_of(i) * t)
    return (wave * 32767.0).astype(np.int16)


def file_id_of(i: int) -> str:
    return str(uuid.uuid5(_NS, clip_id_of(i)))


# -- pandas builders (driver-side fixtures + executor-side batches) ---------

_EXTENDED_ENCODERS = (
    ("alaw", encode_alaw),
    ("ima_adpcm", encode_wav_ima_adpcm),
    ("pcm_s24le", encode_wav_pcm24),
    ("pcm_f32le", encode_wav_f32),
)


def clips_batch(indices: np.ndarray, seed: int = SEED,
                dur_min: int = 200, dur_max: int = 2000,
                ulaw_every: int | None = None,
                extended_every: int | None = None) -> pd.DataFrame:
    """``ulaw_every=k`` makes every k-th clip a REAL mu-law payload
    (codec='ulaw', genuinely lossy vs ref_pcm) — exercises the engine's
    hash-mismatch -> SNR residue path with true lossy data.
    ``extended_every=k`` routes every k-th clip (offset to avoid the
    ulaw slots) round-robin through the r6 extended codecs
    (alaw / ima_adpcm / pcm_s24le / pcm_f32le) — two more true-lossy
    lanes and two lossless alternate containers."""
    rows = []
    for i in map(int, indices):
        pcm = pcm_of(i, seed, dur_min, dur_max)
        sr = sr_of(i, seed)
        if ulaw_every and i % ulaw_every == 0:
            payload, codec = encode_ulaw(pcm, sr), "ulaw"
        elif extended_every and i % extended_every == 1:
            codec, enc = _EXTENDED_ENCODERS[(i // extended_every) % 4]
            payload = enc(pcm, sr)
        else:
            codec = codec_of(i, seed)
            if codec == "flac":
                # REAL FLAC framing (verbatim subframes — lossless and
                # fast on both sides); the gate's flac decoder refuses
                # anything else, so a RIFF payload here would be a bug
                payload = encode_flac(pcm, sr)
            elif codec == "opus":
                # REAL Ogg/Opus container (r6): spec pages + CRC +
                # OpusHead around the documented FPCM sandbox packets —
                # the gate's opus decoder refuses RIFF at the capture
                # pattern now, so a RIFF payload here would be a bug
                payload = encode_ogg_fake_opus(pcm, sr)
            else:
                payload = encode_wav_pcm16(pcm, sr)
        rows.append(
            (
                clip_id_of(i),
                payload,
                sr,
                dur_of(i, seed, dur_min, dur_max),
                codec,
                transcript_of(i, seed),
            )
        )
    return pd.DataFrame(
        rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    )


def ref_batch(indices: np.ndarray, seed: int = SEED,
              dur_min: int = 200, dur_max: int = 2000,
              extended_every: int | None = None,
              ulaw_every: int | None = None) -> pd.DataFrame:
    """Reference rows. With ``extended_every`` matching the clips table,
    the ima_adpcm slots store the DECODE of the ADPCM master as ref_pcm:
    4-bit ADPCM of half-scale tonal content measures 14-28 dB SNR vs the
    original — below the 30 dB invariant by the codec's own physics — so
    the realistic clean-table semantics are "the archive's canonical PCM
    was produced from the same ADPCM master" (bit-exact invariant, fast
    hash path). alaw/pcm_s24le/pcm_f32le slots keep the original
    reference (alaw clears 30 dB; the other two are lossless)."""
    from .functions.audio_codec import decode_wav_ima_adpcm

    rows = []
    for i in map(int, indices):
        pcm = pcm_of(i, seed, dur_min, dur_max)
        # ulaw takes precedence in clips_batch: a slot satisfying BOTH
        # i%ulaw_every==0 and i%extended_every==1 holds a ULAW payload,
        # so substituting the ADPCM-decoded master here would compare a
        # ulaw clip against an ADPCM ref (~14-28 dB) and false-flag a
        # clean table (advisor r6) — mirror the same precedence rule.
        if (extended_every and i % extended_every == 1
                and not (ulaw_every and i % ulaw_every == 0)
                and _EXTENDED_ENCODERS[(i // extended_every) % 4][0] == "ima_adpcm"):
            pcm = decode_wav_ima_adpcm(
                encode_wav_ima_adpcm(pcm, sr_of(i, seed))
            )[1]
        rows.append(
            (
                clip_id_of(i),
                file_id_of(i),
                pcm.tobytes(),
                transcript_of(i, seed),
                sr_of(i, seed),
                dur_of(i, seed, dur_min, dur_max),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["clip_id", "file_id", "ref_pcm", "ref_transcript", "ref_sr_hz", "ref_dur_ms"],
    )


# -- Spark-distributed generation -------------------------------------------

def generate_clips(spark: SparkSession, n: int, seed: int = SEED,
                   partitions: int | None = None,
                   dur_min: int = 200, dur_max: int = 2000,
                   extended_every: int | None = None) -> DataFrame:
    """Distributed clips table: executors synthesize their own index ranges."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield clips_batch(pdf["id"].to_numpy(), seed, dur_min, dur_max,
                                  extended_every=extended_every)

    return spark.range(0, n, 1, parts).mapInPandas(gen, CLIPS_SCHEMA)


def generate_ref_clips(spark: SparkSession, n: int, seed: int = SEED,
                       partitions: int | None = None,
                       dur_min: int = 200, dur_max: int = 2000,
                       extended_every: int | None = None,
                       ulaw_every: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield ref_batch(pdf["id"].to_numpy(), seed, dur_min, dur_max,
                                extended_every=extended_every,
                                ulaw_every=ulaw_every)

    return spark.range(0, n, 1, parts).mapInPandas(gen, REF_CLIPS_SCHEMA)


def _mix_vec(i: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Vectorized _mix over uint64 arrays (same constants, same outputs)."""
    x = (i.astype(np.uint64) * np.uint64(2654435761)
         + np.uint64(seed * 40503) + np.uint64(salt * 97)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(16)
    x = (x * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(13)
    return x


def clips_meta_batch(indices: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Metadata-only clips rows (bytes=None), fully vectorized — used for
    multi-million-row relational/rule scaling runs where synthesizing
    audio would dominate the wall clock. Field values match the scalar
    generators for sr/dur/codec; transcripts are 5 deterministic words."""
    i = np.asarray(indices, dtype=np.int64)
    ids = np.char.mod("clip/%08d.wav", i)
    sr = np.take(np.array(SR_DOMAIN), (_mix_vec(i, seed, 1) % 4).astype(np.int64))
    dur = (200 + _mix_vec(i, seed, 2) % 1800).astype(np.int32)
    codec_r = (_mix_vec(i, seed, 3) % 10).astype(np.int64)
    codec = np.where(codec_r < 8, CODECS[0],
                     np.where((codec_r & 1) == 1, CODECS[2], CODECS[1]))
    lex = np.array(_LEXICON)
    words = [np.take(lex, (_mix_vec(i, seed, 5 + w) % 64).astype(np.int64)) for w in range(5)]
    transcript = words[0]
    for w in words[1:]:
        transcript = np.char.add(np.char.add(transcript, " "), w)
    return pd.DataFrame(
        {
            "clip_id": ids,
            "bytes": None,
            "sr_hz": sr.astype(np.int32),
            "dur_ms": dur,
            "codec": codec,
            "transcript": transcript,
        }
    )


def ref_meta_batch(indices: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Reference-side metadata rows matching clips_meta_batch."""
    c = clips_meta_batch(indices, seed)
    return pd.DataFrame(
        {
            "clip_id": c["clip_id"],
            "file_id": np.char.mod("f%08d", np.asarray(indices, dtype=np.int64)),
            "ref_pcm": None,
            "ref_transcript": c["transcript"],
            "ref_sr_hz": c["sr_hz"],
            "ref_dur_ms": c["dur_ms"],
        }
    )


def generate_clips_meta(spark: SparkSession, n: int, seed: int = SEED,
                        partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield clips_meta_batch(pdf["id"].to_numpy(), seed)

    return spark.range(0, n, 1, parts).mapInPandas(gen, CLIPS_SCHEMA)


def generate_ref_meta(spark: SparkSession, n: int, seed: int = SEED,
                      partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield ref_meta_batch(pdf["id"].to_numpy(), seed)

    return spark.range(0, n, 1, parts).mapInPandas(gen, REF_CLIPS_SCHEMA)


def clips_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Small driver-side fixture -> typed DataFrame (tests)."""
    return spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)


def ref_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf, schema=REF_CLIPS_SCHEMA)
