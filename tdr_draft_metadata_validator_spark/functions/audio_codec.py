"""Audio payload encode/decode + PCM comparison (numpy, no external libs).

The engine's decode-invariant (north_rule; the analog of the reference's
byte-level UTF-8 gate, Lambda.scala:130-153, and protected-field equality,
Lambda.scala:257-281) needs to (a) decode ``bytes`` under the declared
``codec`` and (b) compare decoded PCM against a reference PCM with an
SNR >= 30 dB allclose criterion.

Only PCM16 WAV (RIFF) is implemented for real — it is pure byte layout,
parseable with ``struct``/numpy. ``flac`` and ``opus`` decoders are
STUBS: the container image has no audio libraries, so they are
deterministic fakes that delegate to the WAV parser (the synthetic
generator always produces RIFF payloads). The Spark-side plumbing
(binary column in, Arrow batch, PCM out) is real and tested; swapping a
stub for ``soundfile``/``pyogg`` is a one-function change.
"""

from __future__ import annotations

import struct

import numpy as np

CODEC_WHITELIST = ("pcm_s16le", "flac", "opus")

_RIFF_HEADER = struct.Struct("<4sI4s")
_FMT_CHUNK = struct.Struct("<4sIHHIIHH")
_CHUNK_HDR = struct.Struct("<4sI")


def encode_wav_pcm16(samples: np.ndarray, sr_hz: int) -> bytes:
    """Encode int16 mono samples as a RIFF/WAVE PCM16 byte string."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    data_size = len(pcm)
    fmt = _FMT_CHUNK.pack(b"fmt ", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    data_hdr = _CHUNK_HDR.pack(b"data", data_size)
    riff = _RIFF_HEADER.pack(b"RIFF", 4 + len(fmt) + len(data_hdr) + data_size, b"WAVE")
    return riff + fmt + data_hdr + pcm


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 payload -> (sr_hz, int16 samples).

    Raises ``ValueError`` on any structural corruption (the decode gate
    turns that into a violation row, it never crashes the job).
    """
    if payload is None or len(payload) < 44:
        raise ValueError("payload too short for RIFF header")
    riff, _size, wave = _RIFF_HEADER.unpack_from(payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off = _RIFF_HEADER.size
    sr_hz = None
    bits = None
    channels = None
    while off + _CHUNK_HDR.size <= len(payload):
        cid, csize = _CHUNK_HDR.unpack_from(payload, off)
        body = off + _CHUNK_HDR.size
        if cid == b"fmt ":
            if csize < 16 or body + 16 > len(payload):
                raise ValueError("truncated fmt chunk")
            (audio_fmt, channels, sr_hz, _br, _ba, bits) = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if audio_fmt != 1:
                raise ValueError(f"not PCM (fmt={audio_fmt})")
        elif cid == b"data":
            if sr_hz is None:
                raise ValueError("data chunk before fmt chunk")
            if bits != 16 or channels != 1:
                raise ValueError(f"unsupported layout bits={bits} ch={channels}")
            if body + csize > len(payload):
                raise ValueError("truncated data chunk")
            samples = np.frombuffer(payload, dtype="<i2", count=csize // 2, offset=body)
            return sr_hz, samples
        off = body + csize + (csize & 1)
    raise ValueError("no data chunk found")


def decode_flac_stub(payload: bytes) -> tuple[int, np.ndarray]:
    """STUB: no FLAC lib in the image; synthetic 'flac' payloads are RIFF.

    A real deployment replaces this with ``soundfile.read``. Kept as a
    separate symbol so the dispatch table / tests exercise the codec
    routing for real.
    """
    return decode_wav_pcm16(payload)


def decode_opus_stub(payload: bytes) -> tuple[int, np.ndarray]:
    """STUB: see :func:`decode_flac_stub`."""
    return decode_wav_pcm16(payload)


DECODERS = {
    "pcm_s16le": decode_wav_pcm16,
    "flac": decode_flac_stub,
    "opus": decode_opus_stub,
}


def decode(payload: bytes, codec: str) -> tuple[int, np.ndarray]:
    """Dispatch decode by codec. Unknown codec -> ValueError."""
    try:
        dec = DECODERS[codec]
    except KeyError:
        raise ValueError(f"unknown codec {codec!r}") from None
    return dec(payload)


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of ``decoded`` vs ``reference`` in dB.

    ``10*log10(sum(ref^2)/sum((ref-dec)^2))``; identical signals -> +inf.
    Length mismatch is -inf (counts as total mismatch, not an exception).
    """
    if reference.shape != decoded.shape:
        return float("-inf")
    ref = reference.astype(np.float64)
    err = ref - decoded.astype(np.float64)
    noise = float(np.dot(err, err))
    if noise == 0.0:
        return float("inf")
    signal = float(np.dot(ref, ref))
    if signal == 0.0:
        return float("-inf")
    return 10.0 * np.log10(signal / noise)
