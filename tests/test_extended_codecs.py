"""Round-6 extended codec family: A-law, IMA ADPCM, PCM24, float32 WAV.

The reference's UTF-8 gate accepts every valid input of its format
(Lambda.scala:130-153); the audio analog is that the decode gate should
accept the WAV/G.711 containers archives actually hold, not just
PCM16 + mu-law. These tests lock:

- bit-exact G.711 A-law vs a scalar ITU reference over ALL int16 values
- lossless roundtrips for pcm_s24le / pcm_f32le (int16-sourced content)
- IMA ADPCM block framing (fact-chunk trim, multi-block vectorization)
- corruption refusals (ValueError -> violation row, never a crash)
- end-to-end: a clean extended-codec table produces zero audio
  violations; ADPCM measured against the ORIGINAL pcm correctly flags
  snrBelowThreshold (4-bit ADPCM physics: ~14-28 dB on tonal content)
"""

import numpy as np
import pytest

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.functions.audio_codec import (
    CODEC_WHITELIST,
    DECODERS,
    decode,
    decode_alaw,
    decode_wav_f32,
    decode_wav_ima_adpcm,
    decode_wav_pcm24,
    encode_alaw,
    encode_wav_f32,
    encode_wav_ima_adpcm,
    encode_wav_pcm16,
    encode_wav_pcm24,
    snr_db,
)
from tdr_draft_metadata_validator_spark.operators.audio import audio_invariants


def _signal(n=6000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = 9000 * np.sin(2 * np.pi * 440 * t) + 4000 * np.sin(2 * np.pi * 97 * t)
    return (x + rng.normal(0, 250, n)).clip(-32768, 32767).astype(np.int16)


# -- whitelist / dispatch ----------------------------------------------------

def test_whitelist_matches_decoder_table():
    assert set(CODEC_WHITELIST) == set(DECODERS)


def test_dispatch_all_new_codecs():
    x = _signal()
    for codec, enc in [
        ("alaw", encode_alaw),
        ("ima_adpcm", encode_wav_ima_adpcm),
        ("pcm_s24le", encode_wav_pcm24),
        ("pcm_f32le", encode_wav_f32),
    ]:
        sr, y = decode(enc(x, 16000), codec)
        assert sr == 16000
        assert len(y) == len(x)


def test_cross_codec_payloads_refuse():
    """A payload framed for one codec must refuse under another's label
    (mislabeled rows become violation rows, not silent wrong decodes)."""
    x = _signal(400)
    payloads = {
        "pcm_s16le": encode_wav_pcm16(x, 8000),
        "pcm_s24le": encode_wav_pcm24(x, 8000),
        "pcm_f32le": encode_wav_f32(x, 8000),
        "alaw": encode_alaw(x, 8000),
        "ima_adpcm": encode_wav_ima_adpcm(x, 8000),
    }
    for made_for, payload in payloads.items():
        for label in payloads:
            if label == made_for:
                continue
            with pytest.raises(ValueError):
                decode(payload, label)


# -- A-law: bit-exact vs the scalar ITU algorithm ----------------------------

def _alaw_compress_scalar(pcm_val: int) -> int:
    """Classic public-domain g711.c linear2alaw (Sun Microsystems
    reference implementation shape), scalar."""
    SEG_END = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
    mask = 0xD5 if pcm_val >= 0 else 0x55
    if pcm_val < 0:
        pcm_val = -pcm_val - 1
    pcm_val >>= 3
    seg = 8
    for i, end in enumerate(SEG_END):
        if pcm_val <= end:
            seg = i
            break
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (pcm_val >> 1) & 0xF
    else:
        aval |= (pcm_val >> seg) & 0xF
    return aval ^ mask


def _alaw_expand_scalar(code: int) -> int:
    code ^= 0x55
    t = (code & 0xF) << 4
    seg = (code & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if code & 0x80 else -t


def test_alaw_compress_bit_exact_all_int16():
    xs = np.arange(-32768, 32768, dtype=np.int16)
    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        _alaw_compress,
    )
    got = _alaw_compress(xs)
    # spot-grid plus the chord boundaries — full 64k scalar loop is slow
    idx = np.unique(np.concatenate([
        np.arange(0, 65536, 97),
        np.searchsorted(xs, np.array(
            [-32768, -4097, -4096, -256, -9, -8, -1, 0, 7, 8, 255, 256,
             4095, 4096, 32767], dtype=np.int16)),
    ]))
    for i in idx:
        assert got[i] == _alaw_compress_scalar(int(xs[i])), int(xs[i])


def test_alaw_expand_bit_exact_all_codes():
    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        _alaw_expand_table,
    )
    table = _alaw_expand_table()
    for code in range(256):
        assert int(table[code]) == _alaw_expand_scalar(code), code


def test_alaw_roundtrip_snr_above_invariant():
    x = _signal()
    sr, y = decode_alaw(encode_alaw(x, 16000))
    assert sr == 16000
    s = snr_db(x, y)
    assert 30 < s < 45  # lossy but above the 30 dB gate — like mu-law


def test_alaw_corruption_refusals():
    good = encode_alaw(_signal(100), 8000)
    with pytest.raises(ValueError):
        decode_alaw(b"XLAW" + good[4:])
    with pytest.raises(ValueError):
        decode_alaw(good[:8])
    with pytest.raises(ValueError):
        decode_alaw(good[:-5])  # truncated codes


# -- PCM24 / float32: lossless for 16-bit-sourced content --------------------

def test_pcm24_lossless_roundtrip():
    x = _signal()
    sr, y = decode_wav_pcm24(encode_wav_pcm24(x, 22050))
    assert sr == 22050
    np.testing.assert_array_equal(x, y)


def test_pcm24_negative_sign_extension():
    x = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    _, y = decode_wav_pcm24(encode_wav_pcm24(x, 8000))
    np.testing.assert_array_equal(x, y)


def test_f32_lossless_roundtrip():
    x = _signal()
    sr, y = decode_wav_f32(encode_wav_f32(x, 44100))
    assert sr == 44100
    np.testing.assert_array_equal(x, y)


def test_f32_refuses_non_finite():
    payload = bytearray(encode_wav_f32(np.ones(8, np.int16), 8000))
    payload[44:48] = np.array([np.nan], "<f4").tobytes()
    with pytest.raises(ValueError):
        decode_wav_f32(bytes(payload))


def test_wav_fmt_mismatch_refusals():
    x = _signal(64)
    # PCM24 decoder on a PCM16 container and vice versa
    with pytest.raises(ValueError):
        decode_wav_pcm24(encode_wav_pcm16(x, 8000))
    with pytest.raises(ValueError):
        decode_wav_f32(encode_wav_pcm24(x, 8000))


# -- IMA ADPCM ---------------------------------------------------------------

def test_ima_roundtrip_multi_block():
    x = _signal(n=5 * 505 + 17)  # 5 full blocks + trailing partial
    payload = encode_wav_ima_adpcm(x, 16000)
    sr, y = decode_wav_ima_adpcm(payload)
    assert sr == 16000
    assert len(y) == len(x)  # fact chunk trims the zero-pad
    s = snr_db(x, y)
    assert 12 < s < 30  # 4-bit adaptive delta: real lossy, below gate


def test_ima_block_seeds_are_verbatim():
    """Sample 0 of every block is stored verbatim in the block header."""
    x = _signal(n=3 * 505)
    _, y = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 8000))
    for b in range(3):
        assert y[b * 505] == x[b * 505]


def test_ima_single_short_clip():
    x = _signal(n=40)
    _, y = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 8000))
    assert len(y) == 40


def test_ima_corruption_refusals():
    good = encode_wav_ima_adpcm(_signal(600), 8000)
    # flip wFormatTag to PCM
    bad = bytearray(good)
    bad[20:22] = (1).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(bytes(bad))
    # inconsistent samplesPerBlock in the fmt extension
    bad = bytearray(good)
    bad[38:40] = (999).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(bytes(bad))
    # truncated to a partial block
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(good[:-13])


def test_ima_fact_count_exceeding_refuses():
    good = bytearray(encode_wav_ima_adpcm(_signal(600), 8000))
    # fact chunk sits right after the 20-byte fmt chunk: RIFF(12)+fmt(8+20)
    off = 12 + 8 + 20
    assert good[off:off + 4] == b"fact"
    good[off + 8: off + 12] = (10 ** 6).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_wav_ima_adpcm(bytes(good))


def test_ima_decode_cost_is_per_block_not_per_sample():
    """The decode loop length equals samples-per-block (505 for the
    standard 256-byte align) regardless of clip length — the vector
    dimension grows instead. Locked via block-count independence of
    the within-block trajectory."""
    x = _signal(n=505)
    one = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 8000))[1]
    many = decode_wav_ima_adpcm(
        encode_wav_ima_adpcm(np.tile(x, 7), 8000)
    )[1]
    np.testing.assert_array_equal(many[:505], one)


# -- datagen integration + engine end-to-end ---------------------------------

def test_datagen_extended_slots_cover_all_four():
    pdf = datagen.clips_batch(np.arange(14), extended_every=3)
    codecs = set(pdf["codec"])
    assert {"alaw", "ima_adpcm", "pcm_s24le", "pcm_f32le"} <= codecs


def test_clean_extended_table_no_violations(spark):
    """Clean table with all 8 codecs -> zero audio violations. ADPCM
    rows pass because ref_batch stores the decoded ADPCM master as the
    canonical PCM (bit-exact hash path); alaw clears 30 dB; pcm24/f32
    are lossless."""
    idx = np.arange(14)
    clips = datagen.clips_df(spark, datagen.clips_batch(idx, extended_every=3))
    ref = datagen.ref_df(spark, datagen.ref_batch(idx, extended_every=3))
    assert audio_invariants(clips, ref).count() == 0


def test_adpcm_vs_original_pcm_flags_snr(spark):
    """Against the ORIGINAL (pre-ADPCM) reference, 4-bit ADPCM measures
    14-28 dB — below the 30 dB invariant by the codec's own physics —
    so the engine must flag exactly the ADPCM rows."""
    idx = np.arange(14)
    clips = datagen.clips_df(spark, datagen.clips_batch(idx, extended_every=3))
    ref = datagen.ref_df(spark, datagen.ref_batch(idx))  # no extended ref
    pdf = datagen.clips_batch(idx, extended_every=3)
    adpcm_ids = set(pdf.loc[pdf["codec"] == "ima_adpcm", "clip_id"])
    rows = audio_invariants(clips, ref).collect()
    assert {r["asset_id"] for r in rows} == adpcm_ids
    assert {r["error_key"] for r in rows} == {"snrBelowThreshold"}
