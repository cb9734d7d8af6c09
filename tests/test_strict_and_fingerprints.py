import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.functions.audio_codec import encode_wav_pcm16
from tdr_draft_metadata_validator_spark.operators.audio import (
    audio_invariants,
    ref_fingerprints,
)


def _tables(spark, n=5, noisy_idx=None):
    pdf = datagen.clips_batch(np.arange(n))
    if noisy_idx is not None:
        pcm = datagen.pcm_of(noisy_idx)
        rng = np.random.RandomState(3)
        noisy = (pcm.astype(np.int32) + rng.randint(-20000, 20000, pcm.shape)).clip(
            -32768, 32767
        ).astype(np.int16)
        pdf.loc[noisy_idx, "bytes"] = encode_wav_pcm16(noisy, datagen.sr_of(noisy_idx))
        # keep payload and label consistent: datagen may label this index
        # 'flac' (real FLAC framing since r5), but the noisy bytes are RIFF
        pdf.loc[noisy_idx, "codec"] = "pcm_s16le"
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(n)))
    return clips, ref


def test_strict_and_default_agree(spark):
    clips, ref = _tables(spark, noisy_idx=2)
    default = {(r["asset_id"], r["error_key"])
               for r in audio_invariants(clips, ref).collect()}
    strict = {(r["asset_id"], r["error_key"])
              for r in audio_invariants(clips, ref, strict_snr=True).collect()}
    assert default == strict == {(datagen.clip_id_of(2), "snrBelowThreshold")}


def test_strict_clean_corpus_no_violations(spark):
    clips, ref = _tables(spark)
    assert audio_invariants(clips, ref, strict_snr=True).count() == 0


def test_precomputed_fingerprints_equivalent(spark):
    clips, ref = _tables(spark, noisy_idx=1)
    fp = ref_fingerprints(ref)
    with_fp = {(r["asset_id"], r["error_key"])
               for r in audio_invariants(clips, ref, fingerprints=fp).collect()}
    without = {(r["asset_id"], r["error_key"])
               for r in audio_invariants(clips, ref).collect()}
    assert with_fp == without == {(datagen.clip_id_of(1), "snrBelowThreshold")}


def test_fingerprint_manifest_shape(spark):
    _, ref = _tables(spark, n=3)
    fp = ref_fingerprints(ref)
    rows = fp.collect()
    assert {r["clip_id"] for r in rows} == {datagen.clip_id_of(i) for i in range(3)}
    assert all(len(r["ref_sha1"]) == 40 for r in rows)


def test_stale_md5_manifest_refused(spark):
    """r7: the fingerprint family is sha1; an old md5-family manifest
    must be refused loudly (silently treating it as all-mismatched
    would SNR-join every payload row)."""
    import pytest
    from pyspark.sql import functions as F

    clips, ref = _tables(spark, n=3)
    stale = ref.select(
        F.col("clip_id"), F.md5(F.col("ref_pcm")).alias("ref_md5")
    )
    with pytest.raises(ValueError, match="ref_sha1"):
        audio_invariants(clips, ref, fingerprints=stale)


def test_ulaw_lossy_residue_path(spark):
    """REAL lossy codec through the residue: mu-law clips hash-mismatch
    the reference PCM (lossy round trip), fall into the sample-level SNR
    join, and PASS at ~38 dB >= 30 — the fingerprint screen's fallback
    exercised with genuine (not fabricated) lossy data."""
    pdf = datagen.clips_batch(np.arange(12), ulaw_every=3)  # 0,3,6,9 are ulaw
    assert (pdf["codec"] == "ulaw").sum() == 4
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(12)))
    v = audio_invariants(clips, ref)
    assert v.count() == 0  # lossy but >= threshold: clean


def test_ulaw_below_threshold_fails_snr(spark):
    """A mu-law clip whose source was corrupted before encoding lands
    below 30 dB vs the reference -> snrBelowThreshold violation."""
    from tdr_draft_metadata_validator_spark.functions.audio_codec import encode_ulaw

    pdf = datagen.clips_batch(np.arange(6), ulaw_every=3)
    pcm = datagen.pcm_of(3)
    rng = np.random.RandomState(7)
    noisy = np.clip(
        pcm.astype(np.int32) + rng.randint(-12000, 12000, size=pcm.shape),
        -32768, 32767,
    ).astype(np.int16)
    pdf.loc[3, "bytes"] = encode_ulaw(noisy, datagen.sr_of(3))
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(6)))
    v = audio_invariants(clips, ref)
    rows = v.collect()
    assert {(r["asset_id"], r["error_key"]) for r in rows} == {
        (datagen.clip_id_of(3), "snrBelowThreshold")
    }


def test_ulaw_strict_and_default_agree(spark):
    """Audit mode and the screened path agree on a mixed lossy corpus."""
    pdf = datagen.clips_batch(np.arange(10), ulaw_every=2)
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(10)))
    default = audio_invariants(clips, ref)
    strict = audio_invariants(clips, ref, strict_snr=True)
    assert default.count() == strict.count() == 0
