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
    assert all(len(r["ref_md5"]) == 32 for r in rows)
