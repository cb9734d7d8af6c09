import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.functions.audio_codec import encode_wav_pcm16
from tdr_draft_metadata_validator_spark.models import FileError, ValidationParameters
from tdr_draft_metadata_validator_spark.operators.audio import audio_invariants, has_undecodable
from tdr_draft_metadata_validator_spark.plans.engine import validate

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"


def test_clean_audio_no_violations(spark):
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(4)))
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(4)))
    v = audio_invariants(clips, ref)
    assert v.count() == 0


def test_corrupt_payload_undecodable_and_gate(spark):
    pdf = datagen.clips_batch(np.arange(4))
    pdf.loc[2, "bytes"] = pdf.loc[2, "bytes"][:30]  # truncated header
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(4)))
    v = audio_invariants(clips, ref)
    rows = v.collect()
    assert [(r["asset_id"], r["error_key"]) for r in rows] == [
        (datagen.clip_id_of(2), "undecodable")
    ]
    assert has_undecodable(v)
    # engine turns it into the UTF_8-analog run gate (not-utf8-error.json shape)
    result = validate(spark, clips, ref, ValidationParameters(consignment_id=CID))
    assert result.file_error == FileError.UTF_8
    ef = result.error_file(date="$today")
    assert ef.validationErrors[0].assetId == CID
    assert ef.validationErrors[0].errors[0].errorKey == "UTF8"


def test_noise_triggers_snr_violation(spark):
    pdf = datagen.clips_batch(np.arange(3))
    # replace clip 1's payload with heavy noise at the same sr/length
    i = 1
    pcm = datagen.pcm_of(i)
    rng = np.random.RandomState(7)
    noisy = (pcm.astype(np.int32) + rng.randint(-20000, 20000, pcm.shape)).clip(
        -32768, 32767
    ).astype(np.int16)
    pdf.loc[i, "bytes"] = encode_wav_pcm16(noisy, datagen.sr_of(i))
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(3)))
    rows = audio_invariants(clips, ref).collect()
    assert [(r["asset_id"], r["error_key"]) for r in rows] == [
        (datagen.clip_id_of(1), "snrBelowThreshold")
    ]


def test_mild_noise_passes_snr(spark):
    pdf = datagen.clips_batch(np.arange(2))
    i = 0
    pcm = datagen.pcm_of(i)
    rng = np.random.RandomState(7)
    mild = (pcm.astype(np.int32) + rng.randint(-30, 30, pcm.shape)).clip(
        -32768, 32767
    ).astype(np.int16)
    pdf.loc[i, "bytes"] = encode_wav_pcm16(mild, datagen.sr_of(i))
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(2)))
    assert audio_invariants(clips, ref).count() == 0


def test_transcript_mismatch(spark):
    pdf = datagen.clips_batch(np.arange(3))
    pdf.loc[2, "transcript"] = "completely different words"
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(3)))
    rows = audio_invariants(clips, ref).collect()
    assert [(r["asset_id"], r["error_key"]) for r in rows] == [
        (datagen.clip_id_of(2), "transcriptMismatch")
    ]
