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


def test_metadata_consistency_sr_and_duration(spark):
    """r6: declared sr_hz/dur_ms must match the decoded payload. Clip 1
    lies about its sample rate, clip 2 about its duration; clip 0 is
    honest. The payload itself is valid audio either way — pre-r6 both
    lies passed every check when no reference row flagged content."""
    pdf = datagen.clips_batch(np.arange(3))
    pdf.loc[1, "sr_hz"] = int(pdf.loc[1, "sr_hz"]) * 2
    pdf.loc[2, "dur_ms"] = int(pdf.loc[2, "dur_ms"]) + 250
    clips = datagen.clips_df(spark, pdf)
    rows = audio_invariants(clips, None).collect()
    got = sorted((r["asset_id"], r["error_key"], r["property"]) for r in rows)
    assert got == [
        (datagen.clip_id_of(1), "sampleRateMismatch", "sr_hz"),
        (datagen.clip_id_of(2), "durationMismatch", "dur_ms"),
    ]
    data = {r["error_key"]: {d["name"]: d["value"] for d in r["data"]}
            for r in rows}
    assert data["sampleRateMismatch"]["sr_hz"] == str(pdf.loc[1, "sr_hz"])
    assert int(data["durationMismatch"]["decoded_ms"]) + 250 == int(
        data["durationMismatch"]["dur_ms"])


def test_metadata_consistency_clean_all_codecs(spark):
    """Honest tables (incl. flac/opus/lossy slots) raise no metadata
    violations: every decoder returns exact frame counts."""
    pdf = datagen.clips_batch(np.arange(12), ulaw_every=5, extended_every=3)
    clips = datagen.clips_df(spark, pdf)
    assert audio_invariants(clips, None).count() == 0


def test_metadata_consistency_strict_mode(spark):
    """The strict audit path runs the same metadata checks inside its
    single decode pass (there is no fingerprint stage to host them)."""
    pdf = datagen.clips_batch(np.arange(3))
    pdf.loc[1, "sr_hz"] = int(pdf.loc[1, "sr_hz"]) * 2
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(3)))
    rows = audio_invariants(clips, ref, strict_snr=True).collect()
    got = [(r["asset_id"], r["error_key"], r["property"]) for r in rows]
    assert got == [(datagen.clip_id_of(1), "sampleRateMismatch", "sr_hz")]
