import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.operators.stats import (
    column_stats,
    drift_check,
)


def test_column_stats_single_pass(spark):
    pdf = datagen.clips_batch(np.arange(20))
    pdf.loc[3, "sr_hz"] = 12345
    pdf.loc[5, "codec"] = "mp3~bad"
    clips = datagen.clips_df(spark, pdf)
    s = column_stats(clips)
    assert s["n_rows"] == 20
    assert s["sr_hz_out_of_domain"] == 1
    assert s["codec_not_whitelisted"] == 1
    assert s["null_rate_transcript"] == 0.0
    assert s["dur_ms_min"] >= 200 and s["dur_ms_max"] < 2000
    assert 15 <= s["clip_id_approx_distinct"] <= 25


def test_drift_same_distribution_low(spark):
    a = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 400)))
    b = datagen.clips_df(spark, datagen.clips_batch(np.arange(400, 800)))
    rep = drift_check(a, b, "dur_ms")
    assert rep.psi < 0.1
    assert rep.ks < 0.15
    assert not rep.breaches()


def test_drift_shifted_distribution_breaches(spark):
    a = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 300)))
    shifted = datagen.clips_batch(np.arange(0, 300))
    shifted["dur_ms"] = shifted["dur_ms"] * 3 + 4000
    b = datagen.clips_df(spark, shifted)
    rep = drift_check(b, a, "dur_ms")
    assert rep.psi > 0.2
    assert rep.ks > 0.2
    assert rep.breaches()
