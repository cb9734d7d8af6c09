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


def test_drift_profile_matches_inline_and_skips_reference(spark):
    """The materialized profile reproduces the inline result exactly, and
    the profiled path never touches the reference (reference=None)."""
    from tdr_draft_metadata_validator_spark.operators.stats import (
        build_ref_profile,
        load_profiles,
    )

    ref = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 300)))
    shifted = datagen.clips_batch(np.arange(0, 300))
    shifted["dur_ms"] = shifted["dur_ms"] * 3 + 4000
    cur = datagen.clips_df(spark, shifted)

    inline = drift_check(cur, ref, "dur_ms")
    prof_df = build_ref_profile(spark, ref, columns=(("dur_ms", "dur_ms"),))
    prof = load_profiles(prof_df)["dur_ms"]
    profiled = drift_check(cur, None, "dur_ms", profile=prof)
    assert profiled.psi == inline.psi
    assert profiled.ks == inline.ks
    assert profiled.ref_distinct == inline.ref_distinct
    assert profiled.breaches()


def test_drift_profile_roundtrips_through_parquet(spark, tmp_path):
    """Snapshot-sidecar flow: write the profile, reload, drift unchanged."""
    from tdr_draft_metadata_validator_spark.operators.stats import (
        build_ref_profile,
        drift_violations,
    )

    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(0, 200)))
    cur = datagen.clips_df(spark, datagen.clips_batch(np.arange(200, 400)))
    path = str(tmp_path / "profile")
    build_ref_profile(spark, ref).write.parquet(path)
    prof_df = spark.read.parquet(path)
    v = drift_violations(spark, cur, None, "cid-1", profile_df=prof_df)
    assert v.count() == 0  # same distribution, no breach, zero ref scans


def test_drift_categorical(spark):
    """Categorical PSI: identical category mix -> 0 drift; a codec swap
    shows up in both psi and the max per-category gap."""
    from tdr_draft_metadata_validator_spark.operators.stats import (
        drift_check_categorical,
    )

    a = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 300)))
    b = datagen.clips_df(spark, datagen.clips_batch(np.arange(300, 600)))
    same = drift_check_categorical(b, a, "codec")
    assert same.psi < 0.05 and same.ks < 0.1
    shifted = datagen.clips_batch(np.arange(300, 600))
    shifted["codec"] = "opus"  # collapse the mix to one category
    rep = drift_check_categorical(datagen.clips_df(spark, shifted), a, "codec")
    assert rep.psi > 0.2 and rep.ks > 0.2 and rep.breaches()


def test_categorical_profile_matches_inline_and_skips_reference(spark):
    """Judge r2 task 3: categorical drift profiles are materialized like
    the numeric design — warm runs touch the reference ZERO times
    (reference=None on the profiled path) and reproduce the inline
    result exactly."""
    from tdr_draft_metadata_validator_spark.operators.stats import (
        build_ref_profile,
        drift_check_categorical,
        load_profiles,
    )

    ref = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 300)))
    shifted = datagen.clips_batch(np.arange(300, 600))
    shifted["codec"] = "opus"
    cur = datagen.clips_df(spark, shifted)

    inline = drift_check_categorical(cur, ref, "codec")
    prof_df = build_ref_profile(
        spark, ref, columns=(), categorical_columns=(("codec", "codec"),)
    )
    prof = load_profiles(prof_df)["codec"]
    assert prof.kind == "categorical" and prof.categories
    profiled = drift_check_categorical(cur, None, "codec", profile=prof)
    assert profiled.psi == inline.psi
    assert profiled.ks == inline.ks
    assert profiled.breaches()


def test_drift_violations_routes_categorical_profile(spark, tmp_path):
    """A mixed numeric+categorical profile manifest round-trips through
    parquet and drift_violations routes each row by kind with
    reference=None (zero reference scans on the warm path)."""
    from tdr_draft_metadata_validator_spark.operators.stats import (
        build_ref_profile,
        drift_violations,
    )

    ref = datagen.clips_df(spark, datagen.clips_batch(np.arange(0, 300)))
    path = str(tmp_path / "profile")
    build_ref_profile(
        spark, ref,
        columns=(("dur_ms", "dur_ms"),),
        categorical_columns=(("codec", "codec"),),
    ).write.parquet(path)
    prof_df = spark.read.parquet(path)

    # same distribution -> no breach on either kind
    cur_same = datagen.clips_df(spark, datagen.clips_batch(np.arange(300, 600)))
    assert drift_violations(spark, cur_same, None, "cid-1",
                            profile_df=prof_df).count() == 0

    # collapse the codec mix -> exactly the categorical row breaches
    shifted = datagen.clips_batch(np.arange(300, 600))
    shifted["codec"] = "opus"
    v = drift_violations(spark, datagen.clips_df(spark, shifted), None,
                         "cid-1", profile_df=prof_df).collect()
    assert [r["property"] for r in v] == ["codec"]
