import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
    read_clips_stream,
    run_to_memory_sink,
    violations_stream,
)


def test_streaming_rule_pass(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    pdf = datagen.clips_batch(np.arange(8))
    pdf.loc[3, "sr_hz"] = 12345
    pdf.loc[6, "codec"] = "mp3~bad"
    datagen.clips_df(spark, pdf).write.parquet(src)

    stream = read_clips_stream(spark, src, max_files=2)
    assert stream.isStreaming
    v = violations_stream(stream)
    q = run_to_memory_sink(v, name="v_out")
    try:
        rows = spark.sql("SELECT * FROM v_out").collect()
    finally:
        q.stop()
    got = {(r["asset_id"], r["property"], r["error_key"]) for r in rows}
    assert got == {
        (datagen.clip_id_of(3), "sr_hz", "enum"),
        (datagen.clip_id_of(6), "codec", "enum"),
    }


def test_stream_static_unknown_rows(spark, tmp_path):
    """J2's streaming face: stream-static left-anti join flags arriving
    clips whose keys are absent from the static reference manifest."""
    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        unknown_rows_stream,
    )

    src = str(tmp_path / "ss_in")
    datagen.clips_df(spark, datagen.clips_batch(np.arange(10))).write.parquet(src)
    # static reference knows only the first 6 keys
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(6))).select("clip_id")

    stream = read_clips_stream(spark, src, max_files=3)
    v = unknown_rows_stream(stream, ref)
    assert v.isStreaming
    q = run_to_memory_sink(v, name="unk_out")
    try:
        rows = spark.sql("SELECT * FROM unk_out").collect()
    finally:
        q.stop()
    got = {r["asset_id"] for r in rows}
    assert got == {datagen.clip_id_of(i) for i in range(6, 10)}
    assert all(r["error_key"] == "unknown" for r in rows)


def test_drift_monitor_stream(spark, tmp_path):
    """Per-micro-batch drift vs the materialized profile (numeric +
    categorical, reference never scanned): a matching batch stays quiet,
    a codec-collapsed + duration-shifted batch breaches."""
    from tdr_draft_metadata_validator_spark.operators.stats import build_ref_profile
    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        drift_monitor_stream,
    )

    ref = datagen.clips_df(spark, datagen.clips_batch(np.arange(300)))
    profile = build_ref_profile(
        spark, ref,
        columns=(("dur_ms", "dur_ms"),),
        categorical_columns=(("codec", "codec"),),
    )

    src = str(tmp_path / "drift_in")
    ok = datagen.clips_batch(np.arange(300, 600))
    datagen.clips_df(spark, ok).write.parquet(src)       # file 1: in-profile
    bad = datagen.clips_batch(np.arange(600, 900))
    bad["codec"] = "opus"
    bad["dur_ms"] = bad["dur_ms"] * 3 + 4000
    datagen.clips_df(spark, bad).coalesce(1).write.mode("append").parquet(src)

    stream = read_clips_stream(spark, src, max_files=1)  # one file per micro-batch
    q, log = drift_monitor_stream(stream, profile, "cid-1")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    breached_cols = {c for (_b, c, _p, _k) in log}
    assert breached_cols == {"dur_ms", "codec"}
    # at least one batch was clean (the in-profile files)
    batches_with_breach = {b for (b, *_x) in log}
    all_batches = set(range(max(batches_with_breach) + 1))
    assert all_batches - batches_with_breach, "expected a quiet batch"
