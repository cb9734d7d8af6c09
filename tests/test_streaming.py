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
