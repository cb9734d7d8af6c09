"""Bucketed co-located joins: the repeated-runs layout lever — joining
two tables bucketed on the same key must plan WITHOUT a shuffle."""

import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.sources.tables import write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(100))).drop("bytes")
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(100))).drop("ref_pcm")
    write_bucketed(clips, "b_clips", buckets=8, path=str(tmp_path / "bc"))
    write_bucketed(ref, "b_ref", buckets=8, path=str(tmp_path / "br"))
    try:
        a = spark.table("b_clips")
        b = spark.table("b_ref")
        # force SMJ (AQE would broadcast tiny test tables and hide the
        # layout property under a BroadcastExchange) and run the job so
        # the adaptive plan is FINAL before inspecting it
        joined = a.hint("merge").join(b, on="clip_id")
        assert joined.count() == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle
        # sanity: the same SMJ on plain (unbucketed) parquet DOES shuffle
        plain = clips.hint("merge").join(ref, on="clip_id")
        plain.count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_clips")
        spark.sql("DROP TABLE IF EXISTS b_ref")
