import numpy as np

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.models import ValidationParameters
from tdr_draft_metadata_validator_spark.plans.checkpoint import (
    completed_partitions,
    filter_resume,
    record_partitions,
    resume_run,
)
from tdr_draft_metadata_validator_spark.plans.engine import validate
from tdr_draft_metadata_validator_spark.plans.metrics import logical_partition

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"


def test_record_resume_cycle(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(40)))
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(40)))
    params = ValidationParameters(consignment_id=CID, run_id="r1")
    result = validate(spark, clips, ref, params, n_logical_partitions=8)
    record_partitions(result.metrics, ckpt)

    done = completed_partitions(spark, ckpt, "r1")
    assert done  # some partitions recorded
    remaining = filter_resume(clips, done, 8)
    # every remaining row is in a not-done partition
    lp = logical_partition(F.col("clip_id"), 8)
    assert remaining.where(lp.isin(done)).count() == 0
    # all partitions done -> nothing remains
    all_done = list(range(8))
    assert filter_resume(clips, all_done, 8).count() == 0


def test_record_is_idempotent_per_partition(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(20)))
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(20)))
    params = ValidationParameters(consignment_id=CID, run_id="r2")
    result = validate(spark, clips, ref, params, n_logical_partitions=4)
    record_partitions(result.metrics, ckpt)
    n1 = len(completed_partitions(spark, ckpt, "r2"))
    # retry writes the same partitions -> dynamic overwrite, no dup rows
    record_partitions(result.metrics, ckpt)
    m = spark.read.parquet(str(tmp_path / "ckpt2" / "lineage"))
    assert m.groupBy("partition_id").count().where("count > 1").count() == 0
    assert len(completed_partitions(spark, ckpt, "r2")) == n1


def test_resume_run_empty_checkpoint(spark, tmp_path):
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(10)))
    remaining, done = resume_run(spark, clips, str(tmp_path / "nope"), "rX", 8)
    assert done == []
    assert remaining.count() == 10
