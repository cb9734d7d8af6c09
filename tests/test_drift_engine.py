import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.models import FileError, ValidationParameters
from tdr_draft_metadata_validator_spark.plans.engine import validate

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"


def test_drift_clean_no_violation(spark):
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(200)))
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(200)))
    result = validate(spark, clips, ref, ValidationParameters(consignment_id=CID),
                      with_audio=False, with_drift=True)
    assert result.passed


def test_drift_shifted_durations_flagged(spark):
    pdf = datagen.clips_batch(np.arange(200))
    pdf["dur_ms"] = pdf["dur_ms"] * 3 + 5000  # systematic shift vs reference
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(200)))
    result = validate(spark, clips, ref, ValidationParameters(consignment_id=CID),
                      with_audio=False, with_drift=True)
    assert result.file_error == FileError.SCHEMA_VALIDATION
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    # run-level drift row keyed by consignment id
    drift_rows = merged[CID]
    keys = {(e["validation_process"], e["property"], e["error_key"])
            for e in drift_rows["errors"]}
    assert ("DISTRIBUTION_DRIFT", "dur_ms", "distributionDrift") in keys
    # psi/ks measurements echoed in the data payload
    names = {d["name"] for d in drift_rows["data"]}
    assert {"psi", "ks"} <= names
    # protected-field rows also fire for every shifted clip (dur differs)
    assert len(merged) == 201


def test_drift_breach_does_not_poison_lineage(spark):
    """Run-level drift rows (asset_id = consignment id) must not mark any
    DATA partition failed in the lineage metrics — otherwise resume
    re-validates innocent clips forever while drift persists."""
    pdf = datagen.clips_batch(np.arange(200))
    pdf["dur_ms"] = pdf["dur_ms"] * 3 + 5000
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(200)))
    result = validate(spark, clips, ref, ValidationParameters(consignment_id=CID),
                      with_audio=False, with_drift=True, n_logical_partitions=8)
    assert result.file_error == FileError.SCHEMA_VALIDATION  # drift verdict
    m = result.metrics.collect()
    # every clip also trips protected-field dur_ms here, so partitions DO
    # fail — but none can fail *because of* the run-level drift row: its
    # violations must not be attributed to any partition_id
    n_viol_attributed = sum(r["n_violations"] for r in m)
    per_asset = result.merged.where(f"asset_id != '{CID}'")
    from pyspark.sql import functions as F
    n_real = per_asset.select(F.sum(F.size("errors"))).collect()[0][0]
    assert n_viol_attributed == n_real
