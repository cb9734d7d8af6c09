"""FOI-analog scenarios through the WHOLE engine (not just the rule
compiler): extended schema + custom rule set + golden byte-match.

Completes the FIXTURES.md §4 scenario matrix rows:
- sample-foi-code-period-mismatch.csv -> error-file-foi-code-period-mismatch.json
- sample-foi-exemption-date-errors.csv -> error-file-foi-exemption-date-errors.json
- sample-invalid-description-with-alternate-description.csv analog
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.models import FileError, ValidationParameters
from tdr_draft_metadata_validator_spark.operators.rules import (
    array_length_match_rule,
    clips_base_rules,
    date_before_rule,
    dates_equal_rule,
    expr_rule,
)
from tdr_draft_metadata_validator_spark.plans.engine import validate

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"
GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"

EXTRA = ("foi_codes", "closure_periods", "exemption_date", "closure_start",
         "description", "alternate_description")
PARAMS = ValidationParameters(
    consignment_id=CID,
    expected_columns=(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", *EXTRA
    ),
)

def foi_rules():
    # built lazily: Column construction needs an active SparkContext
    return clips_base_rules() + array_length_match_rule(
        "foi_codes", "closure_periods"
    ) + [
        dates_equal_rule("exemption_date", "closure_start"),
        date_before_rule("exemption_date", "2000-01-01"),
        expr_rule(
            "description", "required",
            F.col("alternate_description").isNotNull()
            & (F.col("alternate_description") != "")
            & (F.col("description").isNull() | (F.col("description") == "")),
            message="Description must be provided when an alternative description is provided",
            data_cols=("description", "alternate_description"),
        ),
    ]


def run(spark, name, extra_values, expect=FileError.SCHEMA_VALIDATION):
    pdf = datagen.clips_batch(np.arange(len(extra_values)))
    for col_idx, col in enumerate(EXTRA):
        pdf[col] = [row[col_idx] for row in extra_values]
    clips = spark.createDataFrame(pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(len(extra_values))))
    result = validate(spark, clips, ref, PARAMS, rules=foi_rules(), with_audio=False)
    assert result.file_error == expect, f"{name}: {result.file_error}"
    doc = result.error_file(date="$today").to_json()
    golden = GOLDEN_DIR / f"{name}.json"
    if os.environ.get("REGEN_GOLDENS") == "1":
        golden.write_text(doc + "\n")
    assert golden.exists(), f"golden missing: {golden}"
    assert doc + "\n" == golden.read_text(), f"{name}: golden mismatch"
    return result


CLEAN = ("27(1)", "40", "", "2001-05-05", "a description", "")


def test_foi_code_period_mismatch(spark):
    rows = [CLEAN, ("27(1);27(2)", "40", "", "2001-05-05", "d", ""), CLEAN]
    result = run(spark, "error-file-foi-code-period-mismatch", rows)
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    errs = merged[datagen.clip_id_of(1)]["errors"]
    # TWO errors, one per column, sharing one data payload (trap list)
    assert [(e["property"], e["error_key"]) for e in errs] == [
        ("closure_periods", "closureCodeAndPeriodMismatch"),
        ("foi_codes", "closureCodeAndPeriodMismatch"),
    ]


def test_foi_exemption_date_errors(spark):
    rows = [
        CLEAN,
        ("27(1)", "40", "2001-05-05", "2001-05-05", "d", ""),  # same dates
        ("27(1)", "40", "1999-12-31", "2001-05-06", "d", ""),  # before 2000
        ("27(1)", "40", "not-a-date", "2001-05-06", "d", ""),  # silently valid
    ]
    result = run(spark, "error-file-foi-exemption-date-errors", rows)
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    assert datagen.clip_id_of(3) not in merged  # unparseable -> no error
    assert {e["error_key"] for e in merged[datagen.clip_id_of(1)]["errors"]} == {
        "exemptionDateAndClosureStartDateSame"
    }
    assert {e["error_key"] for e in merged[datagen.clip_id_of(2)]["errors"]} == {
        "exemptionDateBefore2000"
    }


def test_alternate_description_dependency(spark):
    rows = [CLEAN, ("27(1)", "40", "", "2001-05-05", "", "an alternate")]
    result = run(spark, "error-file-invalid-description-with-alternate-description", rows)
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    errs = merged[datagen.clip_id_of(1)]["errors"]
    assert [(e["property"], e["error_key"]) for e in errs] == [("description", "required")]
