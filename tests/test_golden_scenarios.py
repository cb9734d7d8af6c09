"""Scenario matrix (FIXTURES.md §4): each reference golden-file test case
transplanted onto the clips table, byte-matching our error-file JSON.

Mirrors LambdaSpec.scala:20-230's strategy: run the whole engine, capture
the emitted JSON document, compare as an EXACT string against a golden
under tests/goldens/ ("$today" templating like LambdaSpec.scala:218-219).

Regenerate goldens intentionally with REGEN_GOLDENS=1 (a diff in review
is the approval gate, same as the reference's checked-in json/ corpus).
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pytest

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.models import FileError, ValidationParameters
from tdr_draft_metadata_validator_spark.plans.engine import validate

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"
GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def run_scenario(spark, name: str, clips_pdf, ref_pdf, expect_error: FileError,
                 raw_headers=None, with_audio=True, drop_cols=(), extra_cols=()):
    clips = datagen.clips_df(spark, clips_pdf)
    for c in drop_cols:
        clips = clips.drop(c)
    for c, v in extra_cols:
        from pyspark.sql import functions as F
        clips = clips.withColumn(c, F.lit(v))
    ref = datagen.ref_df(spark, ref_pdf) if ref_pdf is not None else None
    params = ValidationParameters(consignment_id=CID)
    result = validate(spark, clips, ref, params, raw_headers=raw_headers,
                      with_audio=with_audio)
    assert result.file_error == expect_error, (
        f"{name}: expected {expect_error}, got {result.file_error}"
    )
    doc = result.error_file(date="$today").to_json()
    golden = GOLDEN_DIR / f"{name}.json"
    if os.environ.get("REGEN_GOLDENS") == "1":
        GOLDEN_DIR.mkdir(exist_ok=True)
        golden.write_text(doc + "\n")
    assert golden.exists(), f"golden missing: {golden} (set REGEN_GOLDENS=1)"
    assert doc + "\n" == golden.read_text(), f"{name}: golden mismatch"
    return result


def ids(*xs):
    return np.array(xs)


# --- scenarios --------------------------------------------------------------

def test_empty_error_file(spark):
    """sample.csv -> empty-error-file.json: clean rows, file still written."""
    run_scenario(spark, "empty-error-file",
                 datagen.clips_batch(ids(0, 1, 2, 3)), datagen.ref_batch(ids(0, 1, 2, 3)),
                 FileError.NONE)


def test_error_file_combined(spark):
    """invalid-sample.csv -> error-file.json: bad enum + bad range +
    missing required value."""
    pdf = datagen.clips_batch(ids(0, 1, 2, 3))
    pdf.loc[1, "sr_hz"] = 12345          # enum violation
    pdf.loc[2, "dur_ms"] = -1            # range violation
    pdf.loc[3, "transcript"] = ""        # required violation
    run_scenario(spark, "error-file",
                 pdf, datagen.ref_batch(ids(0, 1, 2, 3)),
                 FileError.SCHEMA_VALIDATION, with_audio=False)


def test_not_utf8(spark):
    """sample-not-utf8.csv -> not-utf8-error.json: undecodable payload."""
    pdf = datagen.clips_batch(ids(0, 1, 2))
    pdf.loc[1, "bytes"] = b"\xff\xfenot audio at all"
    run_scenario(spark, "not-utf8-error",
                 pdf, datagen.ref_batch(ids(0, 1, 2)), FileError.UTF_8)


def test_duplicate_headers(spark):
    """sample-duplicate-headers.csv (CSV ingest mode): raw header line
    repeats a column."""
    run_scenario(spark, "error-file-duplicate-headers",
                 datagen.clips_batch(ids(0, 1)), datagen.ref_batch(ids(0, 1)),
                 FileError.DUPLICATE_HEADER,
                 raw_headers=["clip_id", "sr_hz", "sr_hz", "codec"])


def test_additional_headers(spark):
    """sample-additional-headers.csv -> extra columns UUID/AddColumn1/2."""
    run_scenario(spark, "error-file-additional-headers",
                 datagen.clips_batch(ids(0, 1)), datagen.ref_batch(ids(0, 1)),
                 FileError.ADDITIONAL_HEADER,
                 extra_cols=[("UUID", "x"), ("AddColumn1", "y"), ("AddColumn2", "z")])


def test_missing_required_column(spark):
    """sample-missing-required-column.csv -> drop codec."""
    run_scenario(spark, "error-file-required",
                 datagen.clips_batch(ids(0, 1)), datagen.ref_batch(ids(0, 1)),
                 FileError.SCHEMA_REQUIRED, drop_cols=("codec",))


def test_no_match_column(spark):
    """sample-no-match-column.csv -> key column absent: assetId falls back
    to the key column NAME (CSVHandler.scala:38 trap)."""
    run_scenario(spark, "no-match-col-error",
                 datagen.clips_batch(ids(0, 1)), datagen.ref_batch(ids(0, 1)),
                 FileError.SCHEMA_REQUIRED, drop_cols=("clip_id",))


def test_invalid_rows_duplicate(spark):
    """two clip_ids appear twice (salted agg path)."""
    pdf = datagen.clips_batch(ids(0, 1, 2, 1, 3, 3))
    run_scenario(spark, "error-file-invalid-rows-duplicate",
                 pdf, datagen.ref_batch(ids(0, 1, 2, 3)),
                 FileError.SCHEMA_VALIDATION)


def test_invalid_rows_missing(spark):
    """ref has an id absent from clips."""
    run_scenario(spark, "error-file-invalid-rows-missing",
                 datagen.clips_batch(ids(0, 1, 2)), datagen.ref_batch(ids(0, 1, 2, 3)),
                 FileError.SCHEMA_VALIDATION)


def test_invalid_rows_unknown(spark):
    """clips has an id absent from ref."""
    run_scenario(spark, "error-file-validation-error-invalid-rows-unknown",
                 datagen.clips_batch(ids(0, 1, 2, 99)), datagen.ref_batch(ids(0, 1, 2)),
                 FileError.SCHEMA_VALIDATION)


def test_invalid_rows_duplicate_unknown(spark):
    """one unknown id duplicated -> both errors merge on one assetId
    (semigroup merge, ErrorFileData.scala:21-33)."""
    pdf = datagen.clips_batch(ids(0, 1, 99, 99))
    result = run_scenario(spark, "error-file-invalid-rows-duplicate-unknown",
                          pdf, datagen.ref_batch(ids(0, 1)),
                          FileError.SCHEMA_VALIDATION)
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    both = merged[datagen.clip_id_of(99)]
    keys = {e["error_key"] for e in both["errors"]}
    assert keys == {"duplicate", "unknown"}


def test_empty_row_dropped_before_checks(spark):
    """all-null row dropped (CSVHandler.scala:34) + other errors remain."""
    pdf = datagen.clips_batch(ids(0, 1, 2, 99))
    pdf.loc[4] = [None, None, None, None, None, None]  # appended all-null row
    pdf.loc[1, "sr_hz"] = 12345
    run_scenario(spark, "error-file-validation-errors-invalid-rows",
                 pdf, datagen.ref_batch(ids(0, 1, 2, 3)),
                 FileError.SCHEMA_VALIDATION, with_audio=False)


def test_protected_fields_scenario(spark):
    """sr_hz / dur_ms differ from reference intrinsic values."""
    pdf = datagen.clips_batch(ids(0, 1, 2))
    pdf.loc[1, "sr_hz"] = 8000 if datagen.sr_of(1) != 8000 else 16000
    pdf.loc[2, "dur_ms"] = int(pdf.loc[2, "dur_ms"]) + 1
    run_scenario(spark, "error-file-protected-fields",
                 pdf, datagen.ref_batch(ids(0, 1, 2)),
                 FileError.SCHEMA_VALIDATION, with_audio=False)


def test_pattern_linebreak_transcript(spark):
    """transcripts containing \\r\\n (pattern rule)."""
    pdf = datagen.clips_batch(ids(0, 1, 2))
    pdf.loc[1, "transcript"] = "line one\r\nline two"
    run_scenario(spark, "error-file-validation-errors-pattern",
                 pdf, datagen.ref_batch(ids(0, 1, 2)),
                 FileError.SCHEMA_VALIDATION, with_audio=False)


def test_invalid_rows_duplicate_with_rule_errors(spark):
    """error-file-validation-error-invalid-rows-duplicate.json analog
    (LambdaSpec.scala:100-101): the same asset carries schema rule errors
    AND a duplicate-rows error AND a protected-field mismatch — the
    semigroup merge folds row-rule errors WITH relational errors on one
    assetId (the reference's combined scenario no other golden covers)."""
    pdf = datagen.clips_batch(ids(0, 1, 2, 2))
    pdf.loc[2, "sr_hz"] = 12345            # enum violation + protected diff
    pdf.loc[2, "transcript"] = ""          # required violation
    result = run_scenario(
        spark, "error-file-validation-error-invalid-rows-duplicate",
        pdf, datagen.ref_batch(ids(0, 1, 2)),
        FileError.SCHEMA_VALIDATION, with_audio=False,
    )
    merged = {r["asset_id"]: r for r in result.merged.collect()}
    combined = merged[datagen.clip_id_of(2)]
    procs_keys = {(e["validation_process"], e["error_key"]) for e in combined["errors"]}
    assert ("ROW_VALIDATION", "duplicate") in procs_keys
    assert ("SCHEMA_BASE", "enum") in procs_keys
    assert ("SCHEMA_BASE", "required") in procs_keys
    assert ("PROTECTED_FIELD", "PROTECTED_FIELD") in procs_keys


def test_display_header_roundtrip(spark):
    """propertyToOutputMapper analog (CSVHandler.scala:26-31): violations
    computed on canonical properties are emitted with the user's DISPLAY
    headers — the output side of the header mapping whose input side is
    load_clips_csv's header_mapping. Golden locks the display names."""
    from tdr_draft_metadata_validator_spark.operators.merge import (
        collect_error_file,
        map_violation_properties,
    )

    display = {"sr_hz": "Sample Rate", "transcript": "Transcript",
               "clip_id": "Clip ID", "codec": "Codec"}
    pdf = datagen.clips_batch(ids(0, 1, 2))
    pdf.loc[1, "sr_hz"] = 12345
    pdf.loc[2, "transcript"] = ""
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(ids(0, 1, 2)))
    result = validate(spark, clips, ref, ValidationParameters(consignment_id=CID),
                      with_audio=False)
    mapped = map_violation_properties(result.merged, display)
    doc = collect_error_file(mapped, CID, result.file_error, date="$today").to_json()
    golden = GOLDEN_DIR / "error-file-display-headers.json"
    if os.environ.get("REGEN_GOLDENS") == "1":
        golden.write_text(doc + "\n")
    assert golden.exists(), f"golden missing: {golden} (set REGEN_GOLDENS=1)"
    assert doc + "\n" == golden.read_text()
    assert '"property" : "Sample Rate"' in doc
    assert '"name" : "Clip ID"' in doc
    assert "sr_hz" not in doc  # every canonical name mapped out
