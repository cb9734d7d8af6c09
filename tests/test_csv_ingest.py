"""CSV ingest mode end-to-end: S2/S3 readers + header mapping (G6/G7) +
duplicate-header and INVALID_CSV gates over real CSV files."""

import pytest

from tdr_draft_metadata_validator_spark.models import FileError, ValidationParameters
from tdr_draft_metadata_validator_spark.operators.gates import (
    duplicate_headers_gate,
    invalid_csv_gate,
)
from tdr_draft_metadata_validator_spark.plans.engine import validate
from tdr_draft_metadata_validator_spark.sources.tables import (
    load_clips_csv,
    raw_csv_headers,
)

CID = "f82af3bf-b742-454c-9771-bfd6c5eae749"

MAPPING = {
    # input header -> canonical property (inputToPropertyMapper analog)
    "Clip ID": "clip_id",
    "Sample Rate": "sr_hz",
    "Duration": "dur_ms",
    "Codec": "codec",
    "Transcript": "transcript",
    # unmapped headers are dropped (CSVHandler.scala:40)
}


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_csv_load_with_header_mapping(spark, tmp_path):
    path = _write(tmp_path, "in.csv",
                  "Clip ID,Sample Rate,Duration,Codec,Transcript,Ignored\n"
                  "clip/a.wav,16000,500,flac,hello there,zzz\n"
                  "clip/b.wav,8000,900,opus,more words,zzz\n")
    df, headers = load_clips_csv(spark, path, MAPPING)
    assert headers == ["Clip ID", "Sample Rate", "Duration", "Codec", "Transcript", "Ignored"]
    assert set(df.columns) == {"clip_id", "sr_hz", "dur_ms", "codec", "transcript"}
    rows = {r["clip_id"]: r for r in df.collect()}
    assert rows["clip/a.wav"]["sr_hz"] == 16000  # late typing applied
    assert rows["clip/b.wav"]["dur_ms"] == 900


def test_csv_duplicate_header_gate(spark, tmp_path):
    path = _write(tmp_path, "dup.csv",
                  "Clip ID,Codec,Codec\nclip/a.wav,flac,opus\n")
    headers = raw_csv_headers(spark, path)
    failure = duplicate_headers_gate(headers, CID)
    assert failure is not None
    assert failure.file_error == FileError.DUPLICATE_HEADER
    assert failure.error_file.validationErrors[0].errors[0].property == "Codec"


def test_csv_ingest_through_engine(spark, tmp_path):
    """Full gate lifecycle on CSV input: required-column gate catches the
    missing payload column (bytes never exists in CSV mode)."""
    path = _write(tmp_path, "eng.csv",
                  "Clip ID,Sample Rate,Duration,Codec,Transcript\n"
                  "clip/a.wav,16000,500,flac,hi\n")
    df, headers = load_clips_csv(spark, path, MAPPING)
    result = validate(
        spark, df, None, ValidationParameters(consignment_id=CID),
        raw_headers=headers, with_audio=False,
    )
    assert result.file_error == FileError.SCHEMA_REQUIRED  # no bytes column
    props = [e.property for e in result.gate_error_file.validationErrors[0].errors]
    assert props == ["bytes"]


def test_invalid_csv_gate_none_without_corrupt_col(spark):
    df = spark.createDataFrame([("a",)], "clip_id string")
    assert invalid_csv_gate(df, CID) is None
