"""Run config, violation and verdict models.

Mirrors the reference's error model (ErrorFileData.scala:12-42 in
/root/reference/lambdas/tdr-draft-metadata-checks/src/main/scala/uk/gov/
nationalarchives/tdr/draftmetadatachecks/) re-expressed as plain Python
dataclasses + a Spark-side violation row schema.  The JSON emitter
byte-matches the reference's circe ``Printer.spaces2`` output
(``"key" : value``, 2-space indent, empty arrays as ``[\\n  ]``) so golden
files compare as exact strings (LambdaSpec.scala:201-221).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class FileError(str, Enum):
    """Run-level status enum (ErrorFileData.scala:12-15)."""

    UTF_8 = "UTF_8"
    INVALID_CSV = "INVALID_CSV"
    ROW_VALIDATION = "ROW_VALIDATION"
    SCHEMA_REQUIRED = "SCHEMA_REQUIRED"
    DUPLICATE_HEADER = "DUPLICATE_HEADER"
    ADDITIONAL_HEADER = "ADDITIONAL_HEADER"
    SCHEMA_VALIDATION = "SCHEMA_VALIDATION"
    PROTECTED_FIELD = "PROTECTED_FIELD"
    UNKNOWN = "UNKNOWN"
    NONE = "None"


# Validation process names used in violation rows.  The reference's
# processes (observed in golden files): ROW_VALIDATION, SCHEMA_BASE,
# SCHEMA_CLOSURE_*, FILE_CHECK.  Ours keep the same vocabulary.
PROCESS_FILE_CHECK = "FILE_CHECK"
PROCESS_ROW_VALIDATION = "ROW_VALIDATION"
PROCESS_SCHEMA_BASE = "SCHEMA_BASE"
PROCESS_PROTECTED = "PROTECTED_FIELD"
PROCESS_AUDIO = "AUDIO_VALIDATION"
PROCESS_DRIFT = "DISTRIBUTION_DRIFT"


@dataclass(frozen=True)
class Error:
    """One violation (ErrorFileData.scala:17)."""

    validationProcess: str
    property: str
    errorKey: str
    message: str

    def to_dict(self) -> dict:
        return {
            "validationProcess": self.validationProcess,
            "property": self.property,
            "errorKey": self.errorKey,
            "message": self.message,
        }


@dataclass
class ValidationErrors:
    """Per-asset violation record (ErrorFileData.scala:18)."""

    assetId: str
    errors: list[Error]
    data: list[tuple[str, str]]  # (name, value) pairs -- Metadata analog

    def to_dict(self) -> dict:
        return {
            "assetId": self.assetId,
            "errors": [e.to_dict() for e in self.errors],
            "data": [{"name": n, "value": v} for n, v in self.data],
        }


@dataclass
class ErrorFileData:
    """Whole-run verdict (ErrorFileData.scala:35-42)."""

    consignmentId: str
    fileError: FileError = FileError.NONE
    validationErrors: list[ValidationErrors] = field(default_factory=list)
    date: str | None = None  # yyyy-MM-dd; None -> today

    def to_dict(self) -> dict:
        return {
            "consignmentId": self.consignmentId,
            "date": self.date or _dt.date.today().isoformat(),
            "fileError": self.fileError.value,
            "validationErrors": [v.to_dict() for v in self.validationErrors],
        }

    def to_json(self) -> str:
        return circe_spaces2(self.to_dict())


def circe_spaces2(obj, indent: int = 0) -> str:
    """Serialize like circe's Printer.spaces2 (Lambda.scala:318 uses
    ``.asJson`` + spaces2): ``"key" : value``, 2-space indent, empty arrays
    as ``[\\n<indent>]``. Used to byte-match reference golden files."""
    import json as _json

    pad = " " * indent
    child = " " * (indent + 2)
    if isinstance(obj, dict):
        if not obj:
            return "{\n" + pad + "}"
        inner = ",\n".join(
            f'{child}"{k}" : {circe_spaces2(v, indent + 2)}' for k, v in obj.items()
        )
        return "{\n" + inner + "\n" + pad + "}"
    if isinstance(obj, list):
        if not obj:
            return "[\n" + pad + "]"
        inner = ",\n".join(child + circe_spaces2(v, indent + 2) for v in obj)
        return "[\n" + inner + "\n" + pad + "]"
    return _json.dumps(obj, ensure_ascii=False)


@dataclass
class ValidationParameters:
    """Engine run config (ValidationParameters, Lambda.scala:356-365)."""

    consignment_id: str
    unique_asset_id_key: str = "clip_id"
    check_against_uploaded_records: bool = True
    # protected ("System"-type) intrinsic fields checked against the
    # reference table (Lambda.scala:257-281 analog)
    protected_fields: tuple[str, ...] = ("sr_hz", "dur_ms")
    # decode-invariant knobs (north_rule)
    snr_threshold_db: float = 30.0
    run_id: str = "run-0"
    # schema contract for the gates (None -> canonical clips columns);
    # extending the schema (e.g. FOI-style rule columns) extends both
    expected_columns: tuple[str, ...] | None = None
    required_columns: tuple[str, ...] | None = None
    # resume: path of the checkpoint/lineage table (None = fresh run)
    checkpoint_dir: str | None = None


# ---------------------------------------------------------------------------
# Spark-side violation row schema: every check emits rows of this shape;
# the merge (ErrorFileData.scala:21-33 semigroup analog) groups by asset_id.
# ---------------------------------------------------------------------------

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("validation_process", T.StringType(), False),
        T.StructField("property", T.StringType(), False),
        T.StructField("error_key", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        # dynamic data payload: row values for the error properties + key col
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# per-partition verdict/metrics rows (north_rule)
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("pass", T.BooleanType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

REF_CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("file_id", T.StringType(), False),
        T.StructField("ref_pcm", T.BinaryType(), True),
        T.StructField("ref_transcript", T.StringType(), True),
        T.StructField("ref_sr_hz", T.IntegerType(), True),
        T.StructField("ref_dur_ms", T.IntegerType(), True),
    ]
)
