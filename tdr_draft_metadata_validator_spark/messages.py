"""Validation message catalog (F5).

The reference resolves ``{PROCESS}.{property}.{errorKey}`` through
``validation-messages.properties`` (Lambda.scala:239-247, loaded at
:339-344); a missing entry falls back to the lookup key itself (visible in
goldens, e.g. ``"message" : "DUPLICATE_HEADER.file_path.duplicate"``).
We keep that exact contract: ``resolve(process, property, key)`` returns
the catalog entry or the dotted key.

Messages below reuse the reference's user-facing text verbatim where the
scenario maps 1:1 (duplicate / missing / unknown rows, protected fields,
UTF-8), plus audio-engine-specific entries keyed by property.
"""

from __future__ import annotations

# Catalog keyed by (process, property, errorKey). A '*' property matches
# any property (the reference has per-property keys; our rules are mostly
# property-generic so '*' keeps the catalog small).
_CATALOG: dict[tuple[str, str, str], str] = {
    # --- row-level relational checks (RowValidator.scala:8-36 analogs) ---
    ("ROW_VALIDATION", "*", "duplicate"): (
        "This file appears more than once in your metadata file. There must "
        "be only one row in your metadata file for each file you uploaded"
    ),
    ("ROW_VALIDATION", "*", "unknown"): (
        "This file was listed in your metadata file but does not match to "
        "one of your uploaded files"
    ),
    ("ROW_VALIDATION", "*", "missing"): (
        "This file was uploaded but is missing from your metadata file"
    ),
    # --- protected/intrinsic fields (Lambda.scala:257-281 analog) ---
    ("PROTECTED_FIELD", "*", "PROTECTED_FIELD"): (
        "Does not match expected value, this is intrinsic metadata and must "
        "not be changed"
    ),
    # --- file-level gates ---
    ("FILE_CHECK", "*", "UTF8"): "FILE_CHECK.UTF.INVALID",
    ("FILE_CHECK", "*", "DECODE"): (
        "Audio payload could not be decoded with the declared codec"
    ),
    # --- schema rules over the clips table ---
    ("SCHEMA_BASE", "sr_hz", "enum"): (
        "Sample rate must be one of the allowed values"
    ),
    ("SCHEMA_BASE", "codec", "enum"): "Codec must be one of the allowed values",
    ("SCHEMA_BASE", "dur_ms", "range"): (
        "Duration must be a positive number of milliseconds"
    ),
    ("SCHEMA_BASE", "transcript", "required"): "Must not be empty",
    ("SCHEMA_BASE", "transcript", "pattern"): "Must not contain line breaks",
    ("SCHEMA_BASE", "transcript", "speakingRate"): (
        "Transcript length is implausible for the clip duration "
        "(possible transcript/clip mispairing)"
    ),
    ("SCHEMA_BASE", "*", "type"): "Value is not of the expected type",
    ("SCHEMA_BASE", "*", "format.date"): (
        "We are unable to recognise this as a valid date format, please "
        "provide a date in the format yyyy-mm-dd"
    ),
    ("SCHEMA_BASE", "*", "required"): "Must not be empty",
    # cross-field rules (FOI analogs; FOIClosureCodesAndPeriods.scala:32-34,
    # FOIExemptionDate.scala:42-58)
    ("SCHEMA_BASE", "*", "closureCodeAndPeriodMismatch"): (
        "Must have the same number of closure periods as foi exemption codes"
    ),
    ("SCHEMA_BASE", "*", "exemptionDateAndClosureStartDateSame"): (
        "Must be the date of the advisory schedule confirming closure, "
        "should not be the same as closure start date"
    ),
    ("SCHEMA_BASE", "*", "exemptionDateBefore2000"): "Invalid FOI exemption date",
    # --- audio invariants (north_rule U3) ---
    ("AUDIO_VALIDATION", "bytes", "snrBelowThreshold"): (
        "Decoded audio does not match the reference recording (SNR below "
        "threshold)"
    ),
    ("AUDIO_VALIDATION", "transcript", "transcriptMismatch"): (
        "Transcript does not match the reference transcript"
    ),
    ("AUDIO_VALIDATION", "bytes", "undecodable"): (
        "Audio payload could not be decoded with the declared codec"
    ),
    ("AUDIO_VALIDATION", "sr_hz", "sampleRateMismatch"): (
        "Declared sample rate does not match the decoded audio payload"
    ),
    ("AUDIO_VALIDATION", "dur_ms", "durationMismatch"): (
        "Declared duration does not match the decoded audio payload"
    ),
    # --- distribution drift (north_rule A6) ---
    ("DISTRIBUTION_DRIFT", "*", "distributionDrift"): (
        "Column distribution has drifted from the reference beyond the "
        "configured PSI/KS thresholds"
    ),
}


def resolve(process: str, prop: str, error_key: str) -> str:
    """Catalog lookup with the reference's fallback-to-key behavior."""
    for k in ((process, prop, error_key), (process, "*", error_key)):
        if k in _CATALOG:
            return _CATALOG[k]
    return f"{process}.{prop}.{error_key}"
