"""Vectorized rule compiler (U2).

The reference delegates row rules to an external JSON-Schema engine
(``MetadataValidationJsonSchema.validate``, Lambda.scala:232-255) that
walks rows one at a time. Here a rule set compiles to **one projection**:
every rule becomes a Spark ``Column`` predicate; all predicates are
evaluated in a single ``select`` pass (whole-stage codegen, no Python),
violations are exploded into the engine's violation-row shape.

One scan of the data evaluates N rules — Catalyst prunes the scan to the
union of referenced columns, so the expensive ``bytes`` column is never
read unless a rule touches it.

Rule vocabulary covers the reference's observed error keys (enum, type,
pattern, const, required, format.date + the FOI cross-field rules,
SURVEY.md §2.6) plus range checks for the audio table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.audio_codec import CODEC_WHITELIST
from ..messages import resolve
from ..models import PROCESS_SCHEMA_BASE


@dataclass(frozen=True)
class Rule:
    """One compiled validation rule.

    ``condition`` is a Column that is TRUE where the row VIOLATES the rule.
    ``data_cols`` are the columns echoed into the violation's data payload
    (the reference echoes the error property's cell value,
    Lambda.scala:250-251).
    """

    prop: str
    error_key: str
    condition: Column
    process: str = PROCESS_SCHEMA_BASE
    message: str | None = None
    data_cols: tuple[str, ...] = ()

    def resolved_message(self) -> str:
        return self.message if self.message is not None else resolve(
            self.process, self.prop, self.error_key
        )

    def effective_data_cols(self) -> tuple[str, ...]:
        return self.data_cols if self.data_cols else (self.prop,)


# -- rule constructors -------------------------------------------------------

def _not_null_violation(col: str, cond: Column) -> Column:
    """Violation only where the value is present and the predicate holds
    (matches JSON-Schema semantics: type/enum/pattern rules skip nulls;
    ``required`` handles absence)."""
    return F.col(col).isNotNull() & cond


def enum_rule(col: str, allowed: list, **kw) -> Rule:
    return Rule(col, "enum", _not_null_violation(col, ~F.col(col).isin(allowed)), **kw)


def required_rule(col: str, **kw) -> Rule:
    c = F.col(col)
    return Rule(col, "required", c.isNull() | (c.cast("string") == F.lit("")), **kw)


def pattern_rule(col: str, regex: str, error_key: str = "pattern", **kw) -> Rule:
    """Violation where the value does NOT match ``regex``."""
    return Rule(col, error_key, _not_null_violation(col, ~F.col(col).rlike(regex)), **kw)


def forbidden_pattern_rule(col: str, regex: str, error_key: str = "pattern", **kw) -> Rule:
    """Violation where the value DOES match ``regex`` (e.g. line breaks,
    json/error-file-validation-errors-pattern.json analog)."""
    return Rule(col, error_key, _not_null_violation(col, F.col(col).rlike(regex)), **kw)


def range_rule(col: str, lo=None, hi=None, error_key: str = "range", **kw) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Rule(col, error_key, _not_null_violation(col, cond), **kw)


def const_rule(col: str, expected, **kw) -> Rule:
    return Rule(col, "const", _not_null_violation(col, F.col(col) != F.lit(expected)), **kw)


def type_rule(col: str, cast_to: str, **kw) -> Rule:
    """Violation where a string value fails to cast (try_cast -> null)."""
    c = F.col(col)
    return Rule(
        col, "type",
        c.isNotNull() & (c.cast("string") != "") & c.cast("string").try_cast(cast_to).isNull(),
        **kw,
    )


def date_format_rule(col: str, fmt: str = "yyyy-MM-dd", **kw) -> Rule:
    """errorKey format.date: non-empty value that does not parse."""
    c = F.col(col).cast("string")
    return Rule(
        col, "format.date",
        F.col(col).isNotNull() & (c != "") & F.try_to_timestamp(c, F.lit(fmt)).isNull(),
        **kw,
    )


def array_length_match_rule(col_a: str, col_b: str, sep: str = ";",
                            error_key: str = "closureCodeAndPeriodMismatch",
                            **kw) -> list[Rule]:
    """FOI code/period analog (FOIClosureCodesAndPeriods.scala:32-34):
    two semicolon-packed columns must have the same element count; a
    mismatch emits TWO errors (one per column) sharing one data payload
    (FOIClosureCodesAndPeriods.scala:50-65 -- trap list, SURVEY.md §7)."""
    mismatch = (
        F.col(col_a).isNotNull()
        & F.col(col_b).isNotNull()
        & (F.size(F.split(F.col(col_a), sep)) != F.size(F.split(F.col(col_b), sep)))
    )
    data = (col_a, col_b)
    return [
        Rule(col_a, error_key, mismatch, data_cols=data, **kw),
        Rule(col_b, error_key, mismatch, data_cols=data, **kw),
    ]


def dates_equal_rule(col_a: str, col_b: str,
                     error_key: str = "exemptionDateAndClosureStartDateSame",
                     **kw) -> Rule:
    """FOIExemptionDate.scala:42 analog: non-empty a == b is a violation."""
    a = F.col(col_a).cast("string")
    cond = F.col(col_a).isNotNull() & (a != "") & (a == F.col(col_b).cast("string"))
    return Rule(col_a, error_key, cond, data_cols=(col_a, col_b), **kw)


def date_before_rule(col: str, boundary: str,
                     error_key: str = "exemptionDateBefore2000", **kw) -> Rule:
    """FOIExemptionDate.scala:53-58 analog. Unparseable dates are silently
    VALID (Failure -> no error at :75; trap list): ``to_date`` yields null
    on bad input and ``null < lit`` is null -> no violation. Exact match."""
    cond = F.try_to_timestamp(F.col(col).cast("string"), F.lit("yyyy-MM-dd")) < F.to_timestamp(F.lit(boundary))
    return Rule(col, error_key, F.coalesce(cond, F.lit(False)), **kw)


def expr_rule(prop: str, error_key: str, condition: Column, **kw) -> Rule:
    """Escape hatch for arbitrary cross-field predicates (const/dependency
    rules like alternate-description, json/error-file-invalid-description-
    with-alternate-description.json)."""
    return Rule(prop, error_key, condition, **kw)


def speaking_rate_rule(
    dur_col: str = "dur_ms",
    transcript_col: str = "transcript",
    min_wps: float = 0.3,
    max_wps: float = 6.0,
    **kw,
) -> Rule:
    """Cross-MODAL sanity: whitespace words per second of audio must land
    in a plausible human range — catches transcript/clip mispairings
    (a 2 s clip with a 300-word transcript) that per-column checks can't
    see. Pure Column arithmetic over columns already scanned; payload
    untouched. Empty transcript / non-positive duration are other rules'
    jobs, so they pass here (no double-reporting one root cause).
    """
    words = F.size(F.split(F.trim(F.col(transcript_col)), r"\s+"))
    secs = F.col(dur_col).cast("double") / 1000.0
    wps = words / secs
    bad = (
        F.col(transcript_col).isNotNull()
        & (F.trim(F.col(transcript_col)) != "")
        & (secs > 0)
        & ((wps < min_wps) | (wps > max_wps))
    )
    return expr_rule(
        transcript_col, "speakingRate", bad,
        data_cols=(transcript_col, dur_col), **kw,
    )


# -- the default rule set for the clips table (north_rule A5 domains) --------

def clips_base_rules(sr_domain=(8000, 16000, 22050, 44100),
                     codec_whitelist=CODEC_WHITELIST,
                     dur_min: int = 1, dur_max: int = 60_000) -> list[Rule]:
    return [
        enum_rule("sr_hz", list(sr_domain)),
        enum_rule("codec", list(codec_whitelist)),
        range_rule("dur_ms", lo=dur_min, hi=dur_max),
        required_rule("transcript"),
        forbidden_pattern_rule("transcript", r"[\r\n]"),
    ]


# -- the compiler ------------------------------------------------------------

def compile_rules(df: DataFrame, rules: list[Rule], key_col: str = "clip_id",
                  passthrough_cols: list[str] | None = None) -> DataFrame:
    """Evaluate all rules in ONE select pass -> violation rows.

    Output schema matches models.VIOLATION_SCHEMA. Each rule contributes a
    ``CASE WHEN violation THEN struct(...) END`` element; non-null elements
    are exploded. Catalyst folds this into a single whole-stage-codegen
    projection over one scan; only columns referenced by rules + the key
    are read (column pruning -> parquet ReadSchema stays narrow).

    ``passthrough_cols`` ride along unchanged (appended after the standard
    violation columns) — e.g. an event-time column for the streaming
    windowed aggregate, or a partition column for routed sinks.
    """
    passthrough_cols = passthrough_cols or []
    elems = []
    for r in rules:
        data_arr = F.array(
            *[
                F.struct(
                    F.lit(c).alias("name"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in r.effective_data_cols()
            ]
        )
        elems.append(
            F.when(
                r.condition,
                F.struct(
                    F.lit(r.process).alias("validation_process"),
                    F.lit(r.prop).alias("property"),
                    F.lit(r.error_key).alias("error_key"),
                    F.lit(r.resolved_message()).alias("message"),
                    data_arr.alias("data"),
                ),
            )
        )
    packed = F.array_compact(F.array(*elems))
    exploded = (
        df.select(
            F.col(key_col).cast("string").alias("asset_id"),
            *[F.col(c) for c in passthrough_cols],
            packed.alias("__v"),
        )
        .where(F.size("__v") > 0)
        .select("asset_id", *passthrough_cols, F.explode("__v").alias("v"))
    )
    return exploded.select(
        "asset_id",
        F.col("v.validation_process").alias("validation_process"),
        F.col("v.property").alias("property"),
        F.col("v.error_key").alias("error_key"),
        F.col("v.message").alias("message"),
        F.col("v.data").alias("data"),
        *passthrough_cols,
    )
