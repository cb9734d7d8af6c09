"""Cross-field rule tests: FOI analogs (FOIClosureCodesAndPeriods.scala,
FOIExemptionDate.scala incl. the FOIExemptionDateSpec.scala:44-70
boundary cases) + conditional dependency (alternate description analog).

These rules are generic engine vocabulary — the fixture table here adds
the paired columns the scenarios need (the reference's closure/FOI
columns transplanted onto clip rows).
"""

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark.operators.rules import (
    array_length_match_rule,
    compile_rules,
    date_before_rule,
    date_format_rule,
    dates_equal_rule,
    expr_rule,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_array_length_mismatch_two_errors_one_payload(spark):
    """Mismatch emits TWO errors (one per column) sharing one data payload
    (FOIClosureCodesAndPeriods.scala:50-65; golden
    error-file-foi-code-period-mismatch.json)."""
    df = _df(
        spark,
        [("c1", "27(1);27(2)", "40"), ("c2", "27(1);33", "40;60"), ("c3", None, "40")],
        "clip_id string, foi_codes string, closure_periods string",
    )
    rules = array_length_match_rule("foi_codes", "closure_periods")
    v = compile_rules(df, rules).collect()
    assert [r["asset_id"] for r in v] == ["c1", "c1"]
    assert {r["property"] for r in v} == {"foi_codes", "closure_periods"}
    assert all(r["error_key"] == "closureCodeAndPeriodMismatch" for r in v)
    # shared payload: both errors echo both columns
    for r in v:
        assert [(d["name"], d["value"]) for d in r["data"]] == [
            ("foi_codes", "27(1);27(2)"),
            ("closure_periods", "40"),
        ]


def test_dates_equal_rule(spark):
    df = _df(
        spark,
        [("c1", "2001-05-05", "2001-05-05"), ("c2", "2001-05-05", "2001-05-06"),
         ("c3", "", "2001-05-06")],
        "clip_id string, exemption_date string, closure_start string",
    )
    v = compile_rules(df, [dates_equal_rule("exemption_date", "closure_start")]).collect()
    assert [r["asset_id"] for r in v] == ["c1"]
    assert v[0]["error_key"] == "exemptionDateAndClosureStartDateSame"


def test_date_before_2000_boundaries(spark):
    """FOIExemptionDateSpec boundaries: 1999-12-31 invalid, 2000-01-01
    valid, unparseable silently VALID (FOIExemptionDate.scala:57-75)."""
    df = _df(
        spark,
        [("a", "1999-12-31"), ("b", "2000-01-01"), ("c", "not-a-date"),
         ("d", ""), ("e", None), ("f", "1990-06-15")],
        "clip_id string, exemption_date string",
    )
    v = compile_rules(df, [date_before_rule("exemption_date", "2000-01-01")]).collect()
    assert sorted(r["asset_id"] for r in v) == ["a", "f"]
    assert all(r["error_key"] == "exemptionDateBefore2000" for r in v)


def test_date_format_rule(spark):
    df = _df(
        spark,
        [("a", "2020-01-01"), ("b", "01/02/2020"), ("c", ""), ("d", None)],
        "clip_id string, review_date string",
    )
    v = compile_rules(df, [date_format_rule("review_date")]).collect()
    assert [r["asset_id"] for r in v] == ["b"]
    assert v[0]["error_key"] == "format.date"


def test_conditional_dependency_alternate_description(spark):
    """Alternate present => base required (golden error-file-invalid-
    description-with-alternate-description.json analog)."""
    df = _df(
        spark,
        [("a", "main", "alt"), ("b", "", "alt"), ("c", "", ""), ("d", None, "alt")],
        "clip_id string, description string, alternate_description string",
    )
    cond = (
        F.col("alternate_description").isNotNull()
        & (F.col("alternate_description") != "")
        & (F.col("description").isNull() | (F.col("description") == ""))
    )
    rule = expr_rule(
        "description", "required", cond,
        message="Description must be provided when an alternative description is provided",
        data_cols=("description", "alternate_description"),
    )
    v = compile_rules(df, [rule]).collect()
    assert sorted(r["asset_id"] for r in v) == ["b", "d"]


def test_speaking_rate_rule(spark):
    """Cross-modal transcript/duration sanity: implausible words-per-sec
    flags; empty transcript and zero duration are other rules' jobs."""
    from tdr_draft_metadata_validator_spark.operators.rules import (
        compile_rules,
        speaking_rate_rule,
    )

    rows = [
        ("a", 10_000, "this is a perfectly normal ten second utterance ok"),  # 1 wps
        ("b", 2_000, " ".join(["w"] * 300)),   # 150 wps -> mispaired
        ("c", 60_000, "hi"),                   # 0.03 wps -> mispaired
        ("d", 10_000, ""),                     # empty: required_rule's job
        ("e", 0, "zero duration clip"),        # dur rule's job
        ("f", None, "null duration"),          # null-safe
    ]
    df = spark.createDataFrame(rows, "clip_id string, dur_ms int, transcript string")
    v = compile_rules(df, [speaking_rate_rule()], key_col="clip_id")
    got = {r["asset_id"] for r in v.collect()}
    assert got == {"b", "c"}
