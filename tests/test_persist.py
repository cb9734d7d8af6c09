"""F7/F8 coercion goldens (persistence LambdaSpec.scala:138-198 analog)."""

from tdr_draft_metadata_validator_spark.operators.persist import unpivot_for_persistence


def test_unpivot_and_coercions(spark):
    df = spark.createDataFrame(
        [
            ("a1", "1990-01-01", "Yes", "hello", ""),
            ("a2", "", "No", "", "x"),
            ("a3", None, None, "world", "y"),
        ],
        "clip_id string, review_date string, approved string, note string, sys string",
    )
    out = unpivot_for_persistence(
        df,
        key_col="clip_id",
        property_types={"review_date": "date", "approved": "boolean", "note": "text"},
        protected=("sys",),
    )
    rows = {(r["clip_id"], r["name"]): r["value"] for r in out.collect()}
    # date -> start-of-day timestamp, exact golden format (MetadataUtils.scala:73)
    assert rows[("a1", "review_date")] == "1990-01-01 00:00:00.0"
    # yes/no -> true/false for NON-EMPTY cells (MetadataUtils.scala:74-78)
    assert rows[("a1", "approved")] == "true"
    assert rows[("a2", "approved")] == "false"
    # empty stays "" with NO coercion for ANY type, booleans included
    # (MetadataUtils convertDataToBulkFileMetadataInput value.nonEmpty guard)
    assert rows[("a3", "approved")] == ""
    assert rows[("a2", "review_date")] == ""
    assert rows[("a2", "note")] == ""
    # protected column dropped entirely (MetadataUtils.scala:33-43)
    assert ("a1", "sys") not in rows
    # plain text passthrough
    assert rows[("a1", "note")] == "hello"


def test_unpivot_output_mapping(spark):
    """propertyToOutputMapper on the persistence path: emitted names use
    the display header; unmapped columns pass through."""
    df = spark.createDataFrame(
        [("a1", "1990-01-01", "hello")],
        "clip_id string, review_date string, note string",
    )
    out = unpivot_for_persistence(
        df, key_col="clip_id",
        property_types={"review_date": "date"},
        output_mapping={"review_date": "Review Date"},
    )
    names = {r["name"] for r in out.collect()}
    assert names == {"Review Date", "note"}
