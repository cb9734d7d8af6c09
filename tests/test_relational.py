import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.operators import relational as R


def test_missing_and_unknown(spark):
    clips = datagen.clips_df(spark, datagen.clips_batch(np.array([0, 1, 2, 99])))
    ref = datagen.ref_df(spark, datagen.ref_batch(np.array([0, 1, 2, 3])))
    missing = R.missing_rows(clips, ref)
    assert [r["asset_id"] for r in missing.collect()] == [datagen.clip_id_of(3)]
    unknown = R.unknown_rows(clips, ref)
    assert [r["asset_id"] for r in unknown.collect()] == [datagen.clip_id_of(99)]


def test_duplicates_salted_matches_naive_on_skew(spark):
    # skewed: one hot key repeated 500x + uniques (FIXTURES.md clips_skew)
    ids = ["hot"] * 500 + [f"u{i}" for i in range(200)] + ["warm"] * 2
    df = spark.createDataFrame(pd.DataFrame({"clip_id": ids}))
    salted = R.duplicate_rows(df, "clip_id")
    got = sorted(r["asset_id"] for r in salted.collect())
    naive = (
        df.groupBy("clip_id").count().where(F.col("count") > 1)
        .select("clip_id").collect()
    )
    assert got == sorted(r["clip_id"] for r in naive) == ["hot", "warm"]


def test_protected_fields(spark):
    pdf = datagen.clips_batch(np.array([0, 1, 2]))
    pdf.loc[1, "sr_hz"] = 12345
    pdf.loc[2, "dur_ms"] = int(pdf.loc[2, "dur_ms"]) + 7
    clips = datagen.clips_df(spark, pdf)
    ref = datagen.ref_df(spark, datagen.ref_batch(np.array([0, 1, 2])))
    v = R.protected_fields(clips, ref).collect()
    by_asset = {(r["asset_id"], r["property"]) for r in v}
    assert by_asset == {
        (datagen.clip_id_of(1), "sr_hz"),
        (datagen.clip_id_of(2), "dur_ms"),
    }
    assert all(r["error_key"] == "PROTECTED_FIELD" for r in v)
    # data payload echoes the offending submitted value
    row = [r for r in v if r["property"] == "sr_hz"][0]
    assert row["data"][0]["value"] == "12345"
