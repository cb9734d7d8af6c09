import numpy as np

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.plans.engine import drop_empty_rows


def test_drop_empty_rows_ignores_payload_column(spark, tmp_path):
    pdf = datagen.clips_batch(np.arange(3))
    # row with ALL metadata empty but a payload blob attached -> dropped
    # (and the predicate must not reference `bytes`, for column pruning)
    pdf.loc[3] = [None, b"\x00\x01", None, None, "", ""]
    # row with one metadata field -> kept
    pdf.loc[4] = [None, None, 16000, None, None, None]
    path = str(tmp_path / "clips.parquet")
    datagen.clips_df(spark, pdf).write.parquet(path)
    df = spark.read.parquet(path)
    kept = drop_empty_rows(df)
    assert kept.count() == 4
    # a parquet-backed count must prune the binary column from the scan
    counted = kept.groupBy().count()
    plan = counted._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "bytes" not in read_schema, read_schema[:300]


def test_drop_empty_rows_keeps_partial(spark):
    pdf = datagen.clips_batch(np.arange(2))
    pdf.loc[0, "transcript"] = ""
    df = datagen.clips_df(spark, pdf)
    assert drop_empty_rows(df).count() == 2
