import numpy as np
import pytest

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.operators.persist import (
    attach_file_ids,
    unpivot_for_persistence,
    write_batched,
)


def test_attach_file_ids_inner_join(spark):
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(4)))
    df = spark.createDataFrame(
        [(datagen.clip_id_of(i), "codec", "flac") for i in range(4)],
        "clip_id string, name string, value string",
    )
    out = attach_file_ids(df, ref)
    rows = out.collect()
    assert len(rows) == 4
    assert {r["file_id"] for r in rows} == {datagen.file_id_of(i) for i in range(4)}


def test_attach_file_ids_raises_on_missing(spark):
    """J4 fail-on-miss semantics (MetadataUtils.scala:53-55)."""
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(2)))
    df = spark.createDataFrame(
        [(datagen.clip_id_of(0), "a", "b"), ("clip/unknown.wav", "a", "b")],
        "clip_id string, name string, value string",
    )
    with pytest.raises(ValueError, match="1 asset keys have no file_id"):
        attach_file_ids(df, ref)


def test_write_batched_partitioning(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"c{i}", "k", str(i)) for i in range(1000)],
        "clip_id string, name string, value string",
    )
    out = str(tmp_path / "persist_out")
    write_batched(df, out, rows_per_batch=250)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # ~4 batches requested -> 4 output partitions (files)
    import glob
    n_files = len(glob.glob(f"{out}/part-*"))
    assert n_files == 4


def test_persistence_pipeline_end_to_end(spark, tmp_path):
    """S7 path: valid rows -> unpivot+coerce -> file-id attach -> sink."""
    ref = datagen.ref_df(spark, datagen.ref_batch(np.arange(3)))
    clips = datagen.clips_df(spark, datagen.clips_batch(np.arange(3)))
    long = unpivot_for_persistence(
        clips.select("clip_id", "codec", "transcript"),
        key_col="clip_id",
        property_types={"codec": "text", "transcript": "text"},
    )
    enriched = attach_file_ids(long, ref)
    out = str(tmp_path / "s7")
    write_batched(enriched, out, rows_per_batch=10)
    back = spark.read.parquet(out)
    assert back.count() == 6  # 3 assets x 2 properties
    assert set(back.columns) == {"clip_id", "name", "value", "file_id"}
