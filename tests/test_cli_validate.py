"""End-to-end drive of the production entry point (validate.py main)."""

from __future__ import annotations

import json
import sys

import numpy as np
import pytest

import validate as cli
from tdr_draft_metadata_validator_spark import datagen


@pytest.fixture()
def small_tables(spark, tmp_path):
    clips = str(tmp_path / "clips.parquet")
    ref = str(tmp_path / "ref.parquet")
    pdf = datagen.clips_batch(np.arange(30))
    pdf.loc[7, "sr_hz"] = 12345  # one enum violation
    datagen.clips_df(spark, pdf).write.parquet(clips)
    datagen.ref_df(spark, datagen.ref_batch(np.arange(30))).write.parquet(ref)
    return clips, ref


def test_cli_full_run_and_resume(spark, small_tables, tmp_path, capsys, monkeypatch):
    clips, ref = small_tables
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # getOrCreate() inside the CLI reuses the test session (master ignored)
    monkeypatch.setenv("SPARK_GRAFT_MASTER", "local[4]")

    rc = cli.main([
        "--table", clips, "--ref", ref, "--output", out,
        "--checkpoint", ckpt, "--run-id", "rcli", "--partitions", "8",
        "--no-audio",
    ])
    captured = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(captured)
    assert rc == 1  # violations present -> failure exit code
    assert report["status"] == "failure"
    assert report["violation_assets"] == 1
    # sinks exist
    viol = spark.read.json(f"{out}/violations")
    assert viol.count() == 1
    with open(f"{out}/error-file.json") as fh:
        doc = fh.read()
    assert '"fileError" : "SCHEMA_VALIDATION"' in doc
    # resume: all partitions recorded -> second run validates nothing new
    rc2 = cli.main([
        "--table", clips, "--ref", ref, "--output", str(tmp_path / "out2"),
        "--checkpoint", ckpt, "--run-id", "rcli", "--partitions", "8",
        "--resume", "--no-audio",
    ])
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["resumed_partitions"] == 8
    assert report2["violation_assets"] == 0
    assert rc2 == 0
