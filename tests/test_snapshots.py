"""Snapshot layer (Iceberg-contract analog): immutable versions, pinned
reads, snapshot ids threaded into the lineage manifest."""

from __future__ import annotations

import json

import numpy as np

import validate as cli
from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.sources.snapshots import (
    commit_snapshot,
    current_snapshot_id,
    list_snapshots,
    read_snapshot,
)


def test_snapshot_pinning_isolation(spark, tmp_path):
    """A pinned reader NEVER sees later commits; unpinned resolves to the
    latest at call time."""
    root = str(tmp_path / "tbl")
    v1 = datagen.clips_df(spark, datagen.clips_batch(np.arange(10)))
    sid1 = commit_snapshot(v1, root)
    v2 = datagen.clips_df(spark, datagen.clips_batch(np.arange(25)))
    sid2 = commit_snapshot(v2, root)
    assert (sid1, sid2) == (1, 2)
    assert current_snapshot_id(root) == 2
    assert [s["snapshot_id"] for s in list_snapshots(root)] == [1, 2]

    pinned, rid = read_snapshot(spark, root, snapshot_id=1)
    assert rid == 1 and pinned.count() == 10
    latest, rid2 = read_snapshot(spark, root)
    assert rid2 == 2 and latest.count() == 25


def test_cli_snapshot_lineage(spark, tmp_path, capsys):
    """snap:<root> CLI mode: the run pins a version and records it in
    every lineage row; a later commit does not change a pinned re-run."""
    root = str(tmp_path / "tbl")
    pdf = datagen.clips_batch(np.arange(20))
    commit_snapshot(datagen.clips_df(spark, pdf), root)              # snap 1
    bad = datagen.clips_batch(np.arange(20))
    bad.loc[3, "sr_hz"] = 12345
    commit_snapshot(datagen.clips_df(spark, bad), root)              # snap 2

    ref = str(tmp_path / "ref.parquet")
    datagen.ref_df(spark, datagen.ref_batch(np.arange(20))).write.parquet(ref)
    ckpt = str(tmp_path / "ckpt")

    # unpinned run -> resolves to snapshot 2 (the bad one) -> failure
    rc = cli.main([
        "--table", f"snap:{root}", "--ref", ref,
        "--output", str(tmp_path / "out2"), "--checkpoint", ckpt,
        "--run-id", "rsnap", "--partitions", "8", "--no-audio",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and report["violation_assets"] == 1
    m = spark.read.parquet(f"{ckpt}/lineage")
    sids = {r["snapshot_id"] for r in m.select("snapshot_id").distinct().collect()}
    assert sids == {2}

    # pinned run against snapshot 1 -> clean, lineage carries sid 1
    rc1 = cli.main([
        "--table", f"snap:{root}", "--snapshot-id", "1", "--ref", ref,
        "--output", str(tmp_path / "out1"), "--checkpoint", str(tmp_path / "ckpt1"),
        "--run-id", "rsnap1", "--partitions", "8", "--no-audio",
    ])
    report1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc1 == 0 and report1["status"] == "success"
    m1 = spark.read.parquet(f"{tmp_path}/ckpt1/lineage")
    assert {r["snapshot_id"] for r in m1.select("snapshot_id").distinct().collect()} == {1}
