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


def test_snapshot_delta_appended_and_changed(spark, tmp_path):
    """Incremental read: appended mode = new keys only; changed mode also
    catches content updates; removed keys reported."""
    from tdr_draft_metadata_validator_spark.sources.snapshots import snapshot_delta

    root = str(tmp_path / "tbl")
    v1 = datagen.clips_batch(np.arange(10))
    commit_snapshot(datagen.clips_df(spark, v1), root)               # snap 1
    v2 = datagen.clips_batch(np.arange(2, 14))                       # drop 0-1, add 10-13
    v2.loc[v2.index[v2["clip_id"] == datagen.clip_id_of(5)], "sr_hz"] = 22050
    commit_snapshot(datagen.clips_df(spark, v2), root)               # snap 2

    delta, removed, to_sid = snapshot_delta(spark, root, since=1)
    assert to_sid == 2
    assert {r["clip_id"] for r in delta.select("clip_id").collect()} == {
        datagen.clip_id_of(i) for i in (10, 11, 12, 13)
    }
    assert {r["clip_id"] for r in removed.collect()} == {
        datagen.clip_id_of(0), datagen.clip_id_of(1)
    }

    delta_c, _, _ = snapshot_delta(spark, root, since=1, mode="changed")
    got = {r["clip_id"] for r in delta_c.select("clip_id").collect()}
    assert got == {datagen.clip_id_of(i) for i in (10, 11, 12, 13)} | {
        datagen.clip_id_of(5)  # content change caught by the row hash
    }


def test_cli_incremental_since_snapshot(spark, tmp_path, capsys):
    """--since-snapshot validates ONLY the delta (metrics row count = new
    rows), finds the violation hiding in it, and semi-filters the
    reference so missing-rows stays quiet for already-verified keys."""
    root = str(tmp_path / "tbl")
    commit_snapshot(
        datagen.clips_df(spark, datagen.clips_batch(np.arange(30))), root
    )                                                                # snap 1
    v2 = datagen.clips_batch(np.arange(40))                          # +10 rows
    v2.loc[35, "sr_hz"] = 12345                                      # bad NEW row
    commit_snapshot(datagen.clips_df(spark, v2), root)               # snap 2
    ref = str(tmp_path / "ref.parquet")
    datagen.ref_df(spark, datagen.ref_batch(np.arange(40))).write.parquet(ref)

    out = str(tmp_path / "out")
    rc = cli.main([
        "--table", f"snap:{root}", "--ref", ref,
        "--since-snapshot", "1",
        "--output", out, "--run-id", "inc1", "--no-audio",
        "--partitions", "8",
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1  # the new bad row fails the run
    assert captured["violation_assets"] == 1
    doc = json.load(open(f"{out}/error-file.json"))
    assets = {v["assetId"] for v in doc["validationErrors"]}
    assert assets == {datagen.clip_id_of(35)}


def test_cli_incremental_near_dedup_store(spark, tmp_path, capsys):
    """--near-dedup-store wiring: run 1 bootstraps the signature store
    from the full table; run 2 (--since-snapshot) writes near_dup_pairs
    for the delta — catching a new transcript that duplicates an OLD
    clip's without recomputing corpus signatures — then appends the
    delta's signatures as a new batch."""
    import os

    root = str(tmp_path / "tbl")
    store = str(tmp_path
                / "sigstore")
    v1 = datagen.clips_batch(np.arange(30))
    commit_snapshot(datagen.clips_df(spark, v1), root)               # snap 1
    v2 = datagen.clips_batch(np.arange(40))
    v2.loc[35, "transcript"] = v1.loc[5, "transcript"]  # new dup of old clip 5
    commit_snapshot(datagen.clips_df(spark, v2), root)               # snap 2
    ref1 = str(tmp_path / "ref1.parquet")
    datagen.ref_df(spark, datagen.ref_batch(np.arange(30))).write.parquet(ref1)
    ref = str(tmp_path / "ref.parquet")
    datagen.ref_df(spark, datagen.ref_batch(np.arange(40))).write.parquet(ref)

    rc = cli.main([
        "--table", f"snap:{root}", "--snapshot-id", "1", "--ref", ref1,
        "--near-dedup-store", store,
        "--output", str(tmp_path / "out1"), "--run-id", "nd1",
        "--no-audio", "--partitions", "8",
    ])
    capsys.readouterr()
    assert rc == 0
    assert os.path.isdir(os.path.join(store, "batch-1"))

    rc2 = cli.main([
        "--table", f"snap:{root}", "--ref", ref,
        "--since-snapshot", "1", "--near-dedup-store", store,
        "--compact-dedup-store",
        "--output", str(tmp_path / "out2"), "--run-id", "nd2",
        "--no-audio", "--partitions", "8",
    ])
    capsys.readouterr()
    assert rc2 == 0
    pairs = spark.read.parquet(str(tmp_path / "out2" / "near_dup_pairs"))
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    dup_pair = tuple(sorted([datagen.clip_id_of(5), datagen.clip_id_of(35)]))
    assert dup_pair in got
    # delta-only ids on the left join side: every pair touches the delta
    delta_ids = {datagen.clip_id_of(i) for i in range(30, 40)}
    assert all(a in delta_ids or b in delta_ids for a, b in got)
    # --compact-dedup-store folded the batch log into ONE batch (id 3:
    # bootstrap=1, delta append=2, compaction=3)
    batches = sorted(p for p in os.listdir(store) if p.startswith("batch-"))
    assert batches == ["batch-3"]


def test_merge_snapshot_upsert_delete_and_pinning(spark, tmp_path):
    """MERGE-INTO analog: updates replace rows by key, deletes remove,
    untouched rows survive; pinned readers of the pre-merge snapshot see
    the original data (copy-on-write immutability)."""
    from tdr_draft_metadata_validator_spark.sources.snapshots import merge_snapshot

    root = str(tmp_path / "tbl")
    v1 = datagen.clips_batch(np.arange(10))
    commit_snapshot(datagen.clips_df(spark, v1), root)                # snap 1

    upd = datagen.clips_batch(np.arange(3, 5))
    upd["sr_hz"] = 22050                                              # update 3,4
    dels = spark.createDataFrame([(datagen.clip_id_of(9),)], "clip_id string")
    sid = merge_snapshot(spark, root, datagen.clips_df(spark, upd),
                         delete_keys=dels)
    assert sid == 2

    cur, _ = read_snapshot(spark, root)
    rows = {r["clip_id"]: r for r in cur.collect()}
    assert len(rows) == 9                                             # 10 - 1 delete
    assert rows[datagen.clip_id_of(3)]["sr_hz"] == 22050
    assert datagen.clip_id_of(9) not in rows
    assert rows[datagen.clip_id_of(0)]["sr_hz"] == v1.loc[0, "sr_hz"]

    pinned, _ = read_snapshot(spark, root, snapshot_id=1)
    assert pinned.count() == 10                                       # untouched


def test_expire_snapshots_retention(spark, tmp_path):
    """Expiry trims the manifest atomically and deletes expired data;
    the kept snapshots still read; expired ids error clearly."""
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.sources.snapshots import expire_snapshots

    root = str(tmp_path / "tbl")
    for n in (5, 6, 7, 8):
        commit_snapshot(datagen.clips_df(spark, datagen.clips_batch(np.arange(n))), root)
    assert expire_snapshots(root, keep_last=2) == [1, 2]
    assert [s["snapshot_id"] for s in list_snapshots(root)] == [3, 4]
    df, sid = read_snapshot(spark, root, snapshot_id=3)
    assert sid == 3 and df.count() == 7
    with _pytest.raises(ValueError):
        read_snapshot(spark, root, snapshot_id=1)
    assert expire_snapshots(root, keep_last=5) == []                  # no-op


def test_cli_changed_mode_retires_superseded_buckets(spark, tmp_path, capsys):
    """ADVICE r4 (validate.py --delta-mode changed): a changed clip's
    OLD transcript buckets are tombstoned in the same run that appends
    its new ones — a later delta that duplicates the OLD text must not
    draw a phantom candidate pair from the superseded clip."""
    import os

    root = str(tmp_path / "tbl")
    store = str(tmp_path / "sigstore")
    v1 = datagen.clips_batch(np.arange(30))
    commit_snapshot(datagen.clips_df(spark, v1), root)               # snap 1

    # snap 2: clip 5's transcript CHANGES to unique text
    v2 = v1.copy()
    old_text_of_5 = v1.loc[5, "transcript"]
    v2.loc[5, "transcript"] = "totally new words after the big edit"
    commit_snapshot(datagen.clips_df(spark, v2), root)               # snap 2

    ref = str(tmp_path / "ref.parquet")       # matches snaps 1-2 (30 rows)
    datagen.ref_df(spark, datagen.ref_batch(np.arange(30))).write.parquet(ref)
    ref31 = str(tmp_path / "ref31.parquet")   # matches snap 3 (31 rows)
    datagen.ref_df(spark, datagen.ref_batch(np.arange(31))).write.parquet(ref31)

    rc = cli.main([
        "--table", f"snap:{root}", "--snapshot-id", "1", "--ref", ref,
        "--near-dedup-store", store,
        "--output", str(tmp_path / "o1"), "--run-id", "c1",
        "--no-audio", "--partitions", "4",
    ])
    capsys.readouterr()
    assert rc == 0

    rc2 = cli.main([
        "--table", f"snap:{root}", "--ref", ref,
        "--since-snapshot", "1", "--delta-mode", "changed",
        "--near-dedup-store", store,
        "--output", str(tmp_path / "o2"), "--run-id", "c2",
        "--no-audio", "--partitions", "4",
    ])
    capsys.readouterr()
    assert rc2 == 0  # --no-audio: the transcript check is not in play
    # clip 5's old buckets are tombstoned
    assert [p for p in os.listdir(store) if p.startswith("tombstone-")]

    # snap 3: NEW clip 30 arrives with clip 5's OLD transcript
    v3 = datagen.clips_batch(np.arange(31))
    v3.loc[5, "transcript"] = "totally new words after the big edit"
    v3.loc[30, "transcript"] = old_text_of_5
    commit_snapshot(datagen.clips_df(spark, v3), root)               # snap 3

    rc3 = cli.main([
        "--table", f"snap:{root}", "--ref", ref31,
        "--since-snapshot", "2", "--near-dedup-store", store,
        "--output", str(tmp_path / "o3"), "--run-id", "c3",
        "--no-audio", "--partitions", "4",
    ])
    capsys.readouterr()
    pairs = spark.read.parquet(str(tmp_path / "o3" / "near_dup_pairs"))
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    phantom = tuple(sorted([datagen.clip_id_of(5), datagen.clip_id_of(30)]))
    assert phantom not in got  # superseded buckets cannot pair
    assert rc3 in (0, 1)
