"""Filesystem snapshot layer mirroring the Iceberg snapshot contract.

The north rule pins runs to table SNAPSHOTS (resume must re-read the
exact data version it started from). The real deployment uses Iceberg
(``sources/tables.py::read_iceberg``, runtime jar absent in this image);
this module provides the same three primitives over plain parquet so the
snapshot semantics are REAL and testable here, not stubbed:

- ``commit_snapshot(df, root)`` -> immutable ``snap-N`` directory + an
  append-only ``_snapshots.json`` manifest (written via temp-file +
  atomic rename, mirroring Iceberg's metadata swap);
- ``read_snapshot(spark, root, snapshot_id)`` -> the pinned version
  (latest when unpinned) — committing new snapshots NEVER changes what a
  pinned reader sees;
- ``current_snapshot_id(root)`` / ``list_snapshots(root)``.

The engine threads ``snapshot_id`` into the per-partition lineage rows,
so a resume knows which data version each verdict was computed against
(Lambda-analog: the reference revalidates from scratch; at 10^12 rows we
cannot).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_snapshots.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def list_snapshots(root: str) -> list[dict]:
    try:
        with open(_manifest_path(root)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return []


def current_snapshot_id(root: str) -> int | None:
    snaps = list_snapshots(root)
    return snaps[-1]["snapshot_id"] if snaps else None


def commit_snapshot(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next immutable snapshot and publish it in the
    manifest (temp-file + rename — readers see either the old or the new
    manifest, never a torn one)."""
    os.makedirs(root, exist_ok=True)
    snaps = list_snapshots(root)
    sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
    path = os.path.join(root, f"snap-{sid}")
    df.write.mode("errorifexists").parquet(path)
    snaps.append({
        "snapshot_id": sid,
        "path": f"snap-{sid}",
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    })
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(snaps, fh, indent=2)
    os.replace(tmp, _manifest_path(root))
    return sid


def read_snapshot(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> tuple[DataFrame, int]:
    """-> (df, resolved_snapshot_id). Unpinned reads resolve to the
    LATEST committed snapshot at call time and stay pinned to it (same
    as Iceberg's snapshot isolation: a job never sees a version change
    mid-run)."""
    snaps = list_snapshots(root)
    if not snaps:
        raise FileNotFoundError(f"no snapshots committed under {root!r}")
    by_id = {s["snapshot_id"]: s for s in snaps}
    if snapshot_id is None:
        snapshot_id = snaps[-1]["snapshot_id"]
    if snapshot_id not in by_id:
        raise ValueError(
            f"snapshot {snapshot_id} not in manifest (have {sorted(by_id)})"
        )
    return spark.read.parquet(os.path.join(root, by_id[snapshot_id]["path"])), snapshot_id


def snapshot_delta(
    spark: SparkSession,
    root: str,
    since: int,
    to: int | None = None,
    key: str = "clip_id",
    mode: str = "appended",
) -> tuple[DataFrame, DataFrame, int]:
    """Incremental read: the rows that need (re)validation between two
    snapshots — the steady-state workflow at 10^12 rows, where a daily
    batch appends a sliver and revalidating the whole table is absurd
    (Iceberg's incremental/CDC read; same contract over the filesystem
    layer).

    -> (delta_rows, removed_keys, resolved_to_id)

    - ``mode="appended"`` (default, the append-mostly case): delta = rows
      of ``to`` whose KEY is absent from ``since`` — one key-pruned
      left-anti join, payload columns never shuffle (~20 B/row).
    - ``mode="changed"``: additionally catches UPDATED rows — both sides
      project (key, xxhash64(*non-key columns)) and the anti-join runs on
      (key, row_hash). Costs a full scan of both snapshots' columns (the
      hash must read them) but still shuffles only 16 B/row.

    ``removed_keys`` = keys present in ``since`` but gone from ``to`` —
    the caller retires their verdicts/violations (dynamic partition
    overwrite handles this when the output is partition-keyed).

    The ENGINE contract for an incremental run mirrors --resume: the
    reference side must be semi-filtered to the delta's keys, or
    missing-rows would re-flag every already-verified row
    (validate.py --since-snapshot wires this).
    """
    from pyspark.sql import functions as F

    cur, to_sid = read_snapshot(spark, root, to)
    base, _ = read_snapshot(spark, root, since)
    if mode == "appended":
        delta = cur.join(base.select(key), on=key, how="left_anti")
    elif mode == "changed":
        if sorted(cur.columns) != sorted(base.columns):
            # the row hash is positional over the column list; comparing
            # hashes across EVOLVED schemas would silently mark every row
            # changed (or worse, miss changes) — refuse instead
            raise ValueError(
                "snapshot_delta(mode='changed') requires identical schemas; "
                f"snapshot {since} has {sorted(base.columns)}, "
                f"snapshot {to_sid} has {sorted(cur.columns)}"
            )

        others = [c for c in cur.columns if c != key]  # canonical order

        def _row_hash(df):
            # xxhash64(*cols) SKIPS null inputs (the seed passes through
            # unchanged), so a value MOVING between nullable columns —
            # (a=NULL, b='v') -> (a='v', b=NULL) — would hash identically
            # and the change would be silently missed. Hash a canonical
            # JSON serialization instead: ignoreNullFields=false makes
            # nulls positionally explicit (binary rides as base64).
            return F.xxhash64(
                F.to_json(F.struct(*[F.col(c) for c in others]),
                          {"ignoreNullFields": "false"})
            )

        def hashed(df):
            return df.select(F.col(key), _row_hash(df).alias("__rh"))

        # anti-join on (key, row_hash): a row is in the delta unless its
        # (key, hash) pair existed identically in the base snapshot
        delta = cur.join(
            hashed(base).withColumnRenamed("__rh", "__base_rh"), on=key, how="left"
        )
        delta = (
            delta.where(
                F.col("__base_rh").isNull()
                | (_row_hash(delta) != F.col("__base_rh"))
            )
            .drop("__base_rh")
        )
    else:
        raise ValueError(f"unknown mode {mode!r}; 'appended' or 'changed'")
    removed = base.select(key).join(cur.select(key), on=key, how="left_anti")
    return delta, removed, to_sid


def merge_snapshot(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str = "clip_id",
    delete_keys: DataFrame | None = None,
) -> int:
    """UPSERT (+ optional deletes) as a new immutable snapshot — the
    MERGE INTO analog over the filesystem layer (Iceberg/Delta
    copy-on-write semantics): next = (base minus updated/deleted keys)
    union updates. One key anti-join + one union; the base payload is
    rewritten once (copy-on-write — at 10^12 rows the real table format
    does this per-FILE via merge-on-read deletes, which is exactly why
    production uses Iceberg; the SNAPSHOT SEMANTICS pinned readers rely
    on are identical here).

    Readers pinned to earlier snapshots are untouched (immutability);
    the new snapshot id is returned and becomes the unpinned default.
    """
    base, _sid = read_snapshot(spark, root)
    drop = updates.select(key)
    if delete_keys is not None:
        drop = drop.unionByName(delete_keys.select(key))
    survivors = base.join(drop, on=key, how="left_anti")
    merged = survivors.unionByName(updates.select(base.columns))
    return commit_snapshot(merged, root)


def expire_snapshots(root: str, keep_last: int = 2) -> list[int]:
    """Iceberg-maintenance analog: drop all but the newest ``keep_last``
    snapshots — data directories deleted, manifest trimmed atomically
    (temp file + rename). Returns the expired snapshot ids.

    Pinned readers of an expired snapshot fail on their NEXT read — the
    same contract as Iceberg's expire_snapshots; retention policy is the
    operator's promise to long-running jobs, which is why the default
    keeps more than one.
    """
    import shutil

    if keep_last < 1:
        # keep_last=0 would also be a silent no-op (snaps[:-0] == []);
        # refuse explicitly — expiring EVERY snapshot deletes the table
        raise ValueError("keep_last must be >= 1 (the table must keep a head)")
    snaps = list_snapshots(root)
    if len(snaps) <= keep_last:
        return []
    expired, kept = snaps[:-keep_last], snaps[-keep_last:]
    # publish the trimmed manifest FIRST (atomic), then delete data: a
    # crash between the two leaves orphan directories, never a manifest
    # pointing at missing data
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(kept, fh, indent=2)
    os.replace(tmp, _manifest_path(root))
    for s in expired:
        shutil.rmtree(os.path.join(root, s["path"]), ignore_errors=True)
    return [s["snapshot_id"] for s in expired]
