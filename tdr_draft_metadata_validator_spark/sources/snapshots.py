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
