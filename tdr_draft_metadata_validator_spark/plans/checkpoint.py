"""Checkpoint / resume (north_rule "resumable from Iceberg-snapshot
checkpoints with per-partition lineage + metrics rows").

The reference lambda is stateless (its only idempotence is the S3
download skip, S3Files.scala:20-22); at 10^12 rows a run MUST be
resumable. Design:

- Unit of progress = the **logical partition** (plans/metrics.py):
  ``pmod(xxhash64(clip_id), P)`` — stable across cluster sizes and reads.
- After a run (or each sub-run over a partition subset), the engine
  appends the per-partition metrics rows to a **lineage manifest**
  (parquet dataset partitioned by ``partition_id``, written with dynamic
  partition overwrite — retries overwrite their own partition only, so
  lineage rows are exactly-once per (run, partition)).
- Resume = read the manifest, take partitions whose latest verdict for
  the run is ``pass = true`` (failed partitions are re-validated, not
  skipped), and filter the work list: the input is pruned to
  ``logical_partition NOT IN completed`` with a codegen'd literal-set
  probe (P ids, never a shuffle of the input). Prior ``pass = false``
  rows still in the manifest are folded into the final run verdict by
  the CLI, so resuming cannot launder a failure into success.
- Lineage granularity = one record_partitions call per sub-run
  (``--sub-runs K`` splits a run into K chunks, each recording lineage
  as it finishes); a crash loses at most the in-flight sub-run.
- ``snapshot_id`` pins the table version. With real Iceberg jars the
  reader uses ``option("snapshot-id", ...)``; sources/iceberg.py stubs
  that behind an import-try in this image.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .metrics import logical_partition

MANIFEST_SUBDIR = "lineage"


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, MANIFEST_SUBDIR)


def record_partitions(metrics: DataFrame, checkpoint_dir: str) -> None:
    """Write lineage rows idempotently: dynamic overwrite by partition_id."""
    (
        metrics.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(manifest_path(checkpoint_dir))
    )


def _manifest(spark: SparkSession, checkpoint_dir: str):
    try:
        return spark.read.parquet(manifest_path(checkpoint_dir))
    except Exception:
        return None


def completed_partitions(spark: SparkSession, checkpoint_dir: str, run_id: str) -> list[int]:
    """Partition ids whose recorded verdict for this run is PASS (small:
    <= P rows collected). pass=false partitions are deliberately NOT
    'completed': a resume re-validates them (their lineage row is then
    overwritten in place by the dynamic-partition write), so a resumed
    run converges on an all-pass manifest or keeps reporting failure —
    it never silently skips known-bad work."""
    m = _manifest(spark, checkpoint_dir)
    if m is None:
        return []
    rows = (
        m.where((F.col("run_id") == run_id) & F.col("pass"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return sorted(int(r["partition_id"]) for r in rows)


def failed_partitions(spark: SparkSession, checkpoint_dir: str, run_id: str) -> list[int]:
    """Partition ids whose LATEST recorded verdict for this run is FAIL —
    folded into the final run verdict/exit code so a resumed run cannot
    report success while the manifest still carries failures."""
    m = _manifest(spark, checkpoint_dir)
    if m is None:
        return []
    rows = (
        m.where((F.col("run_id") == run_id) & ~F.col("pass"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return sorted(int(r["partition_id"]) for r in rows)


def filter_resume(
    clips: DataFrame,
    completed: list[int],
    n_logical_partitions: int,
    key: str = "clip_id",
) -> DataFrame:
    """Work-list filter: keep only rows of partitions without a verdict.

    ``isin`` over a literal list of ints compiles to a codegen'd hash-set
    probe per row — no join, no shuffle, fully pushed into the scan stage.
    """
    if not completed:
        return clips
    lp = logical_partition(F.col(key), n_logical_partitions)
    return clips.where(~lp.isin(completed))


def filter_to_partitions(
    df: DataFrame,
    parts: list[int],
    n_logical_partitions: int,
    key: str = "clip_id",
) -> DataFrame:
    """Keep ONLY rows of the given logical partitions (sub-run work list —
    the inverse of :func:`filter_resume`). Same codegen'd hash-set probe,
    pushed into the scan; no join, no shuffle."""
    lp = logical_partition(F.col(key), n_logical_partitions)
    return df.where(lp.isin(parts))


def resume_run(
    spark: SparkSession,
    clips: DataFrame,
    checkpoint_dir: str,
    run_id: str,
    n_logical_partitions: int = 64,
    key: str = "clip_id",
) -> tuple[DataFrame, list[int]]:
    done = completed_partitions(spark, checkpoint_dir, run_id)
    return filter_resume(clips, done, n_logical_partitions, key), done
