"""Per-partition verdicts + lineage/metrics rows (north_rule A4 extension).

The engine's unit of progress is a **logical partition**:
``pmod(xxhash64(clip_id), P)``. Logical (not physical) partitions are
stable across cluster sizes, re-reads and resumes — the same clip always
lands in the same logical partition regardless of parallelism, so a
checkpoint manifest written at N executors is valid at 4N.

Both the input rows and the violation rows map to their logical partition
with a hash of the key — NO join is needed to attribute violations to
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..models import ValidationParameters


def logical_partition(key_col, n: int):
    return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(n)).cast("int")


def partition_metrics(
    clips: DataFrame,
    merged_violations: DataFrame,
    params: ValidationParameters,
    n_logical_partitions: int = 64,
    key: str = "clip_id",
    snapshot_id: int | None = None,
    wall_ms: int | None = None,
) -> DataFrame:
    """(run_id, partition_id, snapshot_id, pass, n_rows, n_violations,
    wall_ms) — FIXTURES.md §3 metrics schema.

    Two narrow aggregations (key column only) + one small outer join of
    P-row frames. ``wall_ms`` is the caller-measured elapsed time of the
    run that produced these verdicts (the engine stamps the time from
    run start to the merge materialization — a real action-time
    measurement). Per-partition task timing is not observable from pure
    DataFrame ops, so all partitions of a sub-run carry the same value;
    ``None`` leaves the column null rather than fabricating a timing.
    """
    lp = logical_partition(F.col(key), n_logical_partitions)
    rows_per = clips.select(lp.alias("partition_id")).groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    viol_per = (
        merged_violations.select(
            logical_partition(F.col("asset_id"), n_logical_partitions).alias("partition_id"),
            F.size("errors").alias("n_err"),
        )
        .groupBy("partition_id")
        .agg(F.sum("n_err").alias("n_violations"))
    )
    joined = rows_per.join(viol_per, on="partition_id", how="full_outer")
    return joined.select(
        F.lit(params.run_id).alias("run_id"),
        F.col("partition_id").cast("int"),
        F.lit(snapshot_id).cast("long").alias("snapshot_id"),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("pass"),
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        F.lit(wall_ms).cast("long").alias("wall_ms"),
    )
