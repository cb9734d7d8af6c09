"""Persistence path (S7): protected-field filter -> unpivot -> typed
coercion -> batched sink.

Reference: persistence Lambda.scala:134-155 — rows are unpivoted into
``AddOrUpdateMetadata(name, value)`` pairs (MetadataUtils.scala:47-82)
with two coercions, then written in 400-row batches under a 10-way
semaphore. Spark-first: ``melt`` (stack) + vectorized coercions + a
partitioned write — Spark partitions replace the semaphore; batch size
becomes a partition-count decision, not driver code.

Coercion contract (MetadataUtils.scala:59-81 + persistence
LambdaSpec.scala:138-198 goldens, trap list SURVEY.md §7):
- date   -> start-of-day timestamp string ``yyyy-MM-dd HH:mm:ss.S``
            (golden ``"1990-01-01 00:00:00.0"``)
- boolean-> 'Yes' (case-insensitive) -> 'true', any other non-empty -> 'false'
- empty  -> stays ``""`` with NO coercion for ANY type (the reference
            coerces only ``value.nonEmpty`` cells)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def coerce_date(col):
    """F7: yyyy-MM-dd -> 'yyyy-MM-dd 00:00:00.0' (exact golden format)."""
    ts = F.date_format(F.to_timestamp(col, "yyyy-MM-dd"), "yyyy-MM-dd HH:mm:ss.S")
    return ts


def coerce_bool(col):
    """F8: 'Yes' (case-insensitive) -> 'true'; any other NON-EMPTY value
    -> 'false'. Empty/null handling lives in the caller: the reference
    only coerces non-empty cells (MetadataUtils.scala:59-81,
    ``case m if m.value.nonEmpty``), so '' passes through for booleans
    too."""
    return F.when(F.lower(col) == "yes", F.lit("true")).otherwise(F.lit("false"))


def unpivot_for_persistence(
    df: DataFrame,
    key_col: str,
    property_types: dict[str, str],
    protected: tuple[str, ...] = (),
    output_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """-> (key, file_id?, name, value) long-form rows.

    ``property_types`` maps column -> 'date' | 'boolean' | 'text'
    (getPropertyType analog, Lambda.scala:213 / MetadataUtils.scala:58).
    Protected ('System'-type) columns are dropped before the unpivot
    (MetadataUtils.scala:33-43). ``output_mapping`` renames the emitted
    ``name`` values canonical-property -> display/persistence header
    (propertyToOutputMapper analog, CSVHandler.scala:26-31); unmapped
    names pass through.
    """
    output_mapping = output_mapping or {}
    cols = [c for c in df.columns if c != key_col and c not in protected]
    coerced = []
    for c in cols:
        v = F.col(c).cast("string")
        ptype = property_types.get(c, "text")
        if ptype == "date":
            cv = coerce_date(v)
        elif ptype == "boolean":
            cv = coerce_bool(v)
        else:
            cv = v
        # empty stays "" with NO coercion for ANY type (MetadataUtils
        # convertDataToBulkFileMetadataInput guards on value.nonEmpty);
        # nulls normalize to "" first (typed-table analog of an empty cell)
        out = F.when(v.isNull() | (v == ""), F.lit("")).otherwise(cv)
        coerced.append(
            F.struct(F.lit(output_mapping.get(c, c)).alias("name"), out.alias("value"))
        )
    long = df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.explode(F.array(*coerced)).alias("kv"),
    )
    return long.select(key_col, F.col("kv.name").alias("name"), F.col("kv.value").alias("value"))


def attach_file_ids(long_df: DataFrame, ref: DataFrame, key_col: str = "clip_id") -> DataFrame:
    """J4 (MetadataUtils.scala:53-55): map the asset key -> file_id via the
    reference table; the reference THROWS on a missing key, so we assert
    the anti-join is empty (one cheap count on the key columns only)
    before the enriching inner join."""
    ref_ids = ref.select(F.col(key_col), F.col("file_id"))
    missing = long_df.select(key_col).distinct().join(ref_ids, on=key_col, how="left_anti")
    n_missing = missing.count()
    if n_missing:
        raise ValueError(f"{n_missing} asset keys have no file_id in the reference table")
    return long_df.join(ref_ids, on=key_col, how="inner")


def write_batched(
    long_df: DataFrame,
    path: str,
    rows_per_batch: int = 400 * 1000,
    mode: str = "overwrite",
) -> None:
    """Batched sink. The reference's 400-row GraphQL batches
    (application.conf:27-28) map to output partition sizing here: we size
    partitions so each output file holds ~rows_per_batch rows, then write
    once — executors write in parallel (the Semaphore(10) analog is the
    cluster's task slots)."""
    n = max(1, -(-long_df.count() // rows_per_batch))  # ceil: files never ~2x the batch size
    long_df.repartition(n).write.mode(mode).parquet(path)
