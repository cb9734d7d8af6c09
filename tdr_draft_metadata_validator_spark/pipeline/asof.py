"""As-of join — an operator Spark lacks natively, composed from
built-ins (the preferred path per SURVEY.md §2.8 / pyspark_guide
"As-of / range join").

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group.

Implementation: union-tag + one window pass —

1. union the two sides with a source tag (right rows sort BEFORE left
   rows at equal timestamps, giving inclusive <= semantics),
2. ``last(value, ignorenulls=True)`` over
   ``partitionBy(key).orderBy(ts, tag, tie)`` carries the latest right
   value forward — ``tie`` (a content hash of the right row's values)
   makes the order TOTAL so duplicate right timestamps carry a
   DETERMINISTIC row under any repartitioning,
3. filter back to left rows.

One shuffle on the key (same as any co-grouped operator); no
``applyInPandas``/``merge_asof`` needed, so the whole plan stays
JVM-side and AQE-skew-splittable. Window state is O(1) per row (just
the carried value), so a hot key degrades to a single sorted scan —
acceptable; salting would break the ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right[on] <= left[on]``
    per ``by`` group. Left rows with no prior right row keep nulls.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on
    ]
    # the carried payload is a STRUCT of the value columns, not the bare
    # columns: the struct is non-null for EVERY right row (even when its
    # fields are null), so last(ignorenulls) carries the genuinely latest
    # right row — a newest row with a NULL value correctly supersedes an
    # older non-null one instead of being skipped
    r_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__src"),
        null_struct.alias("__r"),
        F.lit(0).cast("long").alias("__tie"),
    )
    # __tie makes the window order TOTAL when one key has several right
    # rows at the SAME timestamp: without it the carried row among exact
    # ties is whatever the sort happened to place last — plan/partitioning
    # dependent. A content hash of the value struct is deterministic under
    # any repartitioning (hash-equal ties are value-equal, so ambiguity
    # is harmless); the row carried is the max-hash one among ties.
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__src"),
        r_struct.alias("__r"),
        F.xxhash64(r_struct).alias("__tie"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__src"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__carried")
    )
    return (
        carried.where(F.col("__src") == 1)
        .select(
            "*",
            *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
        .drop("__src", "__r", "__carried", "__tie")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join — ``left[on] BETWEEN right[start] AND
    right[end]`` — as a BUCKETED EQUI-JOIN, never an inequality join
    (which Catalyst executes as a nested-loop/cartesian at scale).

    Pattern: time is tiled into ``bucket_s``-second buckets. The left
    side lands in exactly ONE bucket (``floor(epoch/on / bucket_s)``);
    each right interval EXPLODES to the buckets it overlaps. The join is
    a plain equi-join on (by..., bucket) + the exact BETWEEN filter —
    and because the left row occupies a single bucket, every qualifying
    pair meets exactly once: no distinct/dedup pass needed.

    Cost model: right-side row fan-out = interval_length / bucket_s.
    Pick ``bucket_s`` near the TYPICAL interval length so fan-out is
    O(1-2); a pathological open-ended interval should be closed by the
    caller before joining. Column names must be disjoint (``on`` vs
    ``start_col``/``end_col``) — the BETWEEN filter needs all three in
    scope after the join.

    Only ``how='inner'`` is supported: the BETWEEN filter runs AFTER the
    join, so an outer join would silently collapse back to inner
    semantics (null start/end rows fail the filter) — we refuse rather
    than lie.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only (the post-join BETWEEN "
            "filter would silently drop an outer join's unmatched rows)"
        )
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    l_epoch = F.unix_timestamp(F.col(on).cast("timestamp"))
    s_epoch = F.unix_timestamp(F.col(start_col).cast("timestamp"))
    e_epoch = F.unix_timestamp(F.col(end_col).cast("timestamp"))
    l2 = left.withColumn("__b", F.floor(l_epoch / bucket_s))
    r2 = right.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(s_epoch / bucket_s), F.floor(e_epoch / bucket_s))),
    )
    joined = l2.join(r2, on=by + ["__b"], how=how).where(
        F.col(on).cast("timestamp").between(
            F.col(start_col).cast("timestamp"), F.col(end_col).cast("timestamp")
        )
    )
    return joined.drop("__b")
