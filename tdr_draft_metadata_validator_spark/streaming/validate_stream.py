"""Streaming validation: the rule pass as a continuous pipeline.

The reference is strictly single-shot batch (SURVEY.md §2.7) — this module
is the engine's forward-looking mode: clips arriving as parquet files
(or Kafka in production) are validated incrementally with the SAME
compiled rule set; violation rows stream to a sink; a windowed aggregate
tracks violation rates with late-data tolerance via watermarking.

The rule pass is stateless, so the whole compiled projection transfers
to streaming unchanged — one code path for batch and stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..models import CLIPS_SCHEMA
from ..operators.rules import Rule, clips_base_rules, compile_rules


def read_clips_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def violations_stream(clips_stream: DataFrame, rules: list[Rule] | None = None,
                      key: str = "clip_id") -> DataFrame:
    """Stateless rule pass -> streaming violation rows (append mode)."""
    return compile_rules(clips_stream, rules if rules is not None else clips_base_rules(), key)


def violation_rate_stream(
    clips_stream: DataFrame,
    rules: list[Rule] | None = None,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    key: str = "clip_id",
    event_time_col: str | None = None,
) -> DataFrame:
    """Windowed violation counts per (window, process, error_key) with a
    watermark for late arrivals.

    ``event_time_col`` names an event-time column on the input — late
    data is then handled against TRUE event time (the honest streaming
    configuration). When the source has no event time (plain file drops),
    it defaults to an ingest-time stamp applied AFTER the rule pass,
    which makes the watermark processing-time: correct counts, but
    "late" means late-to-arrive, not late-by-event-time.
    """
    if event_time_col is not None:
        keyed = (
            clips_stream.withColumnRenamed(event_time_col, "__ts")
            if event_time_col != "__ts" else clips_stream
        )
        v = compile_rules(
            keyed, rules if rules is not None else clips_base_rules(), key,
            passthrough_cols=["__ts"],
        )
    else:
        v = violations_stream(clips_stream, rules, key).withColumn(
            "__ts", F.current_timestamp()
        )
    return (
        v.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window), "validation_process", "error_key")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )


def dedup_stream(clips_stream: DataFrame, key: str = "clip_id",
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming uniqueness (A1's streaming face): state-backed
    drop-duplicates on the key within the watermark horizon. Late
    duplicates beyond the watermark age out of state — the batch engine's
    salted global agg is the exact variant; this is the continuous one."""
    return (
        clips_stream.withColumn("__ts", F.current_timestamp())
        .withWatermark("__ts", watermark)
        .dropDuplicates([key])
        .drop("__ts")
    )


def run_to_memory_sink(stream_df: DataFrame, name: str = "violations_out"):
    """Test harness: drain all available input synchronously."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
