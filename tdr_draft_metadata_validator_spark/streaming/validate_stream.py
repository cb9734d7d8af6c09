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


def unknown_rows_stream(
    clips_stream: DataFrame,
    ref: DataFrame,
    key: str = "clip_id",
) -> DataFrame:
    """J2's streaming face: referential-integrity check of arriving clips
    against a STATIC reference table via a stream-static LEFT ANTI join
    (supported in Structured Streaming; stateless — the static side is
    re-read per micro-batch and picks up reference-table refreshes on
    file sources).

    At scale the static side is the per-snapshot reference KEY manifest
    (~20 B/row), which Catalyst broadcasts when small, so each
    micro-batch pays a key-pruned lookup, never a payload shuffle —
    identical plan shape to the batch `unknown_rows`.

    -> streaming (asset_id, error_key='unknown') violation rows (append).
    The complement check (missing rows) is inherently a whole-table fact
    and stays batch: a stream can never prove an expected row will NOT
    arrive — that is the watermark-less limit of the semantics, not an
    implementation gap.
    """
    ref_keys = ref.select(F.col(key))
    return (
        clips_stream.select(F.col(key))
        .join(ref_keys, on=key, how="left_anti")
        .select(
            F.col(key).cast("string").alias("asset_id"),
            F.lit("unknown").alias("error_key"),
        )
    )


def dedup_stream(clips_stream: DataFrame, key: str = "clip_id",
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming uniqueness (A1's streaming face): state-backed
    drop-duplicates on the key within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` — plain ``dropDuplicates([key])``
    under a watermark NEVER evicts state (the event-time column is not in
    the dedup subset), so keys accumulate until executor OOM on a
    long-running stream. With the *WithinWatermark* variant a key's state
    ages out once the watermark passes it: bounded state, and duplicates
    arriving within the horizon are still dropped. The batch engine's
    salted global agg is the exact variant; this is the continuous one.
    """
    return (
        clips_stream.withColumn("__ts", F.current_timestamp())
        .withWatermark("__ts", watermark)
        .dropDuplicatesWithinWatermark([key])
        .drop("__ts")
    )


SESSION_OUT_SCHEMA = (
    "user_id string, session_start double, session_end double, "
    "n_events long, session_value double"
)
SESSION_STATE_SCHEMA = "start_ts double, last_ts double, n long, vsum double"


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    continuous sessionization with the same gap semantics as the batch
    ``sessionize`` query (new session when the gap to the previous event
    exceeds ``gap_s``).

    Per key, state carries the OPEN session (start, last_ts, n, value
    sum); events arriving in a batch are folded in event-time order; a
    gap CLOSES the open session, which is emitted immediately (append
    mode); the trailing session stays open in state across micro-batches.
    This is the engine's template for stateful operators Spark lacks —
    Arrow-batched per-group pandas, state is O(1) per key, no payloads.

    -> (user_id, session_start, session_end, n_events, session_value)
    with timestamps as epoch seconds (double).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        rows = []
        for pdf in pdfs:
            if pd.api.types.is_numeric_dtype(pdf[ts_col]):
                # already epoch seconds — pd.to_datetime would read a raw
                # float as NANOseconds and collapse every gap to ~0
                ts = pdf[ts_col].astype(float)
            else:
                ts = pd.to_datetime(pdf[ts_col]).astype("int64") / 1e9
            rows.extend(zip(ts.tolist(), pdf[value_col].astype(float).tolist()))
        rows.sort()
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start = last = None
            n, vsum = 0, 0.0
        completed = []
        for t, v in rows:
            if last is not None and t - last > gap_s:
                completed.append((key[0], start, last, n, vsum))
                start, n, vsum = t, 0, 0.0
            elif last is None:
                start = t
            # cross-batch late arrivals (t < last) fold INTO the open
            # session without rewinding its frontier — `last` only moves
            # forward, `start` only backward, so a later batch's gap check
            # compares against the true session end, not a stale late event
            last = t if last is None else max(last, t)
            start = t if start is None else min(start, t)
            n += 1
            vsum += v
        if last is not None:
            state.update((start, last, n, vsum))
        yield pd.DataFrame(
            completed,
            columns=["user_id", "session_start", "session_end", "n_events", "session_value"],
        )

    return (
        events.select(F.col(key_col).cast("string").alias("user_id"),
                      F.col(ts_col).alias(ts_col),
                      F.col(value_col).alias(value_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
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


def drift_monitor_stream(
    clips_stream: DataFrame,
    profile_df: DataFrame,
    consignment_id: str,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    checkpoint_dir: str | None = None,
):
    """A6's streaming face: per-MICRO-BATCH distribution drift against a
    materialized reference profile (``stats.build_ref_profile`` output —
    numeric and categorical rows alike; the reference table itself is
    never touched, matching the batch warm path).

    Pattern: ``foreachBatch`` — windowed PSI needs arbitrary per-batch
    aggregation + a driver-side O(bins) comparison, which the streaming
    agg surface can't express but a batch callback can. Each micro-batch
    appends its breaching columns (if any) to an in-memory violations
    log tagged with the batch id; production swaps the sink for a
    partitioned table write inside the same callback.

    Returns (query, violations_log) — violations_log is a list of
    (batch_id, column, psi, ks) tuples the caller/monitor consumes.
    Micro-batch drift is a WINDOWED signal: a small batch drifts noisily,
    so thresholds should be looser than the run-level batch check, or
    the caller should aggregate consecutive breaches before alerting.
    """
    from ..operators.stats import drift_check, drift_check_categorical, load_profiles

    profiles = load_profiles(profile_df)
    violations_log: list[tuple[int, str, float, float]] = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        for col, prof in profiles.items():
            if col not in batch_df.columns:
                continue
            if prof.kind == "categorical":
                rep = drift_check_categorical(batch_df, None, col, profile=prof)
            else:
                rep = drift_check(batch_df, None, col, profile=prof)
            if rep.breaches(psi_threshold, ks_threshold):
                violations_log.append((batch_id, col, rep.psi, rep.ks))

    writer = clips_stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), violations_log


def near_dedup_stream(
    clips_stream: DataFrame,
    store_root: str,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    checkpoint_dir: str | None = None,
    append_to_store: bool = True,
    lsh_params: dict | None = None,
    pairs_sink: str | None = None,
):
    """The incremental near-dedup workflow (pipeline.incremental) as a
    continuous pipeline: each arriving micro-batch's MinHash band
    buckets join against the persisted signature store — candidates for
    the new clips only, corpus signatures never recomputed — then (by
    default) the batch's buckets append to the store so later batches
    dedup against it too.

    Pattern: ``foreachBatch``, for two reasons the pure streaming
    surface can't express — the store join needs the batch as a plain
    DataFrame (stream-static joins can't re-read a store that GROWS
    with every batch), and the append must happen exactly after the
    candidate join, in-batch, so ordering is the micro-batch order.
    Store appends inherit the batch-log crash contract
    (write-then-publish; a replayed batch after a crash re-appends —
    duplicate buckets only widen candidate n_bands counts, never drop
    pairs, and compact_signature_store reconciles).

    ``lsh_params`` (num_hashes/bands/n/lane/store_buckets) configures
    the store when the FIRST batch creates it; once the store exists,
    its pinned manifest parameters win (a mismatch refuses — see
    pipeline.incremental). The first batch is NOT special otherwise: it
    runs the delta x delta candidate join against an empty store side,
    so intra-batch duplicates are reported from batch 0, and its append
    honors ``append_to_store`` like every later batch (a read-only
    monitor stays read-only).

    Returns (query, pairs_log). With ``pairs_sink=None`` (test/monitor
    mode) pairs_log collects (batch_id, id_a, id_b, n_bands_matched)
    tuples driver-side. ``pairs_sink=<path>`` is the PRODUCTION sink:
    each batch's candidates append to that parquet table partitioned by
    ``batch_id`` (one dir per micro-batch — a crash-replayed batch
    overwrites ITS OWN partition, never touching earlier ones, so the
    sink stays exactly-once per batch id), and nothing is collected to
    the driver (pairs_log stays empty). The exactly-once contract rests
    on STABLE batch ids, which only a real ``checkpoint_dir`` provides
    (a temporary checkpoint restarts ids at 0 and the overwrite would
    clobber earlier batches' pairs) — so ``pairs_sink`` REQUIRES
    ``checkpoint_dir``.
    """
    from ..pipeline import dedup, incremental

    if pairs_sink is not None and not checkpoint_dir:
        raise ValueError(
            "pairs_sink requires checkpoint_dir: without a persistent "
            "checkpoint a restarted stream restarts batch ids at 0 and "
            "overwrites earlier batches' pairs")
    pairs_log: list[tuple[int, str, str, int]] = []

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        params = incremental.store_params(store_root)
        if params is not None and lsh_params:
            # the store's pinned parameters always win; a caller who
            # passed DIFFERENT ones would misread every n_bands_matched
            # value — refuse instead of silently ignoring them
            conflict = {k: (lsh_params[k], params[k]) for k in lsh_params
                        if k in params and lsh_params[k] != params[k]}
            if conflict:
                raise ValueError(
                    f"lsh_params conflict with the store's pinned "
                    f"parameters (given, pinned): {conflict}")
        # compute this batch's buckets ONCE and share them between the
        # candidate join and the store append below (the text-reading
        # minhash pass is the batch's dominant cost) — on the bootstrap
        # batch too: its self-join candidates derive from the same
        # buckets its append publishes
        if params is None:
            # no store yet: the store side of the join is empty, so the
            # candidates are exactly the batch's self-join
            lsh = {"num_hashes": 32, "bands": 8, "n": 3, "lane": "xxhash64",
                   **(lsh_params or {})}
            bkts = dedup.minhash_band_buckets(
                batch_df, lsh["num_hashes"], lsh["bands"], lsh["n"],
                id_col, text_col, lane=lsh["lane"],
            ).localCheckpoint(eager=True)
            pairs = dedup.lsh_candidates_from_buckets(bkts)
        else:
            bkts = dedup.minhash_band_buckets(
                batch_df, params["num_hashes"], params["bands"], params["n"],
                id_col, text_col, lane=params["lane"],
            ).localCheckpoint(eager=True)
            pairs = incremental.incremental_lsh_candidates(
                spark, batch_df, store_root, id_col=id_col, text_col=text_col,
                delta_buckets=bkts,
            )
        if pairs_sink is not None:
            # dynamic partition overwrite scoped to THIS batch id:
            # replay-idempotent without rewriting other batches. File
            # count scales with pair volume: pairs end on the candidate
            # groupBy's shuffle, which AQE post-shuffle coalescing sizes
            # by bytes — a tiny batch writes one file, a giant one
            # fans out, and no single task is ever the write funnel
            (pairs.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(pairs_sink))
        else:
            for r in pairs.collect():
                pairs_log.append(
                    (batch_id, r["id_a"], r["id_b"], r["n_bands_matched"])
                )
        if append_to_store:
            kw = params or lsh_params or {}
            incremental.append_signatures(
                batch_df, store_root, id_col=id_col, text_col=text_col,
                buckets=bkts,
                **{k: v for k, v in kw.items()
                   if k in ("num_hashes", "bands", "n", "lane",
                            "store_buckets")},
            )

    writer = clips_stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), pairs_log
