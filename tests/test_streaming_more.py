import numpy as np

from tdr_draft_metadata_validator_spark import datagen
from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
    dedup_stream,
    read_clips_stream,
    run_to_memory_sink,
    violation_rate_stream,
)


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    pdf = datagen.clips_batch(np.array([0, 1, 2, 1, 0]))  # dups of 0 and 1
    datagen.clips_df(spark, pdf).write.parquet(src)
    stream = read_clips_stream(spark, src)
    q = run_to_memory_sink(dedup_stream(stream), name="dedup_out")
    try:
        rows = spark.sql("SELECT clip_id FROM dedup_out").collect()
    finally:
        q.stop()
    ids = sorted(r["clip_id"] for r in rows)
    assert ids == sorted({datagen.clip_id_of(i) for i in (0, 1, 2)})


def test_streaming_violation_rate_window(spark, tmp_path):
    src = str(tmp_path / "in2")
    pdf = datagen.clips_batch(np.arange(10))
    pdf.loc[2, "sr_hz"] = 12345
    pdf.loc[5, "sr_hz"] = 999
    datagen.clips_df(spark, pdf).write.parquet(src)
    stream = read_clips_stream(spark, src)
    agg = violation_rate_stream(stream, window="1 minute")
    # windowed agg with watermark: drain with update-mode into memory
    q = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("rate_out").start()
    )
    q.processAllAvailable()
    try:
        rows = spark.sql(
            "SELECT error_key, sum(n_violations) n FROM rate_out GROUP BY 1"
        ).collect()
    finally:
        q.stop()
    got = {r["error_key"]: r["n"] for r in rows}
    assert got.get("enum") == 2


def test_streaming_violation_rate_event_time(spark, tmp_path):
    """event_time_col mode: windows keyed by TRUE event time carried
    through the rule pass (passthrough_cols), not ingest time."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "in3")
    pdf = datagen.clips_batch(np.arange(6))
    pdf.loc[1, "sr_hz"] = 12345   # violation in the 10:00 window
    pdf.loc[4, "sr_hz"] = 999     # violation in the 11:00 window
    df = datagen.clips_df(spark, pdf).withColumn(
        "event_ts",
        F.when(F.col("clip_id") < datagen.clip_id_of(3),
               F.lit("2026-01-01 10:00:30")).otherwise(
               F.lit("2026-01-01 11:00:30")).cast("timestamp"),
    )
    df.write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 4).parquet(src)
    )
    agg = violation_rate_stream(stream, window="1 minute",
                                event_time_col="event_ts")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("rate_et").start()
    )
    q.processAllAvailable()
    try:
        rows = spark.sql(
            "SELECT window.start AS ws, error_key, n_violations FROM rate_et"
        ).collect()
    finally:
        q.stop()
    by_window = {str(r["ws"]): r["n_violations"] for r in rows}
    assert by_window == {"2026-01-01 10:00:00": 1, "2026-01-01 11:00:00": 1}


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: gaps close sessions (emitted
    in append mode); the trailing open session stays in state."""
    from pyspark.sql import functions as F

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        sessionize_stream,
    )

    src = str(tmp_path / "sess")
    rows = [
        # user A: 3 events tight, then a 2h gap, then 2 events (open)
        ("A", "2026-01-01 10:00:00", 1.0),
        ("A", "2026-01-01 10:05:00", 2.0),
        ("A", "2026-01-01 10:10:00", 3.0),
        ("A", "2026-01-01 12:30:00", 10.0),
        ("A", "2026-01-01 12:40:00", 20.0),
        # user B: one session only (stays open, nothing emitted)
        ("B", "2026-01-01 09:00:00", 5.0),
        ("B", "2026-01-01 09:10:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_out").start()
    )
    q.processAllAvailable()
    try:
        out = spark.sql("SELECT * FROM sess_out").collect()
    finally:
        q.stop()
    assert len(out) == 1  # only A's first session closed
    s = out[0]
    assert s["user_id"] == "A"
    assert s["n_events"] == 3
    assert s["session_value"] == 6.0
    assert s["session_end"] - s["session_start"] == 600.0


def test_streaming_sessionize_late_event_does_not_rewind(spark, tmp_path):
    """A cross-batch late arrival folds into the open session without
    rewinding its frontier: the next on-time event must NOT see a
    phantom gap measured from the late event."""
    from pyspark.sql import functions as F

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        sessionize_stream,
    )

    src = str(tmp_path / "late")
    schema = "user_id string, ts timestamp, value double"
    batch1 = spark.createDataFrame(
        [("A", "2026-01-01 10:00:00", 1.0), ("A", "2026-01-01 10:20:00", 1.0)],
        "user_id string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch2 = spark.createDataFrame(
        [("A", "2026-01-01 10:01:00", 1.0)],   # late: before the frontier
        "user_id string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch3 = spark.createDataFrame(
        [("A", "2026-01-01 10:40:00", 1.0)],   # 20 min after TRUE frontier
        "user_id string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    batch1.coalesce(1).write.parquet(src)  # source dir must exist first
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.outputMode("append")
        .format("memory").queryName("late_out").start()
    )
    q.processAllAvailable()
    for b in (batch2, batch3):
        b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    try:
        rows = spark.sql("SELECT * FROM late_out").collect()
    finally:
        q.stop()
    # 10:40 is 20 min after the 10:20 frontier -> same session, NOTHING
    # closed; a rewound frontier (10:01) would have falsely split here
    assert rows == []


def test_streaming_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    """One rule set, one semantics: the stateful streaming sessionizer's
    CLOSED sessions must equal the batch window-pass sessionization on
    the same events (open/trailing sessions excluded — they are still in
    streaming state)."""
    from pyspark.sql import Window, functions as F

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        sessionize_stream,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 40)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)

    # batch sessionization (the oracle-green `sessionize` query's shape),
    # aggregated to closed sessions: drop each user's LAST session (the
    # one streaming still holds open)
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.col("ts").cast("double")  # fractional seconds, like the stream
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "sidx", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    agg = sess.groupBy("user_id", "sidx").agg(
        F.min(epoch).alias("session_start"),
        F.max(epoch).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )
    last_sidx = sess.groupBy("user_id").agg(F.max("sidx").alias("last_sidx"))
    def canon(uid, s0, s1, n, v):
        # the two sides compute epochs via different float routes
        # (ns/1e9 vs us/1e6) — canonicalize at millisecond precision
        return (str(uid), round(s0, 3), round(s1, 3), n, round(v, 4))

    closed_batch = {
        canon(r["user_id"], r["session_start"], r["session_end"],
              r["n_events"], r["session_value"])
        for r in agg.join(last_sidx, "user_id")
        .where(F.col("sidx") < F.col("last_sidx")).collect()
    }

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_parity").start()
    )
    q.processAllAvailable()
    try:
        closed_stream = {
            canon(r["user_id"], r["session_start"], r["session_end"],
                  r["n_events"], r["session_value"])
            for r in spark.sql("SELECT * FROM sess_parity").collect()
        }
    finally:
        q.stop()
    assert closed_stream == closed_batch
    assert len(closed_batch) > 10  # non-trivial corpus


def test_streaming_near_dedup_against_store(spark, tmp_path):
    """near_dedup_stream: batch 1 bootstraps the signature store; batch 2
    dedups against it — a new clip whose transcript duplicates an OLD
    clip is caught with all bands matched, and the batch's signatures
    append so batch 3 would dedup against both."""
    import os

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        near_dedup_stream,
    )

    src = str(tmp_path / "in_nd")
    store = str(tmp_path / "ndstore")
    v1 = datagen.clips_batch(np.arange(30))
    datagen.clips_df(spark, v1).write.parquet(src)

    stream = read_clips_stream(spark, src)
    q, pairs_log = near_dedup_stream(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt_nd")
    )
    try:
        q.processAllAvailable()
        assert os.path.isdir(os.path.join(store, "batch-1"))  # bootstrap
        assert pairs_log == []

        v2 = datagen.clips_batch(np.arange(30, 40))
        v2.loc[v2.index[5], "transcript"] = v1.loc[5, "transcript"]  # clip 35
        datagen.clips_df(spark, v2).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    dup_pair = tuple(sorted([datagen.clip_id_of(5), datagen.clip_id_of(35)]))
    got = {(a, b): n for (_bid, a, b, n) in pairs_log}
    assert dup_pair in got and got[dup_pair] == 8  # identical text: all bands
    # every candidate touches the new batch (old clips never re-signed)
    new_ids = {datagen.clip_id_of(i) for i in range(30, 40)}
    assert all(a in new_ids or b in new_ids for (a, b) in got)
    assert os.path.isdir(os.path.join(store, "batch-2"))  # appended


def test_streaming_near_dedup_bootstrap_semantics(spark, tmp_path):
    """ADVICE r4: the FIRST batch is not special — intra-batch duplicate
    pairs are reported from batch 0 (delta x delta with an empty store
    side), append_to_store=False really is read-only (no store created),
    and lsh_params configure the store the bootstrap batch creates
    (pinned thereafter)."""
    import os

    from tdr_draft_metadata_validator_spark.pipeline import incremental
    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        near_dedup_stream,
    )

    v1 = datagen.clips_batch(np.arange(20))
    v1.loc[v1.index[7], "transcript"] = v1.loc[3, "transcript"]  # intra dup

    # read-only monitor: pairs reported, store never created
    src_ro = str(tmp_path / "in_ro")
    datagen.clips_df(spark, v1).write.parquet(src_ro)
    store_ro = str(tmp_path / "store_ro")
    q, pairs_log = near_dedup_stream(
        read_clips_stream(spark, src_ro), store_ro,
        checkpoint_dir=str(tmp_path / "ck_ro"), append_to_store=False,
        lsh_params={"num_hashes": 16, "bands": 4},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dup = tuple(sorted([datagen.clip_id_of(3), datagen.clip_id_of(7)]))
    got = {(a, b): n for (_bid, a, b, n) in pairs_log}
    assert dup in got and got[dup] == 4  # identical text: all 4 bands
    assert not os.path.exists(store_ro)  # append_to_store=False honored

    # writing monitor: bootstrap batch reports the same pairs AND pins
    # the configured LSH params in the store it creates
    src_w = str(tmp_path / "in_w")
    datagen.clips_df(spark, v1).write.parquet(src_w)
    store_w = str(tmp_path / "store_w")
    q, pairs_log2 = near_dedup_stream(
        read_clips_stream(spark, src_w), store_w,
        checkpoint_dir=str(tmp_path / "ck_w"),
        lsh_params={"num_hashes": 16, "bands": 4, "store_buckets": 8},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got2 = {(a, b): n for (_bid, a, b, n) in pairs_log2}
    assert dup in got2 and got2[dup] == 4
    params = incremental.store_params(store_w)
    assert params["num_hashes"] == 16 and params["bands"] == 4
    assert params["store_buckets"] == 8


def test_streaming_near_dedup_pairs_sink(spark, tmp_path):
    """r5: the production pairs sink — each micro-batch's candidates land
    in a parquet table partitioned by batch_id (nothing collected to the
    driver), and a duplicate-of-old-clip pair arrives under the batch
    that detected it."""
    import os

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        near_dedup_stream,
    )

    src = str(tmp_path / "in_ps")
    store = str(tmp_path / "ps_store")
    sink = str(tmp_path / "ps_pairs")
    v1 = datagen.clips_batch(np.arange(20))
    v1.loc[v1.index[7], "transcript"] = v1.loc[3, "transcript"]  # intra dup
    datagen.clips_df(spark, v1).write.parquet(src)

    q, pairs_log = near_dedup_stream(
        read_clips_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ck_ps"), pairs_sink=sink,
        lsh_params={"num_hashes": 16, "bands": 4},
    )
    try:
        q.processAllAvailable()
        v2 = datagen.clips_batch(np.arange(20, 25))
        v2.loc[v2.index[0], "transcript"] = v1.loc[4, "transcript"]  # 20~4
        datagen.clips_df(spark, v2).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert pairs_log == []  # production mode: nothing driver-side
    out = spark.read.parquet(sink)
    got = {tuple(sorted([r["id_a"], r["id_b"]])): r["batch_id"]
           for r in out.collect()}
    intra = tuple(sorted([datagen.clip_id_of(3), datagen.clip_id_of(7)]))
    cross = tuple(sorted([datagen.clip_id_of(4), datagen.clip_id_of(20)]))
    assert got[intra] == 0 and got[cross] == 1
    # one partition dir per batch: replay overwrites only its own
    assert (os.path.isdir(os.path.join(sink, "batch_id=0"))
            and os.path.isdir(os.path.join(sink, "batch_id=1")))


def test_streaming_near_dedup_guards(spark, tmp_path):
    """Review r5: pairs_sink without a persistent checkpoint refuses
    (batch ids reset on restart -> the overwrite would clobber earlier
    batches), and lsh_params conflicting with an existing store's pinned
    parameters refuse instead of being silently ignored."""
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import incremental
    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        near_dedup_stream,
    )

    src = str(tmp_path / "in_g")
    datagen.clips_df(spark, datagen.clips_batch(np.arange(5))).write.parquet(src)

    with _pytest.raises(ValueError, match="checkpoint_dir"):
        near_dedup_stream(read_clips_stream(spark, src),
                          str(tmp_path / "s1"),
                          pairs_sink=str(tmp_path / "p1"))

    store = str(tmp_path / "s2")
    incremental.append_signatures(
        spark.read.parquet(src), store, num_hashes=16, bands=4,
        id_col="clip_id", text_col="transcript")
    q, _ = near_dedup_stream(
        read_clips_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ck_g"),
        lsh_params={"bands": 8},  # store pinned bands=4
    )
    try:
        with _pytest.raises(Exception, match="pinned"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_pairs_sink_scales_files_and_replays(spark, tmp_path):
    """Judge r5 task 6 'done' criterion: with the per-batch
    repartition(1) gone, a pair-heavy micro-batch fans out to MULTIPLE
    files (AQE post-shuffle coalescing sizes by bytes — no single write
    funnel), and replaying the batch (fresh checkpoint, same source)
    dynamic-overwrites its own partition to identical content."""
    import glob
    import os

    from tdr_draft_metadata_validator_spark.streaming.validate_stream import (
        near_dedup_stream,
    )

    src = str(tmp_path / "in_big")
    store = str(tmp_path / "big_store")
    sink = str(tmp_path / "big_pairs")
    v1 = datagen.clips_batch(np.arange(120))
    # 8 transcript groups of 15 -> 8 * C(15,2) = 840 candidate pairs
    for i in range(120):
        v1.loc[v1.index[i], "transcript"] = f"shared transcript body {i % 8}"
    datagen.clips_df(spark, v1).write.parquet(src)

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in (
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
    )}
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    try:
        def run(ck):
            q, _ = near_dedup_stream(
                read_clips_stream(spark, src), store,
                checkpoint_dir=str(tmp_path / ck), pairs_sink=sink,
                lsh_params={"num_hashes": 16, "bands": 4},
                append_to_store=False,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            files = glob.glob(os.path.join(sink, "batch_id=0", "*.parquet"))
            rows = sorted(
                (r["id_a"], r["id_b"], r["batch_id"])
                for r in spark.read.parquet(sink).collect()
            )
            return files, rows

        files1, rows1 = run("ck_big_1")
        assert len(files1) > 1, f"single write funnel: {files1}"
        assert len(rows1) == 8 * (15 * 14 // 2)

        # replay: fresh checkpoint reprocesses the same source as batch 0
        files2, rows2 = run("ck_big_2")
        assert rows2 == rows1  # idempotent dynamic overwrite
        assert len(files2) > 1
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
