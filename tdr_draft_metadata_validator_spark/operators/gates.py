"""File-level gates (G1-G4): fail-fast, short-circuit the pipeline.

Reference semantics (Lambda.scala:107-115): UTF8 -> CSV load -> duplicate
headers -> required -> additional headers -> row checks; the FIRST failing
gate wins and later stages never run (ValidationExecutionError raised at
Lambda.scala:354, caught at :117-118).

For a typed columnar table the header gates are **pure metadata checks on
``df.schema``** — zero cluster work. The decodability gate (UTF-8 analog,
Lambda.scala:130-153) is data work and lives in ``operators/audio.py``;
the engine applies its verdict with the same first-gate-wins precedence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..messages import resolve
from ..models import (
    Error,
    ErrorFileData,
    FileError,
    ValidationErrors,
)

# canonical clips-table columns (input_hint)
EXPECTED_COLUMNS = ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
REQUIRED_COLUMNS = EXPECTED_COLUMNS

# Parse caches left alive by invalid_csv_gate's clean path (the gate must
# materialize the parsed frame; keeping it saves downstream re-parses).
# Registered here so release is an API CALL, not docstring discipline —
# a long-lived session ingesting many CSVs calls release_parse_caches()
# once its run's outputs have materialized.
_live_parse_caches: list[DataFrame] = []


def release_parse_caches() -> int:
    """Unpersist every parse cache the clean CSV path left alive and
    empty the registry. Returns how many were released. Idempotent;
    safe to call from a finally block after each ingest batch."""
    n = len(_live_parse_caches)
    for df in _live_parse_caches:
        df.unpersist()
    _live_parse_caches.clear()
    return n


@dataclass
class GateFailure:
    """A tripped gate: carries the complete run verdict, like
    ValidationExecutionError carries ErrorFileData (Lambda.scala:354)."""

    error_file: ErrorFileData

    @property
    def file_error(self) -> FileError:
        return self.error_file.fileError


class GateTripped(Exception):
    """Raised by source-side gates that must short-circuit BEFORE a
    DataFrame exists (the CSV UTF-8 byte gate) — the analog of the
    reference's ValidationExecutionError (Lambda.scala:354). Carries the
    complete run verdict."""

    def __init__(self, failure: GateFailure):
        super().__init__(failure.file_error)
        self.failure = failure


def duplicate_headers_gate(
    raw_headers: list[str], consignment_id: str
) -> GateFailure | None:
    """G2 (Lambda.scala:168-184). Only meaningful for CSV ingest, where the
    raw header line can repeat a name (Spark/Iceberg schemas cannot).
    One error per duplicated header; assetId = consignmentId; message ''
    -> catalog fallback key (golden error-file-duplicate-headers.json shows
    'DUPLICATE_HEADER.file_path.duplicate')."""
    seen: dict[str, int] = {}
    for h in raw_headers:
        seen[h] = seen.get(h, 0) + 1
    dups = [h for h, n in seen.items() if n > 1]
    if not dups:
        return None
    errors = [
        Error("DUPLICATE_HEADER", h, "duplicate", f"DUPLICATE_HEADER.{h}.duplicate")
        for h in dups
    ]
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.DUPLICATE_HEADER,
            validationErrors=[ValidationErrors(consignment_id, errors, [])],
        )
    )


def required_columns_gate(
    df: DataFrame,
    consignment_id: str,
    required: tuple[str, ...] = REQUIRED_COLUMNS,
    key_col: str = "clip_id",
) -> GateFailure | None:
    """G3 (Lambda.scala:155-166). Missing required column -> SCHEMA_REQUIRED.

    The reference validates only the FIRST row (List(csvData.head) at
    Lambda.scala:159 — trap list) and reports that row's key as assetId;
    when the key column itself is absent, assetId falls back to the key
    column *name* (CSVHandler.scala:38, golden no-match-col-error.json).
    Schema inspection is metadata-only; we fetch one row's key only when
    a violation is actually being reported."""
    missing = [c for c in required if c not in df.columns]
    if not missing:
        return None
    if key_col in df.columns:
        head = df.select(key_col).limit(1).collect()
        asset_id = str(head[0][0]) if head else key_col
    else:
        asset_id = key_col
    errors = [
        Error("SCHEMA_REQUIRED", c, "required", f"SCHEMA_REQUIRED.{c}.required")
        for c in missing
    ]
    data = [(key_col, asset_id)] if key_col in df.columns else []
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.SCHEMA_REQUIRED,
            validationErrors=[ValidationErrors(asset_id, errors, data)],
        )
    )


def additional_columns_gate(
    df: DataFrame,
    consignment_id: str,
    allowed: tuple[str, ...] = EXPECTED_COLUMNS,
) -> GateFailure | None:
    """G4 (Lambda.scala:186-203). Extra columns -> ADDITIONAL_HEADER, one
    error per stray column, empty message (golden
    error-file-additional-headers.json). Metadata-only."""
    extra = [c for c in df.columns if c not in allowed]
    if not extra:
        return None
    errors = [Error("ADDITIONAL_HEADER", c, "additional", "") for c in extra]
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.ADDITIONAL_HEADER,
            validationErrors=[ValidationErrors(consignment_id, errors, [])],
        )
    )


def invalid_csv_gate(df: DataFrame, consignment_id: str) -> GateFailure | None:
    """INVALID_CSV (Lambda.scala:283-305): for CSV ingest mode, PERMISSIVE
    parsing routes malformed records into ``_corrupt_record``; any such
    record fails the whole file. One narrow count over that column."""
    if "_corrupt_record" not in df.columns:
        return None
    from pyspark.sql import functions as F

    # Spark refuses to query the internal corrupt-record column straight
    # off the file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN); the documented pattern is to cache the parsed frame first.
    # On the CLEAN path the cache is LEFT ALIVE: downstream checks derive
    # from the same plan and hit the InMemoryRelation instead of
    # re-parsing the file (test_csv_clean_path_reuses_parse_cache). The
    # live cache is REGISTERED in _live_parse_caches so ownership is an
    # API contract, not a docstring: callers (validate.py does this) run
    # release_parse_caches() once the run's outputs have materialized.
    # On the failure path the run short-circuits, so the cache is
    # dropped here.
    cached = df.cache()
    n_bad = cached.where(F.col("_corrupt_record").isNotNull()).limit(1).count()
    if not n_bad:
        _live_parse_caches.append(cached)
        return None
    cached.unpersist()
    err = Error("FILE_CHECK", consignment_id, "INVALID_CSV",
                "FILE_CHECK.CSV.INVALID")
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.INVALID_CSV,
            validationErrors=[ValidationErrors(consignment_id, [err], [])],
        )
    )


def utf8_file_gate(spark, path: str, consignment_id: str) -> GateFailure | None:
    """G1 for CSV ingest mode (Lambda.scala:130-153 validUTF8 +
    UTF8ValidationHandler.scala:8-11): byte-level strict UTF-8 scan of the
    raw file(s) BEFORE any CSV parsing, BOM-tolerant (the UTF-8 BOM
    EF BB BF decodes to U+FEFF, a valid code point, so strict decoding
    accepts BOM'd files exactly like the reference's Utf8Validator).

    Spark-first for the common case: ``binaryFile`` source (one row per
    file — scales to a directory of CSV shards) -> Arrow-batched
    ``mapInPandas`` strict decode; only a per-file boolean leaves the
    executors. ``binaryFile`` materializes a whole file as one cell and
    hard-caps at 2 GB, so files above ``_STREAM_THRESHOLD`` instead go
    through an INCREMENTAL single-pass decoder (constant memory,
    multi-byte sequences handled across chunk boundaries via Hadoop-FS
    streams — works for any Spark-reachable filesystem; the reference's
    Utf8Validator is the same single-stream pass). Failure shape mirrors
    not-utf8-error.json (FILE_CHECK / UTF8 / FileError.UTF_8).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F, types as T

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = []
            for blob in pdf["content"]:
                try:
                    bytes(blob).decode("utf-8", errors="strict")
                    ok.append(True)
                except (UnicodeDecodeError, TypeError):
                    ok.append(False)
            yield pd.DataFrame({"path": pdf["path"], "valid": ok})

    _STREAM_THRESHOLD = 1 << 30  # 1 GB: stream instead of one Arrow cell

    def _stream_valid(fs, hp) -> bool:
        import codecs

        dec = codecs.getincrementaldecoder("utf-8")()
        stream = fs.open(hp)  # FSDataInputStream -> java InputStream
        try:
            while True:
                data = bytes(stream.readNBytes(8 << 20))
                try:
                    if not data:
                        # final flush: a file truncated mid-multibyte
                        # sequence fails HERE, as invalid, not as a crash
                        dec.decode(b"", final=True)
                        return True
                    dec.decode(data)
                except UnicodeDecodeError:
                    return False
        finally:
            stream.close()

    jvm = spark._jvm
    # resolve the filesystem FROM the input path, not the default FS:
    # FileSystem.get(conf) returns the DEFAULT scheme's FS and throws
    # "Wrong FS" on e.g. an s3a:// input when the default is HDFS/local
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )

    def _files_of(p):
        """Expand a path/glob to its files (one directory level — the
        shard-directory layout); globStatus(dir) returns the DIR entry,
        not children, so directories are listed explicitly."""
        out = []
        for s in (fs.globStatus(jvm.org.apache.hadoop.fs.Path(p)) or []):
            if s.isFile():
                out.append(s)
            elif s.isDirectory():
                for child in fs.listStatus(s.getPath()):
                    if child.isFile():
                        out.append(child)
        return out

    statuses = _files_of(path)
    big = [s.getPath() for s in statuses if s.getLen() > _STREAM_THRESHOLD]
    for hp in big:
        if not _stream_valid(fs, hp):
            break
    else:
        big = None  # all big files valid (or none existed)
    if big is None:
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*")
            .load(path)
            .where(F.col("length") <= _STREAM_THRESHOLD)
            .select("path", "content")
        )
        schema = T.StructType([
            T.StructField("path", T.StringType(), False),
            T.StructField("valid", T.BooleanType(), False),
        ])
        bad = files.mapInPandas(_check, schema).where(~F.col("valid")).limit(1).count()
    else:
        bad = 1  # a big file failed the streaming pass
    if not bad:
        return None
    err = Error("FILE_CHECK", consignment_id, "UTF8",
                resolve("FILE_CHECK", consignment_id, "UTF8"))
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.UTF_8,
            validationErrors=[ValidationErrors(consignment_id, [err], [])],
        )
    )


def decode_gate_failure(consignment_id: str) -> GateFailure:
    """G1 analog (UTF-8 gate, Lambda.scala:130-153): the run-level verdict
    when any payload is undecodable. Shape mirrors not-utf8-error.json:
    assetId = property = consignmentId, empty data, single FILE_CHECK
    error. The detection itself is the audio stage's decode pass — the
    engine decodes ONCE and derives both this gate and per-row violations
    from the same pass (no second scan of ``bytes`` at 100 TB)."""
    err = Error("FILE_CHECK", consignment_id, "UTF8", resolve("FILE_CHECK", consignment_id, "UTF8"))
    return GateFailure(
        ErrorFileData(
            consignmentId=consignment_id,
            fileError=FileError.UTF_8,
            validationErrors=[ValidationErrors(consignment_id, [err], [])],
        )
    )
