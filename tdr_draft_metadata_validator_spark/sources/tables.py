"""Readers for the clips / reference tables (S1/S2/S3/S5 analogs).

The reference stages a CSV from S3 to /tmp and parses it in-process
(S3Files.scala:17-27, CSVHandler.scala:24-44). Spark-first there is no
staging: ``spark.read`` against the object store / table format, schema
verified on read, header mapping as a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..models import CLIPS_SCHEMA, REF_CLIPS_SCHEMA


_FORMATS = ("parquet", "orc", "json", "avro")


def _read_table(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown table format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if fmt == "json":
        # self-describing columnar formats carry their schema; JSON does
        # not — inference would silently type every field from a sample
        # AND cannot express binary, so the clips schema is applied
        # explicitly (bytes ride as base64 strings per Spark's JSON
        # binary convention and decode on read)
        reader = reader.schema(schema or CLIPS_SCHEMA)
    return reader.format(fmt).load(path)


def read_clips(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Primary source: the clips table in any self-describing columnar
    format Spark ships (parquet default; orc identical; avro needs the
    external spark-avro jar — absent here, clear error from Spark; json
    gets the explicit clips schema applied)."""
    return _read_table(spark, path, fmt)


def read_ref_clips(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    from ..models import REF_CLIPS_SCHEMA as _ref_schema

    return _read_table(spark, path, fmt, schema=_ref_schema)


# ---------------------------------------------------------------------------
# CSV ingest mode (the reference's native input, CSVHandler.scala:24-48)
# ---------------------------------------------------------------------------

def raw_csv_headers(spark: SparkSession, path: str) -> list[str]:
    """S3 analog (CSVHandler.scala:46-48 loadHeaders): first record only.

    Spark renames duplicate CSV headers on read, so the duplicate-header
    gate (G2) must see the RAW first line; one-row text read, no scan.
    Parsed with RFC-4180 quoting rules (a naive split breaks quoted
    headers containing commas and diverges from what Spark's CSV parser
    sees).

    ASSUMPTIONS (single-file header contract): ``path`` is a single CSV
    file, or a shard directory whose shards all carry the SAME header —
    ``spark.read.text(...).limit(1)`` takes the first line of an
    ARBITRARY shard. A quoted header cell containing an EMBEDDED NEWLINE
    is not supported here (the text source splits on raw line breaks
    before the CSV quoting rules apply); such files need multiLine CSV
    parsing end to end and are outside the reference's input contract
    (CSVHandler.scala:46-48 reads the first physical line the same way).
    """
    import csv as _csv

    first = spark.read.text(path).limit(1).collect()
    if not first:
        return []
    return [h.strip() for h in next(_csv.reader([first[0][0]]))]


def load_clips_csv(
    spark: SparkSession,
    path: str,
    header_mapping: dict[str, str] | None = None,
    consignment_id: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """S2 analog: CSV -> typed rows + raw headers for the gates.

    - ``consignment_id`` set -> the byte-level UTF-8/BOM gate
      (Lambda.scala:130-153, UTF8ValidationHandler.scala:8-11) runs FIRST,
      before any parsing — reference gate order. A non-UTF-8 file raises
      :class:`~..operators.gates.GateTripped` carrying the FileError.UTF_8
      verdict (not-utf8-error.json shape).
    - ``header_mapping``: input header -> canonical property
      (inputToPropertyMapper, CSVHandler.scala:26-31). Unmapped headers
      are DROPPED (G6; CSVHandler.scala:40 collects only non-empty
      mappings); mapped ones are renamed (G7).
    - INVALID_CSV gate (Lambda.scala:283-305): the read uses an EXPLICIT
      all-string schema + a ``_corrupt_record`` field (PERMISSIVE routing
      only works with the corrupt column IN the schema — with inferred
      schemas Spark never materializes it and malformed rows silently
      null-fill). With ``consignment_id`` set the gate runs here and
      raises :class:`GateTripped`; otherwise the ``_corrupt_record``
      column is left on the frame for the caller's own gate check.
    - CACHE OWNERSHIP: on the clean gated path the parsed frame stays
      CACHED (the gate must materialize it; keeping it saves downstream
      re-parses) and is REGISTERED in the gates module's live-cache list.
      Release is an API call, not docstring discipline: run
      ``operators.gates.release_parse_caches()`` once the run's outputs
      have materialized (validate.py does; long-lived sessions ingesting
      many CSVs must, or cached files accumulate).
    """
    if consignment_id is not None:
        from ..operators.gates import GateTripped, invalid_csv_gate, utf8_file_gate

        failure = utf8_file_gate(spark, path, consignment_id)
        if failure is not None:
            raise GateTripped(failure)
    headers = raw_csv_headers(spark, path)
    from pyspark.sql import types as T

    # schema field names must be unique for the read; duplicated raw
    # headers (G2's job, checked against raw_csv_headers) get suffixed
    seen: dict[str, int] = {}
    fields = []
    for h in headers:
        n = seen.get(h, 0)
        seen[h] = n + 1
        fields.append(T.StructField(h if n == 0 else f"{h}__dup{n}", T.StringType(), True))
    fields.append(T.StructField("_corrupt_record", T.StringType(), True))
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(T.StructType(fields))
        .csv(path)
    )
    if consignment_id is not None:
        failure = invalid_csv_gate(df, consignment_id)
        if failure is not None:
            raise GateTripped(failure)
        df = df.drop("_corrupt_record")
    if header_mapping:
        keep = {c: header_mapping[c] for c in df.columns if header_mapping.get(c)}
        # without consignment_id the INVALID_CSV gate is the CALLER's job,
        # so _corrupt_record must survive the mapping select (it is never
        # in header_mapping) — dropping it here would make invalid_csv_gate
        # return None via its "not in columns" guard and malformed rows
        # would silently pass as null-filled rows
        if consignment_id is None and "_corrupt_record" in df.columns:
            keep["_corrupt_record"] = "_corrupt_record"
        df = df.select(*[F.col(c).alias(p) for c, p in keep.items()])
    # late typing: the CSV is schema-on-read strings; coerce known columns
    for field in CLIPS_SCHEMA.fields:
        if field.name in df.columns and field.dataType.simpleString() != "string":
            df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return df, headers


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6 analog (CSVHandler.scala:50-55 writeCsv)."""
    df.write.mode(mode).option("header", True).csv(path)


# ---------------------------------------------------------------------------
# Iceberg (import-try stub: jars not in this image)
# ---------------------------------------------------------------------------

def read_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Iceberg scan with optional snapshot pinning (resume contract).

    Falls back with a clear error when the Iceberg runtime jar is absent
    (this sandbox); production adds
    ``--packages org.apache.iceberg:iceberg-spark-runtime-...``.
    """
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    try:
        return reader.load(table)
    except Exception as exc:  # ClassNotFound / datasource not found
        raise NotImplementedError(
            "Iceberg runtime not on the classpath in this environment; "
            "use read_clips(parquet) or add the iceberg-spark-runtime jar"
        ) from exc


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    try:
        row = spark.sql(f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1").collect()
        return int(row[0][0]) if row else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# bucketed layout (co-located joins for repeated validation runs)
# ---------------------------------------------------------------------------

def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int = 64,
    key: str = "clip_id",
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by the join key.

    At 10^12 rows the validation joins (fingerprints, anti-joins,
    protected fields) are re-run against the same reference table for
    every batch of new clips; bucketing BOTH sides by ``clip_id`` with
    the same bucket count makes those sort-merge joins SHUFFLE-FREE —
    each task reads matching buckets co-located by layout (verified by
    the plan test: no Exchange under the join). One-time layout cost,
    amortized across every subsequent run — the same trade as the
    fingerprint/drift snapshot manifests.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)
