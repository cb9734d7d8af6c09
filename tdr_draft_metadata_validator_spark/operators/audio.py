"""Audio decode + PCM-allclose invariant (U3, north_rule).

The per-row invariant vs the reference table: decoded PCM must match the
reference PCM with SNR >= 30 dB, and the transcript must equal the
reference transcript (the analog of the reference validator's
protected-field equality, Lambda.scala:257-281, applied to content
instead of metadata; the decode failure doubles as the UTF-8 gate analog,
Lambda.scala:130-153).

Spark shape — built to scan ``bytes`` exactly once:

1. Prune both sides to the columns the invariant needs
   (clip_id, bytes, codec / clip_id, ref_pcm) BEFORE the join, so the
   shuffle moves one audio payload per row, not two tables' worth.
2. Equi-join on clip_id (ref side broadcast when stats allow).
3. ONE ``mapInPandas`` pass: Arrow-batched, vectorized per batch —
   decodes, computes SNR, emits only failure rows
   (asset_id, error_key, detail). No per-row Python round trips,
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` kept small because a
   batch holds binary payloads.
4. Transcript equality is NOT in the UDF — it is a plain Column
   predicate on the same join (JVM-side, codegen).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.audio_codec import decode, snr_db
from ..messages import resolve
from ..models import PROCESS_AUDIO
from .relational import choose_join_side

_FAIL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("error_key", T.StringType(), False),
        T.StructField("detail", T.StringType(), True),
    ]
)


def _decode_failures(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, keys, details = [], [], []
        has_ref = "ref_pcm" in pdf.columns
        thresholds = pdf["__snr_thresh"] if "__snr_thresh" in pdf.columns else None
        for row in range(len(pdf)):
            payload = pdf["bytes"].iat[row]
            codec = pdf["codec"].iat[row]
            try:
                _sr, samples = decode(payload, codec)
            except ValueError as exc:
                ids.append(pdf["clip_id"].iat[row])
                keys.append("undecodable")
                details.append(str(exc))
                continue
            if has_ref:
                ref_raw = pdf["ref_pcm"].iat[row]
                ref = np.frombuffer(ref_raw, dtype="<i2") if ref_raw is not None else None
                if ref is None:
                    continue
                snr = snr_db(ref, samples)
                thresh = float(thresholds.iat[row]) if thresholds is not None else 30.0
                if snr < thresh:
                    ids.append(pdf["clip_id"].iat[row])
                    keys.append("snrBelowThreshold")
                    details.append(f"snr_db={snr:.2f}")
        yield pd.DataFrame({"asset_id": ids, "error_key": keys, "detail": details})


def audio_invariants(
    clips: DataFrame,
    ref: DataFrame | None,
    key: str = "clip_id",
    snr_threshold_db: float = 30.0,
) -> DataFrame:
    """Decode + SNR + transcript checks -> violation rows.

    With ``ref=None`` only decodability is checked (the standalone UTF-8
    gate analog). Returns the engine's common violation-row shape.
    """
    if ref is None:
        src = clips.select(F.col(key).alias("clip_id"), "bytes", "codec")
    else:
        ref_sel = choose_join_side(
            ref.select(F.col(key).alias("clip_id"), "ref_pcm", "ref_transcript"),
            est_row_bytes=64 * 1024,
        )
        src = clips.select(
            F.col(key).alias("clip_id"), "bytes", "codec", "transcript"
        ).join(ref_sel, on="clip_id", how="inner")

    decode_src = src.select(
        "clip_id", "bytes", "codec",
        *(["ref_pcm"] if ref is not None else []),
        F.lit(snr_threshold_db).alias("__snr_thresh"),
    )
    failures = decode_src.mapInPandas(_decode_failures, _FAIL_SCHEMA)

    empty_data = F.array().cast("array<struct<name:string,value:string>>")
    decode_violations = failures.select(
        F.col("asset_id"),
        F.lit(PROCESS_AUDIO).alias("validation_process"),
        F.lit("bytes").alias("property"),
        F.col("error_key"),
        F.when(F.col("error_key") == "undecodable",
               F.lit(resolve(PROCESS_AUDIO, "bytes", "undecodable")))
         .otherwise(F.lit(resolve(PROCESS_AUDIO, "bytes", "snrBelowThreshold")))
         .alias("message"),
        empty_data.alias("data"),
    )

    if ref is None:
        return decode_violations

    # transcript equality: pure Column predicate, no UDF (JVM-side)
    transcript_violations = src.where(
        ~F.col("transcript").eqNullSafe(F.col("ref_transcript"))
    ).select(
        F.col("clip_id").alias("asset_id"),
        F.lit(PROCESS_AUDIO).alias("validation_process"),
        F.lit("transcript").alias("property"),
        F.lit("transcriptMismatch").alias("error_key"),
        F.lit(resolve(PROCESS_AUDIO, "transcript", "transcriptMismatch")).alias("message"),
        F.array(
            F.struct(F.lit("transcript").alias("name"),
                     F.col("transcript").cast("string").alias("value"))
        ).alias("data"),
    )
    return decode_violations.unionByName(transcript_violations)


def has_undecodable(violations: DataFrame) -> bool:
    """Cheap post-hoc gate decision (UTF-8 analog): derived from the same
    decode pass, never a second scan of ``bytes``."""
    return not violations.where(F.col("error_key") == "undecodable").isEmpty()
