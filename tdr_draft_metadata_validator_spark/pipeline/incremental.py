"""Incremental near-deduplication against a persisted signature store.

The steady-state 100 TB workflow: the corpus grows by a daily sliver,
and re-running MinHash over 10^12 existing documents to dedup a 10^7-row
delta is absurd. Instead the corpus's LSH band buckets
(:func:`..dedup.minhash_band_buckets` — ~bands rows of ~50 B per doc,
independent of document size) are PERSISTED once, append-only, and each
delta run:

1. computes band buckets for the DELTA only (the only pass that reads
   document text);
2. equi-joins them against the store (delta x corpus candidates) and
   against themselves (delta x delta) — one bucket join, exactly the
   :func:`..dedup.minhash_lsh_candidates` shape with one side tiny;
3. appends the delta's buckets to the store for the next run.

The store is an append-only batch log (mirrors the Iceberg append and
the ``ref_fingerprints`` manifest pattern in ``operators/audio.py``):
appending writes ONLY the delta's signatures — corpus signatures are
never recomputed. LSH parameters (num_hashes/bands/n/lane) are pinned
in a store manifest and verified on every touch: buckets computed under
different parameters are incomparable, and a silent mismatch would
yield garbage candidates, so the store REFUSES instead.

Correctness contract (oracle-checked, `incremental_lsh_candidates`
query): a delta run returns exactly the full-run candidate pairs
restricted to pairs touching >=1 delta id.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import minhash_band_buckets

PARAMS = "_signature_params.json"
BATCHES = "_batches.json"

_BUCKET_COLS = ["id", "band", "bh"]


def _read_json(path: str, default):
    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return default


def _write_json_atomic(path: str, doc) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=2)
    os.replace(tmp, path)


def store_params(root: str) -> dict | None:
    return _read_json(os.path.join(root, PARAMS), None)


def _check_params(root: str, params: dict) -> dict:
    existing = store_params(root)
    if existing is not None and existing != params:
        raise ValueError(
            f"signature store {root!r} was built with {existing}; this run "
            f"requested {params} — band buckets under different LSH "
            f"parameters are incomparable. Rebuild the store or match its "
            f"parameters."
        )
    return params


def append_signatures(
    docs: DataFrame,
    root: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lane: str = "xxhash64",
) -> int:
    """Compute ``docs``' band buckets and append them as the next store
    batch (creates the store on first call, pinning the LSH parameters).
    Returns the batch id. Append-only: one parquet write of the NEW
    buckets; existing batches are never rewritten (the Iceberg-append
    analog — at 10^12 rows this is the property that matters)."""
    params = _check_params(root, {
        "num_hashes": num_hashes, "bands": bands, "n": n, "lane": lane,
    })
    os.makedirs(root, exist_ok=True)
    batches = _read_json(os.path.join(root, BATCHES), [])
    bid = (batches[-1]["batch_id"] + 1) if batches else 1
    buckets = minhash_band_buckets(
        docs, num_hashes, bands, n, id_col, text_col, lane=lane
    )
    buckets.write.mode("errorifexists").parquet(os.path.join(root, f"batch-{bid}"))
    # publish params first (idempotent), then the batch list (atomic
    # rename) — a crash in between leaves an orphan directory, never a
    # manifest pointing at missing data
    _write_json_atomic(os.path.join(root, PARAMS), params)
    batches.append({"batch_id": bid, "path": f"batch-{bid}"})
    _write_json_atomic(os.path.join(root, BATCHES), batches)
    return bid


def read_signatures(spark: SparkSession, root: str) -> DataFrame:
    """-> (id, band, bh) union of every committed batch (manifest-driven:
    orphan directories from crashed appends are invisible)."""
    batches = _read_json(os.path.join(root, BATCHES), [])
    if not batches:
        raise FileNotFoundError(f"no signature batches committed under {root!r}")
    paths = [os.path.join(root, b["path"]) for b in batches]
    return spark.read.parquet(*paths).select(*_BUCKET_COLS)


def compact_signature_store(
    spark: SparkSession,
    root: str,
    remove_ids: DataFrame | None = None,
) -> int:
    """Maintenance (the expire_snapshots analog for the signature
    store): rewrite the batch log as ONE batch, optionally retiring the
    buckets of deleted documents (``remove_ids``: a one-column frame of
    ids — pair it with ``snapshot_delta``'s removed_keys so the store
    tracks the corpus). Without periodic compaction an append-every-day
    store accumulates batches (read-side union width grows) and keeps
    signatures for documents that no longer exist (phantom candidate
    pairs). Returns the new batch id.

    Crash-safe in the same order as every manifest here: the compacted
    batch is WRITTEN first, then the trimmed manifest publishes via
    atomic rename, then the old batch directories are deleted — a crash
    leaves orphan directories, never a manifest pointing at missing
    data. Readers pinned to the old manifest in-flight keep their
    batches until the final delete, mirroring expire_snapshots'
    contract.
    """
    import shutil

    if store_params(root) is None:
        raise FileNotFoundError(f"signature store {root!r} has no parameters")
    old_batches = _read_json(os.path.join(root, BATCHES), [])
    if not old_batches:
        raise FileNotFoundError(f"no signature batches committed under {root!r}")
    buckets = read_signatures(spark, root)
    if remove_ids is not None:
        gone = remove_ids.select(
            F.col(remove_ids.columns[0]).cast("string").alias("id")
        )
        buckets = buckets.join(gone, on="id", how="left_anti")
    bid = old_batches[-1]["batch_id"] + 1
    buckets.write.mode("errorifexists").parquet(os.path.join(root, f"batch-{bid}"))
    _write_json_atomic(
        os.path.join(root, BATCHES),
        [{"batch_id": bid, "path": f"batch-{bid}"}],
    )
    for b in old_batches:
        shutil.rmtree(os.path.join(root, b["path"]), ignore_errors=True)
    return bid


def incremental_lsh_candidates(
    spark: SparkSession,
    delta_docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_a, id_b, n_bands_matched): LSH candidate pairs touching the
    delta — (delta x corpus) u (delta x delta) — WITHOUT recomputing any
    corpus signature. LSH parameters come from the store manifest (the
    only comparable choice).

    Shape: delta buckets are tiny (the daily sliver), so the bucket
    equi-join against the store broadcasts the delta side; the store
    scan reads (id, band, bh) only — document text is read once, for
    the delta. Pairs where BOTH ids are in the delta match twice
    (delta-side a x full-side b and vice versa), so matches are
    distinct-ed on (pair, band) before counting — n_bands_matched is
    identical to the full run's.

    NOTE: candidates only — run the standard verify
    (:func:`..dedup.verify_pairs_jaccard`, which needs both texts) and
    closure stages downstream, exactly like the full pipeline. This
    function does NOT append the delta to the store; call
    :func:`append_signatures` after the run commits (validate.py wires
    this order).
    """
    params = store_params(root)
    if params is None:
        raise FileNotFoundError(f"signature store {root!r} has no parameters")
    delta_b = minhash_band_buckets(
        delta_docs, params["num_hashes"], params["bands"], params["n"],
        id_col, text_col, lane=params["lane"],
    )
    full_b = read_signatures(spark, root).unionByName(delta_b)
    a = delta_b.select(F.col("id").alias("id_a"), "band", "bh")
    b = full_b.select(F.col("id").alias("id_b"), "band", "bh")
    matches = (
        a.join(b, on=["band", "bh"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "band",
        )
        .distinct()
    )
    return matches.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_bands_matched")
    )
