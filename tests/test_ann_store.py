"""ANN index store lifecycle (judge r5 task 4): generational PQ/IVFADC
stores, staged re-index, atomic swap, crash orphans, expiry."""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark.pipeline import ann_store, similarity as sim


def _emb(spark, n, dim=16, seed=0, drift=0.0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, dim) * 2 + drift
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.randn(dim) * 0.3])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _res(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
        for r in df.collect()
    )


def test_init_search_and_staged_reindex(spark, tmp_path):
    """Searches resolve the OLD generation until the swap, and the
    post-swap results are bit-exact against a fresh standalone build
    from the same corpus (the judge's 'done' criterion — determinism
    makes generation == fresh build by construction)."""
    root = str(tmp_path / "idx")
    corpus_a = _emb(spark, 200, seed=1)
    queries = corpus_a.where(F.col("vec_id") < 3)

    gen1 = ann_store.init_index(
        corpus_a, root, kind="pq", m=4, k=8, sample_n=128, iters=4)
    assert gen1 == "gen-000001"
    assert ann_store.current_generation(root) == gen1

    # fresh standalone build from corpus A == store search, bit-exact
    books_a = sim.pq_train(corpus_a, m=4, k=8, sample_n=128, iters=4)
    codes_a = sim.pq_encode(corpus_a, books_a)
    fresh_a = _res(sim.pq_topk(codes_a, queries, books_a, k=5))
    assert _res(ann_store.search(spark, root, queries, k=5)) == fresh_a

    # the corpus drifts: new distribution + more vectors
    corpus_b = _emb(spark, 300, seed=2, drift=1.5)

    # BEFORE the swap: the store still serves generation 1 (corpus A)
    assert _res(ann_store.search(spark, root, queries, k=5)) == fresh_a

    gen2 = ann_store.reindex(corpus_b, root, m=4, k=8, sample_n=128, iters=4)
    assert gen2 == "gen-000002"
    assert ann_store.current_generation(root) == gen2

    # AFTER the swap: bit-exact against a fresh build from corpus B
    books_b = sim.pq_train(corpus_b, m=4, k=8, sample_n=128, iters=4)
    codes_b = sim.pq_encode(corpus_b, books_b)
    fresh_b = _res(sim.pq_topk(codes_b, queries, books_b, k=5))
    got_b = _res(ann_store.search(spark, root, queries, k=5))
    assert got_b == fresh_b
    assert got_b != fresh_a  # the drift actually changed the index
    # both generations on disk until expiry
    assert os.path.isdir(os.path.join(root, gen1))
    assert os.path.isdir(os.path.join(root, gen2))


def test_crashed_reindex_leaves_old_generation_serving(spark, tmp_path):
    """A crash mid-reindex = orphan gen directory + untouched manifest:
    searches keep serving the old generation; expire reclaims the
    orphan without touching the current one."""
    root = str(tmp_path / "idx")
    corpus = _emb(spark, 120, seed=3)
    queries = corpus.where(F.col("vec_id") < 2)
    ann_store.init_index(corpus, root, kind="pq", m=4, k=8, sample_n=64,
                         iters=3)
    before = _res(ann_store.search(spark, root, queries, k=4))

    # simulate the crash: a partially-built next generation, no manifest flip
    orphan = os.path.join(root, "gen-000002")
    os.makedirs(os.path.join(orphan, "codes"))
    assert ann_store.current_generation(root) == "gen-000001"
    assert _res(ann_store.search(spark, root, queries, k=4)) == before

    removed = ann_store.expire_generations(root, keep_last=2)
    assert removed == ["gen-000002"]
    assert not os.path.exists(orphan)
    assert _res(ann_store.search(spark, root, queries, k=4)) == before


def test_ivfpq_store_partitions_codes_by_centroid(spark, tmp_path):
    """IVFADC generations write centroid-partitioned codes (the probe
    filter then prunes FILES) and search matches a direct build."""
    root = str(tmp_path / "idx")
    corpus = _emb(spark, 160, dim=16, seed=4)
    queries = corpus.where(F.col("vec_id") < 2)
    ann_store.init_index(corpus, root, kind="ivfpq", dim=16, n_centroids=8,
                         m=4, k=8, sample_n=128, iters=3)
    gen_dir = os.path.join(root, "gen-000001", "codes")
    parts = [d for d in os.listdir(gen_dir) if d.startswith("centroid=")]
    assert len(parts) > 1  # physically partitioned

    books = sim.ivfpq_train(corpus, dim=16, n_centroids=8, m=4, k=8,
                            sample_n=128, iters=3)
    codes = sim.ivfpq_encode(corpus, books, n_centroids=8)
    want = _res(sim.ivfpq_topk(codes, queries, books, n_centroids=8, k=4,
                               n_probe=3))
    assert _res(ann_store.search(spark, root, queries, k=4, n_probe=3)) == want


def test_ivfpq_store_search_plan_file_prunes(spark, tmp_path):
    """The generational layout preserves the IVFADC scan win: the store
    search's probe filter lands as physical PartitionFilters on the
    centroid-partitioned codes scan (files pruned, not just rows)."""
    root = str(tmp_path / "idx")
    corpus = _emb(spark, 160, dim=16, seed=9)
    queries = corpus.where(F.col("vec_id") < 1)
    ann_store.init_index(corpus, root, kind="ivfpq", dim=16, n_centroids=8,
                         m=4, k=8, sample_n=128, iters=3)
    df = ann_store.search(spark, root, queries, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("centroid" in ln for ln in scan), plan[:2000]


def test_refusals_and_locking(spark, tmp_path):
    root = str(tmp_path / "idx")
    corpus = _emb(spark, 60, seed=5)
    with pytest.raises(FileNotFoundError, match="not an ANN index"):
        ann_store.reindex(corpus, root, m=4, k=8)
    ann_store.init_index(corpus, root, kind="pq", m=4, k=8, sample_n=32,
                         iters=2)
    with pytest.raises(FileExistsError, match="reindex"):
        ann_store.init_index(corpus, root, kind="pq", m=4, k=8)
    with pytest.raises(ValueError, match="keep_last"):
        ann_store.expire_generations(root, keep_last=0)

    # a held writer lock blocks reindex with the operator-facing error
    from tdr_draft_metadata_validator_spark.pipeline.incremental import (
        StoreLockedError,
    )

    lock_path = os.path.join(root, ann_store.LOCK)
    with open(lock_path, "w") as fh:
        fh.write("12345")
    with pytest.raises(StoreLockedError):
        ann_store.reindex(corpus, root, m=4, k=8, sample_n=32, iters=2)
    os.unlink(lock_path)


def test_expire_never_drops_current(spark, tmp_path):
    root = str(tmp_path / "idx")
    corpus = _emb(spark, 80, seed=6)
    ann_store.init_index(corpus, root, kind="pq", m=4, k=8, sample_n=48,
                         iters=2)
    for seed in (7, 8):
        ann_store.reindex(_emb(spark, 80, seed=seed), root, m=4, k=8,
                          sample_n=48, iters=2)
    removed = ann_store.expire_generations(root, keep_last=1)
    assert removed == ["gen-000001", "gen-000002"]
    assert ann_store.current_generation(root) == "gen-000003"
    queries = corpus.where(F.col("vec_id") < 2)
    assert len(_res(ann_store.search(spark, root, queries, k=3))) == 6
