"""Similarity search over an embedding column (array<float>).

Two tiers:

- ``brute_force_topk`` — exact cosine top-k, the correctness baseline.
  Query side broadcast (queries are few); dot products via
  ``zip_with``/``aggregate`` (JVM-side, codegen — no Python); top-k with
  a window over each query (one shuffle of (query, candidate, score)).
- ``lsh_buckets`` / ``lsh_near_dups`` — random-hyperplane LSH (sign-bit
  signature; Charikar 2002): candidates meet in bucket equi-joins, the
  100 TB path. Hyperplanes are seed-deterministic and shipped as plan
  literals (no closures, no broadcast variables needed at this size).

- ``ivf_topk`` — IVF-style coarse quantizer: seed-deterministic unit
  centroids (no iterative training job — at 100 TB the centroids come
  from an offline k-means over a sample; here they are random unit
  vectors, which demonstrates the identical plan shape), corpus assigned
  to its argmax-cosine centroid in ONE projection (no shuffle), queries
  probe their top-``n_probe`` centroids, candidates meet in a
  centroid-id equi-join, exact cosine re-ranks. Recall < 1 by
  construction; n_probe trades recall for candidate volume.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    -> (query_id, neighbor_id, cosine, rank). Excludes self-matches.
    Query side is broadcast — the corpus is scanned ONCE regardless of
    query count; scores shuffle once for the per-query top-k window.
    """
    cand = emb.select(
        F.col(id_col).cast("string").alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(q_id_col).cast("string").alias("query_id"),
        F.col(q_vec_col).alias("qv"),
        _norm(F.col(q_vec_col)).alias("qn"),
    )
    scored = cand.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-normal rows)."""
    rng = np.random.RandomState(seed)
    h = rng.randn(n_planes, dim)
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in h]


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature as a string key '1010...' — plan literals only."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    planes_mode: str = "auto",
    codegen_term_limit: int = 4096,
) -> DataFrame:
    """-> (id, band, bucket) rows: signature split into ``bands`` chunks;
    vectors sharing any chunk land in the same bucket (higher recall than
    one monolithic signature).

    ``dim`` is required: Spark array schemas carry no element count, and
    inferring it with ``.first()`` would launch a driver-side job during
    plan construction — a hidden action we refuse to hide.

    ``planes_mode`` mirrors :func:`ivf_topk`'s codebook modes: past
    ``codegen_term_limit`` (= n_planes * dim) hyperplane coefficients,
    the plane matrix rides as ONE broadcast array<array<double>> column
    and the signature is a ``transform`` over it — O(1) plan size —
    instead of n_planes * dim plan literals. Identical signatures either
    way (same coefficients, same fold order).
    """
    if dim is None:
        raise ValueError(
            "dim is required (embedding dimensionality); array<float> schemas "
            "do not carry a length and inferring it would run a driver job"
        )
    planes = hyperplanes(dim, n_planes, seed)
    if planes_mode == "auto":
        planes_mode = "literal" if n_planes * dim <= codegen_term_limit else "broadcast"
    if planes_mode == "literal":
        base = emb
        sig = lsh_signature(F.col(vec_col), planes)
    elif planes_mode == "broadcast":
        pl_df = F.broadcast(
            emb.sparkSession.createDataFrame(
                [(planes,)], "__pl array<array<double>>"
            )
        )
        base = emb.crossJoin(pl_df)
        sig = F.array_join(
            F.transform(
                F.col("__pl"),
                lambda p: F.when(_dot(F.col(vec_col), p) >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        )
    else:
        raise ValueError(f"unknown planes_mode {planes_mode!r}")
    per_band = n_planes // bands
    chunks = [
        F.struct(
            F.lit(i).alias("band"),
            F.substring(sig, i * per_band + 1, per_band).alias("bucket"),
        )
        for i in range(bands)
    ]
    return base.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(F.array(*chunks)).alias("c"),
    ).select("id", "v", F.col("c.band").alias("band"), F.col("c.bucket").alias("bucket"))


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-norm centroids (the coarse quantizer codebook).
    Production swaps in offline-k-means centroids; the plan is identical."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_centroids, dim)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in c]


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    dim: int | None = None,
    codebook: str = "auto",
    codegen_term_limit: int = 4096,
) -> DataFrame:
    """IVF approximate top-k: centroid assignment (one projection, argmax
    of K dot products against the codebook — JVM-side, no shuffle),
    query-side top-``n_probe`` centroid probes (broadcast: queries are
    few), candidate equi-join on centroid id, exact cosine re-rank,
    per-query top-k window.

    -> (query_id, neighbor_id, cosine, rank) — same shape as
    :func:`brute_force_topk`, recall < 1 (only probed centroids are
    searched). At scale the corpus scan is centroid-pruned: with
    partitioning/bucketing by centroid the probe join touches
    n_probe/n_centroids of the data.

    ``codebook`` — how the K x dim centroid matrix reaches executors:

    - ``"literal"``: every coefficient is a plan literal. Fine at oracle
      scale (16 x 64 = 1,024 terms, and exactly reproducible in SQL);
      at production K it bloats the plan/codegen quadratically —
      4,096 x 1,024 would be 4M expression nodes.
    - ``"broadcast"``: the codebook rides as ONE array<array<double>>
      column on a broadcast 1-row frame; dots are computed with
      ``transform``/``aggregate``/``zip_with`` over it — plan size is
      O(1) in K x dim, data ships once per executor.
    - ``"auto"`` (default): literal while n_centroids * dim <=
      ``codegen_term_limit``, else broadcast.
    """
    if dim is None:
        raise ValueError("dim is required (embedding dimensionality)")
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    cents = ivf_centroids(dim, n_centroids, seed)
    if codebook == "auto":
        codebook = "literal" if n_centroids * dim <= codegen_term_limit else "broadcast"
    if codebook not in ("literal", "broadcast"):
        raise ValueError(f"unknown codebook mode {codebook!r}")

    if codebook == "literal":
        cent_lits = [F.array(*[F.lit(x) for x in c]) for c in cents]

        def dots_of(vcol):
            return F.array(*[_dot(vcol, cl) for cl in cent_lits])

        def with_codebook(df):
            return df
    else:
        cb_df = F.broadcast(
            emb.sparkSession.createDataFrame(
                [(cents,)], "__cb array<array<double>>"
            )
        )

        def dots_of(vcol):
            return F.transform(F.col("__cb"), lambda c: _dot(vcol, c))

        def with_codebook(df):
            # 1-row broadcast cross join: attaches the codebook column to
            # every row at ~zero cost, no shuffle
            return df.crossJoin(cb_df)

    corpus = with_codebook(emb).select(
        F.col(id_col).cast("string").alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        dots_of(F.col(vec_col)).alias("__ds"),
    ).select(
        "neighbor_id", "cv", "cn",
        # argmax = FIRST index of the max (ties: lowest centroid wins) —
        # mirrored exactly by the oracle's list_indexof(list, max)
        (F.array_position(F.col("__ds"), F.array_max(F.col("__ds"))) - 1)
        .cast("int").alias("centroid"),
    )

    q = with_codebook(queries).select(
        F.col(q_id_col).cast("string").alias("query_id"),
        F.col(q_vec_col).alias("qv"),
        _norm(F.col(q_vec_col)).alias("qn"),
        dots_of(F.col(q_vec_col)).alias("__ds"),
    )
    qd = q.select(
        "query_id", "qv", "qn", F.posexplode("__ds").alias("centroid", "__d")
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("__d").desc(), F.col("centroid")
    )
    probes = (
        qd.withColumn("__rn", F.row_number().over(wprobe))
        .where(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", "centroid")
    )

    scored = corpus.join(F.broadcast(probes), on="centroid").where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    planes_mode: str = "auto",
) -> DataFrame:
    """Scale path for embedding near-dup: bucket equi-join -> exact cosine
    re-rank of candidates only. Same output shape as
    dedup.embedding_near_dups (recall < 1 by construction; bands/planes
    trade recall for candidate volume). ``dim`` required and
    ``planes_mode`` passed through (see :func:`lsh_buckets`)."""
    b = lsh_buckets(emb, n_planes, bands, seed, id_col, vec_col, dim=dim,
                    planes_mode=planes_mode)
    a_side = b.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "band", "bucket")
    b_side = b.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "band", "bucket")
    cand = (
        a_side.join(b_side, on=["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b")
        .distinct()
    )
    cos = _dot(F.col("v_a"), F.col("v_b")) / (_norm(F.col("v_a")) * _norm(F.col("v_b")))
    return cand.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= threshold)
