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


# r7 — bit-exact numpy replicas of the Column folds above. Spark's
# higher-order functions (aggregate/zip_with) are interpreted per
# element, and embedding a K x dim codebook as plan literals makes
# Catalyst analysis itself the bottleneck (deep Add chains measured
# SLOWER than the interpreted fold). The fast path is the guide §4.2
# shape — whole batches into vectorized numpy — but ACCUMULATED IN THE
# SAME LEFT-ASSOCIATED ORDER as the Column fold (one fused
# multiply-add per dimension across the row batch, NOT BLAS matmul,
# whose blocked summation reorders additions): identical operand
# values + identical association = IEEE-identical doubles, so every
# oracle row that replicates the fold term-by-term in SQL still
# matches bit-for-bit.


def _seq_dots_np(x: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """(n, d) x (K, d) -> (n, K) dots, left-assoc accumulation over d
    (acc = (acc + x_i * c_i) per element — Spark's aggregate order)."""
    out = np.zeros((x.shape[0], mat.shape[0]), dtype=np.float64)
    for i in range(x.shape[1]):
        out += x[:, i:i + 1] * mat[None, :, i]
    return out


def _seq_norms_np(x: np.ndarray) -> np.ndarray:
    """(n, d) -> (n,) L2 norms, left-assoc accumulation over d."""
    acc = np.zeros(x.shape[0], dtype=np.float64)
    for i in range(x.shape[1]):
        acc += x[:, i] * x[:, i]
    return np.sqrt(acc)


def _is_double_vec(df: DataFrame, vec_col: str) -> bool:
    from pyspark.sql import types as T

    f = df.schema[vec_col].dataType
    return isinstance(f, T.ArrayType) and isinstance(f.elementType, T.DoubleType)


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

    r7: for array<double> inputs the scoring runs as one Arrow
    ``mapInPandas`` pass with the collected queries in the task closure
    (queries are few by contract) and left-associated folds
    (:func:`_seq_dots_np`) — IEEE-identical cosines to the Column path
    (which stays for other input types), no interpreted higher-order
    functions, same plan tail (JVM round + per-query top-k window).
    """
    if _is_double_vec(emb, vec_col) and _is_double_vec(queries, q_vec_col):
        q_rows = queries.select(
            F.col(q_id_col).cast("string").alias("qid"),
            F.col(q_vec_col).alias("qv"),
        ).collect()
        qs = []
        for r in q_rows:
            qv = np.asarray(r["qv"], dtype=np.float64)
            qs.append((r["qid"], qv, float(_seq_norms_np(qv[None, :])[0])))

        def run(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
                cn = _seq_norms_np(x)
                ids = pdf["id"].to_numpy()
                frames = []
                for qid, qv, qn in qs:
                    dots = _seq_dots_np(x, qv[None, :])[:, 0]
                    frames.append(pd.DataFrame({
                        "query_id": qid,
                        "neighbor_id": ids,
                        "cosine_raw": dots / (qn * cn),
                    }))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        src = emb.select(
            F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
        )
        scored = src.mapInPandas(
            run, "query_id string, neighbor_id string, cosine_raw double"
        ).where(F.col("neighbor_id") != F.col("query_id")).select(
            "query_id", "neighbor_id",
            F.round(F.col("cosine_raw"), 6).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

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
        # r7: numpy signature pass for array<double> inputs — the plane
        # matrix rides the task closure (O(1) plan size at any
        # n_planes x dim, no codegen of n_planes*dim literal terms);
        # left-assoc folds (_seq_dots_np) make every sign decision
        # IEEE-identical to the literal mode and the SQL oracle.
        if _is_double_vec(emb, vec_col):
            planes_mode = "numpy"
        else:
            planes_mode = "literal" if n_planes * dim <= codegen_term_limit else "broadcast"
    if planes_mode == "numpy":
        pl_np = np.array(planes, dtype=np.float64)

        def run(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
                bits = _seq_dots_np(x, pl_np) >= 0
                sigs = [
                    "".join("1" if b else "0" for b in row) for row in bits
                ]
                yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"], "sig": sigs})

        base = emb.select(
            F.col(id_col).cast("string").alias("id"),
            F.col(vec_col).alias("v"),
        ).mapInPandas(run, f"id string, v array<double>, sig string")
        per_band = n_planes // bands
        chunks = [
            F.struct(
                F.lit(i).alias("band"),
                F.substring(F.col("sig"), i * per_band + 1, per_band).alias("bucket"),
            )
            for i in range(bands)
        ]
        return base.select(
            "id", "v", F.explode(F.array(*chunks)).alias("c")
        ).select("id", "v", F.col("c.band").alias("band"),
                 F.col("c.bucket").alias("bucket"))
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
    - ``"numpy"`` (r7, the fast path — chosen by ``"auto"`` for
      array<double> inputs): assignment + candidate scoring run as ONE
      Arrow ``mapInPandas`` pass with the codebook in the task closure
      (O(1) plan size at ANY K, no broadcast join, no interpreted
      higher-order functions). Accumulation is the left-associated
      per-dimension fold (:func:`_seq_dots_np`), so every cosine and
      every argmax decision is IEEE-identical to the literal mode and
      the SQL oracle. Guide §4.2: batches into vectorized numpy.
    - ``"auto"`` (default): numpy for array<double> columns; otherwise
      literal while n_centroids * dim <= ``codegen_term_limit``, else
      broadcast.
    """
    if dim is None:
        raise ValueError("dim is required (embedding dimensionality)")
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    cents = ivf_centroids(dim, n_centroids, seed)
    if codebook == "auto":
        if _is_double_vec(emb, vec_col) and _is_double_vec(queries, q_vec_col):
            codebook = "numpy"
        else:
            codebook = "literal" if n_centroids * dim <= codegen_term_limit else "broadcast"
    if codebook not in ("literal", "broadcast", "numpy"):
        raise ValueError(f"unknown codebook mode {codebook!r}")

    if codebook == "numpy":
        scored = _ivf_scored_numpy(
            emb, queries, n_probe, cents, id_col, vec_col,
            q_id_col, q_vec_col, dim,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

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


def _ivf_scored_numpy(
    emb: DataFrame,
    queries: DataFrame,
    n_probe: int,
    cents: list[list[float]],
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    dim: int,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) for all probed-cell candidates —
    the ivf_topk "numpy" fast path. Queries are collected driver-side
    (few by contract, the same shape as pq_topk's LUT build); probe
    selection replicates row_number over (dot desc, centroid); the
    corpus pass assigns + scores whole Arrow batches with left-assoc
    folds, so values are bit-identical to the Column/literal path.
    Rounding stays in the JVM (F.round = HALF_UP, not numpy's
    half-even)."""
    cents_np = np.array(cents, dtype=np.float64)
    q_rows = queries.select(
        F.col(q_id_col).cast("string").alias("qid"),
        F.col(q_vec_col).alias("qv"),
    ).collect()
    probes: dict[int, list] = {}  # centroid -> [(qid, qv, qn), ...]
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        if qv.shape != (dim,):
            raise ValueError(f"query dim {qv.shape} != dim={dim}")
        qn = float(_seq_norms_np(qv[None, :])[0])
        ds = _seq_dots_np(qv[None, :], cents_np)[0]
        # top-n_probe by (dot desc, centroid asc) — the window's order
        order = sorted(range(len(ds)), key=lambda c: (-ds[c], c))[:n_probe]
        for c in order:
            probes.setdefault(c, []).append((r["qid"], qv, qn))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            cn = _seq_norms_np(x)
            # argmax keeps the FIRST max — same tie rule as the
            # array_position-of-max projection and the oracle
            assign = _seq_dots_np(x, cents_np).argmax(axis=1)
            ids = pdf["id"].to_numpy()
            frames = []
            for c, qs in probes.items():
                mask = assign == c
                if not mask.any():
                    continue
                xm, cm, im = x[mask], cn[mask], ids[mask]
                for qid, qv, qn in qs:
                    dots = _seq_dots_np(xm, qv[None, :])[:, 0]
                    frames.append(pd.DataFrame({
                        "query_id": qid,
                        "neighbor_id": im,
                        "cosine_raw": dots / (qn * cm),
                    }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    src = emb.select(
        F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
    )
    scored = src.mapInPandas(
        run, "query_id string, neighbor_id string, cosine_raw double"
    )
    return scored.where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine_raw"), 6).alias("cosine"),
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


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid 2011 — "Product quantization
# for nearest neighbor search", public literature). THE memory lever at
# 10^12 vectors: a 64-dim float32 embedding is 256 B; its PQ code is m
# bytes (m=8 -> 32x compression), so the searchable index fits in RAM
# where raw vectors cannot. Division of labor mirrors production FAISS
# deployments: codebooks TRAIN on a bounded sample (driver numpy — the
# codebook is KBs and training is an offline maintenance job, exactly
# like ivf_topk's offline-centroids note above); ENCODE and SEARCH are
# the distributed passes (Arrow mapInPandas, vectorized numpy per batch,
# codebooks shipped in the task closure — KBs, never a shuffle).
#
# Cosine note: vectors are L2-normalized by default (normalize=True
# everywhere), making squared-L2 ordering identical to cosine ordering,
# so pq_topk's results are comparable to brute_force_topk's.
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Train PQ codebooks -> float32 array (m, k, dim/m).

    Deterministic end to end: the training sample is the FIRST
    ``sample_n`` vectors by id (stable under any partitioning — a
    random sample would re-roll codebooks and silently invalidate every
    stored code), k-means++-style seeding uses a fixed RandomState, and
    Lloyd runs a fixed ``iters`` sweeps (empty clusters re-seed to the
    farthest point, deterministically). The collect is bounded by
    ``sample_n`` — this is the one driver-side step, by design."""
    x = _collect_training_sample(emb, sample_n, m, k, id_col, vec_col,
                                 normalize)
    return _train_books(x, m, k, iters, seed)


def _collect_training_sample(
    emb: DataFrame,
    sample_n: int,
    m: int,
    k: int,
    id_col: str,
    vec_col: str,
    normalize: bool,
    dim: int | None = None,
) -> np.ndarray:
    """Shared pq_train/ivfpq_train sample step: first ``sample_n``
    vectors by id (deterministic under any partitioning), validated
    (ragged batches, k vs sample size, dim divisibility, optional
    expected dim) and optionally L2-normalized."""
    if k > 256:
        raise ValueError(
            f"k={k} > 256: codes are stored as uint8 (one byte per "
            "subspace); larger k would silently wrap")
    rows = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id").limit(sample_n).collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float32)
    if x.ndim != 2 or x.shape[0] < k:
        raise ValueError(f"need >= k={k} training vectors, got {x.shape}")
    if dim is not None and x.shape[1] != dim:
        raise ValueError(f"vector dim {x.shape[1]} != dim={dim}")
    if x.shape[1] % m:
        raise ValueError(f"dim {x.shape[1]} not divisible by m={m} subspaces")
    if normalize:
        n = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(n == 0, 1.0, n)
    return x


def _train_books(x: np.ndarray, m: int, k: int, iters: int, seed: int) -> np.ndarray:
    """Per-subspace k-means over (n, dim) -> (m, k, dim/m) float32.
    Deterministic: fixed RandomState, fixed Lloyd sweep count, empty
    clusters re-seed to the farthest point. Shared by pq_train (raw
    vectors) and ivfpq_train (centroid residuals)."""
    if k > 256:
        raise ValueError(
            f"k={k} > 256: codes are stored as uint8 (one byte per "
            "subspace); larger k would silently wrap")
    dim = x.shape[1]
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float32)
    for sub in range(m):
        xs = x[:, sub * dsub:(sub + 1) * dsub].astype(np.float64)
        # k-means++ seeding (fixed rng), then fixed Lloyd sweeps
        cent = [xs[rng.randint(len(xs))]]
        for _ in range(1, k):
            d2 = np.min(
                ((xs[:, None, :] - np.array(cent)[None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            p = d2 / d2.sum() if d2.sum() > 0 else None
            cent.append(xs[rng.choice(len(xs), p=p)])
        cent = np.array(cent)
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
                else:  # empty cluster -> farthest point (deterministic)
                    cent[c] = xs[d2.min(axis=1).argmax()]
        books[sub] = cent.astype(np.float32)
    return books


def _pq_codes_np(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 codes (vectorized per subspace).

    float64 + the DIRECT squared-distance formula (not the
    ||x||^2 - 2x.c + ||c||^2 expansion): the encode is then bit-stable
    against an independent double-precision replica (the DuckDB oracle
    computes the same per-term (x_i - c_i)^2 sums), so an argmin can
    only diverge on a mathematical near-tie at ~1e-15 — measure zero
    for real data — instead of the ~1e-7 float32 window that would
    make the external correctness gate flaky."""
    x = np.asarray(x, dtype=np.float64)
    books = np.asarray(books, dtype=np.float64)
    m, k, dsub = books.shape
    out = np.empty((x.shape[0], m), dtype=np.uint8)
    for sub in range(m):
        xs = x[:, sub * dsub:(sub + 1) * dsub]
        d = ((xs[:, None, :] - books[sub][None, :, :]) ** 2).sum(-1)
        out[:, sub] = d.argmin(axis=1)
    return out


def pq_seeded_books(dim: int, m: int, k: int, seed: int = 11,
                    scale: float | None = None) -> np.ndarray:
    """Deterministic data-independent PQ codebooks -> (m, k, dim/m)
    float64, entries rounded to 6 decimals so they embed as SHORT exact
    plan literals on both sides of the correctness gate (a decimal
    literal parses to the same IEEE double in Spark and DuckDB).

    Production trains codebooks (:func:`pq_train` — offline, on a
    sample); seeded books are the cold-start / externally-replicable
    variant: components ~ N(0, scale^2) with scale defaulting to
    1/sqrt(dim), the component scale of an L2-normalized vector, so
    codes quantize sensibly even untrained. Same spirit as
    :func:`ivf_centroids` above."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if k > 256:
        raise ValueError(f"k={k} > 256 would overflow uint8 codes")
    rng = np.random.RandomState(seed)
    s = scale if scale is not None else 1.0 / np.sqrt(dim)
    books = rng.standard_normal((m, k, dim // m)) * s
    return np.round(books, 6)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """-> (id, codes array<int>): the distributed encode pass — one
    Arrow mapInPandas projection, codebooks in the task closure (KBs).
    Codes are m small ints per vector: the 10^12-row index payload."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    dim = books.shape[0] * books.shape[2]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if x.ndim != 2 or x.shape[1] != dim:
                raise ValueError(
                    f"vector dim {x.shape[1:]} != codebook dim {dim}")
            if normalize:
                n = np.linalg.norm(x, axis=1, keepdims=True)
                x = x / np.where(n == 0, 1.0, n)
            codes = _pq_codes_np(x, books)
            yield pd.DataFrame({
                "id": pdf["id"],
                "codes": [row.tolist() for row in codes.astype(np.int32)],
            })

    src = emb.select(
        F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
    )
    return src.mapInPandas(run, "id string, codes array<int>")


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank: int | None = None,
    emb: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """ADC search over PQ codes -> (query_id, neighbor_id, rank [,cosine]).

    Per query, a (m, k) lookup table of subspace distances is built ONCE
    (asymmetric distance computation — the query stays un-quantized);
    scoring a code is m table gathers + a sum, vectorized across the
    whole Arrow batch. LUTs for all queries ride the task closure
    (nq x m x k floats — queries are few by contract, same as
    brute_force_topk's broadcast). One shuffle: the per-query top-k
    window over (query, candidate, adist).

    ``rerank=R`` (needs ``emb``) re-scores the top R approximate
    candidates per query with EXACT cosine — the standard ADC+re-rank
    deployment: PQ recall comes from the candidate pool, exactness from
    the tiny re-rank join."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    q_rows = _collect_queries(queries, q_id_col, q_vec_col, m * dsub,
                              normalize)
    luts = {qid: _adc_lut(books, qv) for qid, qv in q_rows}
    sub_idx = np.arange(m)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array([np.asarray(v, dtype=np.int64) for v in pdf["codes"]])
            ids = pdf["id"].to_numpy()
            frames = []
            for qid, lut in luts.items():
                adist = lut[sub_idx[None, :], c].sum(axis=1)
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids,
                    "adist": adist.astype(np.float64),
                }))
            yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(
        run, "query_id string, neighbor_id string, adist double"
    ).where(F.col("neighbor_id") != F.col("query_id"))
    return _adc_rank(scored, k, rerank, emb, queries,
                     id_col, vec_col, q_id_col, q_vec_col)


def _collect_queries(
    queries: DataFrame,
    q_id_col: str,
    q_vec_col: str,
    dim: int,
    normalize: bool,
) -> list[tuple[str, np.ndarray]]:
    """Shared pq_topk/ivfpq_topk query collect: validates dimensionality
    against the codebooks (a wrong-width query would be silently
    truncated/broadcast into wrong neighbors) and L2-normalizes."""
    q_rows = queries.select(
        F.col(q_id_col).cast("string").alias("qid"), F.col(q_vec_col).alias("qv")
    ).collect()
    if not q_rows:
        raise ValueError("no query vectors")
    out = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        if qv.shape != (dim,):
            raise ValueError(
                f"query dim {qv.shape} != codebook dim {dim}")
        if normalize:
            n = float(np.linalg.norm(qv))
            qv = qv / (n if n else 1.0)
        out.append((r["qid"], qv))
    return out


def _adc_lut(books: np.ndarray, qv: np.ndarray) -> np.ndarray:
    """(m, k) table of per-subspace squared distances from ``qv`` to
    every code — the ADC lookup table (shared pq_topk/ivfpq_topk)."""
    m, kk, dsub = books.shape
    lut = np.empty((m, kk), dtype=np.float64)
    for sub in range(m):
        diff = books[sub] - qv[sub * dsub:(sub + 1) * dsub][None, :]
        lut[sub] = (diff ** 2).sum(axis=1)
    return lut


def _adc_rank(
    scored: DataFrame,
    k: int,
    rerank: int | None,
    emb: DataFrame | None,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """Shared pq_topk/ivfpq_topk tail: per-query top-pool window over
    adist, then either the pure-ADC result or the exact re-rank."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    pool = rerank if rerank else k
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pool)
    )
    if not rerank:
        return top.select("query_id", "neighbor_id",
                          F.round("adist", 6).alias("adist"), "rank")
    if emb is None:
        raise ValueError("rerank needs the raw embedding table (emb=)")
    return _exact_rerank(
        top.select("query_id", "neighbor_id"), queries, emb, k,
        id_col, vec_col, q_id_col, q_vec_col,
    )


def _exact_rerank(
    cand: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """Re-score (query_id, neighbor_id) candidates with EXACT cosine and
    keep the per-query top-k — the tiny join that restores exactness on
    top of an approximate candidate pool (shared by pq_topk and
    ivfpq_topk). The candidate side is O(nq x pool); the emb join is the
    only touch of raw vectors."""
    vecs = emb.select(
        F.col(id_col).cast("string").alias("neighbor_id"),
        F.col(vec_col).alias("cv"), _norm(F.col(vec_col)).alias("cn"),
    )
    qvecs = queries.select(
        F.col(q_id_col).cast("string").alias("query_id"),
        F.col(q_vec_col).alias("qv"), _norm(F.col(q_vec_col)).alias("qn"),
    )
    exact = (
        cand.join(vecs, on="neighbor_id")
        .join(F.broadcast(qvecs), on="query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF + PQ (IVFADC — Jegou 2011 §V): the standard trillion-vector index
# layout. The coarse quantizer (ivf_centroids) prunes the SCAN to
# n_probe/n_centroids of the corpus; residual PQ codes compress the
# index payload ~32x so it fits in RAM; ADC scores only the probed
# cells; exact re-rank restores exactness on the tiny candidate pool.
# Codes are stored per (centroid) cell — partition the codes table by
# `centroid` and the probe filter prunes FILES, not just rows.
# Residuals (x - centroid) are what PQ quantizes: within a cell they
# are small and centered, so the same code budget buys far less
# quantization error than whole-vector PQ.
# ---------------------------------------------------------------------------


def _ivf_cents_np(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    # float64 of the SAME python floats ivf_topk embeds as plan
    # literals — the numpy coarse quantizer and the Spark/SQL one then
    # agree to ~1e-15, not the 1e-7 a float32 round would leave
    return np.array(ivf_centroids(dim, n_centroids, seed), dtype=np.float64)


def ivfpq_train(
    emb: DataFrame,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 16,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 7,
    cent_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Train RESIDUAL PQ codebooks for the IVFADC layout -> (m, k, dim/m).

    Same determinism contract as :func:`pq_train` (first ``sample_n``
    vectors by id, fixed rng, fixed Lloyd sweeps), but k-means runs on
    centroid residuals ``x - cents[assign(x)]`` — the distribution the
    ADC search actually quantizes. The coarse codebook itself is the
    deterministic :func:`ivf_centroids` (``dim``/``n_centroids``/
    ``cent_seed`` pin it; pass the same triple to encode and search)."""
    cents = _ivf_cents_np(dim, n_centroids, cent_seed)
    x = _collect_training_sample(emb, sample_n, m, k, id_col, vec_col,
                                 normalize, dim=dim)
    # argmax of dot == argmin L2 for unit-norm centroids + normalized x;
    # numpy argmax keeps the FIRST max — same tie rule as ivf_topk's
    # array_position-of-max
    assign = (x @ cents.T).argmax(axis=1)
    resid = x - cents[assign]
    return _train_books(resid, m, k, iters, seed)


def ivfpq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    n_centroids: int = 16,
    cent_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """-> (id, centroid int, codes array<int>): one Arrow mapInPandas
    pass — centroid assignment (argmax dot against the coarse codebook)
    + residual PQ encode. Write this out partitioned by ``centroid``:
    the search's probe filter then prunes files, which is the IVF scan
    win at 10^12 rows."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    dim = books.shape[0] * books.shape[2]
    cents = _ivf_cents_np(dim, n_centroids, cent_seed)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if x.ndim != 2 or x.shape[1] != dim:
                raise ValueError(
                    f"vector dim {x.shape[1:]} != codebook dim {dim}")
            if normalize:
                n = np.linalg.norm(x, axis=1, keepdims=True)
                x = x / np.where(n == 0, 1.0, n)
            assign = (x @ cents.T).argmax(axis=1)
            codes = _pq_codes_np(x - cents[assign], books)
            yield pd.DataFrame({
                "id": pdf["id"],
                "centroid": assign.astype(np.int32),
                "codes": [row.tolist() for row in codes.astype(np.int32)],
            })

    src = emb.select(
        F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
    )
    return src.mapInPandas(run, "id string, centroid int, codes array<int>")


def ivfpq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    n_centroids: int = 16,
    k: int = 5,
    n_probe: int = 4,
    rerank: int | None = None,
    emb: DataFrame | None = None,
    cent_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """IVFADC search over (id, centroid, codes) from :func:`ivfpq_encode`
    -> (query_id, neighbor_id, rank [, adist | cosine]).

    Per query: probe the top ``n_probe`` centroids (by dot product), and
    build one residual ADC lookup table PER PROBED CELL (the query
    residual ``q - cent`` differs per cell — that is what makes
    residual codes accurate). The union of all probed centroid ids
    becomes a plan-side ``centroid IN (...)`` filter BEFORE the Arrow
    stage, so a codes table partitioned by centroid is file-pruned to
    n_probe/n_centroids of the data; inside a batch, scoring is m table
    gathers + a sum per row, vectorized per (query, cell). LUTs ride
    the task closure (nq x n_probe x m x k floats — queries are few by
    contract). ``rerank=R`` (needs ``emb``) re-scores the top R per
    query with exact cosine, as in :func:`pq_topk`."""
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    dim = m * dsub
    cents = _ivf_cents_np(dim, n_centroids, cent_seed)
    if not 1 <= n_probe <= n_centroids:
        raise ValueError(f"n_probe={n_probe} not in [1, {n_centroids}]")
    q_rows = _collect_queries(queries, q_id_col, q_vec_col, dim, normalize)
    luts = {}  # qid -> {centroid: (m, kk) residual LUT}
    for qid, qv in q_rows:
        order = np.argsort(-(cents @ qv), kind="stable")[:n_probe]
        luts[qid] = {int(c): _adc_lut(books, qv - cents[c]) for c in order}
    probed = sorted({c for pc in luts.values() for c in pc})
    sub_idx = np.arange(m)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            cell = pdf["centroid"].to_numpy()
            c = np.array([np.asarray(v, dtype=np.int64) for v in pdf["codes"]])
            ids = pdf["id"].to_numpy()
            frames = []
            for qid, per_cell in luts.items():
                for pc, lut in per_cell.items():
                    mask = cell == pc
                    if not mask.any():
                        continue
                    adist = lut[sub_idx[None, :], c[mask]].sum(axis=1)
                    frames.append(pd.DataFrame({
                        "query_id": qid, "neighbor_id": ids[mask],
                        "adist": adist.astype(np.float64),
                    }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pruned = codes.where(F.col("centroid").isin([int(c) for c in probed]))
    scored = pruned.mapInPandas(
        run, "query_id string, neighbor_id string, adist double"
    ).where(F.col("neighbor_id") != F.col("query_id"))
    return _adc_rank(scored, k, rerank, emb, queries,
                     id_col, vec_col, q_id_col, q_vec_col)


# -- codebook persistence ----------------------------------------------------
# A PQ/IVFPQ index is only valid under the EXACT codebooks that encoded
# it (the docstrings above warn that a re-rolled codebook silently
# invalidates every stored code). Persisting the codebooks next to the
# codes table with pinned parameters makes that contract enforceable
# across runs — the same discipline as the signature store's pinned
# manifest (pipeline/incremental.py): load refuses on any mismatch
# instead of returning wrong neighbors.

_CB_PARAMS = "params.json"
_CB_BOOKS = "codebooks.npy"


def save_codebooks(
    path: str,
    codebooks: np.ndarray,
    kind: str = "pq",
    n_centroids: int | None = None,
    cent_seed: int = 7,
    normalize: bool = True,
) -> None:
    """Persist trained codebooks + pinned search parameters (driver-side
    KB artifact; write-once — refuses to clobber an existing index's
    codebooks, which stored codes may depend on)."""
    import json
    import os

    if kind not in ("pq", "ivfpq"):
        raise ValueError(f"kind must be pq|ivfpq, got {kind!r}")
    if kind == "ivfpq" and not n_centroids:
        raise ValueError("ivfpq codebooks need n_centroids")
    books = np.ascontiguousarray(codebooks, dtype=np.float32)
    if books.ndim != 3:
        raise ValueError(f"codebooks must be (m, k, dsub), got {books.shape}")
    os.makedirs(path, exist_ok=True)
    if os.path.exists(os.path.join(path, _CB_PARAMS)):
        raise FileExistsError(
            f"{path!r} already holds codebooks; stored codes may depend on "
            "them — write a NEW index directory instead of overwriting")
    m, k, dsub = books.shape
    np.save(os.path.join(path, _CB_BOOKS), books)
    params = {"kind": kind, "m": m, "k": k, "dim": m * dsub,
              "normalize": normalize}
    if kind == "ivfpq":
        params |= {"n_centroids": int(n_centroids), "cent_seed": cent_seed}
    with open(os.path.join(path, _CB_PARAMS), "w") as f:
        json.dump(params, f, indent=2)


def load_codebooks(path: str, expect_kind: str | None = None):
    """-> (codebooks, params). Refuses on missing files, array/params
    shape mismatch, or a kind mismatch (searching an ivfpq codes table
    with pq codebooks returns silently wrong neighbors — the refusal is
    the feature)."""
    import json
    import os

    pf = os.path.join(path, _CB_PARAMS)
    bf = os.path.join(path, _CB_BOOKS)
    if not (os.path.exists(pf) and os.path.exists(bf)):
        raise FileNotFoundError(f"{path!r} is not a codebook directory")
    with open(pf) as f:
        params = json.load(f)
    books = np.load(bf)
    m, k, dsub = books.shape
    if (params["m"], params["k"], params["dim"]) != (m, k, m * dsub):
        raise ValueError(
            f"codebook array {books.shape} contradicts pinned params "
            f"{params} — index directory corrupted")
    if expect_kind is not None and params["kind"] != expect_kind:
        raise ValueError(
            f"index at {path!r} is kind={params['kind']!r}, caller expects "
            f"{expect_kind!r}")
    return books, params
