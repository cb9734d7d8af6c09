"""Property-based tests (hypothesis): algebraic laws the engine's
correctness rests on, probed over randomized inputs rather than fixtures.

- codec laws: WAV round-trip is EXACT; mu-law round-trip holds the SNR
  floor the residue path depends on (>= 30 dB for non-degenerate signals)
- salted duplicate agg == naive multiset count for ANY salt fan-out
  (the explicit two-phase rewrite must be observationally invisible)
- semigroup merge laws: order/grouping/duplication of check outputs
  cannot change the merged verdict (ErrorFileData.scala:21-33 |+|)
- logical partitioning is parallelism-independent (the checkpoint
  manifest's core assumption: same key -> same partition at N and 4N)
- PSI identity/non-negativity (drift can't go negative or flag self)
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from tdr_draft_metadata_validator_spark.functions.audio_codec import (
    decode_ulaw,
    decode_wav_pcm16,
    encode_ulaw,
    encode_wav_pcm16,
    snr_db,
)
from tdr_draft_metadata_validator_spark.operators import relational as R
from tdr_draft_metadata_validator_spark.operators.merge import (
    merge_violations,
    union_checks,
)
from tdr_draft_metadata_validator_spark.operators.stats import (
    ks_from_fractions,
    psi,
)

SPARK_SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


# ---------------------------------------------------------------------------
# pure-numpy codec laws (cheap: full hypothesis example budget)
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(-32768, 32767), min_size=4, max_size=4000),
    st.sampled_from([8000, 16000, 22050, 44100]),
)
def test_wav_roundtrip_exact(samples, sr):
    x = np.asarray(samples, dtype=np.int16)
    sr2, y = decode_wav_pcm16(encode_wav_pcm16(x, sr))
    assert sr2 == sr
    assert np.array_equal(x, y)


@given(
    st.lists(st.integers(-32768, 32767), min_size=64, max_size=4000),
    st.sampled_from([8000, 16000]),
)
def test_ulaw_snr_floor(samples, sr):
    """mu-law quantization keeps SNR >= 30 dB for any signal with
    non-negligible energy — the exact bound the residue path relies on."""
    x = np.asarray(samples, dtype=np.int16)
    if float(np.dot(x.astype(np.float64), x.astype(np.float64))) < 1e8:
        return  # degenerate near-silence: SNR undefined territory
    sr2, y = decode_ulaw(encode_ulaw(x, sr))
    assert sr2 == sr
    assert y.shape == x.shape
    assert snr_db(x, y) >= 30.0


@given(st.lists(st.integers(-32768, 32767), min_size=16, max_size=1000))
def test_ulaw_requantization_stable(samples):
    """Decoding then re-encoding reproduces the same codes: the quantizer
    is idempotent after the first pass (no drift across re-encodes)."""
    x = np.asarray(samples, dtype=np.int16)
    p1 = encode_ulaw(x, 8000)
    _, y = decode_ulaw(p1)
    p2 = encode_ulaw(y, 8000)
    assert p1 == p2


# ---------------------------------------------------------------------------
# drift math laws (pure python)
# ---------------------------------------------------------------------------

probs = st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=2, max_size=12)


def _normed(ws):
    t = sum(ws)
    if t == 0:
        return [1.0 / len(ws)] * len(ws)
    return [w / t for w in ws]


@given(probs)
def test_psi_self_is_zero(ws):
    p = _normed(ws)
    assert psi(p, p) == 0.0
    assert ks_from_fractions(p, p) == 0.0


@given(probs, probs)
def test_psi_nonnegative_ks_bounded(wa, wb):
    n = min(len(wa), len(wb))
    p, q = _normed(wa[:n]), _normed(wb[:n])
    assert psi(p, q) >= -1e-9  # eps-smoothing can shave epsilon, never sign
    assert 0.0 <= ks_from_fractions(p, q) <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# Spark laws (small example budget: each example runs real jobs)
# ---------------------------------------------------------------------------

@SPARK_SETTINGS
@given(
    keys=st.lists(st.integers(0, 15), min_size=1, max_size=50),
    salt=st.sampled_from([0, 3, 16]),
)
def test_salted_duplicate_agg_equals_naive(spark, keys, salt):
    """The explicit salted two-phase aggregate must be observationally
    identical to a naive count>1 for every multiset and salt fan-out."""
    df = spark.createDataFrame([(f"k{k}",) for k in keys], "clip_id string")
    got = {
        r["asset_id"]
        for r in R.duplicate_rows(df, "clip_id", salt_buckets=salt).collect()
    }
    want = {f"k{k}" for k, c in Counter(keys).items() if c > 1}
    assert got == want


_viol = st.tuples(
    st.integers(0, 5),                      # asset index
    st.sampled_from(["enum", "range", "required", "duplicate"]),
    st.sampled_from(["sr_hz", "dur_ms", "transcript", ""]),
)


def _frame(spark, rows):
    data = [
        (
            f"a{a}", "SCHEMA_BASE", prop, key, f"msg.{key}",
            [(prop or "x", "v")],
        )
        for a, key, prop in rows
    ]
    from tdr_draft_metadata_validator_spark.models import VIOLATION_SCHEMA

    return spark.createDataFrame(data, VIOLATION_SCHEMA)


def _canon(merged):
    return sorted(
        (
            r["asset_id"],
            tuple(tuple(e) for e in r["errors"]),
            tuple(tuple(d) for d in r["data"]),
        )
        for r in merged.collect()
    )


@SPARK_SETTINGS
@given(
    a=st.lists(_viol, min_size=0, max_size=12),
    b=st.lists(_viol, min_size=0, max_size=12),
)
def test_merge_semigroup_laws(spark, a, b):
    """Commutativity + idempotence of the violation merge: check order
    cannot matter, and replaying a check's output cannot add errors."""
    fa, fb = _frame(spark, a), _frame(spark, b)
    ab = _canon(merge_violations(union_checks([fa, fb])))
    ba = _canon(merge_violations(union_checks([fb, fa])))
    assert ab == ba                       # commutative
    aa = _canon(merge_violations(union_checks([fa, fa])))
    just_a = _canon(merge_violations(fa))
    assert aa == just_a                   # idempotent (error-set union)


@SPARK_SETTINGS
@given(keys=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=40))
def test_logical_partition_parallelism_independent(spark, keys):
    """Same key -> same logical partition at ANY physical parallelism —
    the invariant that makes checkpoint manifests valid across cluster
    sizes (N and 4N executors)."""
    from pyspark.sql import functions as F

    from tdr_draft_metadata_validator_spark.plans.metrics import logical_partition

    df1 = spark.createDataFrame([(k,) for k in keys], "clip_id string").repartition(1)
    df8 = spark.createDataFrame([(k,) for k in keys], "clip_id string").repartition(8)
    lp = lambda df: dict(
        df.select("clip_id", logical_partition(F.col("clip_id"), 64).alias("p"))
        .collect()
    )
    m1, m8 = lp(df1), lp(df8)
    assert m1 == m8
    assert all(0 <= p < 64 for p in m1.values())


# ---------------------------------------------------------------------------
# connected components: star method vs an independent union-find oracle
# ---------------------------------------------------------------------------

@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1, max_size=60,
    ),
    st.booleans(),
)
def test_star_components_match_union_find(spark, edges, use_star):
    """Both CC methods must equal a pure-Python union-find ground truth
    (min-id representative) on arbitrary random graphs."""
    from tdr_draft_metadata_validator_spark.pipeline import dedup

    edges = [(f"{a:02d}", f"{b:02d}") for a, b in edges if a != b]
    if not edges:
        return

    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    truth = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    method = "star" if use_star else "minlabel"
    got = {
        r["id"]: r["component"]
        for r in dedup.near_dup_components(pairs, method=method, max_iter=40).collect()
    }
    assert got == truth


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=3000),
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from(["verbatim", "fixed", "lpc"]),
    st.sampled_from([0, 1, 2, 3]),
)
def test_flac_roundtrip_exact(samples, sr, subframe, order):
    """FLAC is lossless by construction: ANY int16 mono signal
    roundtrips bit-exact through encode_flac -> decode_flac in
    verbatim, every fixed-predictor order, and LPC (r6 — losslessness
    must hold for ANY quantized coefficient set, so arbitrary signals
    are exactly the adversarial input), across block boundaries
    (blocksize 256 forces multi-frame streams past 256 samples)."""
    from tdr_draft_metadata_validator_spark.functions.flac_codec import (
        decode_flac,
        encode_flac,
    )

    x = np.asarray(samples, dtype=np.int16)
    payload = encode_flac(x, sr, blocksize=256, subframe=subframe,
                          fixed_order=order)
    sr2, y = decode_flac(payload)
    assert sr2 == sr
    assert np.array_equal(x, y)


@given(
    st.lists(st.tuples(st.integers(-32768, 32767),
                       st.integers(-32768, 32767)),
             min_size=1, max_size=1500),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    st.sampled_from(["verbatim", "fixed", "lpc"]),
)
def test_flac_stereo_roundtrip_exact(pairs, mode, subframe):
    """r6: ANY int16 stereo signal roundtrips bit-exact through every
    channel layout x subframe type — the decorrelated layouts'
    17-bit side channel and the mid channel's dropped low bit must
    reconstruct exactly at the int16 extremes hypothesis finds."""
    from tdr_draft_metadata_validator_spark.functions.flac_codec import (
        decode_flac,
        encode_flac,
    )

    x = np.asarray(pairs, dtype=np.int16)
    payload = encode_flac(x, 16000, blocksize=256, subframe=subframe,
                          stereo_mode=mode)
    sr2, y = decode_flac(payload)
    assert sr2 == 16000
    assert y.shape == x.shape
    assert np.array_equal(x, y)


@given(st.lists(st.integers(-32768, 32767), min_size=64, max_size=500),
       st.integers(0, 60))
def test_flac_bitflip_never_silent(samples, flip_at):
    """Corrupting a byte in the frame region either still decodes to the
    EXACT original (the flip hit padding/unused coding space) or raises
    ValueError — decode_flac never silently returns wrong samples
    (CRC-8 on headers, CRC-16 on frames)."""
    from tdr_draft_metadata_validator_spark.functions.flac_codec import (
        decode_flac,
        encode_flac,
    )

    x = np.asarray(samples, dtype=np.int16)
    payload = bytearray(encode_flac(x, 16000, subframe="fixed"))
    # flip inside the frame section (after the 42-byte header+STREAMINFO)
    pos = 42 + (flip_at % max(1, len(payload) - 42))
    payload[pos] ^= 0x40
    try:
        _, y = decode_flac(bytes(payload))
    except ValueError:
        return  # detected — the expected outcome
    assert np.array_equal(x, y), "corruption neither detected nor harmless"


@given(st.integers(0, 2**31 - 1), st.sampled_from([2, 4, 8]),
       st.sampled_from([4, 8, 16]))
def test_pq_adc_lut_identity(seed, m, k):
    """The ADC decomposition law pq_topk/ivfpq_topk rely on: the
    per-subspace LUT-gathered sum equals the direct squared L2 distance
    between the query and the code's reconstruction — for ANY codebooks,
    codes and query (subspace distances are independent, so the sum
    telescopes exactly)."""
    rng = np.random.RandomState(seed)
    dsub = 4
    dim = m * dsub
    books = rng.randn(m, k, dsub).astype(np.float32)
    q = rng.randn(dim).astype(np.float32)
    codes = rng.randint(0, k, size=(16, m))
    # LUT path (what the search builds per query)
    lut = np.empty((m, k), dtype=np.float64)
    for sub in range(m):
        diff = books[sub].astype(np.float64) - q[sub * dsub:(sub + 1) * dsub]
        lut[sub] = (diff ** 2).sum(axis=1)
    adist = lut[np.arange(m)[None, :], codes].sum(axis=1)
    # direct path: reconstruct each code and measure
    recon = np.concatenate(
        [books[sub][codes[:, sub]] for sub in range(m)], axis=1
    ).astype(np.float64)
    direct = ((recon - q.astype(np.float64)) ** 2).sum(axis=1)
    np.testing.assert_allclose(adist, direct, rtol=1e-6, atol=1e-6)


@given(st.integers(0, 2**31 - 1))
def test_pq_encode_picks_nearest_code(seed):
    """_pq_codes_np optimality: per subspace, the chosen code's centroid
    is at least as close as every other centroid (argmin correctness of
    the vectorized -2x.c + ||c||^2 trick)."""
    from tdr_draft_metadata_validator_spark.pipeline.similarity import (
        _pq_codes_np,
    )

    rng = np.random.RandomState(seed)
    m, k, dsub = 4, 8, 3
    books = rng.randn(m, k, dsub).astype(np.float32)
    x = rng.randn(10, m * dsub).astype(np.float32)
    codes = _pq_codes_np(x, books)
    for sub in range(m):
        xs = x[:, sub * dsub:(sub + 1) * dsub].astype(np.float64)
        d = ((xs[:, None, :] - books[sub][None].astype(np.float64)) ** 2).sum(-1)
        chosen = d[np.arange(10), codes[:, sub]]
        assert (chosen <= d.min(axis=1) + 1e-9).all()
