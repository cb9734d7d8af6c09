import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tdr_draft_metadata_validator_spark.pipeline import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _toy_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),     # near dup
        (4, "completely unrelated text about spark engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_duplicates(spark):
    d = _toy_docs(spark)
    groups = dedup.exact_duplicates(d).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == ["1", "2"]
    kept = dedup.drop_exact_duplicates(d)
    assert kept.count() == 4
    assert kept.where("doc_id = 2").count() == 0  # min id wins


def test_jaccard_pairs(spark):
    d = _toy_docs(spark)
    # doc1 vs doc3: 4 common of 10 distinct trigrams -> jaccard = 0.4
    pairs = dedup.jaccard_pairs(d, threshold=0.35, n=3).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {("1", "2"), ("1", "3"), ("2", "3")}
    exact = [p for p in pairs if p["id_b"] == "2"][0]
    assert exact["jaccard"] == 1.0


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark):
    d = _toy_docs(spark)
    cand = dedup.minhash_lsh_candidates(d, num_hashes=32, bands=16)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    # identical docs must collide on every band
    assert ("1", "2") in got
    full = [r for r in cand.collect() if (r["id_a"], r["id_b"]) == ("1", "2")][0]
    assert full["n_bands_matched"] == 16


def test_minhash_signature_deterministic(spark):
    d = _toy_docs(spark)
    s1 = {r["id"]: r["sig"] for r in dedup.minhash_signatures(d, 8).collect()}
    s2 = {r["id"]: r["sig"] for r in dedup.minhash_signatures(d, 8).collect()}
    assert s1 == s2
    assert s1["1"] == s1["2"]  # identical text -> identical signature


def test_simhash_near_pairs(spark):
    d = _toy_docs(spark)
    fps = {r["id"]: r["simhash"] for r in dedup.simhash(d).collect()}
    assert fps["1"] == fps["2"]
    pairs = dedup.simhash_near_pairs(d, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[("1", "2")] == 0


def test_embedding_near_dups_and_lsh_agree(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    exact = dedup.embedding_near_dups(e, threshold=0.95)
    assert {(r["id_a"], r["id_b"]) for r in exact.collect()} == {("1", "2")}
    approx = similarity.lsh_near_dups(e, threshold=0.95, n_planes=6, bands=3, dim=4)
    assert {(r["id_a"], r["id_b"]) for r in approx.collect()} == {("1", "2")}


def test_brute_force_topk(spark, emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = similarity.brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 3 * 5
    for qid in ("0", "1", "2"):
        ranks = sorted(r["rank"] for r in rows if r["query_id"] == qid)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["cosine"] for r in sorted(
            (x for x in rows if x["query_id"] == qid), key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)


def test_text_features(spark, docs):
    out = text.quality_score(docs).limit(50).collect()
    for r in out:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_tokens"] >= 0
        assert 0.0 <= r["q_punct_ratio"] <= 1.0


def test_detect_language(spark):
    rows = [
        (1, "the cat and the dog went to the market and that was that"),
        (2, "der hund und die katze sind nicht mit dem zug gefahren"),
        (3, "le chat et le chien sont dans la maison et pas dehors"),
        (4, "xyzzy plugh qwerty"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["lang_detected"] for r in text.fingerprint_docs(d).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "doc_id int, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint_docs(d).collect()}
    assert fps[1] == fps[2] != fps[3]


def _test_img(i, w=12, h=9):
    x = np.arange(w * h * 3, dtype=np.uint32).reshape(h, w, 3)
    return ((x * (i + 3) + i * 17) % 256).astype(np.uint8)


def test_image_codec_roundtrips():
    """PPM and BMP decode are REAL: byte-level round trips are exact."""
    from tdr_draft_metadata_validator_spark.functions.image_codec import (
        decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm,
    )

    img = _test_img(1)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # sniffing dispatch + corruption surfaces as ValueError, never a crash
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    for bad in (b"", b"P6\n", b"BM123", b"\x89PNG....", b"garbage"):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_multimodal_image_features(spark):
    """Feature extraction over REAL pixels (PPM + BMP payloads), bad
    payloads -> decode_ok=False rows."""
    from tdr_draft_metadata_validator_spark.functions.image_codec import (
        encode_bmp, encode_ppm, luminance_feature,
    )

    rows = [(f"p{i}", encode_ppm(_test_img(i))) for i in range(3)]
    rows += [(f"b{i}", encode_bmp(_test_img(i))) for i in range(2)]
    rows += [("bad", b"not an image")]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    out = multimodal.image_features(media, feature_dim=16).collect()
    ok = {r["media_id"]: r for r in out if r["decode_ok"]}
    assert len(ok) == 5
    assert all(len(r["feature"]) == 16 for r in ok.values())
    assert ok["p0"]["width"] == 12 and ok["p0"]["height"] == 9
    # the feature is the real luminance grid, not a hash artifact
    want = [float(x) for x in luminance_feature(_test_img(0), 4)]
    got = [pytest.approx(x, abs=1e-6) for x in want]
    assert list(ok["p0"]["feature"]) == got
    # same pixels via PPM and BMP -> same feature (decoders agree)
    assert list(ok["p0"]["feature"]) == [
        pytest.approx(x, abs=1e-6) for x in ok["b0"]["feature"]
    ]
    bad = [r for r in out if not r["decode_ok"]]
    assert len(bad) == 1 and bad[0]["media_id"] == "bad"


def test_multimodal_resize(spark):
    """decode -> nearest resize -> re-encode round trip on real pixels."""
    from tdr_draft_metadata_validator_spark.functions.image_codec import (
        decode_ppm, encode_ppm, resize_nearest,
    )

    img = _test_img(4, w=16, h=8)
    media = spark.createDataFrame(
        [("a", encode_ppm(img)), ("bad", b"nope")], "media_id string, payload binary"
    )
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    assert out["bad"]["decode_ok"] is False and out["bad"]["payload"] is None
    resized = decode_ppm(bytes(out["a"]["payload"]))
    assert resized.shape == (4, 8, 3)
    assert np.array_equal(resized, resize_nearest(img, 8, 4))


def test_multimodal_frame_sampling_chunk_fallback(spark):
    """Opaque payloads + raw_chunk_fallback: the round-2 pseudo-frame
    plumbing (1:N cardinality) still works for non-AVI bytes."""
    media = spark.createDataFrame(
        [("v1", bytes(256 * 30)), ("v2", bytes(256 * 5))],
        "media_id string, payload binary",
    )
    frames = multimodal.sample_frames(media, every_n=10,
                                      raw_chunk_fallback=True).collect()
    v1 = [r["frame_idx"] for r in frames if r["media_id"] == "v1"]
    assert v1 == [0, 10, 20]
    assert all(len(r["frame"]) <= 256 for r in frames)


def test_video_codec_roundtrip():
    """encode_avi -> decode_avi is pixel-exact (uncompressed DIB), incl.
    row padding (odd widths) and fps; corruption/compressed codecs raise
    ValueError (decode_ok=False policy, never a crash)."""
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.functions.video_codec import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (5, 7, 3), dtype=np.uint8) for _ in range(4)]
    payload = encode_avi(frames, fps=12)
    fps, decoded = decode_avi(payload)
    assert fps == 12 and len(decoded) == 4
    for a, b in zip(frames, decoded):
        assert np.array_equal(a, b)

    with _pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00AVI garbage")
    with _pytest.raises(ValueError):
        decode_avi(payload[:40])  # truncated
    with _pytest.raises(ValueError):
        decode_avi(b"not even riff")


def test_multimodal_frame_sampling_real_avi(spark):
    """REAL video path: synthetic AVI -> sample every 2nd frame -> PPM
    frames whose PIXELS match the encoded source frames; non-AVI payloads
    in the same batch are skipped (decode_ok policy)."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.image_codec import decode_ppm
    from tdr_draft_metadata_validator_spark.functions.video_codec import encode_avi

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (4, 6, 3), dtype=np.uint8) for _ in range(5)]
    media = spark.createDataFrame(
        [("vid", encode_avi(frames, fps=10)), ("junk", b"\x00" * 512)],
        "media_id string, payload binary",
    )
    out = multimodal.sample_frames(media, every_n=2).collect()
    got = {r["frame_idx"]: r["frame"] for r in out if r["media_id"] == "vid"}
    assert sorted(got) == [0, 2, 4]
    for idx, ppm in got.items():
        assert np.array_equal(decode_ppm(bytes(ppm)), frames[idx])
    assert not [r for r in out if r["media_id"] == "junk"]

    # sampled frames feed the image pipeline directly
    fdf = spark.createDataFrame(
        [(f"vid-{r['frame_idx']}", bytes(r["frame"])) for r in out],
        "media_id string, payload binary",
    )
    feats = multimodal.image_features(fdf, feature_dim=4).collect()
    assert all(f["decode_ok"] for f in feats)


def test_jaccard_df_cap_prunes_hot_shingles(spark):
    """df_cap skew guard: one stopword token shared by every doc would
    emit O(d^2) candidate pairs; capping document frequency drops those
    candidates while the >=threshold near-dup set is unchanged (the
    surviving pairs' jaccard is conservative, never inflated)."""
    rows = [
        (1, "alpha beta gamma delta eps common"),
        (2, "alpha beta gamma delta eps zeta common"),
    ] + [(i, f"uniq{i}a uniq{i}b uniq{i}c common") for i in range(3, 21)]
    d = spark.createDataFrame(rows, "doc_id int, text string")

    # candidate volume: uncapped, every pair meets via 'common' (C(20,2))
    all_pairs = dedup.jaccard_pairs(d, threshold=0.0, n=1)
    capped_pairs = dedup.jaccard_pairs(d, threshold=0.0, n=1, df_cap=5)
    n_all, n_capped = all_pairs.count(), capped_pairs.count()
    assert n_all == 190
    assert n_capped == 1  # only (1,2) share a sub-cap shingle

    # the >=threshold result set is unchanged by the cap
    hot = dedup.jaccard_pairs(d, threshold=0.6, n=1)
    cold = dedup.jaccard_pairs(d, threshold=0.6, n=1, df_cap=5)
    ids = lambda df: {(r["id_a"], r["id_b"]) for r in df.collect()}
    assert ids(hot) == ids(cold) == {("1", "2")}
    # conservative scoring: capped jaccard <= exact jaccard
    j_hot = hot.collect()[0]["jaccard"]
    j_cold = cold.collect()[0]["jaccard"]
    assert j_cold <= j_hot


def test_ivf_topk_shape_and_recall(spark, emb):
    """IVF approximate top-k: correct shape, ranks contiguous, and at
    n_probe = n_centroids (exhaustive probing) it EQUALS brute force —
    the approximation is exactly the candidate restriction."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = e.where(F.col("vec_id") < 3)
    approx = similarity.ivf_topk(e, queries, k=5, n_centroids=8, n_probe=2, dim=64)
    rows = approx.collect()
    for qid in ("0", "1", "2"):
        ranks = sorted(r["rank"] for r in rows if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))  # contiguous from 1
        assert len(ranks) <= 5

    exhaustive = similarity.ivf_topk(e, queries, k=5, n_centroids=8, n_probe=8, dim=64)
    brute = similarity.brute_force_topk(e, queries, k=5)
    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in df.collect()
    )
    assert key(exhaustive) == key(brute)


def test_near_dup_components_and_drop(spark):
    """Connected components over candidate pairs: a chain a-b-c collapses
    to one component even though (a,c) was never a pair; singletons and
    untouched docs survive drop_near_duplicates."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    comp = {r["id"]: r["component"] for r in dedup.near_dup_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in ["a", "b", "c", "x", "y", "z"]],
        "doc_id string, text string",
    )
    kept = {r["doc_id"] for r in dedup.drop_near_duplicates(docs, pairs).collect()}
    assert kept == {"a", "x", "z"}  # one rep per component + untouched z


def test_near_dup_components_long_chain_converges(spark):
    """Propagation needs diameter rounds: a 12-node path still converges
    to a single min-labeled component."""
    n = 12
    pairs = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    comp = {r["id"]: r["component"] for r in dedup.near_dup_components(pairs).collect()}
    assert set(comp.values()) == {"n00"}
    assert len(comp) == n


def test_contamination_asymmetric_containment(spark):
    """Eval doc fully inside a train doc -> overlap 1.0 even though the
    train doc is much bigger (asymmetric: denominator is the EVAL set)."""
    train = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),       # 4/4 contained -> 1.0
         (2, "alpha beta nu xi"),             # 2/4 -> 0.5
         (3, "mu nu xi omicron")],            # 0 shared -> no row
        "doc_id int, text string",
    )
    got = {(r["eval_id"], r["train_id"]): r["overlap"]
           for r in dedup.contamination(train, ev, threshold=0.5, n=1).collect()}
    assert got == {("1", "100"): 1.0, ("2", "100"): 0.5}


def test_hash_split_deterministic_and_proportional(spark, docs):
    out1 = {r["doc_id"]: r["split"] for r in text.hash_split(docs).collect()}
    out2 = {r["doc_id"]: r["split"] for r in text.hash_split(docs).collect()}
    assert out1 == out2  # pure function of the key
    from collections import Counter
    c = Counter(out1.values())
    n = sum(c.values())
    assert set(c) <= {"train", "val", "test"}
    assert 0.8 <= c["train"] / n <= 0.97  # ~0.9 +- sampling noise at n=500
    # repartitioning cannot move a doc between splits
    out3 = {r["doc_id"]: r["split"]
            for r in text.hash_split(docs.repartition(13)).collect()}
    assert out3 == out1


def test_hash_lane_modes_equivalent_verified_sets(spark, docs):
    """Production (xxhash64) vs oracle (md5) lanes: the hash family feeds
    candidate GENERATION only — after exact verification both modes must
    recover the same near-dup sets at the tested thresholds (judge r2
    task 1)."""
    d = docs.where(F.col("doc_id") < 150)

    def verified(lane):
        cand = dedup.minhash_lsh_candidates(d, num_hashes=32, bands=16, n=1,
                                            lane=lane)
        # verify candidates with exact token-set jaccard >= 0.9
        toks = d.select(
            F.col("doc_id").cast("string").alias("id"),
            F.array_distinct(F.split(dedup.normalize_text(F.col("text")), " ")).alias("t"),
        )
        a = toks.select(F.col("id").alias("id_a"), F.col("t").alias("ta"))
        b = toks.select(F.col("id").alias("id_b"), F.col("t").alias("tb"))
        j = (
            cand.join(a, "id_a").join(b, "id_b")
            .withColumn("common", F.size(F.array_intersect("ta", "tb")))
            .withColumn(
                "jac",
                F.col("common")
                / (F.size("ta") + F.size("tb") - F.col("common")),
            )
            .where(F.col("jac") >= 0.9)
        )
        return {(r["id_a"], r["id_b"]) for r in j.collect()}

    md5_set = verified("md5")
    xx_set = verified("xxhash64")
    assert md5_set == xx_set
    # identical docs agree on EVERY band under any hash family, so exact
    # dups are guaranteed present in both candidate sets
    dups = {
        tuple(sorted(g["doc_ids"][:2]))
        for g in dedup.exact_duplicates(d).collect()
    }
    for pair in dups:
        assert pair in md5_set and pair in xx_set


def test_simhash_lane_modes_agree_on_exact_dups(spark):
    """Identical texts hash to the SAME simhash under either lane family
    (hamming 0), so the verified near-pair (1,2) appears in both modes."""
    d = _toy_docs(spark)
    for lane in ("md5", "xxhash64"):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(d, max_hamming=0, lane=lane).collect()
        }
        assert pairs.get(("1", "2")) == 0


def test_hash_split_xxhash_lane_proportional_and_stable(spark, docs):
    """Production lane: same invariants as the md5 lane — deterministic
    across repartitioning, fractions near the requested weights."""
    out = text.hash_split(docs, lane="xxhash64").select("doc_id", "split")
    again = text.hash_split(docs.repartition(7), lane="xxhash64").select("doc_id", "split")
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    n = out.count()
    fr = {r["split"]: r["n"] / n for r in
          out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(fr.get("train", 0) - 0.9) < 0.05


def test_star_components_match_minlabel_and_bound_rounds(spark):
    """Large-star/small-star (Kiveris et al. 2014) returns the SAME
    components as min-label propagation and converges in FEWER rounds on
    a long chain (judge r2 task 2): diameter-15 path -> min-label needs
    diameter+1 rounds, star O(log^2 n)."""
    rows = [(f"{i:03d}", f"{i+1:03d}") for i in range(15)] + [
        ("900", "901"), ("902", "903")
    ]
    pairs = spark.createDataFrame(rows, "id_a string, id_b string")
    r_min, r_star = [], []
    ml = {
        (r["id"], r["component"])
        for r in dedup.near_dup_components(
            pairs, max_iter=40, method="minlabel", rounds_out=r_min
        ).collect()
    }
    st = {
        (r["id"], r["component"])
        for r in dedup.near_dup_components(
            pairs, method="star", max_iter=40, rounds_out=r_star
        ).collect()
    }
    assert ml == st
    assert ("015", "000") in st  # chain collapses to min id
    assert r_star[0] < r_min[0]
    assert r_star[0] <= 6  # log-ish, not diameter-ish

    # random graph: methods agree on every node's component
    import random

    random.seed(5)
    edges = [(str(random.randrange(60)), str(random.randrange(60)))
             for _ in range(80)]
    p2 = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a string, id_b string"
    )
    assert {
        tuple(r) for r in dedup.near_dup_components(p2, max_iter=40).collect()
    } == {
        tuple(r) for r in dedup.near_dup_components_star(p2, max_iter=40).collect()
    }


def test_minlabel_fused_blocks_match_per_round_execution(spark):
    """r7: in the small-graph regime min-label rounds run in fused
    blocks (up to _MINLABEL_FUSE rounds of lineage per materialized
    job). Labels must be identical to per-round execution (min-label is
    idempotent past the fixpoint), the non-convergence refusal must
    still fire on the true round budget, and the reported round count
    stays within fuse-1 of the unfused count."""
    import random

    deep = spark.createDataFrame(
        [(f"{i:03d}", f"{i+1:03d}") for i in range(30)],
        "id_a string, id_b string",
    )
    random.seed(7)
    rand = spark.createDataFrame(
        [(str(random.randrange(40)), str(random.randrange(40)))
         for _ in range(60)],
        "id_a string, id_b string",
    ).where(F.col("id_a") != F.col("id_b"))

    saved = dedup._MINLABEL_FUSE
    try:
        for pairs in (deep, rand):
            r_f, r_u = [], []
            dedup._MINLABEL_FUSE = 8
            fused = {
                tuple(r) for r in dedup.near_dup_components(
                    pairs, max_iter=60, method="minlabel", rounds_out=r_f
                ).collect()
            }
            dedup._MINLABEL_FUSE = 1
            unfused = {
                tuple(r) for r in dedup.near_dup_components(
                    pairs, max_iter=60, method="minlabel", rounds_out=r_u
                ).collect()
            }
            assert fused == unfused
            assert r_u[0] <= r_f[0] < r_u[0] + 8
        # refusal: diameter 30 > max_iter 10, fused or not
        dedup._MINLABEL_FUSE = 8
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.near_dup_components(
                deep, max_iter=10, method="minlabel"
            ).collect()
    finally:
        dedup._MINLABEL_FUSE = saved


def test_auto_cc_dispatch_identical_components_both_regimes(spark):
    """Judge r3 task 5: method='auto' probes with min-label and switches
    to star only when the probe doesn't converge. Deep chain (diameter
    80 > probe): auto == star == minlabel(max_iter=100), and auto never
    pays O(diameter) rounds. Shallow graph: auto stays on min-label
    (round count <= probe budget) with identical components."""
    # deep: one 81-node chain
    deep = spark.createDataFrame(
        [(f"{i:03d}", f"{i+1:03d}") for i in range(80)],
        "id_a string, id_b string",
    )
    r_auto: list = []
    auto = {
        tuple(r)
        for r in dedup.near_dup_components(
            deep, max_iter=40, rounds_out=r_auto
        ).collect()
    }
    slow = {
        tuple(r)
        for r in dedup.near_dup_components(
            deep, max_iter=100, method="minlabel"
        ).collect()
    }
    star = {
        tuple(r)
        for r in dedup.near_dup_components(deep, max_iter=40, method="star").collect()
    }
    assert auto == slow == star
    assert all(c == "000" for _i, c in auto)  # one component, min id
    assert r_auto[0] <= 12  # star rounds, not the 81 min-label would need

    # shallow: triangles -> auto converges inside the probe on min-label
    shallow = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    r_sh: list = []
    sh = {
        tuple(r)
        for r in dedup.near_dup_components(shallow, rounds_out=r_sh).collect()
    }
    assert sh == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}
    assert r_sh[0] <= 6  # stayed on the min-label probe; no star switch


def test_ivf_broadcast_codebook_matches_literal_and_bounds_plan(spark, emb):
    """Judge r2 task 6: at production K the codebook ships as a broadcast
    array column (transform/aggregate/zip_with dots), not plan literals.
    Same results as literal mode at oracle scale; bounded plan size at
    256 centroids x 256 dims where literals would be ~65k expression
    terms per projection."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = e.where(F.col("vec_id") < 3)
    lit_out = sorted(
        tuple(r) for r in similarity.ivf_topk(
            e, q, k=5, n_centroids=16, n_probe=4, dim=64, codebook="literal"
        ).collect()
    )
    bc_out = sorted(
        tuple(r) for r in similarity.ivf_topk(
            e, q, k=5, n_centroids=16, n_probe=4, dim=64, codebook="broadcast"
        ).collect()
    )
    assert lit_out == bc_out
    # r7: the numpy fast path (auto's pick for array<double>) must match
    # the literal plan bit-for-bit — left-assoc folds, same tie rules
    np_out = sorted(
        tuple(r) for r in similarity.ivf_topk(
            e, q, k=5, n_centroids=16, n_probe=4, dim=64, codebook="numpy"
        ).collect()
    )
    assert lit_out == np_out
    # auto on array<double> -> numpy: codebook rides the task closure,
    # plan stays O(1) in K x dim at any size
    big = similarity.ivf_topk(
        e.limit(50), q, k=3, n_centroids=256, n_probe=4, dim=64,
        codebook="auto",
    )
    plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 120_000
    assert "cosine_raw" in plan  # the numpy scoring pass
    assert big.count() >= 0  # executes
    # broadcast mode stays available for non-double inputs / explicit
    # request: 256*64 = 16384 terms must NOT be inlined
    big_bc = similarity.ivf_topk(
        e.limit(50), q, k=3, n_centroids=256, n_probe=4, dim=64,
        codebook="broadcast",
    )
    plan_bc = big_bc._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan_bc) < 120_000
    assert "__cb" in plan_bc
    assert big_bc.count() >= 0

    # plan-size assertion at 256x256 (the judge's stated size): building
    # the broadcast plan is cheap and bounded; a literal plan would embed
    # 65,536 coefficient literals PER projection
    import numpy as np

    rng = np.random.RandomState(3)
    wide = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(256)]) for i in range(20)],
        "vec_id int, embedding array<double>",
    )
    wq = wide.where(F.col("vec_id") < 2)
    out = similarity.ivf_topk(
        wide, wq, k=3, n_centroids=256, n_probe=2, dim=256, codebook="auto"
    )
    plan256 = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan256) < 120_000
    assert out.count() >= 0


def test_lsh_broadcast_planes_match_literal(spark, emb):
    """planes_mode='broadcast' (O(1) plan size past the codegen limit)
    produces the SAME buckets and near-dup pairs as literal mode."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    lit_pairs = sorted(
        tuple(r) for r in similarity.lsh_near_dups(
            e, threshold=0.3, n_planes=9, bands=3, dim=64, planes_mode="literal"
        ).collect()
    )
    bc_pairs = sorted(
        tuple(r) for r in similarity.lsh_near_dups(
            e, threshold=0.3, n_planes=9, bands=3, dim=64, planes_mode="broadcast"
        ).collect()
    )
    assert lit_pairs == bc_pairs and lit_pairs
    # r7: the numpy signature pass (auto's pick for array<double>) must
    # produce the same pairs bit-for-bit
    np_pairs = sorted(
        tuple(r) for r in similarity.lsh_near_dups(
            e, threshold=0.3, n_planes=9, bands=3, dim=64, planes_mode="numpy"
        ).collect()
    )
    assert np_pairs == lit_pairs
    # auto on array<double> -> numpy: plan stays bounded at any size
    big = similarity.lsh_buckets(e.limit(20), n_planes=128, bands=8, dim=64)
    plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 120_000
    # broadcast mode stays available on explicit request, plan bounded
    big_bc = similarity.lsh_buckets(e.limit(20), n_planes=128, bands=8,
                                    dim=64, planes_mode="broadcast")
    plan_bc = big_bc._jdf.queryExecution().optimizedPlan().toString()
    assert "__pl" in plan_bc and len(plan_bc) < 120_000


def test_redact_pii_and_extract_domains(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.com or call +1 555-123-4567 now"),
        (2, "server at 10.0.42.7 hosts https://Docs.Example.org/a and http://cdn.net:8080/x"),
        (3, "nothing sensitive here"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    red = {r["doc_id"]: r for r in text.redact_pii(d).collect()}
    assert red[1]["n_email"] == 1 and red[1]["n_phone"] == 1
    assert "<EMAIL>" in red[1]["text_redacted"] and "<PHONE>" in red[1]["text_redacted"]
    assert "bob.smith" not in red[1]["text_redacted"]
    assert red[2]["n_ipv4"] == 1 and "<IPV4>" in red[2]["text_redacted"]
    assert red[3]["text_redacted"] == rows[2][1]

    doms = {(r["id"], r["domain"]) for r in text.extract_domains(d).collect()}
    assert doms == {("2", "docs.example.org"), ("2", "cdn.net")}


def test_production_overrides_contract(spark):
    """Every production override shadows a real queries() entry and runs
    (bench contract): same key set subset, callable, non-failing plan."""
    import __spark_entry__ as e

    qs, po = e.queries(), e.production_overrides()
    assert set(po) <= set(qs)
    for name, fn in po.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_pack_sequences_budget_and_stability(spark, docs):
    """Contiguous first-fit packing: within every (group, bin) the tokens
    before the last doc fit the budget (overflow <= one doc), bins are
    dense from 0 per group, and assignment is repartition-invariant."""
    budget = 200
    out = text.pack_sequences(docs, budget_tokens=budget, n_groups=8)
    again = text.pack_sequences(docs.repartition(13), budget_tokens=budget, n_groups=8)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0

    rows = out.collect()
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r["group"], r["bin"]), []).append(r)
    for (_g, _b), members in by_bin.items():
        members.sort(key=lambda r: r["id"])
        total = sum(r["n_tokens"] for r in members)
        # all but the overflow doc fit the budget
        assert total - members[-1]["n_tokens"] < budget
    # bins dense per group
    for g in {r["group"] for r in rows}:
        bins = sorted({r["bin"] for r in rows if r["group"] == g})
        assert bins == list(range(len(bins)))

    # docs LONGER than the budget count as one budget: bins stay dense
    big = spark.createDataFrame(
        [(1, "w " * 50), (2, "x " * 600), (3, "y " * 50), (4, "z " * 50)],
        "doc_id int, text string",
    )
    out2 = text.pack_sequences(big, budget_tokens=100, n_groups=1).collect()
    bins2 = sorted({r["bin"] for r in out2})
    assert bins2 == list(range(len(bins2)))
    oversized = [r for r in out2 if r["id"] == "2"][0]
    assert oversized["n_tokens"] == 600  # true count reported, clamp is packing-only


def test_stratified_sample_deterministic_and_proportional(spark, docs):
    """Per-stratum fractions hit within tolerance; the sample is a pure
    function of the key (stable under repartitioning); absent strata
    fall back to default_fraction=0."""
    labeled = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    fr = {"en": 0.5, "de": 0.1}
    s1 = text.stratified_sample(labeled, fr, "lang")
    s2 = text.stratified_sample(labeled.repartition(11), fr, "lang")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    tot = {r["lang"]: r["n"] for r in labeled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(got["en"] / tot["en"] - 0.5) < 0.1
    assert abs(got["de"] / tot["de"] - 0.1) < 0.06
    # stratum not in fractions -> dropped entirely (default 0)
    other = labeled.withColumn("lang", F.lit("fr"))
    assert text.stratified_sample(other, fr, "lang").count() == 0


def test_audio_quality_features(spark):
    """Known signals -> known features: a -9 dBFS sine has the analytic
    RMS and zcr ~= 2f/sr; rails-clipped square -> clip_ratio ~1; silence
    -> silence_ratio 1 and -inf RMS; junk bytes -> decode_ok=False."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import encode_wav_pcm16
    from tdr_draft_metadata_validator_spark.pipeline.audio_features import (
        audio_quality_features,
    )

    sr = 16000
    t = np.arange(sr)  # 1 s
    sine = (16384 * np.sin(2 * np.pi * 1000 * t / sr)).astype(np.int16)
    square = np.where(np.sin(2 * np.pi * 100 * t / sr) >= 0, 32767, -32767).astype(np.int16)
    silence = np.zeros(sr, dtype=np.int16)
    rows = [
        ("sine", encode_wav_pcm16(sine, sr), "pcm_s16le"),
        ("square", encode_wav_pcm16(square, sr), "pcm_s16le"),
        ("silence", encode_wav_pcm16(silence, sr), "pcm_s16le"),
        ("junk", b"\x01\x02\x03", "pcm_s16le"),
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r for r in audio_quality_features(clips).collect()}

    s = got["sine"]
    assert s["decode_ok"] and abs(s["dur_s"] - 1.0) < 1e-9
    # RMS of A*sin = A/sqrt(2): 20*log10(16384/sqrt(2)/32768) ~= -9.03 dB
    assert abs(s["rms_db"] - (-9.03)) < 0.1
    assert abs(s["zcr"] - 2 * 1000 / sr) < 0.01
    assert s["clip_ratio"] == 0.0

    q = got["square"]
    assert q["clip_ratio"] > 0.99 and q["silence_ratio"] == 0.0

    z = got["silence"]
    assert z["silence_ratio"] == 1.0 and z["rms_db"] == float("-inf")

    assert got["junk"]["decode_ok"] is False and got["junk"]["rms_db"] is None


def test_prepare_training_corpus_end_to_end(spark):
    """The full LLM-corpus recipe composes: junk filtered, PII scrubbed,
    exact + near dups collapsed to one representative, contaminated doc
    dropped, every survivor split + packed."""
    from pyspark.sql import functions as F

    from tdr_draft_metadata_validator_spark.pipeline.recipes import (
        CorpusPrepConfig,
        prepare_training_corpus,
    )

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "under the old oak tree near the river all afternoon long")
    rows = [
        (1, base),
        (2, base),                                     # exact dup of 1
        (3, base.replace("lazy", "sleepy")),           # near dup of 1
        (4, "completely different report about spark shuffle tuning and "
            "partition sizing for large scale joins in production systems"),
        (5, "!!! ??? ,,, ;;;"),                        # junk -> quality filter
        (6, "contact me at alice@example.com about the quick brown fox "
            "jumps over the lazy dog and then naps under the old oak tree "
            "near the river"),                          # PII + near dup of 1
        (7, "an entirely separate essay on mu law companding and audio "
            "codecs with sample rates and bit depths discussed at length"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # eval doc heavily overlapping doc 7 -> decontamination drops 7
    ev = spark.createDataFrame(
        [(100, "an entirely separate essay on mu law companding and audio "
               "codecs with sample rates and bit depths")],
        "doc_id int, text string",
    )
    cfg = CorpusPrepConfig(
        jaccard_threshold=0.5, minhash_hashes=16, minhash_bands=8,
        shingle_n=1, pack_budget_tokens=30, pack_groups=2,
    )
    out = prepare_training_corpus(docs, ev, cfg).collect()
    by_id = {r["id"]: r for r in out}

    # junk (5) gone; contaminated (7) gone; of {1,2,3,6} only min id 1 kept
    assert set(by_id) == {"1", "4"}
    assert "<EMAIL>" not in by_id["1"]["text_redacted"]  # doc 6 dropped, 1 clean
    assert by_id["1"]["split"] in ("train", "val", "test")
    assert by_id["1"]["bin"] >= 0 and by_id["1"]["n_tokens"] > 0

    # PII scrub visible when the PII doc survives on its own
    solo = prepare_training_corpus(
        docs.where(F.col("doc_id").isin(4, 6)), None, cfg
    ).collect()
    solo_by_id = {r["id"]: r for r in solo}
    assert "<EMAIL>" in solo_by_id["6"]["text_redacted"]
    assert "alice@example.com" not in solo_by_id["6"]["text_redacted"]


def test_recipe_bins_never_mix_splits(spark):
    """Judge r3 task 1 (split/bin purity): every (group, bin) of the
    packed corpus contains exactly ONE split value — a bin is a training
    batch, so a bin straddling train/test would leak eval data. Uses
    enough docs that train/val/test all materialize and a tiny budget so
    bins chain several docs each (the mixing opportunity is real)."""
    from pyspark.sql import functions as F

    from tdr_draft_metadata_validator_spark.pipeline.recipes import (
        CorpusPrepConfig,
        prepare_training_corpus,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = [
        (i, f"document number {i} talks about {words[i % 20]} and "
            f"{words[(i * 7) % 20]} at length with plenty of the usual "
            f"filler words in the middle of the sentence")
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    cfg = CorpusPrepConfig(
        min_quality=0.0, pack_budget_tokens=40, pack_groups=2,
        split_weights={"train": 0.6, "val": 0.2, "test": 0.2},
    )
    out = prepare_training_corpus(docs, None, cfg)
    assert out.select("split").distinct().count() == 3  # all splits present
    mixed = (
        out.groupBy("group", "bin")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
    )
    assert mixed.count() == 0
    # and bins still chain multiple docs (purity wasn't bought by
    # one-doc-per-bin degeneration)
    multi = (
        out.groupBy("split", "group", "bin").count().where(F.col("count") > 1)
    )
    assert multi.count() > 0
    # bpe budget unit flows through the recipe
    cfg_bpe = CorpusPrepConfig(
        min_quality=0.0, pack_budget_tokens=120, pack_groups=2,
        pack_token_unit="bpe",
    )
    bpe_out = prepare_training_corpus(docs.where(F.col("doc_id") < 20), None, cfg_bpe)
    ws_tok = {r["id"]: r["n_tokens"] for r in out.where(F.col("id").cast("int") < 20).collect()}
    bpe_tok = {r["id"]: r["n_tokens"] for r in bpe_out.collect()}
    assert all(bpe_tok[i] > ws_tok[i] for i in bpe_tok)  # pieces > words here


def test_video_decode_nested_list_bomb_raises_valueerror():
    """A crafted payload of thousands of nested LIST chunks must raise
    ValueError (decode_ok policy), not RecursionError (code-review r3)."""
    import struct

    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.functions.video_codec import decode_avi

    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = struct.pack("<4sI", b"LIST", len(inner) + 4) + b"xxxx" + inner
    payload = struct.pack("<4sI", b"RIFF", len(inner) + 4) + b"AVI " + inner
    with _pytest.raises(ValueError):
        decode_avi(payload)


def test_audio_zero_sample_rate_is_decode_failure(spark):
    """A WAV whose fmt chunk declares sr=0 must surface decode_ok=False,
    never ZeroDivisionError aborting the task (code-review r3)."""
    import numpy as np
    import struct

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_features import (
        audio_quality_features,
    )

    good = encode_wav_pcm16(np.zeros(16, dtype=np.int16), 16000)
    # patch the fmt chunk's sample-rate field (offset 24 in the canonical
    # RIFF|fmt |data layout our encoder emits) to 0
    bad = bytearray(good)
    struct.pack_into("<I", bad, 24, 0)
    clips = spark.createDataFrame(
        [("z", bytes(bad), "pcm_s16le")], "clip_id string, bytes binary, codec string"
    )
    row = audio_quality_features(clips).collect()[0]
    assert row["decode_ok"] is False


def test_audio_envelope_near_dups(spark):
    """Audio near-dup: the SAME recording re-encoded lossily (mu-law) and
    gain-adjusted fingerprints within a small Hamming radius of the
    original; different program material does not. Exact dups are
    hamming 0."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        encode_ulaw,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_features import (
        audio_near_dups,
        envelope_fingerprint,
    )

    sr = 16000
    rng = np.random.RandomState(3)
    t = np.arange(sr * 2)
    # speech-like: noise bursts with a varying envelope
    env = np.abs(np.sin(2 * np.pi * 1.7 * t / sr)) + 0.1
    sig = (8000 * env * rng.randn(len(t)).clip(-3, 3) / 3).astype(np.int16)
    other = (8000 * np.sin(2 * np.pi * 440 * t / sr) *
             np.abs(np.cos(2 * np.pi * 0.9 * t / sr))).astype(np.int16)

    # gain invariance is exact (deltas compare, not measure)
    assert envelope_fingerprint(sig) == envelope_fingerprint(
        (sig * 0.5).astype(np.int16))

    rows = [
        ("orig", encode_wav_pcm16(sig, sr), "pcm_s16le"),
        ("dup", encode_wav_pcm16(sig, sr), "pcm_s16le"),
        ("lossy", encode_ulaw(sig, sr), "ulaw"),
        ("other", encode_wav_pcm16(other, sr), "pcm_s16le"),
        ("junk", b"\x00\x01", "pcm_s16le"),
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_near_dups(clips, max_hamming=3).collect()}
    assert pairs.get(("dup", "orig")) == 0
    assert ("lossy", "orig") in pairs           # lossy re-encode still matches
    assert not any("other" in p for p in pairs)  # different material
    assert not any("junk" in p for p in pairs)   # undecodable excluded


def test_audio_fingerprint_bitexact_in_mixed_batch(spark):
    """Regression (code-review r3 #2): one undecodable payload in a batch
    used to coerce the afp column to float64, silently flipping low bits
    of fingerprints above 2^53. The Spark-side fingerprint must be
    BIT-EXACT vs the local computation even with a junk row in the same
    Arrow batch."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_features import (
        audio_fingerprints,
        envelope_fingerprint,
    )

    sr = 16000
    rng = np.random.RandomState(9)
    # keep drawing until the fingerprint exceeds 2^53 (float64 mantissa)
    for _ in range(50):
        sig = (8000 * rng.randn(sr)).clip(-32768, 32767).astype(np.int16)
        expected = envelope_fingerprint(sig)
        if expected is not None and expected > (1 << 53):
            break
    assert expected > (1 << 53)

    payload = encode_wav_pcm16(sig, sr)
    assert envelope_fingerprint(decode_wav_pcm16(payload)[1]) == expected
    clips = spark.createDataFrame(
        [("good", payload, "pcm_s16le"), ("junk", b"\x00", "pcm_s16le"),
         ("flat", encode_wav_pcm16(np.zeros(sr, dtype=np.int16), sr), "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    ).coalesce(1)  # one partition -> one Arrow batch containing the junk row
    rows = {r["clip_id"]: r for r in audio_fingerprints(clips).collect()}
    assert rows["good"]["afp"] == expected            # bit-exact, no float trip
    assert rows["junk"]["decode_ok"] is False
    assert rows["flat"]["decode_ok"] is True and rows["flat"]["afp"] is None


def test_audio_resample_and_normalize(spark):
    """Resample: a 16k sine lands at 8k with length halved and the tone
    preserved (zcr in cycles/sec invariant); normalize: RMS hits the
    target level; junk rows surface decode_ok=False."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_transform import (
        normalize_loudness,
        resample_clips,
    )

    sr = 16000
    t = np.arange(sr)
    sine = (8000 * np.sin(2 * np.pi * 400 * t / sr)).astype(np.int16)
    clips = spark.createDataFrame(
        [("s", encode_wav_pcm16(sine, sr), "pcm_s16le"),
         ("j", b"\x00", "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )
    rows = {r["clip_id"]: r for r in resample_clips(clips, target_sr=8000).collect()}
    assert rows["j"]["decode_ok"] is False
    r = rows["s"]
    assert r["sr_hz"] == 8000 and abs(r["dur_ms"] - 1000) <= 1
    sr2, out = decode_wav_pcm16(bytes(r["bytes"]))
    assert sr2 == 8000 and abs(len(out) - 8000) <= 1
    # tone preserved: zero crossings per second ~ 2 * 400
    zc = float(np.mean(np.signbit(out[1:].astype(float)) != np.signbit(out[:-1].astype(float)))) * 8000
    assert abs(zc - 800) < 40

    norm = {r["clip_id"]: r for r in
            normalize_loudness(clips, target_rms_db=-20.0).collect()}
    _, ns = decode_wav_pcm16(bytes(norm["s"]["bytes"]))
    rms_db = 20 * np.log10(np.sqrt(np.mean(ns.astype(float) ** 2)) / 32768.0)
    assert abs(rms_db - (-20.0)) < 0.1


def test_audio_segmentation(spark):
    """1:N segmentation: a 25 s clip at 10 s segments yields 10+10+5;
    with min_tail 6 s the 5 s orphan drops; overlap advances the stride;
    segments re-decode to the exact source slices."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_transform import (
        segment_clips,
    )

    sr = 1000  # 1 kHz keeps arrays small; durations stay exact
    sig = np.arange(25_000, dtype=np.int16)  # 25 s ramp, slice-identifiable
    clips = spark.createDataFrame(
        [("c", encode_wav_pcm16(sig, sr), "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )
    segs = sorted(segment_clips(clips, segment_ms=10_000).collect(),
                  key=lambda r: r["segment_idx"])
    assert [s["dur_ms"] for s in segs] == [10_000, 10_000, 5_000]
    mid = decode_wav_pcm16(bytes(segs[1]["bytes"]))[1]
    assert mid[0] == 10_000 and len(mid) == 10_000  # exact source slice

    dropped = segment_clips(clips, segment_ms=10_000, min_tail_ms=6_000).collect()
    assert [s["segment_idx"] for s in sorted(dropped, key=lambda r: r["segment_idx"])] == [0, 1]

    lapped = segment_clips(clips, segment_ms=10_000, overlap_ms=5_000,
                           min_tail_ms=5_000).collect()
    # stride 5 s over 25 s: starts 0,5,10,15 — the 15-25 s segment reaches
    # the end, so a 20-25 s tail would be fully contained and is not emitted
    assert len(lapped) == 4
    assert sorted(r["dur_ms"] for r in lapped) == [10_000] * 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        segment_clips(clips, segment_ms=1000, overlap_ms=1000)


def test_audio_augmentation_speed_and_noise(spark):
    """speed_perturb: factor 2 halves duration and doubles the tone's
    cycles/sec at constant declared rate; add_noise: measured SNR within
    1 dB of target and BIT-IDENTICAL across re-runs (deterministic per
    clip_id+seed); silence passes through noise-free."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        snr_db,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_transform import (
        add_noise,
        speed_perturb,
    )

    sr = 16000
    t = np.arange(sr)
    sine = (8000 * np.sin(2 * np.pi * 400 * t / sr)).astype(np.int16)
    clips = spark.createDataFrame(
        [("s", encode_wav_pcm16(sine, sr), "pcm_s16le"),
         ("z", encode_wav_pcm16(np.zeros(sr, dtype=np.int16), sr), "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )

    fast = {r["clip_id"]: r for r in speed_perturb(clips, factor=2.0).collect()}
    assert fast["s"]["sr_hz"] == sr and abs(fast["s"]["dur_ms"] - 500) <= 1
    _, out = decode_wav_pcm16(bytes(fast["s"]["bytes"]))
    zc_per_sec = float(np.mean(np.signbit(out[1:].astype(float))
                               != np.signbit(out[:-1].astype(float)))) * sr
    assert abs(zc_per_sec - 1600) < 80  # 400 Hz tone now plays at 800 Hz

    import pytest as _pytest
    with _pytest.raises(ValueError):
        speed_perturb(clips, factor=0)

    n1 = {r["clip_id"]: bytes(r["bytes"]) for r in add_noise(clips, snr_db=20.0).collect()}
    n2 = {r["clip_id"]: bytes(r["bytes"]) for r in
          add_noise(clips.repartition(3), snr_db=20.0).collect()}
    assert n1 == n2  # deterministic under re-run AND repartitioning
    _, noisy = decode_wav_pcm16(n1["s"])
    measured = snr_db(sine, noisy)
    assert abs(measured - 20.0) < 1.0
    _, still_silent = decode_wav_pcm16(n1["z"])
    assert not still_silent.any()  # no gain fixes silence; passes through


def test_audio_transform_guards_and_empty_clip(spark):
    """Review r3c regressions: bad params refuse at the DRIVER; a valid
    zero-sample WAV stays decode_ok=True through resample; an sr=1 clip
    cannot zero the segmentation stride (task-crash path)."""
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_transform import (
        resample_clips,
        segment_clips,
    )

    empty = encode_wav_pcm16(np.zeros(0, dtype=np.int16), 16000)
    srone = encode_wav_pcm16(np.arange(30, dtype=np.int16), 1)
    clips = spark.createDataFrame(
        [("e", empty, "pcm_s16le"), ("one", srone, "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )
    with _pytest.raises(ValueError):
        resample_clips(clips, target_sr=0)
    with _pytest.raises(ValueError):
        segment_clips(clips, segment_ms=10_000, min_tail_ms=20_000)

    rows = {r["clip_id"]: r for r in resample_clips(clips, target_sr=8000).collect()}
    assert rows["e"]["decode_ok"] is True and rows["e"]["dur_ms"] == 0

    # sr=1 clip: stride clamps to >=1 instead of range(...,0) killing the task
    segs = segment_clips(clips, segment_ms=10_500, overlap_ms=10_000,
                         min_tail_ms=500).collect()
    assert all(r["clip_id"] == "one" for r in segs) and segs


def test_stratified_sample_missing_stratum_guard(spark):
    """Judge r3 task 7: a stratum present in the data but absent from
    fractions with default_fraction=0 is a silent full drop — the guard
    warns by default, raises with on_missing='error', and stays silent
    with 'ignore' or when every stratum is covered."""
    import warnings as _warnings

    import pytest as _pytest

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
         for i in range(30)],
        "doc_id int, lang string",
    )
    fr = {"en": 0.5, "de": 0.5}  # 'fr' missing -> would be fully dropped
    with _warnings.catch_warnings(record=True) as seen:
        _warnings.simplefilter("always")
        out = text.stratified_sample(docs, fr, "lang")
        assert any("'fr'" in str(w.message) for w in seen)
    assert out.where(F.col("lang") == "fr").count() == 0  # drop still happens
    with _pytest.raises(ValueError, match="fr"):
        text.stratified_sample(docs, fr, "lang", on_missing="error")
    with _warnings.catch_warnings(record=True) as seen:
        _warnings.simplefilter("always")
        text.stratified_sample(docs, fr, "lang", on_missing="ignore")
        text.stratified_sample(docs, {**fr, "fr": 0.0}, "lang")  # explicit 0
        text.stratified_sample(docs, fr, "lang", default_fraction=0.1)
        assert not [w for w in seen if "stratified_sample" in str(w.message)]
    with _pytest.raises(ValueError):
        text.stratified_sample(docs, fr, "lang", on_missing="loudly")


def test_rebalance_domains_hits_target_mixture(spark):
    """rebalance_domains on a skewed synthetic corpus: primary-domain
    labeling (ties -> lexicographic min; no URL -> dropped as 'none'),
    max-feasible total T = min(n_d/w_d), per-domain fractions w_d*T/n_d.
    Value-exact: the scarce domain is kept whole and the kept mixture
    matches the target within hash-sampling tolerance."""
    import pytest as _pytest

    rows = []
    for i in range(400):
        if i % 10 == 0:
            rows.append((i, f"doc {i} with no links at all"))
        elif i % 10 == 1:
            # rare.org docs also cite big.com once; rare.org appears
            # twice -> primary must be rare.org (count beats count)
            rows.append((i, f"doc {i} see https://rare.org/a "
                            f"https://rare.org/b and https://big.com/x"))
        else:
            # tie between big.com and zeta.net (one each) -> big.com wins
            rows.append((i, f"doc {i} via https://big.com/p/{i} "
                            f"and https://zeta.net/q/{i}"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # counts: rare.org = 40, big.com = 320
    out = text.rebalance_domains(docs, {"rare.org": 0.5, "big.com": 0.5})
    got = out.groupBy("domain").count().collect()
    by_dom = {r["domain"]: r["count"] for r in got}
    # T = min(40/.5, 320/.5) = 80 -> rare kept whole (frac 1.0), big
    # sampled at 40/320 = 0.125
    assert by_dom["rare.org"] == 40
    assert abs(by_dom["big.com"] - 40) <= 15  # hash sampling variance
    assert set(by_dom) == {"rare.org", "big.com"}  # none/zeta dropped
    # deterministic: same input -> identical kept set
    again = text.rebalance_domains(docs, {"rare.org": 0.5, "big.com": 0.5})
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # unreachable mixture refuses
    with _pytest.raises(ValueError, match="absent.org"):
        text.rebalance_domains(docs, {"rare.org": 0.5, "absent.org": 0.5})
    with _pytest.raises(ValueError):
        text.rebalance_domains(docs, {})
    with _pytest.raises(ValueError):
        text.rebalance_domains(docs, {"rare.org": 0.0})


def test_dedup_with_counts_multiplicity(spark):
    """keep_count=True: one representative per identical text with the
    collapse count — duplication-aware weighting input; default path
    unchanged (no n_copies column)."""
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (5, "aaa"), (3, "bbb"), (4, "ccc")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["n_copies"]
           for r in dedup.drop_exact_duplicates(docs, keep_count=True).collect()}
    assert got == {1: 3, 3: 1, 4: 1}
    assert "n_copies" not in dedup.drop_exact_duplicates(docs).columns


def test_repetition_features_values(spark):
    """Gopher repetition signals, value-exact: duplicate lines and
    duplicate 3-grams counted against their totals; short docs get 0."""
    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),             # 3 lines, 1 dup
            (2, "x y z x y z x y z"),          # 9 toks -> 7 grams, 5 dup
            (3, "one two"),                     # too short for a 3-gram
            (4, "unique words only here now"),
        ],
        "doc_id int, text string",
    )
    got = {r["id"]: r for r in text.repetition_features(docs).collect()}
    assert got["1"]["n_lines"] == 3 and got["1"]["dup_line_frac"] == round(1 / 3, 6)
    assert got["2"]["n_grams"] == 7
    # grams: xyz yzx zxy xyz yzx zxy xyz -> 3 distinct, 4 dup
    assert got["2"]["dup_3gram_frac"] == round(4 / 7, 6)
    assert got["3"]["n_grams"] == 0 and got["3"]["dup_3gram_frac"] == 0.0
    assert got["4"]["dup_line_frac"] == 0.0 and got["4"]["dup_3gram_frac"] == 0.0


def test_prepare_audio_corpus_end_to_end(spark):
    """Judge r3 task 3: the audio corpus-prep recipe drops junk, short,
    and silent clips at the quality gate; a GAIN-ADJUSTED MU-LAW
    re-encode of a kept clip is caught by the envelope near-dedup (the
    gain/codec-invariance claim, proven in composition); segments land at
    the canonical rate; and every segment of a clip rides ONE split."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        encode_ulaw,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.recipes import (
        AudioCorpusPrepConfig,
        prepare_audio_corpus,
    )

    sr = 16000

    def speechish(seconds: float, seed: int) -> np.ndarray:
        n = int(sr * seconds)
        r = np.random.default_rng(seed)
        carrier = r.normal(0, 2500, n)
        env = 0.2 + 0.8 * np.abs(np.sin(np.arange(n) * 2 * np.pi * (1.5 + seed % 3) / sr))
        return np.clip(carrier * env, -30000, 30000).astype(np.int16)

    a = speechish(25.0, 1)     # 3 segments at 10 s
    b = speechish(12.0, 2)
    c = speechish(12.0, 3)
    rows = [
        ("a", encode_wav_pcm16(a, sr), "pcm_s16le"),
        ("b", encode_wav_pcm16(b, sr), "pcm_s16le"),
        ("c", encode_wav_pcm16(c, sr), "pcm_s16le"),
        # gain-adjusted (x0.5) mu-law re-encode of a -> near-dup of 'a'
        ("zdup", encode_ulaw((a * 0.5).astype(np.int16), sr), "ulaw"),
        ("junk", b"not audio at all", "pcm_s16le"),
        ("tiny", encode_wav_pcm16(speechish(0.2, 4), sr), "pcm_s16le"),
        ("sil", encode_wav_pcm16(np.zeros(sr * 2, dtype=np.int16), sr), "pcm_s16le"),
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = prepare_audio_corpus(clips, AudioCorpusPrepConfig())
    segs = out.collect()

    kept = {r["clip_id"] for r in segs}
    assert kept == {"a", "b", "c"}  # zdup deduped; junk/tiny/sil gated
    assert all(r["sr_hz"] == 16000 and r["codec"] == "pcm_s16le" for r in segs)
    n_a = sum(1 for r in segs if r["clip_id"] == "a")
    assert n_a == 3  # 25 s -> 10 + 10 + 5 s tail (>= min_tail)
    # split purity per clip: every segment of a clip rides one split
    per_clip = {}
    for r in segs:
        per_clip.setdefault(r["clip_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_clip.values())
    assert all(r["split"] in ("train", "val", "test") for r in segs)


def test_incremental_lsh_store_lossless_and_guarded(spark, tmp_path):
    """Judge r3 task 2: delta-run candidates against a persisted
    signature store == full-run candidates restricted to pairs touching
    the delta (both hash lanes); the store refuses mismatched LSH
    parameters; appending is append-only (old batch files untouched)."""
    import os

    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import incremental

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "oak tree by the river bank every single morning")
    rows = []
    for i in range(60):
        if i % 7 == 0:
            rows.append((i, base))                     # dup cluster spans old+delta
        elif i % 7 == 1:
            rows.append((i, base.replace("lazy", "sleepy")))
        else:
            rows.append((i, f"unique document {i} about topic {i * 31 % 17} "
                            f"with filler content number {i} and more words"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    old = docs.where(F.col("doc_id") >= 20)
    delta = docs.where(F.col("doc_id") < 20)
    delta_ids = {str(i) for i in range(20)}

    for lane in ("xxhash64", "md5"):
        root = str(tmp_path / f"store_{lane}")
        incremental.append_signatures(
            old.where(F.col("doc_id") >= 40), root,
            num_hashes=16, bands=4, lane=lane,
        )
        incremental.append_signatures(
            old.where(F.col("doc_id") < 40), root,
            num_hashes=16, bands=4, lane=lane,
        )
        got = incremental.incremental_lsh_candidates(spark, delta, root)
        full = dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4, lane=lane)
        want = full.where(
            F.col("id_a").isin(delta_ids) | F.col("id_b").isin(delta_ids)
        )
        got_set = {(r["id_a"], r["id_b"], r["n_bands_matched"]) for r in got.collect()}
        want_set = {(r["id_a"], r["id_b"], r["n_bands_matched"]) for r in want.collect()}
        assert got_set == want_set and got_set  # lossless AND non-trivial

    root = str(tmp_path / "store_xxhash64")
    # parameter pinning: different bands -> refuse, never garbage
    with _pytest.raises(ValueError, match="incomparable"):
        incremental.append_signatures(delta, root, num_hashes=16, bands=8)
    # append-only: committing the delta adds a batch, leaves old ones alone
    before = {p: os.path.getmtime(os.path.join(root, p))
              for p in os.listdir(root) if p.startswith("batch-")}
    incremental.append_signatures(delta, root, num_hashes=16, bands=4)
    after = {p: os.path.getmtime(os.path.join(root, p))
             for p in os.listdir(root) if p.startswith("batch-")}
    assert set(after) == set(before) | {"batch-3"}
    # empty store / missing params refuse clearly
    with _pytest.raises(FileNotFoundError):
        incremental.incremental_lsh_candidates(
            spark, delta, str(tmp_path / "nope")
        )


def test_trim_silence_margins_pad_and_all_silent(spark):
    """trim_silence: dead air beyond the pad is stripped, the padded
    onset survives, all-silent clips trim to zero samples but stay
    decode_ok (the quality gate owns dropping them), bad pad refuses."""
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.functions.audio_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from tdr_draft_metadata_validator_spark.pipeline.audio_transform import (
        trim_silence,
    )

    sr = 16000
    tone = (np.sin(np.arange(sr) * 0.1) * 8000).astype(np.int16)  # 1 s
    sil = np.zeros(sr, dtype=np.int16)                             # 1 s
    clip = np.concatenate([sil, tone, sil])                        # 3 s
    rows = [
        ("pad", encode_wav_pcm16(clip, sr), "pcm_s16le"),
        ("allsil", encode_wav_pcm16(np.zeros(sr * 2, dtype=np.int16), sr),
         "pcm_s16le"),
    ]
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r for r in trim_silence(clips, pad_ms=100).collect()}
    # 1 s tone + 100 ms pad each side = 1.2 s
    assert got["pad"]["decode_ok"] is True
    assert abs(got["pad"]["dur_ms"] - 1200) <= 2
    _sr, trimmed = decode_wav_pcm16(bytes(got["pad"]["bytes"]))
    # tone[0] is sin(0)=0 (below threshold), so the first voiced sample
    # is tone[1] and the padded window starts one sample later
    assert np.array_equal(trimmed[1599:1599 + sr], tone)  # onset intact
    assert got["allsil"]["decode_ok"] is True and got["allsil"]["dur_ms"] == 0
    with _pytest.raises(ValueError):
        trim_silence(clips, pad_ms=-1)


def test_compact_signature_store_retires_removed_ids(spark, tmp_path):
    """Store maintenance: compaction folds the batch log into one batch
    (old directories deleted, manifest rewritten) and retires removed
    documents' buckets, so deleted corpus rows stop producing phantom
    candidate pairs; surviving pairs are unchanged."""
    import os

    from tdr_draft_metadata_validator_spark.pipeline import incremental

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "oak tree by the river bank every single morning")
    rows = [(i, base if i % 5 == 0 else f"unique doc {i} topic {i * 13 % 7} "
             f"filler {i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    old = docs.where(F.col("doc_id") >= 10)
    delta = docs.where(F.col("doc_id") < 10)
    root = str(tmp_path / "store")
    incremental.append_signatures(old.where(F.col("doc_id") >= 25), root,
                                  num_hashes=16, bands=4)
    incremental.append_signatures(old.where(F.col("doc_id") < 25), root,
                                  num_hashes=16, bands=4)
    before = incremental.incremental_lsh_candidates(spark, delta, root)
    before_set = {(r["id_a"], r["id_b"]) for r in before.collect()}
    assert ("0", "10") in before_set and ("0", "20") in before_set

    removed = spark.createDataFrame([("10",)], "doc_id string")
    bid = incremental.compact_signature_store(spark, root, remove_ids=removed)
    assert sorted(p for p in os.listdir(root) if p.startswith("batch-")) == \
        [f"batch-{bid}"]
    after = incremental.incremental_lsh_candidates(spark, delta, root)
    after_set = {(r["id_a"], r["id_b"]) for r in after.collect()}
    assert ("0", "10") not in after_set           # retired id gone
    assert after_set == {p for p in before_set if "10" not in p}
    # params survive compaction; further appends still work
    incremental.append_signatures(delta, root, num_hashes=16, bands=4)


def test_resample_method_is_explicit_never_import_dependent():
    """ADVICE r3: the resampler must not silently switch on scipy
    availability — method='linear' is pure numpy (same bytes in every
    environment); method='poly' raises ImportError when scipy is absent
    instead of degrading; unknown methods refuse."""
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import audio_transform as at

    s = (np.sin(np.arange(400) * 0.1) * 3000).astype(np.int16)
    lin = at.resample_linear(s, 16000, 8000)  # default = linear
    assert lin.dtype == np.int16 and len(lin) == 200
    # explicit 'linear' matches the default bit-for-bit
    assert np.array_equal(lin, at.resample_linear(s, 16000, 8000, method="linear"))
    with _pytest.raises(ValueError):
        at.resample_linear(s, 16000, 8000, method="cubic")
    if at._resample_poly is None:  # this image: scipy absent
        with _pytest.raises(ImportError):
            at.resample_linear(s, 16000, 8000, method="poly")
    else:  # pragma: no cover - env-dependent
        poly = at.resample_linear(s, 16000, 8000, method="poly")
        assert poly.dtype == np.int16
        # and 'poly' being available must NOT change the default lane
        assert np.array_equal(lin, at.resample_linear(s, 16000, 8000))


def test_pack_sequences_group_id_injective_with_slashes(spark):
    """ADVICE r4: group-col values containing '/' must not merge
    distinct packing partitions — ('a','b/1') g and ('a/b','1') g used
    to both render 'a/b/1/<g>'. Components are %-escaped now, and the
    window partitions on the columns, so bins never mix."""
    rows = [(f"{i:03d}", "w " * 50, "a" if i % 2 else "a/b",
             "b/1" if i % 2 else "1") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string, c1 string, c2 string")
    out = text.pack_sequences(
        docs, budget_tokens=120, n_groups=1, group_cols=["c1", "c2"]
    ).collect()
    groups = {(r["c1"], r["c2"]): r["group"] for r in out}
    assert groups[("a", "b/1")] != groups[("a/b", "1")]
    assert groups[("a", "b/1")] == "a/b%2F1/0"
    assert groups[("a/b", "1")] == "a%2Fb/1/0"
    # (group, bin) alone is pure: no rendered id spans two value tuples
    by_gid = {}
    for r in out:
        by_gid.setdefault((r["group"], r["bin"]), set()).add((r["c1"], r["c2"]))
    assert all(len(v) == 1 for v in by_gid.values())
    # bins are dense from 0 within each partition (windows didn't merge)
    for pair in (("a", "b/1"), ("a/b", "1")):
        bins = sorted(r["bin"] for r in out if (r["c1"], r["c2"]) == pair)
        assert bins[0] == 0 and bins == sorted(set(bins)) or len(set(bins)) < len(bins)


def test_stratified_sample_guard_scan_is_bounded(spark):
    """ADVICE r4: the missing-stratum guard collects at most
    missing_scan_limit+1 offender rows (filter-first, distinct-limited)
    and truncates the warned list — never an unbounded distinct+collect
    over a huge key space."""
    import warnings

    rows = [(i, f"k{i % 200}") for i in range(2000)]  # 200 distinct strata
    docs = spark.createDataFrame(rows, "doc_id int, lang string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        text.stratified_sample(docs, {"k0": 0.5}, "lang")
        msgs = [str(x.message) for x in w if "FULLY dropped" in str(x.message)]
    assert len(msgs) == 1 and "list truncated" in msgs[0]
    # named offenders are capped at the scan limit (20)
    import re
    named = re.findall(r"'k\d+'", msgs[0])
    assert len(named) == 20


def test_pq_train_encode_deterministic_and_numpy_exact(spark):
    """Product quantization (r5): codebooks are a pure function of the
    id-ordered sample (stable under repartitioning — a re-rolled
    codebook would invalidate every stored code), and the distributed
    encode matches the pure-numpy reference bit-for-bit."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(5)
    vecs = rng.randn(300, 16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>")

    b1 = sim.pq_train(emb, m=4, k=8, sample_n=200, iters=5)
    b2 = sim.pq_train(emb.repartition(13), m=4, k=8, sample_n=200, iters=5)
    assert b1.shape == (4, 8, 4)
    np.testing.assert_array_equal(b1, b2)

    codes = {r["id"]: r["codes"]
             for r in sim.pq_encode(emb, b1).collect()}
    # numpy reference on the same normalized vectors (float64, like the
    # encode pass — oracle-replicable double math end to end)
    x = vecs.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    ref = sim._pq_codes_np(x, b1)
    for i in range(300):
        assert codes[str(i)] == ref[i].tolist()
    # the memory claim: m bytes/vector vs 4*dim raw
    assert len(codes["0"]) == 4  # 4 codes vs 64 raw bytes -> 16x


def test_pq_topk_adc_and_rerank_recall(spark):
    """ADC search: on clustered vectors the reranked PQ top-k recovers
    the exact brute-force neighbors (recall@5 >= 0.8 with a 4x rerank
    pool) and the pure-ADC ranking is self-consistent (self excluded,
    k rows per query, deterministic)."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(9)
    centers = rng.randn(6, 32).astype(np.float32) * 3
    rows = []
    for i in range(360):
        v = centers[i % 6] + rng.randn(32).astype(np.float32) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 3)

    books = sim.pq_train(emb, m=8, k=16, sample_n=360, iters=8)
    codes = sim.pq_encode(emb, books)

    adc = sim.pq_topk(codes, queries, books, k=5).collect()
    by_q = {}
    for r in adc:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"0", "1", "2"}
    for qid, rs in by_q.items():
        assert len(rs) == 5
        assert all(r["neighbor_id"] != qid for r in rs)
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["adist"])] == [1, 2, 3, 4, 5]

    exact = sim.brute_force_topk(emb, queries, k=5)
    want = {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rer = sim.pq_topk(codes, queries, books, k=5, rerank=40, emb=emb)
    got = {}
    for r in rer.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = np.mean([len(want[q] & got[q]) / 5 for q in want])
    assert recall >= 0.8, recall


def test_pq_refuses_bad_shapes(spark):
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1), 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="divisible"):
        sim.pq_train(emb, m=2, k=4)  # dim 3 % 2
    with _pytest.raises(ValueError, match="training vectors"):
        sim.pq_train(emb, m=3, k=64)  # k > sample
    books = sim.pq_train(emb, m=3, k=4)
    codes = sim.pq_encode(emb, books)
    with _pytest.raises(ValueError, match="rerank needs"):
        sim.pq_topk(codes, emb.where(F.col("vec_id") == 0), books,
                    k=3, rerank=5).collect()


def test_ivfpq_train_encode_residual_parity(spark):
    """IVFADC (r5): residual codebooks are repartition-invariant, and the
    distributed encode (centroid argmax-dot assignment + residual PQ
    codes) matches the pure-numpy reference bit-for-bit."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(11)
    vecs = rng.randn(240, 16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(240)],
        "vec_id long, embedding array<float>")

    b1 = sim.ivfpq_train(emb, dim=16, n_centroids=8, m=4, k=8,
                         sample_n=200, iters=5)
    b2 = sim.ivfpq_train(emb.repartition(13), dim=16, n_centroids=8, m=4,
                         k=8, sample_n=200, iters=5)
    assert b1.shape == (4, 8, 4)
    np.testing.assert_array_equal(b1, b2)

    got = {r["id"]: (r["centroid"], r["codes"])
           for r in sim.ivfpq_encode(emb, b1, n_centroids=8).collect()}
    x = vecs.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = sim._ivf_cents_np(16, 8, 7)
    assign = (x @ cents.T).argmax(axis=1)
    ref = sim._pq_codes_np(x - cents[assign], b1)
    for i in range(240):
        assert got[str(i)] == (int(assign[i]), ref[i].tolist())


def test_ivfpq_topk_exact_when_all_probed_and_recall(spark):
    """With every cell probed and a corpus-sized re-rank pool, IVFADC
    degenerates to exact brute force (the approximation comes ONLY from
    probe pruning + code quantization); at n_probe=4/8 the re-ranked
    recall@5 stays >= 0.8. The probe filter must appear in the plan
    BEFORE the Arrow stage (that is the file-prune at scale)."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(13)
    centers = rng.randn(6, 32).astype(np.float32) * 3
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.randn(32).astype(np.float32) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 3)

    books = sim.ivfpq_train(emb, dim=32, n_centroids=8, m=8, k=16,
                            sample_n=300, iters=8)
    codes = sim.ivfpq_encode(emb, books, n_centroids=8)

    full = sim.ivfpq_topk(codes, queries, books, n_centroids=8, k=5,
                          n_probe=8, rerank=300, emb=emb)
    exact = sim.brute_force_topk(emb, queries, k=5)
    assert sorted(map(tuple, full.collect()), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, exact.collect()), key=lambda t: (t[0], t[3]))

    pruned = sim.ivfpq_topk(codes, queries, books, n_centroids=8, k=5,
                            n_probe=4, rerank=40, emb=emb)
    want, got = {}, {}
    for r in exact.collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in pruned.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = np.mean([len(want[q] & got[q]) / 5 for q in want])
    assert recall >= 0.8, recall

    # the centroid IN (...) filter sits under the Arrow stage: on a
    # centroid-partitioned codes table this prunes files, not just rows
    adc = sim.ivfpq_topk(codes, queries, books, n_centroids=8, k=5, n_probe=2)
    plan = adc._jdf.queryExecution().optimizedPlan().toString()
    assert "centroid" in plan and "IN" in plan


def test_ivfpq_refusals(spark):
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, -1.0]) for i in range(30)],
        "vec_id long, embedding array<float>")
    books = sim.ivfpq_train(emb, dim=4, n_centroids=4, m=2, k=4)
    codes = sim.ivfpq_encode(emb, books, n_centroids=4)
    with _pytest.raises(ValueError, match="n_probe"):
        sim.ivfpq_topk(codes, emb.limit(1), books, n_centroids=4, n_probe=9)
    with _pytest.raises(ValueError, match="rerank needs"):
        sim.ivfpq_topk(codes, emb.where(F.col("vec_id") == 0), books,
                       n_centroids=4, k=3, n_probe=4, rerank=5).collect()
    with _pytest.raises(ValueError, match="dim"):
        sim.ivfpq_train(emb, dim=8, n_centroids=4, m=2, k=4)


def test_ivfpq_partitioned_codes_prune_files(spark, tmp_path):
    """The 10^12-row claim made concrete: codes written partitioned by
    centroid are FILE-pruned by the probe filter — the physical scan of
    a 2-probe search touches only the probed partition directories."""
    import numpy as np

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(17)
    vecs = rng.randn(200, 16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    books = sim.ivfpq_train(emb, dim=16, n_centroids=8, m=4, k=8)
    path = str(tmp_path / "codes_by_cell")
    sim.ivfpq_encode(emb, books, n_centroids=8).write.partitionBy(
        "centroid").parquet(path)
    codes = spark.read.parquet(path)

    q = emb.where(F.col("vec_id") == 0)
    adc = sim.ivfpq_topk(codes, q, books, n_centroids=8, k=3, n_probe=2)
    rows = adc.collect()
    assert len(rows) == 3
    # physical proof: the probe filter lands as a PARTITION filter on
    # the parquet scan (PartitionFilters: [centroid IN (a,b)]) — only
    # the 2 probed centroid directories are read
    plan = adc._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[centroid#\d+ IN \(([^)]*)\)\]", plan)
    assert m, plan[:2000]
    assert len(m.group(1).split(",")) == 2, m.group(1)
    # and codes really has more cells than the probe touched
    n_cells = codes.select("centroid").distinct().count()
    assert n_cells > 2


def test_codebook_persistence_roundtrip_and_refusals(spark, tmp_path):
    """Codebooks persist with pinned params and load bit-exact (search
    results over a stored codes table are identical across processes);
    overwrite, kind-mismatch and corruption all refuse."""
    import numpy as np
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    rng = np.random.RandomState(23)
    vecs = rng.randn(100, 16).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<float>")
    books = sim.ivfpq_train(emb, dim=16, n_centroids=4, m=4, k=8)

    idx = str(tmp_path / "idx")
    sim.save_codebooks(idx, books, kind="ivfpq", n_centroids=4)
    loaded, params = sim.load_codebooks(idx, expect_kind="ivfpq")
    np.testing.assert_array_equal(books, loaded)
    assert params == {"kind": "ivfpq", "m": 4, "k": 8, "dim": 16,
                      "normalize": True, "n_centroids": 4, "cent_seed": 7}
    # loaded codebooks drive the search identically
    codes = sim.ivfpq_encode(emb, loaded, n_centroids=params["n_centroids"])
    q = emb.where(F.col("vec_id") == 0)
    got = sim.ivfpq_topk(codes, q, loaded,
                         n_centroids=params["n_centroids"], k=3,
                         n_probe=4).collect()
    assert len(got) == 3

    with _pytest.raises(FileExistsError, match="NEW index"):
        sim.save_codebooks(idx, books, kind="ivfpq", n_centroids=4)
    with _pytest.raises(ValueError, match="expects"):
        sim.load_codebooks(idx, expect_kind="pq")
    with _pytest.raises(ValueError, match="n_centroids"):
        sim.save_codebooks(str(tmp_path / "i2"), books, kind="ivfpq")
    # corruption: params say a different shape than the array
    np.save(str(tmp_path / "idx" / "codebooks.npy"),
            books[:, :4, :])  # k 8 -> 4
    with _pytest.raises(ValueError, match="contradicts"):
        sim.load_codebooks(idx)


def test_pq_query_dim_and_k_guards(spark):
    """Review r5: a wrong-width query must refuse (it used to be
    silently truncated per-subspace into wrong neighbors), and k > 256
    must refuse at train time (codes are uint8 — larger k would wrap)."""
    import pytest as _pytest

    from tdr_draft_metadata_validator_spark.pipeline import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, -1.0]) for i in range(30)],
        "vec_id long, embedding array<float>")
    books = sim.pq_train(emb, m=2, k=4)
    codes = sim.pq_encode(emb, books)
    bad_q = spark.createDataFrame(
        [(0, [1.0] * 6)], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="query dim"):
        sim.pq_topk(codes, bad_q, books, k=3)
    with _pytest.raises(ValueError, match="query dim"):
        sim.ivfpq_topk(codes, bad_q, books, n_centroids=4, k=3)
    with _pytest.raises(ValueError, match="uint8"):
        sim.pq_train(emb, m=2, k=300, sample_n=400)
