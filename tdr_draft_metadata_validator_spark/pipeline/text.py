"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All four are pure Column expressions (whole-stage codegen, no Python in
the hot path) so they fold into a single projection over one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import normalize_text

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately small: language ID here is a *pipeline quality signal*
# (route/flag), not a linguistics product.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "las"),
}


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = normalize_text(col)
    return F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, " ")))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs, the
    standard ~len/4 heuristic refined by an explicit piece regex. Used
    for corpus token budgeting, not exact tokenizer parity."""
    pieces = F.regexp_extract_all(
        F.lower(col), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"), 0
    )
    return F.coalesce(F.size(pieces), F.lit(0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])))
    # array_intersect dedups; for a ratio signal that's fine (distinct hits)
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def detect_language(col: Column) -> Column:
    """Argmax over per-language stopword-hit counts; 'und' (undetermined)
    when nothing matches. One pass, no UDF: builds a score per profile
    and folds a CASE chain."""
    toks = F.array_distinct(tokens(col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in scores.items():
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals (Gopher/C4-style filters):
    length, mean word length, punctuation ratio, digit ratio, stopword
    ratio, uppercase ratio. All in ONE projection."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?\"']", ""))
    n_upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    tc = token_count(c)
    return docs.select(
        "*",
        tc.alias("n_tokens"),
        n_chars.alias("q_n_chars"),
        F.round(n_chars / F.greatest(tc, F.lit(1)), 6).alias("q_mean_word_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("q_punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6).alias("q_digit_ratio"),
        F.round(n_upper / F.greatest(n_alpha, F.lit(1)), 6).alias("q_upper_ratio"),
        F.round(stopword_ratio(c), 6).alias("q_stopword_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  min_tokens: int = 5, max_punct_ratio: float = 0.2) -> DataFrame:
    """Composite keep/drop score in [0,1]: starts at 1, multiplicative
    penalties for short docs, punctuation soup, digit soup, no stopwords."""
    feats = quality_features(docs, text_col)
    score = (
        F.lit(1.0)
        * F.when(F.col("n_tokens") >= min_tokens, 1.0).otherwise(0.2)
        * F.when(F.col("q_punct_ratio") <= max_punct_ratio, 1.0).otherwise(0.5)
        * F.when(F.col("q_digit_ratio") <= 0.3, 1.0).otherwise(0.5)
        * F.when(F.col("q_stopword_ratio") > 0, 1.0).otherwise(0.7)
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def repetition_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of DUPLICATE lines and of duplicate word 3-grams in each
    document — high values mark boilerplate/spam (nav menus, scraped
    templates, keyword stuffing) that length/punctuation quality
    features miss. One projection, no UDF, no shuffle:

    -> (id, n_lines, dup_line_frac, n_grams, dup_3gram_frac), fractions
    rounded to 6; documents too short for a 3-gram get dup_3gram_frac=0
    (nothing repeats), not null.
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    dup_line = F.round(
        (n_lines - F.size(F.array_distinct(lines))) /
        F.greatest(n_lines, F.lit(1)), 6,
    )
    toks = F.split(normalize_text(c), " ")
    k = F.size(toks) - 2
    grams = F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )).otherwise(F.array())
    n_grams = F.size(grams)
    dup_gram = F.round(
        (n_grams - F.size(F.array_distinct(grams))) /
        F.greatest(n_grams, F.lit(1)), 6,
    )
    return docs.select(
        F.col(id_col).cast("string").alias("id"),
        n_lines.alias("n_lines"),
        dup_line.alias("dup_line_frac"),
        n_grams.alias("n_grams"),
        dup_gram.alias("dup_3gram_frac"),
    )


def fingerprint(col: Column) -> Column:
    """Stable document fingerprint: md5 of the normalized text (the
    rolling-hash analog with a portable primitive — reproducible in any
    engine for oracle checks)."""
    return F.md5(normalize_text(col))


def fingerprint_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
        token_count(F.col(text_col)).alias("n_tokens"),
        detect_language(F.col(text_col)).alias("lang_detected"),
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 13,
    buckets: int = 10_000,
    lane: str = "md5",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — the split is
    a pure function of the key, so it is stable across runs, cluster
    sizes, and table re-partitioning (the property random() splits lack),
    and a doc can never leak between splits on re-runs.

    ``lane="md5"`` (default) is the ORIGINAL, engine-portable lane (the
    DuckDB oracle reproduces it bit-for-bit; dedup module docstring) and
    it STAYS the default on purpose: a split assignment is corpus
    identity, and a silent default change would re-roll every existing
    corpus's train/test membership on upgrade — an eval-leakage hazard.
    ``lane="xxhash64"`` is the cheaper production hash (one JVM-side
    integer hash per row, no md5 string materialization); opting in is an
    EXPLICIT, per-corpus decision because it re-rolls the split — never
    switch lanes on a corpus that already has downstream eval results.

    MIGRATION NOTE (the round-3 default epoch): engine versions 0.2.x
    briefly shipped ``lane="xxhash64"`` as the DEFAULT. A corpus whose
    split was first assigned under that epoch must PIN
    ``lane="xxhash64"`` explicitly when upgrading — relying on the
    (restored) md5 default would silently re-roll its train/test
    membership, the exact eval-leakage hazard this parameter exists to
    prevent. Splits first assigned on 0.1.x or >=0.3.x defaults are md5
    and unaffected.
    -> docs + ``split``.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = F.pmod(_key_lane(key_col, seed, lane), F.lit(buckets))
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return docs.withColumn("split", expr)


# ---------------------------------------------------------------------------
# PII scrubbing + URL/domain analysis (training-data hygiene ops)
# ---------------------------------------------------------------------------

# deliberately conservative patterns: a corpus scrubber prefers false
# positives (over-redaction) to leaking contact details into a training set
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\-\s]{7,}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str = "text_redacted",
) -> DataFrame:
    """Scrub PII-ish spans, replacing each with ``<TYPE>`` — one chained
    ``regexp_replace`` projection (whole-stage codegen, no UDF, one scan),
    plus a per-type hit count so the pipeline can quarantine documents
    that are mostly PII instead of silently keeping husks.
    """
    patterns = patterns or PII_PATTERNS
    red = F.col(text_col)
    counts = []
    for name, pat in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select("*", *counts, red.alias(out_col))


def extract_domains(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, domain) one row per URL occurrence: extract http(s) URLs,
    explode, reduce to the registrable-ish host (lowercased, port and
    path stripped). Feeds per-domain corpus stats (the standard
    provenance/quality signal); a groupBy(domain) after this is the
    domain-frequency table.
    """
    urls = F.regexp_extract_all(
        F.col(text_col), F.lit(r"https?://[^\s\"'<>]+"), 0
    )
    host = F.lower(
        F.regexp_extract(F.col("url"), r"https?://([^/:\s]+)", 1)
    )
    return (
        docs.select(F.col(id_col).cast("string").alias("id"), F.explode(urls).alias("url"))
        .select("id", host.alias("domain"))
        .where(F.col("domain") != "")
    )


# ---------------------------------------------------------------------------
# training-batch prep: sequence packing + stratified sampling
# ---------------------------------------------------------------------------

def _key_lane(key_col: str, seed: int, lane: str):
    if lane == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}\x1f"), F.col(key_col).cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("long")
    return F.xxhash64(F.lit(seed), F.col(key_col).cast("string"))


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_groups: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
    lane: str = "xxhash64",
    group_cols: list[str] | tuple[str, ...] | None = None,
    token_fn=None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins (LLM batch
    packing): deterministic contiguous first-fit — docs fill a bin in id
    order; the doc that CROSSES the budget stays in its bin (bins can
    overflow by at most one doc, the standard contiguous-packing trade
    that keeps the op a pure window expression). A doc longer than the
    whole budget counts as exactly ONE budget toward the cumsum, so bin
    ids stay DENSE from 0 per group — splitting oversized docs is the
    tokenizer/chunker stage's job, not the packer's.

    ``group_cols`` lists EXTRA partition columns the packing must never
    mix across — above all the train/val/test ``split`` column: a bin is
    a training batch, so a bin straddling splits either leaks eval text
    into training or leaves budget holes. The window partitions by
    (*group_cols, hash-group), the columns ride through to the output,
    AND the emitted ``group`` id becomes the composite string
    ``"<vals>/<hash-group>"`` (e.g. ``"train/3"``) — so (group, bin)
    ALONE identifies a pure batch; a consumer that batches by
    (group, bin) cannot mix splits even if it ignores the split column.
    Component values are URL-style escaped (``%``->``%25``,
    ``/``->``%2F``) so the id stays injective when a group-col value
    itself contains ``/``. Without ``group_cols`` the group id stays
    the bare int hash-group.

    ``token_fn`` picks the budget UNIT: a Column->Column token counter,
    default :func:`token_count` (whitespace); pass
    :func:`bpe_ish_token_count` to budget in BPE-ish pieces — budgets
    must bind in the unit the trainer consumes, or bins systematically
    overflow on punctuation/digit-heavy text.

    Scale shape: packing is inherently sequential, so a single global
    cumsum would serialize on one task. Instead docs are first hashed
    into ``n_groups`` independent packing GROUPS (deterministic key
    lane), and the cumulative sum windows per (group_cols..., group) —
    n_groups-way parallel, one shuffle, and bin ids are stable under any
    input partitioning. At 10^12 rows pick n_groups ~ cluster cores.

    -> (id, n_tokens, *group_cols, group, bin). ``lane="md5"`` for
    oracle parity.
    """
    extra = list(group_cols or [])
    toks = (token_fn or token_count)(F.col(text_col))
    g = F.pmod(_key_lane(id_col, seed, lane), F.lit(n_groups)).cast("int")

    def esc(c):
        # '%'->'%25' then '/'->'%2F': the joined id stays INJECTIVE even
        # when a group-col value contains '/' (otherwise ('a','b/1'),g=2
        # and ('a/b','1'),g=2 would both render 'a/b/1/2' and a consumer
        # batching by (group, bin) could mix packing partitions — and
        # with group_cols=['split'] that is eval-set leakage). NULL
        # renders as the sentinel '%00' (concat_ws would otherwise SKIP
        # it, colliding ('a', NULL) with (NULL, 'a')); a literal '%00'
        # value escapes to '%2500', so the sentinel cannot collide.
        return F.coalesce(
            F.regexp_replace(
                F.regexp_replace(c.cast("string"), "%", "%25"), "/", "%2F"
            ),
            F.lit("%00"),
        )

    gid = (
        F.concat_ws("/", *[esc(F.col(c)) for c in extra], g.cast("string"))
        if extra else g
    )
    base = docs.select(
        F.col(id_col).cast("string").alias("id"),
        toks.cast("long").alias("n_tokens"),
        *extra,
        g.alias("__g"),
        gid.alias("group"),
    )
    # the window partitions on the COLUMNS, not the rendered string —
    # correct regardless of the id encoding
    w = Window.partitionBy(*extra, "__g").orderBy("id")
    contrib = F.least(F.col("n_tokens"), F.lit(budget_tokens))
    cum = F.sum(contrib).over(w)
    return base.select(
        "id", "n_tokens", *extra, "group",
        F.floor((cum - contrib) / budget_tokens).cast("long").alias("bin"),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    seed: int = 29,
    lane: str = "xxhash64",
    default_fraction: float = 0.0,
    on_missing: str = "warn",
) -> DataFrame:
    """Deterministic stratified sampling: keep a key iff its hash bucket
    falls under the stratum's fraction — a pure function of (key, seed),
    so the sample is REPRODUCIBLE across runs, cluster sizes, and
    repartitioning (df.sampleBy is seed-and-partitioning dependent), and
    composable with :func:`hash_split` (different seeds -> independent).

    One projection + filter, no shuffle — EXCEPT the missing-stratum
    guard: with ``on_missing != 'ignore'`` and ``default_fraction == 0``
    this function runs ONE EXTRA SPARK JOB before sampling (a
    column-pruned scan of ``stratum_col`` filtered to values outside
    ``fractions``, distinct-limited to ``missing_scan_limit + 1`` rows
    back to the driver). That is the deliberate price of refusing
    silent data loss: an absent stratum under a zero default is FULLY
    dropped. On hot paths — or stratum columns with huge key spaces
    where even the guard scan is unwelcome — pass
    ``on_missing='ignore'`` (what :func:`rebalance_domains` does for
    the intentionally-dropped long tail). ``on_missing``:

    - ``"warn"`` (default): ``warnings.warn`` naming up to
      ``missing_scan_limit`` strata present in the data but missing
      from ``fractions`` (the list notes when it is truncated).
    - ``"error"``: same check, raises ValueError instead.
    - ``"ignore"``: skip the check — NO extra scan.
    """
    if on_missing not in ("warn", "error", "ignore"):
        raise ValueError(f"on_missing {on_missing!r}; 'warn'|'error'|'ignore'")
    missing_scan_limit = 20
    if on_missing != "ignore" and default_fraction == 0.0:
        # filter FIRST (pushed to the scan), collect at most limit+1
        # distinct offenders — bounded driver traffic on any key space
        s = F.col(stratum_col).cast("string")
        offenders = (
            docs.select(s.alias("__stratum"))
            .where(~s.isin(*fractions) & s.isNotNull())
            .distinct()
            .limit(missing_scan_limit + 1)
            .collect()
        )
        missing = sorted(r["__stratum"] for r in offenders)
        if missing:
            shown = missing[:missing_scan_limit]
            suffix = " (list truncated)" if len(missing) > missing_scan_limit else ""
            msg = (
                f"stratified_sample: strata {shown}{suffix} are present in "
                f"the data but absent from fractions with default_fraction=0 "
                f"— they will be FULLY dropped. Pass an explicit fraction "
                f"(0.0 to confirm the drop) or on_missing='ignore'."
            )
            if on_missing == "error":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
    buckets = 1_000_000
    bucket = F.pmod(_key_lane(key_col, seed, lane), F.lit(buckets))
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col).cast("string") == stratum
        thr = F.lit(int(round(frac * buckets)))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        expr.otherwise(F.lit(int(round(default_fraction * buckets))))
        if expr is not None
        else F.lit(int(round(default_fraction * buckets)))
    )
    return docs.where(bucket < thr_col)


def primary_domain(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    none_domain: str = "none",
) -> DataFrame:
    """-> docs + ``domain``: each doc labeled with its PRIMARY domain —
    the most frequent host among its URLs (ties -> lexicographically
    smallest, deterministic); docs with no URL get ``none_domain``.

    Shape: :func:`extract_domains` explodes (id, domain) occurrence rows
    (never full text), one count agg + one row_number window on those
    small rows, then one join back keyed on id — text rides only the
    final join, partitioned by id."""
    dom = extract_domains(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("domain"))
    prim = (
        dom.groupBy("id", "domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("id").alias("__pid"), "domain")
    )
    return (
        docs.withColumn("__id", F.col(id_col).cast("string"))
        .join(prim, F.col("__id") == F.col("__pid"), "left")
        .drop("__pid", "__id")
        .withColumn("domain", F.coalesce(F.col("domain"), F.lit(none_domain)))
    )


def rebalance_domains(
    docs: DataFrame,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 31,
    lane: str = "xxhash64",
    none_domain: str = "none",
) -> DataFrame:
    """Reshape the corpus's domain mixture to ``target_weights`` by
    deterministic downsampling — the standard LLM corpus-shaping move
    (rebalance web sources before training). Composition of
    :func:`primary_domain` + per-domain counts + :func:`stratified_sample`:

    1. label each doc with its primary domain;
    2. count docs per target domain (ONE small agg; O(#domains) scalars
       to the driver — the only driver-side data);
    3. the largest achievable output is ``T = min_d(count_d/weight_d)``
       (the scarcest domain binds; sampling can only remove); each
       domain keeps ``fraction_d = weight_d * T / count_d`` — so the
       kept set realizes the target mixture in expectation at the
       maximum feasible size;
    4. hash-sample per domain (reproducible under repartitioning).

    Domains outside ``target_weights`` (including ``none_domain``) are
    DROPPED — that is the semantic of rebalancing to an explicit
    mixture, so the stratified sampler runs with on_missing='ignore'.
    A target domain with zero documents raises ValueError (an
    unreachable mixture must refuse, not silently re-normalize).

    -> the sampled docs + ``domain``.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    for d, p in target_weights.items():
        if p <= 0:
            raise ValueError(f"target weight for {d!r} must be > 0 (got {p})")
    labeled = primary_domain(
        docs, id_col=id_col, text_col=text_col, none_domain=none_domain
    )
    counts = {
        r["domain"]: r["n"]
        for r in labeled.where(
            F.col("domain").isin(*target_weights)
        ).groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    empty = sorted(d for d in target_weights if counts.get(d, 0) == 0)
    if empty:
        raise ValueError(
            f"rebalance_domains: target domains {empty} have no documents "
            f"— the requested mixture is unreachable"
        )
    t = min(counts[d] / p for d, p in target_weights.items())
    fractions = {d: p * t / counts[d] for d, p in target_weights.items()}
    return stratified_sample(
        labeled, fractions, "domain", key_col=id_col, seed=seed, lane=lane,
        on_missing="ignore",
    )
