"""Per-column stats (A5) and distribution-drift checks (A6, north_rule).

A5 is ONE ``df.agg`` pass (partial aggregation map-side, tiny final
reduce): null rates, min/max/avg dur_ms, sr_hz domain conformance, codec
whitelist conformance, approximate cardinality (HyperLogLog++ via
``approx_count_distinct``) and duration quantiles (``percentile_approx``,
a mergeable KLL-style sketch — the built-in replaces a hand-rolled
t-digest + treeAggregate; SURVEY.md §2.4 A6).

A6 compares the current table's distributions against the reference
table's:

- **PSI** (population stability index) over bins anchored at the
  reference's deciles: one narrow agg per side, P+2 bins, driver-side
  final arithmetic on ~10 numbers.
- **KS** statistic approximated as the max CDF gap probed at the merged
  quantile grid of both sides.
- **cardinality drift** via HLL estimates.

Everything that scans data is a Spark aggregate over ONE column; only
O(bins) scalars reach the driver — this is the 100 TB-safe shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..functions.audio_codec import CODEC_WHITELIST

SR_DOMAIN = (8000, 16000, 22050, 44100)


def column_stats(
    clips: DataFrame,
    sr_domain=SR_DOMAIN,
    codec_whitelist=CODEC_WHITELIST,
) -> dict:
    """A5: single-pass per-column stats (north_rule list)."""
    n = F.count(F.lit(1))
    aggs = [
        n.alias("n_rows"),
        *[
            F.avg(F.col(c).isNull().cast("double")).alias(f"null_rate_{c}")
            for c in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
        ],
        F.min("dur_ms").alias("dur_ms_min"),
        F.max("dur_ms").alias("dur_ms_max"),
        F.avg("dur_ms").alias("dur_ms_avg"),
        F.percentile_approx("dur_ms", [0.5, 0.95, 0.99], 10_000).alias("dur_ms_q"),
        F.sum((~F.col("sr_hz").isin(list(sr_domain))).cast("long")).alias(
            "sr_hz_out_of_domain"
        ),
        F.sum((~F.col("codec").isin(list(codec_whitelist))).cast("long")).alias(
            "codec_not_whitelisted"
        ),
        F.approx_count_distinct("clip_id").alias("clip_id_approx_distinct"),
        F.approx_count_distinct("sr_hz").alias("sr_hz_approx_distinct"),
    ]
    row = clips.agg(*aggs).collect()[0]
    return row.asDict()


# ---------------------------------------------------------------------------
# drift
# ---------------------------------------------------------------------------

@dataclass
class ColumnProfile:
    """Materialized reference distribution for ONE column — everything
    the warm drift path needs from the reference side, so the reference
    table is touched ZERO times per run.

    ``kind="numeric"``: decile ``edges`` + bin ``fractions`` over them.
    ``kind="categorical"``: per-category ``fractions`` aligned with
    ``categories`` (edges empty). Both carry the HLL distinct estimate.
    """

    column: str
    edges: list[float]
    fractions: list[float]
    approx_distinct: int
    kind: str = "numeric"
    categories: list[str] | None = None


# the persisted manifest shape; ``categories`` is NULL for numeric rows
PROFILE_SCHEMA = (
    "column string, edges array<double>, fractions array<double>, "
    "approx_distinct long, kind string, categories array<string>"
)


def build_ref_profile(
    spark,
    reference: DataFrame,
    columns: tuple[tuple[str, str], ...] = (("dur_ms", "ref_dur_ms"), ("sr_hz", "ref_sr_hz")),
    n_bins: int = 10,
    categorical_columns: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """Materialize the reference's drift profile ONCE per table snapshot
    (mirrors ``audio.ref_fingerprints``): a tiny DataFrame of
    (column, edges, fractions, approx_distinct, kind, categories) rows,
    persisted alongside the snapshot so warm validation runs never scan
    the reference table for drift at all. At 100 TB this converts 3
    reference scans per drifted column per run into zero — for numeric
    AND categorical columns alike (``categorical_columns`` rows carry
    per-category fractions instead of decile bins).

    Keyed by the CURRENT-side column name so consumers never need the
    ref_* mapping again.
    """
    rows = []
    for col, ref_col in columns:
        probs = [i / n_bins for i in range(1, n_bins)]
        edges = sorted(set(_quantiles(reference, ref_col, probs)))
        p = _bin_fractions(reference, ref_col, edges)
        rd = reference.agg(F.approx_count_distinct(ref_col)).collect()[0][0]
        rows.append((col, [float(e) for e in edges], [float(x) for x in p],
                     int(rd), "numeric", None))
    for col, ref_col in categorical_columns:
        frac = _category_fractions(reference, ref_col)
        cats = sorted(frac)
        rd = reference.agg(F.approx_count_distinct(ref_col)).collect()[0][0]
        rows.append((col, [], [float(frac[c]) for c in cats], int(rd),
                     "categorical", cats))
    return spark.createDataFrame(rows, PROFILE_SCHEMA)


def load_profiles(profile_df: DataFrame) -> dict[str, ColumnProfile]:
    """Collect the (tiny: one row per column) profile manifest. Tolerates
    pre-categorical manifests (no kind/categories columns -> numeric)."""
    has_kind = "kind" in profile_df.columns
    return {
        r["column"]: ColumnProfile(
            column=r["column"],
            edges=list(r["edges"] or []),
            fractions=list(r["fractions"]),
            approx_distinct=int(r["approx_distinct"]),
            kind=(r["kind"] if has_kind and r["kind"] else "numeric"),
            categories=(list(r["categories"]) if has_kind and r["categories"] is not None else None),
        )
        for r in profile_df.collect()
    }


@dataclass
class DriftReport:
    column: str
    psi: float
    ks: float
    ref_distinct: int
    cur_distinct: int

    def breaches(self, psi_threshold: float = 0.2, ks_threshold: float = 0.2) -> bool:
        return self.psi > psi_threshold or self.ks > ks_threshold


def _quantiles(df: DataFrame, col: str, probs: list[float], acc: int = 10_000) -> list[float]:
    row = df.agg(F.percentile_approx(col, probs, acc).alias("q")).collect()[0]
    return [float(x) for x in row["q"]]


def _bin_fractions(df: DataFrame, col: str, edges: list[float]) -> list[float]:
    """Histogram fractions over (-inf, e1], (e1, e2], ..., (eK, +inf) —
    one narrow agg; bins assigned with a fold over the edge literals."""
    c = F.col(col).cast("double")
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + (c > F.lit(float(e))).cast("int")
    counts = (
        df.where(c.isNotNull())
        .groupBy(bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    total = sum(r["__n"] for r in counts) or 1
    frac = [0.0] * (len(edges) + 1)
    for r in counts:
        frac[int(r["__b"])] = r["__n"] / total
    return frac


def psi(p: list[float], q: list[float], eps: float = 1e-6) -> float:
    return sum(
        (pi - qi) * math.log((pi + eps) / (qi + eps)) for pi, qi in zip(p, q)
    )


def ks_from_fractions(p: list[float], q: list[float]) -> float:
    """Max CDF gap over the shared bin edges."""
    cp = cq = 0.0
    worst = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        worst = max(worst, abs(cp - cq))
    return worst


def drift_violations(
    spark,
    current: DataFrame,
    reference: DataFrame | None,
    consignment_id: str,
    columns: tuple[tuple[str, str], ...] | None = None,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    profile_df: DataFrame | None = None,
) -> DataFrame:
    """A6 as an engine check: run drift per column pair, emit one
    run-level violation row per breaching column (assetId =
    consignmentId, mirroring the reference's file-level error shape).

    ``profile_df`` (a :func:`build_ref_profile` manifest, typically read
    from the snapshot's sidecar parquet) makes this a current-table-only
    pass — the steady-state shape at scale.

    Returns a DataFrame in the engine's common violation-row schema so
    the semigroup merge folds drift into the same verdict as row checks.
    """
    from ..messages import resolve as _resolve
    from ..models import PROCESS_DRIFT, VIOLATION_SCHEMA

    profiles = load_profiles(profile_df) if profile_df is not None else {}
    if columns is None:
        # default to the profile's own column set when one is given (a
        # profile missing a hardcoded column would otherwise raise
        # mid-validation); without a profile, the engine defaults
        columns = (
            tuple((c, c) for c in sorted(profiles))
            if profiles
            else (("dur_ms", "ref_dur_ms"), ("sr_hz", "ref_sr_hz"))
        )
    rows = []
    for col, ref_col in columns:
        prof = profiles.get(col)
        if prof is not None and prof.kind == "categorical":
            rep = drift_check_categorical(current, reference, col, ref_col,
                                          profile=prof)
        else:
            rep = drift_check(current, reference, col, ref_col, profile=prof)
        if rep.breaches(psi_threshold, ks_threshold):
            rows.append(
                (
                    consignment_id,
                    PROCESS_DRIFT,
                    col,
                    "distributionDrift",
                    _resolve(PROCESS_DRIFT, col, "distributionDrift"),
                    [
                        ("psi", f"{rep.psi:.6f}"),
                        ("ks", f"{rep.ks:.6f}"),
                    ],
                )
            )
    return spark.createDataFrame(rows, VIOLATION_SCHEMA)


def _category_fractions(df: DataFrame, col: str) -> dict[str, float]:
    """Per-category fraction map — one groupBy over the single column,
    O(categories) scalars to the driver."""
    rows = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in rows) or 1
    return {r["c"]: r["n"] / total for r in rows}


def drift_check_categorical(
    current: DataFrame,
    reference: DataFrame | None,
    column: str,
    ref_column: str | None = None,
    profile: ColumnProfile | None = None,
) -> DriftReport:
    """A6 for CATEGORICAL columns (codec, language, label): PSI over
    per-category fractions; the KS slot carries the max per-category
    fraction gap (total-variation-style). One groupBy per side over the
    single column; O(categories) scalars on the driver.

    ``profile`` given (the scale path, matching :func:`drift_check`'s
    numeric design): the reference fractions come from the materialized
    manifest — the reference table is touched ZERO times and may be None.
    """
    ref_column = ref_column or column
    if profile is not None:
        p_map = dict(zip(profile.categories or [], profile.fractions))
    elif reference is not None:
        p_map = _category_fractions(reference, ref_column)
    else:
        raise ValueError(
            "drift_check_categorical needs either a reference table or a profile"
        )
    q_map = _category_fractions(current, column)
    cats = sorted(set(p_map) | set(q_map))
    p = [p_map.get(c, 0.0) for c in cats]
    q = [q_map.get(c, 0.0) for c in cats]
    gap = max((abs(pi - qi) for pi, qi in zip(p, q)), default=0.0)
    return DriftReport(column=column, psi=psi(p, q), ks=gap,
                       ref_distinct=len(p_map), cur_distinct=len(q_map))


def drift_check(
    current: DataFrame,
    reference: DataFrame | None,
    column: str,
    ref_column: str | None = None,
    n_bins: int = 10,
    profile: ColumnProfile | None = None,
) -> DriftReport:
    """A6: PSI + KS of ``column`` vs the reference distribution.

    Bin edges = the reference's internal quantiles (deciles by default),
    so PSI is anchored where the reference has mass.

    Two modes:
    - ``profile`` given (the scale path): the reference side comes from
      the materialized :func:`build_ref_profile` manifest — the reference
      table is touched ZERO times; only the current table is scanned
      (2 narrow aggs), so ``reference`` may be None.
    - ``profile`` omitted: the profile is derived inline (3 extra
      reference aggregates — fine for ad-hoc use, wasteful per-run).
    O(n_bins) scalars reach the driver either way.
    """
    if profile is None:
        if reference is None:
            raise ValueError("drift_check needs either a reference table or a profile")
        ref_column = ref_column or column
        probs = [i / n_bins for i in range(1, n_bins)]
        edges = sorted(set(_quantiles(reference, ref_column, probs)))
        p = _bin_fractions(reference, ref_column, edges)
        rd = reference.agg(F.approx_count_distinct(ref_column)).collect()[0][0]
    else:
        edges, p, rd = profile.edges, profile.fractions, profile.approx_distinct
    q = _bin_fractions(current, column, edges)
    cd = current.agg(F.approx_count_distinct(column)).collect()[0][0]
    return DriftReport(column=column, psi=psi(p, q), ks=ks_from_fractions(p, q),
                       ref_distinct=int(rd), cur_distinct=int(cd))
