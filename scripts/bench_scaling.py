"""Two-parallelism scaling evidence (BASELINE.md sandbox plan).

Runs the IDENTICAL full validation job (decode invariant included) on the
IDENTICAL input at local[N] and local[4N], reports throughput at both and
efficiency = (T_N / T_4N) / 4 — the sandbox stand-in for the north rule's
"N -> 4N executors with scaling efficiency >= 0.8".

Writes/updates BENCH/BASELINE.md with the measured table.

Usage: python scripts/bench_scaling.py [n_clips] [N]
"""

from __future__ import annotations

import datetime
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

N_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "60000"))
N_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_BIG = N_SMALL * 4
BENCH_DATA = pathlib.Path("/root/repo/.bench_data")
OUT_MD = pathlib.Path("/root/repo/BENCH/BASELINE.md")


def run_at(cores: int, clips_path: str, ref_path: str, fp_path: str | None = None,
           runs: int = 2) -> float:
    """Best-of-N wall seconds for the full validation at local[cores]."""
    from tdr_draft_metadata_validator_spark.models import ValidationParameters
    from tdr_draft_metadata_validator_spark.plans.engine import validate
    from tdr_draft_metadata_validator_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    try:
        best = float("inf")
        for _ in range(runs):
            clips = spark.read.parquet(clips_path)
            ref = spark.read.parquet(ref_path)
            fp = spark.read.parquet(fp_path) if fp_path else None
            t0 = time.monotonic()
            result = validate(
                spark, clips, ref,
                ValidationParameters(consignment_id="scaling", run_id=f"s{cores}"),
                n_logical_partitions=256,
                ref_fingerprints=fp,
            )
            assert result.merged.count() == 0
            assert result.metrics.count() > 0
            best = min(best, time.monotonic() - t0)
        return best
    finally:
        spark.stop()


def main():
    from tdr_draft_metadata_validator_spark.session import get_spark
    from bench import ensure_bench_tables

    gen = get_spark(app_name="scaling-gen", master="local[32]")
    clips_path, ref_path, fp_path = ensure_bench_tables(gen, N_CLIPS)
    gen.stop()

    t_small = run_at(N_SMALL, clips_path, ref_path, fp_path)
    t_big = run_at(N_BIG, clips_path, ref_path, fp_path)
    thr_small = N_CLIPS / t_small
    thr_big = N_CLIPS / t_big
    efficiency = (thr_big / thr_small) / (N_BIG / N_SMALL)

    report = {
        "n_clips": N_CLIPS,
        "cores_small": N_SMALL,
        "cores_big": N_BIG,
        "wall_s_small": round(t_small, 2),
        "wall_s_big": round(t_big, 2),
        "clips_per_sec_small": round(thr_small, 1),
        "clips_per_sec_big": round(thr_big, 1),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))

    OUT_MD.parent.mkdir(exist_ok=True)
    OUT_MD.write_text(f"""# BENCH/BASELINE — scaling evidence (sandbox stand-in)

North rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster in this sandbox, so the same full validation
job (rule pass + salted duplicate agg + anti-joins + protected-field join
+ audio decode/SNR/transcript invariants + merge + per-partition metrics)
runs on the SAME deterministic input at two parallelism levels
(local[{N_SMALL}] vs local[{N_BIG}]); best-of-2 wall each.

Measured {datetime.date.today().isoformat()}:

| | local[{N_SMALL}] (N) | local[{N_BIG}] (4N) |
|---|---|---|
| wall seconds | {report['wall_s_small']} | {report['wall_s_big']} |
| clips/sec | {report['clips_per_sec_small']} | {report['clips_per_sec_big']} |

- input: {N_CLIPS} synthetic PCM16 WAV clips + reference table (seed=42,
  datagen.py; avg ~1.1 s audio at 8-44.1 kHz)
- **scaling efficiency = (clips/sec_4N / clips/sec_N) / 4 =
  {report['scaling_efficiency']}** (target >= 0.8)

Raw JSON: `{json.dumps(report)}`

Caveats: local-mode cores share one JVM + host page cache, so this
measures compute scalability of the engine's plan (decode UDF dominates)
rather than network shuffle behavior; the plan's shuffle volume is
documented in SURVEY.md §4 (key-pruned joins, map-side partial aggs).
""")
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    main()
