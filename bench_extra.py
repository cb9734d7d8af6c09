"""Per-lane measurement harness for the optimization rounds (r7).

NOT the driver's bench (bench.py is frozen): this file exists so single
lanes can be timed / explained in isolation per the optimization guide
§1 — noop-sink timing, labeled jobs, formatted plans — without paying
the full bench.

Usage:
  python bench_extra.py --lanes duplicate_rows,merge_semigroup --reps 3
  python bench_extra.py --all --reps 2
  python bench_extra.py --lanes ivf_topk --explain plans/r07/ivf_topk_before.txt
  python bench_extra.py --lanes validate_full          # flagship, needs .bench_data

Timing methodology matches bench.py (fn(spark, SF_DIR) then count(),
best-of-N) unless --noop is given, which forces full materialization of
every column through the noop sink instead (guide §1.4).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default="",
                    help="dump .explain('formatted') of each lane to this "
                         "path (one lane) or directory (several)")
    args = ap.parse_args()

    from tdr_draft_metadata_validator_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qs = {**entrymod.queries(), **entrymod.bench_extras(),
          **entrymod.production_overrides()}

    lanes = list(qs) if args.all else [x for x in args.lanes.split(",") if x]
    out: dict[str, float] = {}
    for name in lanes:
        if name == "validate_full":
            out[name] = _validate_full(spark, args.reps)
            continue
        fn = qs[name]
        if args.explain:
            p = pathlib.Path(args.explain)
            if p.suffix != ".txt":
                p = p / f"{name}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        walls = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(min(walls), 3)
        print(f"{name}: {out[name]} (all: {[round(w, 3) for w in walls]})",
              file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": args.noop,
                      "queries": out}))
    spark.stop()


def _validate_full(spark, reps: int) -> float:
    import bench as benchmod

    clips_path, ref_path, fp_path = benchmod.ensure_bench_tables(
        spark, benchmod.N_CLIPS)
    walls = [benchmod.run_validation(spark, clips_path, ref_path, fp_path)[0]
             for _ in range(max(2, reps))]
    print(f"validate_full walls: {[round(w, 3) for w in walls]}",
          file=sys.stderr, flush=True)
    return round(min(walls[1:]), 3)  # skip cold


if __name__ == "__main__":
    main()
