"""Per-query optimization probe: time named queries with the bench's
full-work hash action and dump their ``explain("formatted")`` plans.

Usage::

    python tools/opt_probe.py [--sf DIR] [--plans OUTDIR] [--suffix S]
                              [--reps N] name [name ...]

Names are exact catalog names or substrings (all matches run). For each
query: one warmup run at sf0.01 (JIT/codegen/Python-worker pool), then
``--reps`` timed runs at the target scale (default 3, min reported —
the bench methodology), and the formatted plan written to
``OUTDIR/<name>_<suffix>.txt`` when ``--plans`` is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from __spark_entry__ import queries  # noqa: E402
from bench import bench_action  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3, help="0 = plans only, no timing")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    qs = dict(queries())
    try:
        from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

        qs.update(BENCH_ONLY)
    except Exception:
        pass
    picked = []
    for pat in args.names:
        if pat in qs:
            picked.append(pat)
        else:
            picked.extend(n for n in qs if pat in n and n not in picked)
    if not picked:
        print(f"no queries match {args.names}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(app_name="opt_probe")
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.01")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    results: dict[str, float] = {}
    for name in picked:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if not args.no_warm and args.reps > 0:
            try:
                bench_action(qs[name](spark, warm_dir)).collect()
            except Exception as e:
                print(f"WARM FAIL {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            try:
                bench_action(qs[name](spark, args.sf)).collect()
            except Exception as e:
                print(f"FAIL {name}: {e}", file=sys.stderr)
                break
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        if samples:
            results[name] = min(samples)
            print(f"{min(samples):8.3f}s  {name}   (samples {samples})", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                df = qs[name](spark, args.sf)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
            except Exception as e:
                print(f"PLAN FAIL {name}: {e}", file=sys.stderr)

    total = round(sum(results.values()), 3)
    print(f"TOTAL {total}s over {len(results)} queries")


if __name__ == "__main__":
    main()
