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

    # Warm the JVM/codegen AND the Python worker pool before timing: every
    # chained ArrowEvalPython operator needs one Python worker per task, and
    # a cold pool pays ~2 s of pandas/pyarrow imports per worker — a
    # session-lifetime cost that would otherwise all land on whichever query
    # first reaches that chain depth. sf0.001 makes the warmup data-cheap.
    warm_dir = "/root/testdata/sf0.001"
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    for warm_q in ("export_pipeline_e2e", "dedup_minhash_lsh"):
        if warm_q in qs:
            try:
                qs[warm_q](spark, warm_dir).count()
            except Exception:
                pass
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a broken query should not hide the others
            print(f"bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # Queries are independent: drop any persist() state a query built so
        # later timings measure the query, not accumulated heap pressure.
        spark.catalog.clearCache()
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
