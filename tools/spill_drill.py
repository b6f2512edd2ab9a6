"""Memory-bounded spill drill for the persisted-relation operators.

SCALING.md's sweeps measure warm-cache CPU scaling; this drill forces
the OTHER regime — execution memory deliberately starved
(``spark.memory.fraction=0.05`` on a 2 GiB heap, so the unified pool is
~tens of MB for 8 concurrent tasks) — and checks that the
MEMORY_AND_DISK persists and shuffle-heavy joins (minhash state,
winnowing fingerprint relation) complete by SPILLING rather than
OOMing, with output identical to an unconstrained run. At 100 TB this
is the steady state, not the edge case: executors always have less
memory than the relations flowing through them, and an operator that is
only correct when everything fits in RAM is not an operator.

Prints ONE JSON line: per-query row count + canonical value hash (the
driver gate's exact canonicalisation, imported from
check_correctness) + elapsed, plus the spill/OOM-relevant totals
observed through the app status store. Exit 1 on any query error.

Usage::

    python tools/spill_drill.py [sf_dir] [query ...]
    # defaults: /root/testdata/sf0.01  dedup_minhash_lsh winnowing_overlap

tests/test_spill.py pins this drill: it runs the same queries in the
normal test session, launches this script as a subprocess, and asserts
hash equality.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from check_correctness import pandas_rows, value_hash  # noqa: E402

from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = ["dedup_minhash_lsh", "winnowing_overlap"]


def starved_session():
    return get_spark(
        app_name="spill-drill",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={
            # extra_conf is applied last, so these OVERRIDE get_spark's
            # comfortable defaults: a small heap and a 5% unified pool
            "spark.driver.memory": "2g",
            "spark.memory.fraction": "0.05",
            # small Arrow batches keep the Python workers' footprint flat
            # too — the drill is about the JVM spill path, not pandas RSS
            "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
        },
    )


def spill_totals(spark) -> dict:
    """Aggregate spill bytes across all completed stages via the app
    status store (py4j into AppStatusStore.stageList); -1 when the
    private API shape changes — the drill's assertions never depend on
    these, they are evidence for SCALING.md."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        # Spark 4's stageList has Scala default args; py4j needs them
        # materialised via the compiler-generated default$N accessors
        statuses = sc._jvm.java.util.ArrayList()
        defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        stages = store.stageList(statuses, *defaults)
        mem = disk = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
        return {"memoryBytesSpilled": int(mem), "diskBytesSpilled": int(disk)}
    except Exception:
        return {"memoryBytesSpilled": -1, "diskBytesSpilled": -1}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = starved_session()
    from __spark_entry__ import queries  # after session conf is fixed

    qs = queries()
    out: dict = {"sf_dir": sf_dir, "queries": {}}
    rc = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            cols = sdf.columns
            rows = pandas_rows(sdf.toPandas())
            out["queries"][name] = {
                "rows": len(rows),
                "hash": value_hash(rows, cols),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:
            out["queries"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            rc = 1
    out.update(spill_totals(spark))
    print(json.dumps(out))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
