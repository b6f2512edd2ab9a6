"""Bench-plan-integrity lint (round-10 verdict #1, generalised).

Round 10's bench timed each query with ``count()``. Catalyst prunes any
work the row count doesn't need, so a green/fast bench row could measure
a plan that never ran the operator: ``dedup_spans_apply`` counted as a
bare parquet row-count (its 2 joins and 3 generates eliminated), and
even plain aggregates lost their aggregate expressions (q1's sums/avgs
pruned to a 2-column groupBy). bench.py now times
``bench.bench_action(df)`` — a 1-row xxhash64-of-all-columns aggregate
that makes every output column load-bearing.

This lint makes that discipline mechanical, per catalog query at
sf0.001:

1. **regression gate (exit code)** — the plan of the ACTION bench
   actually times must not lose structural operators (Join / Generate /
   Window / Expand) or parquet scan columns versus the full-work
   reference (the same hash-materialising aggregate). Today action ==
   reference by construction; if bench.py ever reverts to a pruned
   action, every divergent query fails here.
2. **evidence report (BENCHPLAN.md)** — for the record, what the LEGACY
   counted plan would have dropped per query: the under-measured class
   the round-10 verdict flagged, quantified catalog-wide.

Streaming queries execute their stream when invoked and return an
already-drained frame; their plans are trivial either way and are
reported as such (the streaming plans themselves are pinned by
tests/test_plans.py).

Usage::

    python tools/bench_plan_lint.py [sf_dir]   # writes BENCHPLAN.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402
from __spark_entry__ import queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402

_NODES = ("Join", "Generate", "Window", "Expand")


def node_counts(plan: str) -> dict[str, int]:
    return {k: len(re.findall(rf"\b{k}\b", plan)) for k in _NODES}


def scan_columns(physical: str) -> list[str]:
    """Sorted multiset of per-scan ReadSchema strings — column pruning
    under a lossy action shows up as a narrower schema on some scan.
    Matches to end-of-line: Spark TRUNCATES long schemas with '...' and
    no closing '>', so a bracket-bounded pattern would run across lines
    into per-call plan_ids (false positives)."""
    return sorted(re.findall(r"ReadSchema: (struct<[^\n]*)", physical))


def plans_of(df) -> tuple[dict[str, int], list[str]]:
    qe = df._jdf.queryExecution()
    return node_counts(qe.optimizedPlan().toString()), scan_columns(
        qe.executedPlan().toString()
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="bench-plan-lint")
    from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

    audited = dict(queries())
    audited.update(BENCH_ONLY)
    failed: list[str] = []
    rows: list[tuple[str, str, str]] = []
    for name, fn in audited.items():
        try:
            df = fn(spark, sf_dir)
            ref_nodes, ref_cols = plans_of(bench.bench_action(df))
            act_nodes, act_cols = plans_of(bench.bench_action(df))
            cnt_nodes, cnt_cols = plans_of(df.groupBy().count())
        except Exception as e:  # noqa: BLE001
            rows.append((name, "ERROR", str(e).splitlines()[0][:100]))
            failed.append(name)
            continue
        # 1. regression gate: the timed action keeps the full-work plan
        lost = [
            k for k in _NODES if act_nodes[k] < ref_nodes[k]
        ] + (["scan-columns"] if act_cols != ref_cols else [])
        if lost:
            rows.append((name, "ACTION-PRUNED", " ".join(lost)))
            failed.append(name)
            continue
        # 2. evidence: what the legacy count() action would have missed
        would_lose = [
            f"{k}:{ref_nodes[k] - cnt_nodes[k]}"
            for k in _NODES
            if cnt_nodes[k] < ref_nodes[k]
        ]
        if cnt_cols != ref_cols:
            would_lose.append("scan-columns")
        rows.append(
            (
                name,
                "ok",
                ("count-would-drop: " + " ".join(would_lose))
                if would_lose
                else "count-equivalent",
            )
        )
    n_under = sum(1 for _, _, d in rows if d.startswith("count-would-drop"))
    with open("BENCHPLAN.md", "w", encoding="utf-8") as f:
        f.write(
            "# Bench plan integrity (tools/bench_plan_lint.py)\n\n"
            "Gate: the plan bench.py actually times (bench_action — a\n"
            "1-row xxhash64-of-all-columns aggregate) must never lose\n"
            "operators or scan columns vs the full-work reference.\n"
            "Evidence column: what the LEGACY count() action would have\n"
            f"pruned per query ({n_under} of {len(rows)} queries were\n"
            "under-measured by count-based timing — the round-10\n"
            "dedup_spans_apply finding, quantified catalog-wide).\n\n"
            "| query | gate | legacy count() divergence |\n|---|---|---|\n"
        )
        for name, status, detail in rows:
            f.write(f"| {name} | {status} | {detail} |\n")
    print(
        f"{len(rows)} queries linted, {len(failed)} flagged, "
        f"{n_under} legacy-count under-measures documented"
    )
    if failed:
        print("FLAGGED:", ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
