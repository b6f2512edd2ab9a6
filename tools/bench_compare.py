"""Per-query bench diff between the current bench_full.json and a prior
round's numbers (a git rev holding bench_full.json, or a BENCH_r0N.json
whose parsed tail carries the headline queries).

Usage:
    python tools/bench_compare.py [rev_or_bench_json ...]

For each reference it prints the shared-query count, the median ratio
(current / reference), and the biggest movers both ways. Methodology
note (round-3 lesson, README performance journal): totals are only
comparable at equal catalog size on an idle machine; before reading a
>1.5x per-query ratio as a regression, re-time that query standalone —
single-run outliers are usually session-order GC/worker-pool artifacts.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ref(spec: str) -> dict[str, float]:
    """Query->seconds map from a BENCH_r0N.json path or a git rev."""
    if os.path.isfile(spec):
        d = json.load(open(spec))
        if "parsed" in d:  # driver-recorded BENCH_r0N.json
            return (d.get("parsed") or {}).get("queries", {})
        return d.get("queries", d)
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{spec}:bench_full.json"],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        raise SystemExit(f"cannot load {spec}: {out.stderr.strip()}")
    return json.loads(out.stdout)["queries"]


def main() -> int:
    cur = json.load(open(os.path.join(REPO, "bench_full.json")))
    qc = {n: v for n, v in cur["queries"].items() if v is not None and v >= 0}
    print(f"current: total={cur['total']}s n={len(qc)} sf={cur['sf']}")
    for spec in sys.argv[1:] or ["HEAD~1"]:
        ref = {n: v for n, v in load_ref(spec).items() if v and v > 0}
        shared = [(qc[n] / ref[n], n, ref[n], qc[n]) for n in qc if n in ref]
        if not shared:
            print(f"vs {spec}: no shared queries")
            continue
        med = statistics.median(r for r, *_ in shared)
        print(f"vs {spec}: n={len(shared)} median={med:.2f}x")
        for label, rows in (
            ("slower", sorted(shared, reverse=True)[:5]),
            ("faster", sorted(shared)[:5]),
        ):
            for r, n, a, b in rows:
                print(f"  {label} {n}: {a} -> {b} ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
