"""Per-query bench diff with host-factor normalisation.

Usage:
    python tools/bench_compare.py [--methodology-break] [rev_or_bench_json ...]

References: a git rev holding bench_full.json, or a BENCH_r0N.json whose
parsed tail carries the headline queries. Default: BENCH_r10.json — the
pinned accepted baseline (round-10 verdict #4: the host runs ~1.35x
slower steady-state since 2026-08-16, confirmed by four agreeing
refreshes on byte-identical code, so ABSOLUTE totals across rounds are
not comparable; the r10 sample is the last one taken and is the
baseline the new regime is judged against).

Discipline (committed, round-11):

1. **Host factor** — the median current/reference ratio across the
   comparable shared queries. Host-level slowdown moves every family
   uniformly (the round-10 finding: 1.40x across untouched map-only
   scans); a genuine regression moves specific queries. Dividing each
   ratio by the median cancels the uniform component.
2. **Flag** only queries whose ADJUSTED ratio exceeds 1.5x — the
   documented single-query jitter tail on identical code (r6
   bisection). The flagged list must be EMPTY on no-change code.
3. **--methodology-break** — pass when comparing across the round-11
   action change (bench switched from ``count()`` to the materialising
   hash action, so 83 previously count-pruned queries are HONESTLY
   slower now). The host factor is then computed only over the
   count-equivalent queries (BENCHPLAN.md), and the under-measured
   class is reported informationally instead of flagged. Comparisons
   between two materialising-action rounds (r11+ vs r11+) omit it.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 1.5


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


def count_equivalent_queries() -> set[str]:
    """Queries whose legacy count() plan equals the full-work plan
    (BENCHPLAN.md) — the only ones comparable across the round-11
    methodology break."""
    path = os.path.join(REPO, "BENCHPLAN.md")
    if not os.path.isfile(path):
        return set()
    eq = set()
    for line in open(path, encoding="utf-8"):
        m = re.match(r"\| (\S+) \| ok \| count-equivalent \|", line)
        if m:
            eq.add(m.group(1))
    return eq


def compare(
    cur: dict[str, float],
    ref: dict[str, float],
    methodology_break: bool,
) -> dict:
    shared = {n: (ref[n], cur[n]) for n in cur if n in ref and ref[n] > 0}
    if not shared:
        return {"n_shared": 0}
    comparable = set(shared)
    informational: set[str] = set()
    if methodology_break:
        eq = count_equivalent_queries()
        informational = {n for n in shared if n not in eq}
        comparable = {n for n in shared if n in eq} or set(shared)
    ratios = {n: b / a for n, (a, b) in shared.items()}
    host = statistics.median(ratios[n] for n in comparable)
    adjusted = {n: r / host for n, r in ratios.items()}
    flagged = sorted(
        n for n in comparable if adjusted[n] > FLAG_RATIO
    )
    return {
        "n_shared": len(shared),
        "n_comparable": len(comparable),
        "host_factor": round(host, 3),
        "flagged": flagged,
        "adjusted": adjusted,
        "shared": shared,
        "informational": informational,
    }


def main() -> int:
    args = sys.argv[1:]
    methodology_break = "--methodology-break" in args
    refs = [a for a in args if a != "--methodology-break"] or [
        os.path.join(REPO, "BENCH_r10.json")
    ]
    cur_all = json.load(open(os.path.join(REPO, "bench_full.json")))
    cur = {n: v for n, v in cur_all["queries"].items() if v is not None and v >= 0}
    print(f"current: total={cur_all['total']}s n={len(cur)} sf={cur_all['sf']}")
    rc = 0
    for spec in refs:
        ref = {n: v for n, v in load_ref(spec).items() if v and v > 0}
        res = compare(cur, ref, methodology_break)
        if not res["n_shared"]:
            print(f"vs {spec}: no shared queries")
            continue
        print(
            f"vs {spec}: n={res['n_shared']} "
            f"(comparable={res['n_comparable']}) "
            f"host_factor={res['host_factor']}x "
            f"flagged={res['flagged'] or 'NONE'}"
        )
        adj, shared = res["adjusted"], res["shared"]
        for n in res["flagged"]:
            a, b = shared[n]
            print(f"  FLAG {n}: {a} -> {b} (adjusted {adj[n]:.2f}x)")
        movers = sorted(adj, key=adj.get, reverse=True)
        for n in movers[:5]:
            a, b = shared[n]
            tag = " [methodology]" if n in res["informational"] else ""
            print(f"  slower {n}: {a} -> {b} (adjusted {adj[n]:.2f}x){tag}")
        for n in sorted(adj, key=adj.get)[:3]:
            a, b = shared[n]
            print(f"  faster {n}: {a} -> {b} (adjusted {adj[n]:.2f}x)")
        if res["flagged"]:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
