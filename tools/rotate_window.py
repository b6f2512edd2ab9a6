"""Driver-window rotation planner: make the staleness-first discipline
mechanical instead of hand-curated.

Reads every ``CORRECTNESS_r*.json`` in the repo root and, for each
gated catalog query, computes the latest round with an ALL-TRUE row
(rows_match & schema_match & hash_match, no err). Emits the proposed
next DRIVER_WINDOW (default size 50), ranked:

1. queries with NO driver row ever (never checked — non-negotiable);
2. queries whose CODE changed since their last all-true round (pass
   the changed names via --changed a,b,c — the planner cannot see the
   diff, the builder can);
3. remaining queries, oldest evidence first, name-tiebroken.

Prints the ranking table and the ready-to-paste window list. This does
NOT edit queries.py — the window stays explicit reviewed data; the tool
removes the copy-from-verdict step and the risk of silently dropping a
never-checked query (the round-7 secondary gap).

Usage::

    python tools/rotate_window.py [--size 50] [--changed name1,name2]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwp_hbase_to_mongo_export_spark import queries as catalog  # noqa: E402


def all_true(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def latest_green_round(root: str = ".", max_round: int | None = None) -> dict[str, int]:
    """query -> latest round number whose CORRECTNESS row is all-true.
    ``max_round`` caps the rounds considered — the catalog lint passes
    the round the current window was rotated FOR minus one, so the
    discipline check judges the window against the evidence that
    existed at rotation time (a later driver run adding fresher rows
    must not retroactively flunk an honestly-rotated window)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and all_true(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def plan(size: int = 50, changed: list[str] | None = None) -> list[str]:
    changed_set = set(changed or [])
    green = latest_green_round()
    names = list(catalog.QUERIES)
    unknown = changed_set - set(names)
    if unknown:
        raise SystemExit(f"--changed names not in the gated catalog: {sorted(unknown)}")

    def rank(n: str):
        r = green.get(n, 0)
        never = r == 0
        code_changed = n in changed_set
        # never-checked first, then code-changed, then oldest evidence
        return (0 if never else 1 if code_changed else 2, r, n)

    ordered = sorted(names, key=rank)
    return ordered[:size]


def main() -> int:
    size = 50
    changed: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--size":
            size = int(args.pop(0))
        elif a == "--changed":
            changed = [x for x in args.pop(0).split(",") if x]
        else:
            raise SystemExit(f"unknown arg {a}")
    green = latest_green_round()
    window = plan(size, changed)
    print(f"# proposed DRIVER_WINDOW ({len(window)} of {len(catalog.QUERIES)} gated queries)")
    for n in window:
        r = green.get(n, 0)
        tag = "NEVER-CHECKED" if r == 0 else f"last green r{r}"
        if n in set(changed):
            tag += " +code-changed"
        print(f"    \"{n}\",  # {tag}")
    leftovers = [n for n in catalog.QUERIES if n not in set(window)]
    stalest_left = min((green.get(n, 0) for n in leftovers), default=None)
    print(
        f"# outside the window: {len(leftovers)} queries, "
        f"stalest evidence r{stalest_left}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
