"""Memory-starvation drill (tools/spill_drill.py) pinned as tests.

SCALING.md's sweeps measure warm-cache CPU scaling; these tests pin the
other regime: a subprocess session whose unified memory pool is
deliberately starved (2 GiB heap x memory.fraction=0.05) must complete
the persisted-relation-heavy operators (minhash LSH state, winnowing
fingerprints) by SPILLING — and produce byte-identical canonical output
to the normal test session. An operator that is only correct when its
state fits in RAM would fail here first.

The default-run test drills sf0.01 (completion + hash equality; the
corpus is too small to overflow even the starved pool, so spill bytes
are not asserted). The ``slow``-marked test drills sf0.1, where the
starved pool measurably spills (hundreds of MB observed), and asserts
disk spill actually happened alongside hash equality.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRILL = os.path.join(REPO, "tools", "spill_drill.py")
# dedup_incremental_indexed joined in round 9: its durable-index build
# (signature Arrow pass + partitioned writes) and batch screen
# (candidate join + set verify) must also complete by spilling, and the
# fingerprint-gated artifact must hash-match across constrained and
# unconstrained sessions. dedup_spans_indexed joined in round 10: the
# gram store's corpus distinct + bucketed write and the batch probe's
# gram agg must likewise spill-and-match. The edit-distance family
# joined in round 11 session 3: its persisted emission stream
# (MEMORY_AND_DISK via the operator cache slot), the prefix self-join,
# and the frozen-order store probe must complete under the starved pool
# with hashes identical to the unconstrained session.
QUERIES = [
    "dedup_minhash_lsh",
    "winnowing_overlap",
    "dedup_incremental_indexed",
    "dedup_spans_indexed",
    "dedup_edit_distance",
    "dedup_edit_indexed",
]


def _session_hashes(spark, sf_dir: str) -> dict[str, tuple[int, str]]:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_correctness import pandas_rows, value_hash

    from dwp_hbase_to_mongo_export_spark.queries import QUERIES as CATALOG

    out = {}
    for name in QUERIES:
        sdf = CATALOG[name](spark, sf_dir)
        rows = pandas_rows(sdf.toPandas())
        out[name] = (len(rows), value_hash(rows, sdf.columns))
    return out


def _run_drill(sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, DRILL, sf_dir, *QUERIES],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_starved_session_matches_unconstrained(spark):
    sf_dir = "/root/testdata/sf0.01"
    expected = _session_hashes(spark, sf_dir)
    got = _run_drill(sf_dir)
    for name in QUERIES:
        q = got["queries"][name]
        assert "error" not in q, q
        assert (q["rows"], q["hash"]) == expected[name], (name, q, expected[name])


@pytest.mark.slow
def test_starved_session_spills_and_matches_at_sf01(spark):
    sf_dir = "/root/testdata/sf0.1"
    expected = _session_hashes(spark, sf_dir)
    got = _run_drill(sf_dir)
    for name in QUERIES:
        q = got["queries"][name]
        assert "error" not in q, q
        assert (q["rows"], q["hash"]) == expected[name], (name, q, expected[name])
    # the starved pool must actually have overflowed to disk — otherwise
    # this drill silently degraded into a plain rerun
    assert got["diskBytesSpilled"] > 0, got
