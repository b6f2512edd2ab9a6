"""bench.bench_action — the materialising bench action (round-10
verdict #1): the timed plan must be the full-work plan, not whatever
Catalyst leaves behind under a row count."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import bench
from dwp_hbase_to_mongo_export_spark.queries import QUERIES


def _joins(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return len(re.findall(r"\bJoin\b", plan))


def _generates(df) -> int:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return len(re.findall(r"\bGenerate\b", plan))


def test_count_prunes_span_strip_but_bench_action_keeps_it(spark, sf_dir):
    """The round-10 finding, pinned: dedup_spans_apply's COUNTED plan
    loses every join and generate (Catalyst reduces it to a parquet
    row-count), while the bench action keeps the full strip plan."""
    df = QUERIES["dedup_spans_apply"](spark, sf_dir)
    counted = df.groupBy().count()
    assert _joins(counted) == 0 and _generates(counted) == 0
    acted = bench.bench_action(df)
    # round-11 plan shape: 2 generates (gram-set explode + hit
    # posexplode — covered positions now expand per-row inside arrays
    # instead of a third explode), still >= 2 joins (dup semi-join +
    # the strip's cov join)
    assert _joins(acted) >= 2 and _generates(acted) >= 2


def test_bench_action_keeps_aggregate_expressions(spark, sf_dir):
    """Even plain aggregates were under-measured by count(): q1's
    counted plan drops all eight sum/avg expressions. The action plan
    must still compute them (they feed the hash)."""
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    counted_plan = (
        df.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
    )
    acted_plan = (
        bench.bench_action(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "sum(l_quantity" not in counted_plan
    assert "sum(l_quantity" in acted_plan


def test_bench_action_is_one_row_and_deterministic(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    a = bench.bench_action(df).collect()
    b = bench.bench_action(df).collect()
    assert len(a) == len(b) == 1
    assert a[0]["h"] == b[0]["h"] and a[0]["h"] is not None


def test_bench_action_handles_map_and_quoted_columns(spark):
    """Hash expressions reject MapType (to_json path) and dotted names
    need backtick quoting — both covered so any future query shape
    benches without a -1.0 error row."""
    df = spark.createDataFrame(
        [(1, {"a": 2}), (3, {"b": 4})], "`id.x` bigint, m map<string,int>"
    )
    row = bench.bench_action(df).collect()
    assert len(row) == 1 and row[0]["h"] is not None


def test_bench_action_empty_frame_is_null_hash(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir).filter(F.lit(False))
    row = bench.bench_action(df).collect()
    assert len(row) == 1 and row[0]["h"] is None


@pytest.mark.slow
def test_bench_plan_lint_gate_passes(spark, sf_dir):
    """The catalog-wide lint (tools/bench_plan_lint.py) exits 0 on the
    current bench action — run under -m slow; the per-round evidence
    lives in BENCHPLAN.md."""
    import subprocess
    import sys as _sys

    res = subprocess.run(
        [_sys.executable, "tools/bench_plan_lint.py", sf_dir],
        capture_output=True,
        text=True,
        cwd=str(bench.os.path.dirname(bench.os.path.abspath(bench.__file__))),
    )
    assert res.returncode == 0, res.stdout + res.stderr
