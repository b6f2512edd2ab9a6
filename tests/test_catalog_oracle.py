"""Replicates the driver's t2 gate in-pytest: every catalog query with an
oracle must match DuckDB on row count, column names, and an
order-insensitive value hash (at sf0.001 for speed; the driver uses sf0.01).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import pandas_rows, value_hash  # noqa: E402

from dwp_hbase_to_mongo_export_spark import queries as catalog  # noqa: E402
from dwp_hbase_to_mongo_export_spark.sources.parquet import TABLES  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(catalog.ORACLE))
def test_oracle_match(name, spark, sf_dir, duck):
    sdf = catalog.QUERIES[name](spark, sf_dir)
    # driver-canonicaliser lint folded in here (it used to be a second
    # full catalog construction pass in test_catalog_lint — every gated
    # query is built in THIS matrix anyway): no top-level
    # array/map/struct columns, which pandas sort_values cannot hash
    from pyspark.sql import types as T

    complex_cols = {
        f.name: f.dataType.simpleString()
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    }
    assert not complex_cols, (
        f"{name} emits driver-unhashable complex columns: {complex_cols}"
    )
    scols = sdf.columns
    srows = pandas_rows(sdf.toPandas())
    res = duck.execute(catalog.ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = pandas_rows(res.df())
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    assert value_hash(srows, scols) == value_hash(drows, dcols)


def test_every_query_has_runnable_entry(spark, sf_dir):
    # BENCH_ONLY entries (oracle-less by structure, outside the driver
    # gate) still must build a valid plan — they are bench/audit
    # surfaces, not dead code. Gated queries are NOT re-built here:
    # every one of them is constructed and executed by the
    # test_oracle_match matrix above; re-building the whole catalog in
    # one monolithic test doubled the suite's catalog-construction cost
    # (~200 s — eager surfaces like the streaming drains and the
    # recovery drill execute real work at construction) for zero added
    # coverage (round-11 verdict #1: the driver's pytest no longer
    # finished).
    for name, fn in catalog.BENCH_ONLY.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_bench_only_disjoint_from_gated_surface():
    """A bench-only entry in the gated catalog would reintroduce the
    round-7 red row (an entry the driver can never hash-check)."""
    assert not set(catalog.BENCH_ONLY) & set(catalog.QUERIES)
    assert "similarity_topk_opq" in catalog.BENCH_ONLY
    assert not set(catalog.BENCH_ONLY) & set(catalog.ORACLE)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.slow
def test_full_catalog_oracle_exact_at_sf01():
    """The both-scales standard (round-4 lesson: sf0.01 alone hides
    boundary-rounding, sum-order, and LSH-recall divergence that 10x
    the data surfaces): every catalog query must be oracle-exact at
    sf0.1 too. Opt-in via `pytest -m slow` (~10 min)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.1"],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    tail = "\n".join(r.stdout.splitlines()[-5:])
    assert r.returncode == 0, tail
    assert ", 0 fail" in tail, tail
