"""Bucketed-layout tests: a join between two tables bucketed on the
join key must plan with ZERO exchanges, and results must match the
plain shuffled join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", 4)
    write_bucketed(li, "lineitem_b", "l_orderkey", 4)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Force the large⋈large path (at test scale the small side would
    # broadcast, which hides the co-location property under test).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ot, lt = bucketed_tables
        o = read_bucketed(spark, ot)
        li = read_bucketed(spark, lt)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("qty"))
        plan = _plan(joined)
        # The join itself is exchange-free (bucket co-location); the only
        # allowed exchange is the final tiny aggregation on priority.
        tree = plan.split("(1) Scan")[0]
        assert tree.count("Exchange") == 1
        assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    o_b = read_bucketed(spark, ot)
    li_b = read_bucketed(spark, lt)
    bucketed = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    ot, _ = bucketed_tables
    o = read_bucketed(spark, ot)
    agg = o.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert "Exchange" not in _plan(agg)
