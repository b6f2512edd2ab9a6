"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dwp_hbase_to_mongo_export_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered with the explicit ``queries.DRIVER_WINDOW`` prefix first so
    the driver's ~50-query correctness window samples the queries whose
    driver evidence is missing or stalest (the registries themselves
    keep stable registration order for internal consumers)."""
    order = _catalog.driver_window_order()
    return {n: _catalog.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where SQL-expressible)."""
    order = _catalog.driver_window_order(list(_catalog.ORACLE))
    return {n: _catalog.ORACLE[n] for n in order}
