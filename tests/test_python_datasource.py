"""The custom Python DataSource (sources/hbase_cells_source.py): partition
planning, filter pushdown contract, and scan fidelity — SURVEY §2 rows
1-4 in DSv2 form."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from dwp_hbase_to_mongo_export_spark.sources import hbase_cells_source as src


def test_partition_grid_matches_reference():
    # HBasePartitioner.kt:12-37 — ceil(256/width) ranges, last one short.
    r = src.HBaseCellsReader({"path": "x", "scan_width": 5})
    parts = r.partitions()
    assert len(parts) == 52
    assert (parts[0].start, parts[0].stop) == (0, 5)
    assert (parts[-1].start, parts[-1].stop) == (255, 256)
    r40 = src.HBaseCellsReader({"path": "x", "scan_width": 40})
    assert len(r40.partitions()) == 7  # the integration fixture's 8-reader... 256/40
    assert r40.partitions()[-1].stop == 256


def test_push_filters_keeps_ts_bounds_and_returns_rest():
    r = src.HBaseCellsReader({"path": "x"})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("ts",), 100),
                LessThan(("ts",), 200),
                EqualTo(("value",), "nope"),
            ]
        )
    )
    # ts bounds accepted (pushed), the value equality returned to Spark
    assert ("ts", ">=", 100) in r._ts_filters
    assert ("ts", "<", 200) in r._ts_filters
    assert len(unsupported) == 1 and isinstance(unsupported[0], EqualTo)


def test_scan_partitioning_and_rowset(spark, sf_dir):
    src.register(spark)
    path = src.ensure_cells_fixture(spark, sf_dir)
    df = (
        spark.read.format(src.SOURCE_NAME)
        .option("path", path)
        .option("scan_width", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 52
    # every row landed in the partition its first key byte belongs to
    from dwp_hbase_to_mongo_export_spark.operators.partitioning import (
        key_partition_id,
    )

    with_pid = df.select(
        F.spark_partition_id().alias("task_pid"),
        key_partition_id(F.col("row_key"), 5).alias("key_pid"),
    )
    assert with_pid.filter(F.col("task_pid") != F.col("key_pid")).count() == 0
    # full scan row count equals the backing orders table
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    assert df.count() == load_table(spark, sf_dir, "orders").count()
