"""Parquet table sources for the driver-provided TPC-H-ish test data.

In the reference the only source is an HBase table scan
(reference: src/main/kotlin/app/batch/HBaseReader.kt:34-60); here parquet
stands in for the oracle harness and columnar scans get predicate/column
pushdown from Catalyst for free. The HBase-shaped source lives in
sources/hbase_cells.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_read_confs(spark: SparkSession) -> None:
    """Make parquet reads work on ANY session, not just ours.

    events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects outright (PARQUET_TYPE_ILLEGAL) unless
    spark.sql.legacy.parquet.nanosAsLong is on — it is a runtime-settable
    SQL conf, so the source sets it itself instead of depending on how
    the caller built the session (the driver's harness builds its own).
    UTC session timezone keeps collected timestamps bit-identical to the
    DuckDB oracle's naive-UTC values."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # never fail a read over an unsettable conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS) which Spark reads as long
    # (nanosAsLong); truncate to micros like DuckDB's ns->us cast so both
    # engines see identical values.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to defaultParallelism*factor if the input has fewer
    partitions. Small parquet files arrive as ONE input split (they fit a
    single maxPartitionBytes chunk), which serialises every downstream
    pandas-UDF/HOF on one core; CPU-heavy operators call this so compute
    parallelism is decoupled from input file layout. No-op (and no
    shuffle) when the source already has enough splits — the 100 TB
    case."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_events_time_range(
    spark: SparkSession, sf_dir: str, start: str, end: str
) -> DataFrame:
    """events with ts in [start, end) — the incremental-scan predicate.

    The ts column is stored as TIMESTAMP(NANOS), read as bigint
    (nanosAsLong): filtering on the *converted* timestamp cannot reach
    the parquet scan (Catalyst can't invert timestamp_micros), so the
    range predicate is applied to the raw nanos value first — it shows
    up in PushedFilters and prunes row groups via min/max stats, which
    at 100 TB is the difference between scanning a day and scanning the
    table. The conversion to micros happens after."""
    from datetime import datetime, timezone

    ensure_read_confs(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        to_ns = lambda s: int(
            datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        ) * 1_000
        raw = raw.filter(
            (F.col("ts") >= F.lit(to_ns(start))) & (F.col("ts") < F.lit(to_ns(end)))
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return raw
    return raw.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
