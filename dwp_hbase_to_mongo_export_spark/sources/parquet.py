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

    events.parquet stores a NAIVE timestamp[us] `ts` column (pyarrow
    confirms, all scale factors). Spark 4's parquet reader defaults
    spark.sql.parquet.inferTimestampNTZ.enabled=true, so a naive column
    arrives as TIMESTAMP_NTZ — on which `unix_micros`, watermarks, and
    interval arithmetic against TIMESTAMP literals all fail analysis.
    Turning inference OFF reads it as plain TIMESTAMP under the UTC
    session timezone, which is value-identical to DuckDB's naive-UTC
    oracle reads. Both are runtime-settable SQL confs, so the source
    sets them itself instead of depending on how the caller built the
    session (the driver's harness builds its own). nanosAsLong stays on
    as a guard so a TIMESTAMP(NANOS) fixture would degrade to bigint
    (normalised below) instead of failing the read outright."""
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # never fail a read over an unsettable conf


def _normalise_ts(df: DataFrame) -> DataFrame:
    """Guard: coerce a `ts` column to plain TIMESTAMP whatever the reader
    produced — TIMESTAMP_NTZ (a caller session with NTZ inference already
    baked into a cached plan) or bigint nanos (nanosAsLong fallback)."""
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        t = field.dataType.simpleString()
        if t == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif t == "timestamp_ntz":
            # NTZ -> LTZ cast interprets the naive value in the session tz
            # (UTC), matching the oracle's naive-UTC semantics exactly.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalise_ts(df)


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to defaultParallelism*factor if the input has fewer
    partitions. Small parquet files arrive as ONE input split (they fit a
    single maxPartitionBytes chunk), which serialises every downstream
    pandas-UDF/HOF on one core; CPU-heavy operators call this so compute
    parallelism is decoupled from input file layout. No-op (and no
    shuffle) when the source already has enough splits — the 100 TB
    case.

    The "already parallel?" probe is df.inputFiles() — an analyzed-plan
    file-index lookup — NOT df.rdd.getNumPartitions(), which forces a
    full optimize+physical-plan+RDD conversion per call and composes
    into real driver-side planning overhead when operators chain.
    File count under-estimates splits (a big file yields many splits),
    which only errs toward skipping the repartition at scale — the
    safe direction: a many-file 100 TB table is never round-robined."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0  # non-file source: assume narrow, spread it
    if n_files >= target:
        return df
    return df.repartition(target)


def load_events_time_range(
    spark: SparkSession, sf_dir: str, start: str, end: str
) -> DataFrame:
    """events with ts in [start, end) — the incremental-scan predicate
    (reference: src/main/kotlin/app/batch/HBaseReader.kt:131-150,
    ``Scan.setTimeRange``).

    The range predicate is applied on the column in its AS-READ type
    BEFORE any normalising cast: Catalyst can't invert a cast/conversion
    wrapped around the column, so filtering after normalisation would
    strand the predicate above the scan. Applied first, it lands in
    PushedFilters and prunes row groups via min/max stats — at 100 TB
    the difference between scanning a day and scanning the table."""
    from datetime import datetime, timezone

    ensure_read_confs(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":  # nanosAsLong fallback path
        to_ns = lambda s: int(
            datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        ) * 1_000
        return raw.filter(
            (F.col("ts") >= F.lit(to_ns(start))) & (F.col("ts") < F.lit(to_ns(end)))
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        # push the range on the NTZ column (prunes fine), cast after
        return raw.filter(
            (F.col("ts") >= F.lit(start).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(end).cast("timestamp_ntz"))
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
