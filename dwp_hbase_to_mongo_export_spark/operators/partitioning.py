"""Key-range partitioning analogue.

Reference: src/main/kotlin/app/batch/HBasePartitioner.kt:12-37 splits the
256-value first-key-byte space into scan.width-wide ranges (default 5 ->
51 ranges + remainder), one scanner thread each.

In Spark the source's input partitions already play this role (parquet
row groups / HBase region splits), so this module exists for:
- parity: compute the reference's partition id for a key, so tests can
  pin identical range assignment;
- repartitioning a cells DataFrame by key range before a sink that wants
  deterministic file naming per range (sinks/snapshot.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_ranges(scan_width: int = 5) -> list[tuple[int, int]]:
    """[(start, stop), ...) byte ranges; stop of the last range is 256.
    Mirrors the reference's grid: ceil(256/width) ranges."""
    return [(lo, min(lo + scan_width, 256)) for lo in range(0, 256, scan_width)]


def key_partition_id(row_key: Column, scan_width: int = 5) -> Column:
    """Partition id = first key byte div scan_width. The fixture row key
    leads with a CRC32 byte, so ids are uniform — the property that makes
    byte-range partitioning balanced at 100 TB (SURVEY.md §1.1)."""
    # substring on binary yields binary; hex -> conv gives the unsigned
    # byte value (0-255) without a signed-byte correction
    first_byte = F.conv(F.hex(F.substring(row_key, 1, 1)), 16, 10).cast("int")
    return (first_byte / F.lit(scan_width)).cast("int")


def repartition_by_key_range(df: DataFrame, scan_width: int = 5) -> DataFrame:
    n = len(partition_ranges(scan_width))
    return df.repartitionByRange(n, key_partition_id(F.col("row_key"), scan_width))


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Fan a NARROW scan out to the session's parallelism before heavy
    per-row work — scale-adaptively, never by a constant.

    Why it exists: a parquet file is only splittable at row-group
    boundaries, so a small input (one row group) plans as ONE scan
    partition and every pre-exchange expression — gram hashing, JSON
    parsing, histogram counting — runs on one core no matter how many
    the session has (measured: the whole editdist staging chain
    serialised on 1 of 32 cores). A corpus at real scale has thousands
    of row groups and needs nothing, so this is a NO-OP whenever the
    planned scan already has >= defaultParallelism partitions — it can
    never coalesce real parallelism, and it adapts to whatever core
    count the session was given (the bench's contract: the same code is
    timed at several core counts).

    The shuffle it inserts carries the caller's NARROW projection
    (select the join/id + payload columns first), i.e. strictly fewer
    bytes than the first natural exchange of the pipelines it feeds.
    ``keys`` hash-partitions deterministically (retry-safe by key, and
    skips round-robin's sort-before-repartition pass); with no keys it
    falls back to round-robin, acceptable only for map-only consumers.

    This is the KEYED sibling of sources.parquet.ensure_parallelism
    (which guards the pandas-UDF operators) and shares its cheap
    "already parallel?" probe: df.inputFiles() — an analyzed-plan
    file-index lookup, not df.rdd.getNumPartitions(), which forces a
    full optimize+physical-plan+RDD conversion per call. File count
    under-estimates splits (a big file yields many splits), which only
    errs toward skipping the repartition at scale — the safe
    direction."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0  # non-file source: assume narrow, spread it
    if n_files >= n:
        return df
    if keys:
        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)
