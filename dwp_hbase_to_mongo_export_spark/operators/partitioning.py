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
