"""Bucketed (co-located) table layout — the shuffle-elimination lever
for repeated large⋈large joins and aggregations on a stable key.

At 100 TB the fact⋈fact join (e.g. lineitem⋈orders on orderkey, or the
export pipeline's record⋈manifest alignment) shuffles both sides every
run. Writing both sides bucketed by the join key with the same bucket
count makes the join a zipped per-bucket hash join: ZERO exchanges at
read time, forever after. The write pays one shuffle once; every
downstream join/groupBy on the bucket key is exchange-free.

Spark specifics encoded here:
- bucketBy is only available via ``saveAsTable`` (the bucket metadata
  lives in the catalog, not the parquet footer);
- both sides must have the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` within buckets additionally removes the sort from
  sort-merge joins and enables bucket-local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table keyed for co-located joins on ``bucket_col``."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
