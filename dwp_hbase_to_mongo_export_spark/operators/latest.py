"""Latest-version-per-key dedup.

Reference: the HBase Scan returns only the newest cell version inside the
scan time range (src/main/kotlin/app/batch/HBaseResultProcessor.kt:76-77,
SURVEY.md §1.1). When the source materialises every version (our parquet
stand-in, or a raw change-feed), this operator reinstates those
semantics.

Scale: one shuffle on the key — unavoidable; at 100 TB prefer
max_by(struct) aggregation over window+filter when only the latest row's
columns are needed (single agg, partial map-side combine, no sort), which
is what reduce_latest does. keep_latest is the window form retained for
when downstream needs the full row ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_latest(df: DataFrame, key_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """Window row_number form — exact reference semantics, stable under
    ties via the full ordering."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def reduce_latest(df: DataFrame, key_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """max_by aggregation form — same result when ts is unique per key;
    cheaper at scale (partial aggregation, no per-partition sort)."""
    others = [c for c in df.columns if c not in key_cols]
    return df.groupBy(*key_cols).agg(
        *[F.max_by(c, F.col(ts_col)).alias(c) for c in others]
    )
