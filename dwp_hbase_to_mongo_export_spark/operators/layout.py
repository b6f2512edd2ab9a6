"""Z-order (Morton-curve) data layout for multi-dimensional scan
locality (Morton 1966; the technique behind Delta Lake's OPTIMIZE
ZORDER BY, public literature).

A 100 TB table is pruned at the scan by parquet row-group/file min-max
statistics. Sorting by ONE column makes that column's ranges tight per
file but leaves every other column's range full-domain; interleaving
the BITS of several columns into one sort key gives every participating
column a ~sqrt-tight range per file, so a conjunctive box predicate
(day range AND price range) skips files on BOTH dimensions.

Spark-first design:

* The z-value is a pure JVM column expression — fixed data-independent
  bucketing (the histogram-sketch discipline, so the layout never needs
  a stats pass and the same expression is engine-portable and
  oracle-checkable bit-for-bit in DuckDB with the same `<<`/`&`/`|`
  operators), then bit interleaving as an OR-fold of shift/mask terms.
* The write is ONE range repartition on the z-value (Spark samples the
  range bounds — the only data-dependent step, and it touches only the
  sort key) + a within-partition sort; both scale linearly and the
  shuffle moves each row exactly once, the same cost as any global
  sort-write.
* No custom reader: pruning comes from vanilla parquet min-max stats on
  the RAW columns (bucketing is monotone per dimension), so every
  engine that reads the files — Spark, DuckDB, Trino — benefits.

Reference scope note: the reference writes size-rolled snapshot files
with no intra-file ordering (S3StreamingWriter.kt:95-161); this extends
the sink family with the layout optimisation a scan-heavy lakehouse
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension; 2 dims -> 16-bit z-value


def fixed_bucket(value: Column, lo: float, width: float, nbuckets: int) -> Column:
    """Monotone data-independent bucket id: floor((x-lo)/width) clamped
    to [0, nbuckets-1] — same family as the histogram sketch's bucket,
    so no stats pass is needed and the mapping is engine-portable.

    NULL caveat: floor(NULL)=NULL but greatest(NULL,0)=0 (Spark's
    greatest/least skip nulls), so a NULL value lands in bucket 0. For
    a LAYOUT key that is acceptable — every row must land somewhere and
    co-locating nulls at the low edge is as good a place as any — which
    is why, unlike hist_build (where bucket-0 nulls skew quantiles),
    callers here need not pre-filter; they only need to know nulls
    cluster into the lowest z-region."""
    raw = F.floor((value - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbuckets - 1)).cast("bigint")


def interleave_bits(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton z-value of two bucket ids: bit i of ``a`` lands at
    position 2i+1, bit i of ``b`` at position 2i. An OR-fold of
    2*bits shift/mask terms — pure codegen, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def zorder_write(
    df: DataFrame, path: str, zvalue: Column, n_files: int
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    z-value: one range repartition on z + a within-partition sort, so
    each output file covers a compact z-range — a compact box in the
    bucketed dimension space. The z-value rides only through the
    shuffle; it is not materialised in the output schema."""
    (
        df.repartitionByRange(n_files, zvalue.alias("_z"))
        .sortWithinPartitions(zvalue.alias("_z"))
        .write.mode("overwrite")
        .parquet(path)
    )
