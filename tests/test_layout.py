"""Z-order layout (operators/layout.py): the locality claims, pinned on
actual parquet footer statistics — not on plan shape. A z-ordered write
must make per-file min-max ranges compact on BOTH participating
dimensions; a 1-D sort only manages its own column."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import layout
from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table


def _bucket_cols():
    day = layout.fixed_bucket(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")),
        0.0,
        10.0,
        256,
    )
    price = layout.fixed_bucket(F.col("o_totalprice"), 0.0, 2000.0, 256)
    return day, price


def _mean_span(path: str, column: str) -> float:
    """Mean per-file (max - min) of a column, from parquet footers."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    lo = mn if lo is None or mn < lo else lo
                    hi = mx if hi is None or mx > hi else hi
        assert lo is not None, f"no stats for {column} in {f}"
        spans.append(
            (hi - lo).total_seconds() if hasattr(hi - lo, "total_seconds")
            else float(hi - lo)
        )
    assert spans
    return sum(spans) / len(spans)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layouts"))
    o = load_table(spark, str(sf_dir), "orders")
    day, price = _bucket_cols()

    paths = {k: os.path.join(base, k) for k in ("unsorted", "daysort", "zorder")}
    # same file count everywhere so spans are comparable; 16 files cuts
    # the z-curve on 4 leading bits = 2 per dimension (a 4x4 grid), the
    # symmetric split that shows locality on BOTH dimensions
    o.repartition(16).write.parquet(paths["unsorted"])
    (
        o.repartitionByRange(16, F.col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.parquet(paths["daysort"])
    )
    layout.zorder_write(o, paths["zorder"], layout.interleave_bits(day, price), 16)
    return paths


def test_zorder_tightens_both_dimensions(layouts):
    """Per-file spans: z-order must be much tighter than the unsorted
    layout on the date dimension AND much tighter than the date-sorted
    layout on the price dimension — the 'both at once' property no 1-D
    sort can deliver."""
    z_day = _mean_span(layouts["zorder"], "o_orderdate")
    z_price = _mean_span(layouts["zorder"], "o_totalprice")
    unsorted_day = _mean_span(layouts["unsorted"], "o_orderdate")
    daysort_price = _mean_span(layouts["daysort"], "o_totalprice")

    assert z_day < 0.6 * unsorted_day, (z_day, unsorted_day)
    assert z_price < 0.6 * daysort_price, (z_price, daysort_price)


def test_daysort_leaves_price_full_domain(layouts):
    """The comparison is honest: the 1-D sort really does keep date
    tight while leaving price at (near) full domain per file."""
    daysort_day = _mean_span(layouts["daysort"], "o_orderdate")
    unsorted_day = _mean_span(layouts["unsorted"], "o_orderdate")
    daysort_price = _mean_span(layouts["daysort"], "o_totalprice")
    unsorted_price = _mean_span(layouts["unsorted"], "o_totalprice")
    assert daysort_day < 0.2 * unsorted_day
    assert daysort_price > 0.8 * unsorted_price


def _files_hit(path: str, column: str, lo_q, hi_q) -> int:
    """Files whose footer [min,max] on ``column`` intersects [lo_q, hi_q]
    — exactly the file-level skipping a stats-aware reader performs."""
    hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column:
                    s = col.statistics
                    lo = s.min if lo is None or s.min < lo else lo
                    hi = s.max if hi is None or s.max > hi else hi
        if lo <= hi_q and hi >= lo_q:
            hit += 1
    return hit


def test_zorder_prunes_across_a_mixed_workload(layouts):
    """The actual claim of multi-dimensional clustering: ROBUSTNESS. A
    1-D date sort wins a date-only predicate and loses a price-only
    predicate outright (reads every file); z-order prunes BOTH. Over a
    workload of one ~1-year date query and one ~10%-of-domain price
    query, z-order must touch fewer total files than either 1-D layout,
    and must beat the date sort on the price query by itself."""
    import datetime as dt

    utc = dt.timezone.utc
    date_q = (dt.datetime(1997, 1, 1, tzinfo=utc), dt.datetime(1998, 1, 1, tzinfo=utc))
    price_q = (100_000.0, 150_000.0)

    def workload(path: str) -> tuple[int, int]:
        return (
            _files_hit(path, "o_orderdate", *date_q),
            _files_hit(path, "o_totalprice", *price_q),
        )

    z_date, z_price = workload(layouts["zorder"])
    d_date, d_price = workload(layouts["daysort"])
    u_date, u_price = workload(layouts["unsorted"])

    assert z_price < d_price, (z_price, d_price)  # date sort can't prune price
    assert z_date < u_date, (z_date, u_date)  # unsorted can't prune anything
    assert z_date + z_price < d_date + d_price, ((z_date, z_price), (d_date, d_price))
    assert z_date + z_price < u_date + u_price
