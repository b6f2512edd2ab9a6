"""Edge-case tests for the temporal join operators (operators/asof.py).

The oracle-parity tests (test_catalog_oracle.py) pin these against
DuckDB's native ASOF JOIN / inequality join on real data; here we pin
the boundary semantics on hand-built frames:
- left row with no preceding right row -> null right columns;
- exactly-simultaneous right row IS matched (ts >= semantics);
- the latest of several candidates wins;
- range join boundaries are [start, start+window) per key, including
  matches that cross the internal bucket boundary.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators.asof import (
    asof_join,
    range_join_time_window,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_preceding(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (2, _ts("2024-01-01 09:00:00"), "L3"),  # nothing precedes
        ],
        "k int, l_ts timestamp, l_tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), "R-early"),
            (1, _ts("2024-01-01 10:00:00"), "R-simultaneous"),
            (1, _ts("2024-01-01 11:00:00"), "R-late"),
            (2, _ts("2024-01-01 09:30:00"), "R-after-left"),
        ],
        "k int, r_ts timestamp, r_tag string",
    )
    out = asof_join(left, right, on="k", left_ts="l_ts", right_ts="r_ts",
                    right_cols=["r_tag", "r_ts"])
    rows = {r["l_tag"]: r for r in out.collect()}
    assert len(rows) == 3
    # ts >= semantics: the simultaneous right row wins over the earlier one.
    assert rows["L1"]["r_tag"] == "R-simultaneous"
    # latest preceding wins.
    assert rows["L2"]["r_tag"] == "R-late"
    # no preceding right row -> nulls.
    assert rows["L3"]["r_tag"] is None and rows["L3"]["r_ts"] is None


def test_asof_join_is_left_total(spark, sf_dir):
    """Every left row appears exactly once regardless of match count."""
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts")
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("cid")
    )
    out = asof_join(left, right, on="user_id", left_ts="p_ts",
                    right_ts="c_ts", right_cols=["cid"])
    assert out.count() == left.count()
    assert out.select("pid").distinct().count() == left.count()


def test_range_join_boundaries(spark):
    base = _ts("2024-01-01 10:00:00")

    def plus(seconds: float) -> dt.datetime:
        return base + dt.timedelta(seconds=seconds)

    left = spark.createDataFrame(
        [(1, base, "L")], "k int, l_ts timestamp, l_tag string"
    )
    right = spark.createDataFrame(
        [
            (1, plus(-0.5), "before"),        # excluded: r < l
            (1, plus(0), "at-start"),         # included: r == l
            (1, plus(59.999), "inside"),      # included (also crosses bucket)
            (1, plus(60), "at-end"),          # excluded: r == l + window
            (2, plus(10), "other-key"),       # excluded: key mismatch
        ],
        "k int, r_ts timestamp, r_tag string",
    )
    out = range_join_time_window(
        left, right, on="k", left_ts="l_ts", right_ts="r_ts", window_seconds=60
    )
    tags = sorted(r["r_r_tag"] for r in out.collect())
    assert tags == ["at-start", "inside"]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    """A right row matching via the second candidate bucket appears once."""
    base = _ts("2024-01-01 10:00:00")
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=30), "L")],
        "k int, l_ts timestamp, l_tag string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=75), "R")],
        "k int, r_ts timestamp, r_tag string",
    )
    out = range_join_time_window(
        left, right, on="k", left_ts="l_ts", right_ts="r_ts", window_seconds=60
    )
    assert out.count() == 1
