"""As-of and time-range joins — temporal operators Spark lacks as builtins.

The reference engine has no joins at all (SURVEY.md §2 "deliberately
absent"); these are part of the 100 TB-extension surface. Both are
implemented as compositions of existing DataFrame ops (the brief's
preferred strategy) rather than UDFs, so Catalyst/Tungsten handle them:

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` within the same key — the classic backward
  as-of join (pandas ``merge_asof`` / kdb ``aj`` semantics).
  Implemented as union + window ``last(ignorenulls)`` instead of an
  inequality join: ONE shuffle on the key and a per-partition sort,
  linear in rows. A naive ``left.ts >= right.ts`` join is a cartesian
  per key (Spark would pick BroadcastNestedLoopJoin or a sort-merge on
  the key with quadratic per-key probing) — unusable when a hot key has
  millions of rows.

- ``range_join_time_window``: all (left, right) pairs with
  ``right_ts ∈ [left_ts, left_ts + window)`` per key. Implemented by
  quantising time into ``window``-sized buckets and equi-joining on
  (key, bucket) with the left side exploded to its two candidate
  buckets, then exact-filtering. The equi-join keeps it a hash/SMJ —
  pair count is bounded by true matches + same-2-bucket near-misses,
  not |L|×|R| per key. This is the bucketed "band join" strategy range
  joins use in Databricks' range-join optimisation and in interval
  libraries; at 100 TB the bucket width is the knob that trades
  shuffle fan-out (2×) against false-candidate filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_ts`` <= its ``left_ts`` (ties on the key column
    broken by right-side arrival order in the sort, which is
    deterministic when (on, right_ts) is unique).

    Returns all left columns plus ``right_cols`` (null when no right row
    precedes). Exactly one shuffle: the window's hash partition on
    ``on``; the union is narrow.
    """
    marker = F.lit(1)
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", marker)
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    # Align schemas: right rows carry nulls for the left payload columns.
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    merged = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    # Right rows sort BEFORE left rows at the same timestamp so an exactly
    # simultaneous right row is visible to the left row (ts >= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__f_{c}").alias(c) for c in right_cols
    ]
    return filled.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join_time_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: float,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    ``left_ts <= right_ts < left_ts + window_seconds``.

    Bucketed band-join: right rows land in bucket floor(ts/w); each left
    row probes its own bucket and the next one (the interval spans at
    most two buckets because its length equals the bucket width), via an
    explode to 2 candidate buckets followed by an equi-join and the
    exact range filter.
    """
    w_us = int(window_seconds * 1_000_000)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn("__l_us", l_us).withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.col("__l_us") / w_us).cast("long"),
                (F.col("__l_us") / w_us).cast("long") + 1,
            )
        ),
    )
    r = right.withColumn("__r_us", r_us).withColumn(
        "__bucket", (F.col("__r_us") / w_us).cast("long")
    )
    cond = (
        (l[on] == r[on])
        & (l["__bucket"] == r["__bucket"])
        & (r["__r_us"] >= l["__l_us"])
        & (r["__r_us"] < l["__l_us"] + F.lit(w_us))
    )
    lcols = [l[c] for c in left.columns]
    rcols = [r[c].alias(f"r_{c}") for c in right.columns if c != on]
    return l.join(r, cond).select(*lcols, *rcols)
