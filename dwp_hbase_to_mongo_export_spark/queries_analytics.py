"""Analytics operator coverage beyond the reference's fixed dataflow:
semi-join, anti-join, windowed top-k per group, rollup aggregation, and
watermarked streaming dedup.

The reference deliberately has none of these (SURVEY.md §2 "deliberately
absent"); BASELINE.json's north star adds them as engine capabilities.
Each is declared with the DataFrame API so Catalyst picks the physical
strategy — the scale notes on each query say which strategy that should
be and why it survives 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import query
from .sources.parquet import load_table


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (TPC-H Q4 shape; the synthetic lineitem
    has no commit/receipt dates, so "late" is stood in by returnflag='R').

    Scale: the semi-join shuffles only the join key + grouping column,
    never materialises matched lineitem rows, and the date filter is
    pushed to the orders scan. AQE converts to broadcast when the
    filtered side fits."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
    # every sf0.001/sf0.01 customer has an order — the anti-join only
    # selects rows at sf0.1+, so driver rows at the small scales are
    # agreement-on-emptiness, not value evidence (round-9 verdict #3)
    empty_at=("sf0.001", "sf0.01"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join, then a broadcast dim join.

    Scale: anti-join shuffles keys only; nation is a broadcast dim (25
    rows), so the only wide exchange is the customer/orders key shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rank FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window + rank filter.

    Scale: one hash shuffle on the partition key; Spark inserts a
    WindowGroupLimit (partial top-k before the shuffle) for rank<=k
    filters, so the exchange carries at most k rows per key per map
    partition — the 100 TB-safe form of per-group top-k."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


@query(
    "revenue_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via rollup (grouping-sets family).

    Scale: Spark expands rollup to one Expand + single aggregation pass
    (map-side partial aggs per grouping set) — one shuffle regardless of
    how many subtotal levels, vs one job per level if hand-rolled."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 1 HOUR OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 1 HOUR) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: events grouped into per-user sessions that close
    after 1 hour of inactivity, via the built-in session_window agg
    (works identically over a stream with a watermark).

    Scale: one shuffle on the session key (user_id); Spark merges
    overlapping candidate windows inside the aggregation, so state/work
    is linear in events. The oracle reproduces the semantics with a
    gaps-and-islands window chain — the pre-Spark-3.2 formulation, which
    costs an extra full sort; session_window is the cheaper native form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "distinct_users_per_day",
    oracle="""
    SELECT epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_us,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def distinct_users_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation alongside a plain count.

    Scale: count(distinct) expands to a two-phase aggregate (partial
    distinct per map task, then merge) — one extra exchange vs the plain
    count; when the exactness requirement relaxes, swap
    approx_count_distinct (HLL, single pass, mergeable sketches)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        F.unix_micros("day").alias("day_us"), "n_users", "n_events"
    )


@query(
    "median_value_by_type",
    oracle="""
    SELECT event_type,
           round(median(value), 2) AS median_value,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (UDAF surface) as a GROUPED_AGG pandas UDF.

    Exact median has no builtin aggregate expression (percentile_approx
    is approximate), so this is the honest custom-UDAF case: an
    Arrow-batched grouped-agg pandas UDF. Scale: the group's values must
    fit one executor's memory per key — correct for bounded groups;
    for unbounded keys switch to percentile_approx (mergeable sketch,
    partial aggregation, no per-key materialisation)."""

    @F.pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    @F.pandas_udf("long")
    def _n(v: pd.Series) -> int:
        # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregate
        # functions in one agg(), so the count rides along as a pandas agg.
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(_median("value"), 2).alias("median_value"),
        _n("value").alias("n_events"),
    )


@query(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           round(sum(value), 2) AS sum_value,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    events has only a handful of event_type values — the canonical
    hot-key shape where a plain groupBy funnels each key through one
    reducer. Phase 1 aggregates on (key, salt) — 16-way fan-out of every
    hot key; phase 2 merges the 16 partials per key. Results are
    identical to the direct groupBy (the oracle IS the direct form);
    the plan trades one extra (tiny) shuffle for bounded per-task input.
    Spark's map-side partial aggregation makes this redundant for
    algebraic aggs like sum/count — the pattern is for when partial
    aggregation can't help: collect_list/collect_set, exact distinct
    merges, or grouped-map UDFs on skewed keys."""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.hash("event_id"), F.lit(16)).alias("salt")
    partial = ev.groupBy("event_type", salt).agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return partial.groupBy("event_type").agg(
        F.round(F.sum("s"), 2).alias("sum_value"),
        F.sum("n").alias("n_events"),
    )


@query(
    "streaming_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates on the key columns over the
    event stream, driven to completion with AvailableNow.

    Scale: state is one empty-value entry per distinct key, partitioned
    by key hash; with dropDuplicatesWithinWatermark the state is bounded
    by the watermark horizon instead of |keys| for continuous runs."""
    from .streaming import incremental as streaming

    ev = streaming.stream_table(spark, sf_dir, "events")
    dedup = ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    return streaming.run_available_now(dedup)


@query(
    "percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL percentile_cont semantics).

    Scale: exact percentile materialises the group's values — fine for
    bounded groups; the unbounded-cardinality escape hatch is
    percentile_approx (KLL-style mergeable sketch, partial aggregation,
    tunable accuracy), same call shape."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 4).alias("p50"),
        F.round(pct[1], 4).alias("p90"),
        F.round(pct[2], 4).alias("p99"),
    )


@query(
    "udtf_split_sentences",
    oracle="""
    WITH p AS (
      SELECT doc_id, string_split_regex(text, '[.!?]+') AS parts
      FROM documents WHERE doc_id < 100
    ),
    ix AS (
      SELECT doc_id, parts, unnest(range(1, len(parts) + 1)) AS i FROM p
    )
    SELECT doc_id, CAST(i AS INT) AS sent_idx,
           trim(parts[CAST(i AS INT)], ' ' || chr(9) || chr(10) || chr(13)) AS sentence,
           length(trim(parts[CAST(i AS INT)], ' ' || chr(9) || chr(10) || chr(13))) AS n_chars
    FROM ix
    WHERE trim(parts[CAST(i AS INT)], ' ' || chr(9) || chr(10) || chr(13)) <> ''
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: one input row -> N output rows (sentence
    splitting), the table-function shape that select+explode can't
    express when the fan-out logic is imperative.

    Scale: UDTFs are per-row Python — the slow path by design; this
    entry demonstrates the SURFACE (lateral join, declared schema). When
    the split is regex-expressible prefer posexplode(split(...)) which
    stays in codegen; the arrow serialisation here at least batches the
    transport."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            import re

            for i, part in enumerate(re.split(r"[.!?]+", text or "")):
                s = part.strip(" \t\n\r")
                if s:
                    yield i + 1, s, len(s)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM __udtf_docs d, LATERAL split_sentences(d.text) s"
    )


@query(
    "distinct_users_kmv",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                           AS BIGINT) AS hv
      FROM events
    ),
    smallest AS (SELECT hv FROM h ORDER BY hv LIMIT 64)
    SELECT count(*) AS k_used,
           max(hv) AS kth_hash,
           CAST(round((count(*) - 1) * 4294967296.0 / max(hv), 0) AS BIGINT)
             AS est_distinct
    FROM smallest
    """,
)
def distinct_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values) distinct-count sketch, k=64: estimate =
    (k-1) / kth-smallest hash fraction. Unlike HLL (whose register layout
    is implementation-private, so approx_count_distinct can't be
    value-checked across engines), KMV over an md5 hash is DETERMINISTIC
    — the oracle reproduces the estimate bit-for-bit.

    Scale: CONSTANT-STATE build (sketches.kmv_partials) — each partition
    folds to its local 64 distinct minima map-side, so the exchange
    carries <= 64 hashes per partition (no shuffle of the per-partition-
    distinct key set — the cardinality-sized exchange the round-7 build
    paid; plan-pinned Exchange-free below the fold in
    tests/test_sketches.py); the final distinct + TakeOrdered operates
    on <= 64 x n_partitions rows. The sketch is mergeable (union of
    k-min sets -> k-min of union), which is what makes it a sketch:
    per-day sketches combine into a month without rescanning."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    partials = sketches.kmv_partials(
        ev.select(sketches.kmv_hash(F.col("user_id")).alias("hv"))
    )
    smallest = partials.distinct().orderBy("hv").limit(64)
    return smallest.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_hash"),
        F.round((F.count(F.lit(1)) - 1) * F.lit(4294967296.0) / F.max("hv"), 0)
        .cast("bigint")
        .alias("est_distinct"),
    )


@query(
    "funnel_analysis",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2 FROM events e
      JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.ts1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3 FROM events e
      JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.ts2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'view' AS stage, (SELECT count(*) FROM t1) AS n_users
    UNION ALL SELECT 'click_after_view', (SELECT count(*) FROM t2)
    UNION ALL SELECT 'purchase_after_click', (SELECT count(*) FROM t3)
    """,
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel (view -> later click -> later
    purchase): each stage is the earliest qualifying event strictly
    after the previous stage's time — the sequence-aware funnel that a
    naive per-type EXISTS overcounts.

    Scale: three cascaded aggregations all keyed on user_id — one hash
    partitioning reused down the chain (the stage frames are
    user-count-sized and shrink monotonically), then three scalar
    counts unioned. No window over the raw event stream, no
    per-user sort."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(etype: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    t1 = stage("view", None, "", "ts1")
    t2 = stage("click", t1, "ts1", "ts2")
    t3 = stage("purchase", t2, "ts2", "ts3")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        count_row("view", t1)
        .unionAll(count_row("click_after_view", t2))
        .unionAll(count_row("purchase_after_click", t3))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firstday AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firstday f ON f.user_id = e.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset,
           count(*) AS n_users
    FROM active WHERE day_offset <= 7 GROUP BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted
    distinct per (cohort, day-offset) for the first week — the
    triangle matrix behind every retention curve.

    Scale: first-day is one user-keyed aggregation broadcast back onto
    the stream (cohort table is |users|-sized); the distinct and the
    final count share the (cohort, offset) key. The offset cap bounds
    the output to |cohorts| * 8 rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


@query(
    "kmv_sketch_merge",
    oracle="""
    WITH h AS (
      SELECT DISTINCT dayofmonth(ts) % 4 AS shard,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM events
    ),
    per_shard AS (
      SELECT shard, hv FROM (
        SELECT shard, hv, row_number() OVER (PARTITION BY shard ORDER BY hv) AS rn
        FROM h) WHERE rn <= 64
    ),
    merged AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM per_shard) ORDER BY hv LIMIT 64
    ),
    direct AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM h) ORDER BY hv LIMIT 64
    ),
    agg AS (
      SELECT 'merged' AS scope, count(*) AS k_used, max(hv) AS kth_hash,
             CAST(round((count(*) - 1) * 4294967296.0 / max(hv), 0) AS BIGINT)
               AS est_distinct
      FROM merged
      UNION ALL
      SELECT 'direct', count(*), max(hv),
             CAST(round((count(*) - 1) * 4294967296.0 / max(hv), 0) AS BIGINT)
      FROM direct
    )
    SELECT * FROM agg
    """,
)
def kmv_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA, pinned: per-shard KMV sketches (k smallest hashes
    per time shard) merged by taking the k smallest of their union must
    equal the sketch built directly over all data — the mergeability
    that makes cardinality estimation shardable (per-day sketches
    combine into a month without rescanning; each executor ships 64
    longs, not its hash set). Both rows of the output carry the SAME
    estimate; the oracle pins that equality exactly.

    Scale: CONSTANT-STATE build — kmv_partials folds each partition to
    its local 64 distinct minima PER SHARD map-side, so the exchange
    carries <= shards x 64 hashes per partition (never the hash set);
    the per-shard k-mins are then a windowed top-k over that partial
    relation, and the merge operates on shards x k rows. The direct
    (all-data) sketch is derived from the SAME partials: a hash in the
    global bottom-64 is in its shard's bottom-64, hence in its
    partition's per-shard partial — the mergeability being pinned."""
    from pyspark.sql.window import Window

    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        (F.dayofmonth("ts") % 4).alias("shard"),
        sketches.kmv_hash(F.col("user_id")).alias("hv"),
    )
    partials = sketches.kmv_partials(h, "hv", ["shard"]).distinct()
    w = Window.partitionBy("shard").orderBy("hv")
    per_shard = (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select("shard", "hv")
    )
    merged = per_shard.select("hv").distinct().orderBy("hv").limit(64)
    direct = partials.select("hv").distinct().orderBy("hv").limit(64)

    def sketch_agg(df: DataFrame, scope: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("hv").alias("kth_hash"),
            F.round((F.count(F.lit(1)) - 1) * F.lit(4294967296.0) / F.max("hv"), 0)
            .cast("bigint")
            .alias("est_distinct"),
        ).select(F.lit(scope).alias("scope"), "k_used", "kth_hash", "est_distinct")

    return sketch_agg(merged, "merged").unionAll(sketch_agg(direct, "direct"))


@query(
    "kmv_jaccard_sets",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    sa AS (SELECT hv FROM h WHERE event_type = 'click' ORDER BY hv LIMIT 64),
    sb AS (SELECT hv FROM h WHERE event_type = 'purchase' ORDER BY hv LIMIT 64),
    su AS (
      SELECT hv FROM (SELECT hv FROM sa UNION SELECT hv FROM sb)
      ORDER BY hv LIMIT 64
    ),
    both_sets AS (
      SELECT hv FROM su
      WHERE hv IN (SELECT hv FROM sa) AND hv IN (SELECT hv FROM sb)
    )
    SELECT (SELECT count(*) FROM su) AS k_used,
           CAST(round(((SELECT count(*) FROM su) - 1) * 4294967296.0
                      / (SELECT max(hv) FROM su), 0) AS BIGINT) AS union_est,
           round((SELECT count(*) FROM both_sets) * 1.0
                 / (SELECT count(*) FROM su), 4) AS jaccard_est,
           CAST(round((SELECT count(*) FROM both_sets) * 1.0
                      / (SELECT count(*) FROM su)
                      * (((SELECT count(*) FROM su) - 1) * 4294967296.0
                         / (SELECT max(hv) FROM su)), 0) AS BIGINT) AS inter_est,
           CAST(greatest(0,
                round(((SELECT count(*) FROM sa) - 1) * 4294967296.0
                      / (SELECT max(hv) FROM sa), 0)
                - round((SELECT count(*) FROM both_sets) * 1.0
                        / (SELECT count(*) FROM su)
                        * (((SELECT count(*) FROM su) - 1) * 4294967296.0
                           / (SELECT max(hv) FROM su)), 0))
                AS BIGINT) AS diff_a_est,
           CAST(greatest(0,
                round(((SELECT count(*) FROM sb) - 1) * 4294967296.0
                      / (SELECT max(hv) FROM sb), 0)
                - round((SELECT count(*) FROM both_sets) * 1.0
                        / (SELECT count(*) FROM su)
                        * (((SELECT count(*) FROM su) - 1) * 4294967296.0
                           / (SELECT max(hv) FROM su)), 0))
                AS BIGINT) AS diff_b_est
    """,
)
def kmv_jaccard_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET ALGEBRA: estimate the union size, Jaccard similarity, and
    intersection size of two user sets (clickers vs purchasers) from
    their k-minimum-value sketches alone — the third member of the KMV
    family after the single-set estimate (distinct_users_kmv) and the
    mergeability pin (kmv_sketch_merge). The classic estimator
    (Beyer et al. 2007, public literature): among the k smallest hashes
    of the UNION sketch, the fraction present in both per-set sketches
    estimates Jaccard; intersection = J x union-estimate; set DIFFERENCES
    follow by inclusion-exclusion from each side's own sketch estimate
    (|A\\B| ~ |A| - |A inter B|, floored at 0) — so two 64-long
    summaries answer every binary set question without ever co-shuffling
    the underlying sets. md5 hashing keeps every number deterministic and
    bit-for-bit oracle-checkable (the reason this family avoids HLL).

    Scale: CONSTANT-STATE build — kmv_partials folds each partition to
    its local 64 distinct minima per event_type map-side, so the
    exchange carries <= 2 x 64 hashes per partition; everything
    downstream operates on <=128 rows. At 100 TB the two sets never
    meet — only their sketches do."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    h = ev.select(
        "event_type",
        sketches.kmv_hash(F.col("user_id")).alias("hv"),
    )
    p = sketches.kmv_partials(h, "hv", ["event_type"])
    sa = (
        p.filter(F.col("event_type") == "click")
        .select("hv")
        .distinct()
        .orderBy("hv")
        .limit(64)
    )
    sb = (
        p.filter(F.col("event_type") == "purchase")
        .select("hv")
        .distinct()
        .orderBy("hv")
        .limit(64)
    )
    su = sa.unionAll(sb).distinct().orderBy("hv").limit(64)
    both = su.join(sa, "hv", "left_semi").join(sb, "hv", "left_semi")
    stats = (
        su.agg(F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("max_hv"))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("n_both")))
        .crossJoin(
            sa.agg(F.count(F.lit(1)).alias("k_a"), F.max("hv").alias("max_a"))
        )
        .crossJoin(
            sb.agg(F.count(F.lit(1)).alias("k_b"), F.max("hv").alias("max_b"))
        )
    )
    scale = F.lit(4294967296.0)
    inter = F.round(
        F.col("n_both") / F.col("k_used") * ((F.col("k_used") - 1) * scale / F.col("max_hv")),
        0,
    )
    a_est = F.round((F.col("k_a") - 1) * scale / F.col("max_a"), 0)
    b_est = F.round((F.col("k_b") - 1) * scale / F.col("max_b"), 0)
    return stats.select(
        "k_used",
        F.round((F.col("k_used") - 1) * scale / F.col("max_hv"), 0)
        .cast("bigint")
        .alias("union_est"),
        F.round(F.col("n_both") / F.col("k_used"), 4).alias("jaccard_est"),
        inter.cast("bigint").alias("inter_est"),
        F.greatest(F.lit(0.0), a_est - inter).cast("bigint").alias("diff_a_est"),
        F.greatest(F.lit(0.0), b_est - inter).cast("bigint").alias("diff_b_est"),
    )


@query(
    "corpus_drift_psi",
    oracle="""
    WITH cohorts AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5('drift:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 'ref' ELSE 'cur' END AS cohort,
             least(CAST(floor(n_chars / 100.0) AS BIGINT), 9) AS b_chars,
             least(CAST(floor(len(string_split(text, ' ')) / 20.0) AS BIGINT), 9) AS b_tokens
      FROM documents
    ),
    feat AS (
      SELECT cohort, 'n_chars' AS feature, b_chars AS bucket FROM cohorts
      UNION ALL
      SELECT cohort, 'n_tokens' AS feature, b_tokens AS bucket FROM cohorts
    ),
    counts AS (
      SELECT feature, bucket,
             sum(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END) AS n_cur
      FROM feat GROUP BY feature, bucket
    ),
    tot AS (
      SELECT feature, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
      FROM counts GROUP BY feature
    ),
    shares AS (
      SELECT c.feature, c.bucket,
             c.n_ref * 1.0 / t.t_ref AS ref_share,
             c.n_cur * 1.0 / t.t_cur AS cur_share
      FROM counts c JOIN tot t ON t.feature = c.feature
    )
    SELECT feature, bucket,
           floor(ref_share * 10000.0 + 0.5) / 10000.0 AS ref_share,
           floor(cur_share * 10000.0 + 0.5) / 10000.0 AS cur_share,
           floor((cur_share - ref_share)
                 * ln((cur_share + 0.000001) / (ref_share + 0.000001))
                 * 1000000.0 + 0.5) / 1000000.0 AS psi_contrib
    FROM shares
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two corpus cohorts — the
    population-stability-index (PSI) check a training pipeline runs
    between the reference snapshot and a fresh ingest before retraining
    (per-bucket shares + PSI contributions; sum a feature's contribs
    >= ~0.2 and the ingest distribution has materially shifted). The
    cohort split here is a deterministic md5 gate standing in for the
    old/new snapshot ids, so both engines bucket identical populations.

    Scale: one pass builds (cohort, feature-bucket) rows; the only
    shuffles carry FEATURE x BUCKET counts (here 2 x 10), then
    broadcast-sized share/PSI math — corpus bytes never move, so the
    same plan holds when the cohorts are 100 TB snapshots. The eps in
    the log guards empty buckets identically on both engines."""
    from .functions.portable import round_portable

    docs = load_table(spark, sf_dir, "documents")
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("drift:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    cohorts = docs.select(
        F.when(gate == 0, "ref").otherwise("cur").alias("cohort"),
        F.least(F.floor(F.col("n_chars") / 100.0), F.lit(9)).alias("b_chars"),
        F.least(
            F.floor(F.size(F.split(F.col("text"), " ")) / 20.0), F.lit(9)
        ).alias("b_tokens"),
    )
    feat = cohorts.select(
        "cohort", F.lit("n_chars").alias("feature"), F.col("b_chars").alias("bucket")
    ).unionAll(
        cohorts.select(
            "cohort",
            F.lit("n_tokens").alias("feature"),
            F.col("b_tokens").alias("bucket"),
        )
    )
    counts = feat.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("cohort") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("cohort") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    tot = counts.groupBy("feature").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    shares = counts.join(F.broadcast(tot), "feature").select(
        "feature",
        "bucket",
        (F.col("n_ref") / F.col("t_ref")).alias("ref_share_raw"),
        (F.col("n_cur") / F.col("t_cur")).alias("cur_share_raw"),
    )
    eps = F.lit(0.000001)
    return shares.select(
        "feature",
        "bucket",
        round_portable(F.col("ref_share_raw"), 4).alias("ref_share"),
        round_portable(F.col("cur_share_raw"), 4).alias("cur_share"),
        round_portable(
            (F.col("cur_share_raw") - F.col("ref_share_raw"))
            * F.log((F.col("cur_share_raw") + eps) / (F.col("ref_share_raw") + eps)),
            6,
        ).alias("psi_contrib"),
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (operators/sketches.py) — the heavy-hitter
# complement to the KMV distinct sketch above; md5 buckets make every
# estimate value-checkable bit-for-bit against DuckDB.
# ---------------------------------------------------------------------------

_CMS_G = "(SELECT unnest(range(0, 4)) AS d)"
_CMS_WORDS = """
    cwords AS (
      SELECT w, source FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w, source
        FROM documents
      ) WHERE len(w) >= 2
    )"""


def _cms_bucket_sql(val: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(g.d AS VARCHAR) || ':' || {val}), 1, 8))"
        " AS BIGINT) % 256"
    )


# shared by word_freq_cms (batch) and streaming_word_freq_cms (the
# sketch built incrementally over the document stream): the CMS merge
# is exact, so both paths pin against the identical oracle
_WORD_FREQ_CMS_ORACLE = f"""
    WITH {_CMS_WORDS},
    tc AS (
      SELECT w AS word, count(*) AS true_cnt FROM cwords GROUP BY w
      ORDER BY true_cnt DESC, word LIMIT 20
    ),
    sk AS (
      SELECT g.d, {_cms_bucket_sql('w')} AS bucket, count(*) AS cnt
      FROM cwords CROSS JOIN {_CMS_G} g GROUP BY 1, 2
    ),
    pb AS (
      SELECT tc.word, tc.true_cnt, g.d, {_cms_bucket_sql('tc.word')} AS bucket
      FROM tc CROSS JOIN {_CMS_G} g
    )
    SELECT pb.word, pb.true_cnt,
           CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_est
    FROM pb LEFT JOIN sk ON sk.d = pb.d AND sk.bucket = pb.bucket
    GROUP BY pb.word, pb.true_cnt
    """


@query("word_freq_cms", oracle=_WORD_FREQ_CMS_ORACLE)
def word_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the corpus vocabulary
    (operators/sketches.py): ONE corpus scan builds the depth=4 x
    width=256 sketch (all four bucket ids per word computed as a single
    exploded array expression, map-side-combined agg — the shuffle
    carries at most 1024 partial rows per partition regardless of
    corpus size), then the true top-20 words are probed against it —
    (word, true_cnt, cms_est), where cms_est >= true_cnt always (the
    CMS guarantee, additionally pinned corpus-wide in unit tests). The
    exact-count probe side is bounded (top-20); at 100 TB the sketch
    replaces the full-cardinality vocabulary groupBy for screens that
    tolerate bounded overcount."""
    from .operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    ).filter(F.length("word") >= 2)
    sketch = sketches.cms_build(words, "word")
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(20)
    )
    return sketches.cms_estimate(sketch, top, "word")


@query(
    "cms_sketch_merge",
    oracle=f"""
    WITH {_CMS_WORDS},
    persh AS (
      SELECT source, g.d, {_cms_bucket_sql('w')} AS bucket, count(*) AS cnt
      FROM cwords CROSS JOIN {_CMS_G} g GROUP BY 1, 2, 3
    ),
    merged AS (SELECT d, bucket, sum(cnt) AS cnt FROM persh GROUP BY 1, 2),
    direct AS (
      SELECT g.d, {_cms_bucket_sql('w')} AS bucket, count(*) AS cnt
      FROM cwords CROSS JOIN {_CMS_G} g GROUP BY 1, 2
    ),
    tc AS (
      SELECT w AS word FROM cwords GROUP BY w
      ORDER BY count(*) DESC, w LIMIT 10
    ),
    pb AS (
      SELECT tc.word, g.d, {_cms_bucket_sql('tc.word')} AS bucket
      FROM tc CROSS JOIN {_CMS_G} g
    ),
    est AS (
      SELECT 'merged' AS scope, pb.word,
             CAST(min(coalesce(m.cnt, 0)) AS BIGINT) AS cms_est
      FROM pb LEFT JOIN merged m ON m.d = pb.d AND m.bucket = pb.bucket
      GROUP BY pb.word
      UNION ALL
      SELECT 'direct', pb.word, CAST(min(coalesce(x.cnt, 0)) AS BIGINT)
      FROM pb LEFT JOIN direct x ON x.d = pb.d AND x.bucket = pb.bucket
      GROUP BY pb.word
    )
    SELECT scope, word, cms_est FROM est
    """,
)
def cms_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS sketch ALGEBRA, pinned: per-source-shard sketches summed
    bucket-wise must equal the sketch built directly over all data —
    EXACT mergeability (not approximate), which is what lets per-day /
    per-shard sketches combine into larger windows without rescanning,
    each shard shipping depth x width longs. Both scopes' estimates for
    the same top-10 probe words are emitted; the oracle pins them
    identical. The per-shard build is ONE grouped pass (source, d,
    bucket) — the distributed equivalent of building every shard's
    sketch independently (cms_merge exercises the explicit two-relation
    form in unit tests)."""
    from .operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word"),
        "source",
    ).filter(F.length("word") >= 2)
    buckets = F.array(
        *[sketches.cms_bucket(F.col("word"), d) for d in range(sketches.CMS_DEPTH)]
    )
    persh = (
        words.select("source", F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("source", "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = persh.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    direct = sketches.cms_build(words.select("word"), "word")
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(10)
        .select("word")
    )

    def est(sketch: DataFrame, scope: str) -> DataFrame:
        return sketches.cms_estimate(sketch, top, "word").select(
            F.lit(scope).alias("scope"), "word", "cms_est"
        )

    return est(merged, "merged").unionAll(est(direct, "direct"))


@query(
    "value_quantiles_hist",
    oracle="""
    WITH b AS (
      SELECT CAST(least(greatest(floor((value - 0.0) / 5.0), 0), 199) AS INT)
               AS bucket,
             count(*) AS cnt
      FROM events GROUP BY 1
    ),
    c AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM b),
    t AS (
      SELECT q, q * (SELECT sum(cnt) FROM b) AS t
      FROM (SELECT unnest(CAST([0.25, 0.5, 0.9, 0.99] AS DOUBLE[])) AS q)
    )
    SELECT t.q,
           round(0.0 + 5.0 * (c.bucket + (t.t - (c.cum - c.cnt)) / c.cnt), 4)
             AS est
    FROM t JOIN c ON (c.cum - c.cnt) < t.t AND c.cum >= t.t
    """,
)
def value_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from the mergeable equi-width histogram sketch
    (operators/sketches.py) — the UNBOUNDED-cardinality escape hatch
    that percentiles_by_type's docstring promises: ONE corpus scan
    builds the <=200-row (bucket, cnt) relation (shuffle carries at
    most nbins partials per partition, constant in corpus size), then
    p25/p50/p90/p99 are interpolated from the cumulative distribution
    entirely in sketch-sized relations. Estimates are within one bucket
    width of exact (pinned vs the exact percentiles in unit tests);
    per-shard histograms merge by bucket-wise sum without rescanning."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    hist = sketches.hist_build(ev, "value")
    return sketches.hist_quantiles(hist, [0.25, 0.5, 0.9, 0.99])


@query(
    "quantiles_by_type_hist",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(least(greatest(floor((value - 0.0) / 5.0), 0), 199) AS INT)
               AS bucket,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, bucket, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
      FROM b
    ),
    n AS (SELECT event_type, sum(cnt) AS n FROM b GROUP BY 1),
    t AS (
      SELECT n.event_type, qv.q, qv.q * n.n AS t
      FROM n CROSS JOIN
        (SELECT unnest(CAST([0.25, 0.5, 0.9, 0.99] AS DOUBLE[])) AS q) qv
    )
    SELECT t.event_type, t.q,
           round(0.0 + 5.0 * (c.bucket + (t.t - (c.cum - c.cnt)) / c.cnt), 4)
             AS est
    FROM t JOIN c ON c.event_type = t.event_type
                 AND (c.cum - c.cnt) < t.t AND c.cum >= t.t
    """,
)
def quantiles_by_type_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP quantiles from the grouped histogram sketch
    (operators/sketches.hist_build_grouped) — the unbounded-group-count
    answer to percentiles_by_type: that exact query sorts every group's
    values; this one replaces the sort with ONE map-side-combined
    aggregation to a |groups| x 200-row sketch, then interpolates
    p25/p50/p90/p99 per group inside sketch-sized relations (the probe
    join is an equi-join on the group key, broadcast-sized). Per-group
    error bound: one bucket width, pinned vs the exact per-group
    percentiles in unit tests. At 100 TB with millions of groups the
    exact path's per-group sort is the bottleneck; the sketch's shuffle
    stays (groups x bins)-bounded and per-shard sketches merge by
    bucket-wise sum."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    hist = sketches.hist_build_grouped(ev, "value", ["event_type"])
    return sketches.hist_quantiles_grouped(
        hist, [0.25, 0.5, 0.9, 0.99], ["event_type"]
    )


@query(
    "heavy_hitters_screened",
    oracle="""
    WITH kmv AS (
      SELECT count(*) AS k, max(hv) AS kth FROM (
        SELECT hv FROM (
          SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                               AS BIGINT) AS hv
          FROM events
        ) ORDER BY hv LIMIT 64
      )
    ),
    thr AS (
      SELECT 1.15 * (SELECT count(*) FROM events)
             / round((k - 1) * 4294967296.0 / kth, 0) AS t
      FROM kmv
    )
    SELECT user_id, count(*) AS cnt
    FROM events
    GROUP BY user_id
    HAVING count(*) >= (SELECT t FROM thr)
    """,
)
def heavy_hitters_screened(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters through an all-sketch screen — the pattern a
    100 TB pipeline uses when the key space is too large for a full
    groupBy hash table: (1) ONE scan builds a CMS frequency sketch
    (constant size); (2) the threshold itself is sketch-derived —
    1.15x the mean key frequency, with the key cardinality estimated by
    the KMV sketch, so NO exact-distinct pass; (3) the verify scan
    filters rows MAP-SIDE with the sketch embedded as array literals
    (operators/sketches.cms_literal_estimate — no join, no shuffle),
    then aggregates exactly over surviving keys only. CMS never
    undercounts, so the screen passes a superset of the true heavy
    keys and the final exact HAVING makes the result EXACT — which is
    why the oracle is the plain exact query, with the KMV threshold
    reproduced bit-for-bit.

    Scale: the exact aggregation's key space and shuffle are bounded by
    the candidate set (true heavies + CMS collision false positives,
    tunable via width), not by the full key cardinality. Driver
    collects: the sketch (<= depth x width rows) and the KMV scalar —
    both bounded."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    return sketches.exact_heavy_hitters(ev, "user_id", factor=1.15, width=1024)


def _z_interleave_sql(a: str, b: str, bits: int = 8) -> str:
    """Morton interleave as DuckDB bit-ops — the SQL mirror of
    operators/layout.interleave_bits (bit i of a -> 2i+1, of b -> 2i)."""
    terms = [f"((({a} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)] + [
        f"((({b} >> {i}) & 1) << {2 * i})" for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


_Z_DAY_SQL = (
    "least(greatest(CAST(floor(date_diff('day', DATE '1995-01-01', "
    "CAST(o_orderdate AS DATE)) / 10.0) AS BIGINT), 0), 255)"
)
_Z_PRICE_SQL = (
    "least(greatest(CAST(floor(o_totalprice / 2000.0) AS BIGINT), 0), 255)"
)


@query(
    "zorder_layout",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           {_z_interleave_sql(_Z_DAY_SQL, _Z_PRICE_SQL)} AS zval
    FROM orders
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout rewrite (operators/layout.py — the Morton-curve
    clustering behind Delta's OPTIMIZE ZORDER BY): orders is rewritten
    into files clustered by the interleaved bits of its order-day and
    total-price buckets, so parquet min-max stats are tight on BOTH
    dimensions per file and a conjunctive box predicate prunes files on
    either — the multi-dimensional scan-locality lever a 100 TB
    scan-heavy table needs (a 1-D sort keeps only its own column's
    stats tight; pinned comparatively via footer stats in
    tests/test_layout.py). The query returns the REWRITTEN table read
    back with its z-value recomputed; the oracle computes the identical
    Morton math over the source table, checking both that the rewrite
    is lossless and that the bit interleave is engine-exact.

    Scale: the z-value is pure codegen (shift/mask OR-fold over
    data-independent buckets — no stats pass); the rewrite is one range
    repartition on z + a within-partition sort, each row moving once —
    the same cost as any sorted write, amortised over every subsequent
    pruned scan."""
    import os as _os
    import tempfile as _tempfile

    from .operators import layout

    o = load_table(spark, sf_dir, "orders")
    day = layout.fixed_bucket(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")),
        0.0,
        10.0,
        256,
    )
    price = layout.fixed_bucket(F.col("o_totalprice"), 0.0, 2000.0, 256)
    path = _os.path.join(
        _tempfile.gettempdir(),
        "spark_graft_zorder",
        _os.path.basename(sf_dir.rstrip("/")),
    )
    layout.zorder_write(o, path, layout.interleave_bits(day, price), 8)

    back = spark.read.parquet(path)
    day_b = layout.fixed_bucket(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")),
        0.0,
        10.0,
        256,
    )
    price_b = layout.fixed_bucket(F.col("o_totalprice"), 0.0, 2000.0, 256)
    return back.select(
        "o_orderkey",
        "o_totalprice",
        layout.interleave_bits(day_b, price_b).alias("zval"),
    )


@query(
    "distinct_users_kmv_by_day",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM events
    ),
    per_day AS (
      SELECT day, hv FROM (
        SELECT day, hv,
               row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
        FROM h) WHERE rn <= 64
    )
    SELECT day, count(*) AS k_used,
           CASE WHEN count(*) < 64 THEN count(*)
                ELSE CAST(round((count(*) - 1) * 4294967296.0 / max(hv), 0)
                          AS BIGINT)
           END AS est_distinct
    FROM per_day GROUP BY day
    """,
)
def distinct_users_kmv_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP KMV distinct sketch: daily distinct-user estimates from
    a k=64 sketch per day — the grouped member of the KMV family
    (global estimate: distinct_users_kmv; mergeability: kmv_sketch_merge;
    set algebra: kmv_jaccard_sets). Small days (fewer than k distinct
    hashes) report their EXACT count — the sketch holds the whole hash
    set — and only saturated days use the (k-1)/kth-fraction estimator,
    so the estimate is never worse than exact for small groups.

    Scale: CONSTANT-STATE build — kmv_partials folds each partition to
    its local 64 distinct minima PER DAY map-side, so the shuffle
    carries |days present per partition| x 64 hashes per partition at
    worst, never the user set (the round-7 build's leading .distinct()
    shuffled the per-partition-distinct (day, hv) pairs —
    cardinality-sized); the per-day window top-k then runs over the
    partial relation. With millions of groups this is the same escape
    hatch the grouped histogram gives percentiles. Per-day sketches
    also merge upward (day -> month) by re-taking k-mins, without
    rescanning."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        sketches.kmv_hash(F.col("user_id")).alias("hv"),
    )
    p = sketches.kmv_partials(h, "hv", ["day"]).distinct()
    w = Window.partitionBy("day").orderBy("hv")
    per_day = p.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 64)
    k = F.count(F.lit(1))
    return per_day.groupBy("day").agg(
        k.alias("k_used"),
        F.when(k < 64, k)
        .otherwise(
            F.round((k - 1) * F.lit(4294967296.0) / F.max("hv"), 0).cast("bigint")
        )
        .alias("est_distinct"),
    )


# --- HLL distinct-count sketch (operators/sketches.py bottom section) -------
# Shared SQL fragments: the register build and the estimate, mirrored
# op-for-op from sketches.hll_rows/hll_registers/hll_estimate. The
# harmonic denominator is an exact BIGINT sum (order-insensitive); the
# estimate is one double division by the shared HLL_ALPHA_NUM literal.

_HLL_ROWS = """
    SELECT {extra} CAST(('0x' || substr(hex, 1, 2)) AS BIGINT) AS r,
           CAST(('0x' || substr(hex, 3, 12)) AS BIGINT) AS v
    FROM (SELECT {extra_src} md5(CAST(user_id AS VARCHAR)) AS hex FROM events)
"""

_HLL_RHO = "CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END"

# estimate over a register relation named {regs} (columns: [group,] mr)
_HLL_EST = """
    SELECT {g} CAST(count(*) AS BIGINT) AS n_registers_used,
           round(CASE WHEN (2.6499581405668102e+19 / CAST(
                     COALESCE(sum((CAST(1 AS BIGINT) << (49 - mr))), 0)
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 49) AS DOUBLE))
                     <= 640.0 AND (256 - count(*)) > 0
                 THEN 256.0 * ln(256.0 / (256 - count(*)))
                 ELSE (2.6499581405668102e+19 / CAST(
                     COALESCE(sum((CAST(1 AS BIGINT) << (49 - mr))), 0)
                     + (256 - count(*)) * (CAST(1 AS BIGINT) << 49) AS DOUBLE))
                 END, 1) AS est_distinct
    FROM {regs} {group_by}
"""


# shared by distinct_users_hll (in-session build) and
# distinct_users_hll_indexed (durable-store build/append/load) — two
# plans, ONE oracle (the _BM25_ORACLE discipline)
_HLL_GLOBAL_ORACLE = f"""
    WITH rws AS ({_HLL_ROWS.format(extra="", extra_src="")}),
    regs AS (SELECT r, max({_HLL_RHO}) AS mr FROM rws GROUP BY r),
    est AS ({_HLL_EST.format(g="", regs="regs", group_by="")}),
    x AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
    SELECT n_registers_used, est_distinct, exact_distinct,
           round((est_distinct - exact_distinct) / exact_distinct * 100.0, 2)
             AS rel_err_pct
    FROM est CROSS JOIN x
    """


@query("distinct_users_hll", oracle=_HLL_GLOBAL_ORACLE)
def distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count estimate over events.user_id, m=256
    md5-derived registers — the third distinct sketch next to KMV
    (operators/sketches.py bottom section has the family comparison and
    the cross-engine determinism contract: exact-integer harmonic sum,
    one double division, linear-counting correction under 2.5m). The
    output carries the EXACT count and the relative error alongside the
    estimate, so the gate also pins the accuracy claim (~1.04/sqrt(256)
    = 6.5% sigma): sf0.001 exercises the linear-counting branch, sf0.1
    the raw-estimate branch.

    Scale: registers build in ONE scan + one map-side-combined max()
    aggregation — the exchange carries <= 256 rows per partition, and
    the estimate folds 256 rows to 1. The exact count here is fixture
    evidence; at 100 TB you'd keep only the sketch (that's the point)."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    regs = sketches.hll_registers(ev, F.col("user_id"))
    est = sketches.hll_estimate(regs)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(F.broadcast(exact)).select(
        "n_registers_used",
        "est_distinct",
        "exact_distinct",
        F.round(
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            * F.lit(100.0),
            2,
        ).alias("rel_err_pct"),
    )


@query(
    "hll_sketch_merge",
    oracle=f"""
    WITH rws AS ({_HLL_ROWS.format(
        extra="day,",
        extra_src="CAST(CAST(ts AS DATE) AS VARCHAR) AS day,",
    )}),
    daily AS (SELECT day, r, max({_HLL_RHO}) AS mr FROM rws GROUP BY day, r),
    merged AS (SELECT r, max(mr) AS mr FROM daily GROUP BY r),
    direct AS (SELECT r, max({_HLL_RHO}) AS mr FROM rws GROUP BY r),
    em AS ({_HLL_EST.format(g="", regs="merged", group_by="")}),
    ed AS ({_HLL_EST.format(g="", regs="direct", group_by="")})
    SELECT 'direct' AS scope, n_registers_used, est_distinct FROM ed
    UNION ALL
    SELECT 'merged_daily', n_registers_used, est_distinct FROM em
    """,
)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch ALGEBRA, pinned: per-day register relations merged by
    register-wise MAX must equal the registers built directly over all
    data — max is associative/commutative/idempotent, so
    sketch(A ∪ B) = merge(sketch(A), sketch(B)) EXACTLY, which is what
    lets per-day sketches (256 small ints each) combine into a month
    without rescanning. Both output rows carry the SAME estimate; the
    oracle pins that equality. The daily and direct sides are built as
    DIFFERENT groupings of the same row relation — the equality is an
    algebraic fact being tested, not plan reuse."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    rows = sketches.hll_rows(
        ev.select(
            F.col("ts").cast("date").cast("string").alias("day"), "user_id"
        ),
        F.col("user_id"),
        ["day"],
    )
    daily = rows.groupBy("day", "r").agg(F.max("rho").alias("mr"))
    merged = sketches.hll_merge(daily)
    direct = rows.groupBy("r").agg(F.max("rho").alias("mr"))

    def side(regs: DataFrame, scope: str) -> DataFrame:
        return sketches.hll_estimate(regs).select(
            F.lit(scope).alias("scope"), "n_registers_used", "est_distinct"
        )

    return side(direct, "direct").unionAll(side(merged, "merged_daily"))


@query(
    "distinct_users_hll_by_day",
    oracle=f"""
    WITH rws AS ({_HLL_ROWS.format(
        extra="day,",
        extra_src="CAST(CAST(ts AS DATE) AS VARCHAR) AS day,",
    )}),
    daily AS (SELECT day, r, max({_HLL_RHO}) AS mr FROM rws GROUP BY day, r)
    {_HLL_EST.format(g="day,", regs="daily", group_by="GROUP BY day")}
    """,
)
def distinct_users_hll_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP HLL: daily distinct-user estimates from a 256-register
    sketch per day — the grouped member of the HLL family (global:
    distinct_users_hll; mergeability: hll_sketch_merge), the KMV-by-day
    counterpart with constant state per group and no bottom-k fold
    needed (max() partial-aggregates natively). Small days sit in the
    linear-counting regime, so small-group estimates stay near-exact —
    the same never-worse-for-small-groups property the KMV by-day query
    documents.

    Scale: one scan; the exchange carries <= 256 register rows per
    (partition, day present); per-day estimate folds each day's
    registers to one row. Daily sketches also merge upward (day ->
    month) by register MAX without rescanning."""
    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    regs = sketches.hll_registers(
        ev.select(
            F.col("ts").cast("date").cast("string").alias("day"), "user_id"
        ),
        F.col("user_id"),
        ["day"],
    )
    return sketches.hll_estimate(regs, ["day"])


@query("distinct_users_hll_indexed", oracle=_HLL_GLOBAL_ORACLE)
def distinct_users_hll_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The durable-store form of distinct_users_hll (operators/
    hllstore.py — the sixth persisted artifact, and the one whose
    append protocol is deliberately minimal because register MAX-merge
    is IDEMPOTENT; the module docstring has the contrast with the five
    row stores): registers of the first 24 days are SAVED, the rest of
    the month APPENDS by merge, and the estimate is taken from the
    loaded store — exercising save/append/load end-to-end and pinning,
    against the SAME oracle as the in-session build, that the persisted
    artifact answers identically to a from-scratch sketch. The store is
    O(256 small ints) per key-domain: the shape a 100 TB pipeline keeps
    per metric instead of rescanning history.

    The save+append runs per invocation (honest store cost — it's two
    sub-second writes of <= 256 rows); a deployment would append only
    each new day."""
    import os
    import tempfile

    from .operators import hllstore, sketches

    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.dayofmonth("ts") <= 24)
    new = ev.filter(F.dayofmonth("ts") > 24)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_hllstore_{os.path.basename(sf_dir)}",
    )
    hllstore.save_hll_registers(
        sketches.hll_registers(old, F.col("user_id")), path
    )
    hllstore.append_to_hll_registers(
        sketches.hll_registers(new, F.col("user_id")), path
    )
    regs = hllstore.load_hll_registers(spark, path)
    est = sketches.hll_estimate(regs)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(F.broadcast(exact)).select(
        "n_registers_used",
        "est_distinct",
        "exact_distinct",
        F.round(
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            * F.lit(100.0),
            2,
        ).alias("rel_err_pct"),
    )


@query(
    "streaming_distinct_hll",
    oracle=f"""
    WITH rws AS ({_HLL_ROWS.format(extra="", extra_src="")}),
    regs AS (SELECT r, max({_HLL_RHO}) AS mr FROM rws GROUP BY r)
    {_HLL_EST.format(g="", regs="regs", group_by="")}
    """,
)
def streaming_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL registers built INCREMENTALLY over the event stream
    (streaming/incremental.hll_sketch_stream): micro-batch (register,
    rho) rows fold into <= 256 rows of running state by register-wise
    MAX — the sketch's merge IS the streaming aggregation — then the
    estimate reads the final state. Bit-identical to the batch
    distinct_users_hll registers under the same estimate SQL (the
    streaming_quantiles_hist discipline, for the distinct member of
    the sketch family: histogram=SUM-fold, CMS=SUM-fold, HLL=MAX-fold
    all stream with constant state)."""
    from .operators import sketches
    from .streaming import incremental as streaming

    regs = streaming.run_available_now(
        streaming.hll_sketch_stream(spark, sf_dir)
    )
    return sketches.hll_estimate(regs)


@query(
    "skew_split_join_events",
    oracle="""
    SELECT c.c_nationkey,
           count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_nationkey
    """,
)
def skew_split_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-split join (operators/skewjoin.py): events (fact) joined to
    customer (dimension) with HOT user keys routed through a broadcast
    of just their dimension rows, while cold keys take the ordinary
    co-partitioned sort-merge join; the union is exactly the plain join
    (the oracle IS the plain join + aggregation). This is the
    production remedy for the key AQE's partition-splitting can't save:
    hot fact rows never shuffle at all.

    Detection here is the SAMPLED mode (detect_hot_keys_sampled, one
    seeded fraction-of-a-scan): routing needs no exact frequencies — a
    borderline key the sample misses rides the cold path and the result
    is unchanged, which is why the oracle holds under any detection
    mode. The exact CMS+KMV pipeline stays a first-class op with its
    own gate (heavy_hitters_screened) for when the hot list itself is
    the deliverable; tools/skew_bench.py measures both inline modes
    against AQE (SCALING.md).

    Scale: detection costs sample_fraction of a scan + a sample-bounded
    aggregation; the broadcast side is |hot keys| dimension rows
    regardless of dimension size; the cold plan is the one you'd ship
    anyway. Plan pinned (SortMergeJoin + BroadcastHashJoin + Union) in
    tests/test_skew.py; sampled-mode exactness pinned there too."""
    from .operators.skewjoin import skew_split_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    joined = skew_split_join(ev, cust, "user_id", "c_custkey", detect="sample")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "continuous_aggregate_rollup",
    oracle="""
    SELECT epoch_us(date_trunc('day', ts)) AS day_us,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(round(value, 4) AS DECIMAL(20,6))), 2) AS DOUBLE)
             AS sum_value,
           round(CAST(sum(CAST(round(value, 4) AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*), 6) AS avg_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def continuous_aggregate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERTABLE-style continuous aggregate: the HOURLY partial-state
    relation (count / decimal sum / min / max per hour and type) is
    materialised once, and the daily answer is computed by MERGING the
    hourly partials — never re-touching raw events. This is the
    TimescaleDB continuous-aggregate / materialized-rollup pattern: at
    100 TB the hourly relation is ~|hours| x |types| rows, the daily
    (or monthly) re-aggregation is sketch-sized, and an incremental
    refresh only recomputes the hours a late batch touches. The ORACLE
    computes the daily answer DIRECTLY from raw events — merged
    partials must equal the direct aggregation exactly, which is why
    the sum partials ride as DECIMAL (associative addition; a double
    sum's value depends on merge order and would diverge between the
    two aggregation shapes, not just between engines).

    Scale: two map-side-combined aggregations, the second over the
    already-tiny hourly relation; every aggregate here is mergeable
    state (count/sum/min/max — the same algebra the KMV/CMS/histogram
    sketches pin for their domains)."""
    ev = load_table(spark, sf_dir, "events")
    v6 = F.round("value", 4).cast("decimal(20,6)")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v6).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s"), 2).cast("double").alias("sum_value"),
            F.round(F.sum("s").cast("double") / F.sum("n"), 6).alias("avg_value"),
            F.round(F.min("mn"), 4).alias("min_value"),
            F.round(F.max("mx"), 4).alias("max_value"),
        )
        .select(
            F.unix_micros("day").alias("day_us"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


@query("streaming_word_freq_cms", oracle=_WORD_FREQ_CMS_ORACLE)
def streaming_word_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS frequency sketch built INCREMENTALLY over the document
    stream (streaming/incremental.cms_sketch_stream): micro-batch
    bucket counts fold into <= depth x width rows of running state —
    the sketch's exact merge IS the streaming aggregation — then the
    batch-exact top-20 probe reads estimates from the final state.
    Bit-identical to the batch word_freq_cms under the SAME oracle
    (the streaming_quantiles_hist discipline, for the frequency member
    of the sketch family)."""
    from .operators import sketches
    from .streaming import incremental as streaming

    sketch = streaming.run_available_now(
        streaming.cms_sketch_stream(spark, sf_dir)
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    ).filter(F.length("word") >= 2)
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(20)
    )
    return sketches.cms_estimate(sketch, top, "word")
