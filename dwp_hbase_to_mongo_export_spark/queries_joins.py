"""Join / subquery / window-frame / set-operation coverage.

The reference's dataflow deliberately contains none of these
(SURVEY.md §2 "deliberately absent") — they are engine capabilities the
north star adds. Each query is a distinct *operator class*, declared with
the DataFrame API so Catalyst picks the physical strategy:

- decorrelated scalar subqueries (q15, q17, q22) — aggregate + broadcast
  of the 1-row frame, never a driver-side collect;
- IN / HAVING subqueries (q18), NOT IN (q16) as semi/anti joins;
- multi-dim broadcast star joins (q7, q9, q10), left-outer + double
  aggregation (q13), conditional-share aggregation (q14), disjunctive
  join predicates (q19);
- as-of and banded range joins (temporal, via operators/asof.py);
- window frames + lag (moving averages / gaps), pivot, cube, set ops,
  array higher-order functions, statistical aggregates, CDC tombstone
  apply.

Scale notes sit on each query: which side broadcasts, where the one
unavoidable shuffle is, and why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.asof import asof_join, range_join_time_window
from .queries import query
from .sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    # the specific NATION_1<->NATION_2 supplier/customer pairing finds
    # no lineitem in the 500-order smoke fixture; real value evidence
    # at sf0.01+ (caught by the round-10 vacuity lint at sf0.001)
    empty_at=("sf0.001",),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): two aliases of the same
    dim table with a disjunctive cross-pair predicate.

    Scale: nation/supplier/customer broadcast; the only wide exchange is
    lineitem⋈orders. The nation-pair filter evaluates after the
    broadcast joins, so no lineitem row is shuffled twice."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit by nation and year (TPC-H Q9 shape; the
    synthetic part table's p_type stands in for p_name LIKE).

    Scale: part is filtered BEFORE the join and broadcast, so the
    selective part predicate prunes lineitem rows at the map side of
    the lineitem⋈orders shuffle — the join-ordering win Catalyst gets
    from declarative filters."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            # DECIMAL summation: double sums are ORDER-dependent and the
            # engines sum in different orders, so a rounded double sum
            # can differ in the last cent at scale (seen at sf0.1). The
            # per-row double product is bit-identical on both engines;
            # cast to DECIMAL(18,6) is exact for these <=4-decimal money
            # values, and decimal addition is associative — the sum is
            # identical whatever the partial-aggregation order.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, revenue, n_name FROM (
      SELECT c.c_custkey, c.c_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             n.n_name,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS raw_rev
      FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
      ORDER BY raw_rev DESC, c.c_custkey
      LIMIT 20
    )
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue (TPC-H Q10 shape).

    Scale: global top-k over an aggregate — Spark's TakeOrderedAndProject
    keeps k rows per partition then k overall; no full sort ever
    materialises."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "raw_rev"
            )
        )
        .orderBy(F.desc("raw_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", F.round("raw_rev", 2).alias("revenue"), "n_name"
        )
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count histogram (TPC-H Q13): left outer join with a
    join-side predicate, then two stacked aggregations.

    Scale: count(o_orderkey) counts only matched rows (null-skipping),
    preserving zero-order customers from the outer join. The second
    groupBy is over ≤ a few hundred distinct counts — AQE coalesces it
    to a handful of tasks."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14): conditional aggregation over
    a broadcast join — the ratio computes in one pass, no self-join.

    Scale: part (the dim) broadcasts; the month filter is pushed to the
    lineitem scan so the join input is already pruned."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15): an uncorrelated
    scalar MAX subquery over a derived aggregate.

    Scale: the scalar subquery is a 1-row aggregate broadcast into a
    cross join — never `.collect()` on the driver (which would serialise
    the job), and never a global window sort."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_rev")
    )
    mx = rev.agg(F.max("raw_rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("raw_rev") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("raw_rev", 2).alias("total_revenue"))
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%99%'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part attribute (TPC-H Q16 shape; lineitem
    stands in for partsupp, which the synthetic schema lacks): NOT IN
    subquery as an anti join + distinct aggregation.

    Scale: the excluded-supplier list is tiny and broadcast for the
    anti join; count(DISTINCT) expands to a two-phase aggregate."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%99%"))
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17): a correlated scalar
    subquery, decorrelated into a per-key aggregate + key join — the
    rewrite Catalyst itself applies to correlated scalar subqueries.

    Scale: the per-part average shuffles (partkey, partial-avg) pairs
    only; the filtered part dim broadcasts into both sides."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           round(o.o_totalprice, 2) AS totalprice,
           round(big.total_qty, 2)  AS total_qty
    FROM orders o
      JOIN (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
      ) big ON big.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18): IN-subquery with HAVING,
    expressed as an aggregate + join (the set IS the aggregate, so no
    second lineitem pass is needed — better than the literal Q18 text).

    Scale: the HAVING filter runs inside the aggregate, so only
    qualifying orderkeys reach the join; AQE broadcast-converts the
    survivor side when it is small."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_pred",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under OR-of-AND predicates (TPC-H Q19 shape).

    Scale: Catalyst extracts the common `p_partkey` equi-condition so
    the join stays a broadcast hash join with the disjunction as a
    post-join filter; the per-side conjuncts (brand/size on part,
    quantity on lineitem) are inferred and pushed to each scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
    # orderless customers only exist at sf0.1+ (see
    # customers_without_orders): small-scale driver rows are
    # agreement-on-emptiness, not value evidence (round-9 verdict #3)
    empty_at=("sf0.001", "sf0.01"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy customers with no orders (TPC-H Q22 shape): uncorrelated
    scalar AVG subquery + anti join + aggregate.

    Scale: the average is a 1-row broadcast; the anti join shuffles
    custkeys only; nation broadcasts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal joins (custom operators — see operators/asof.py)
# ---------------------------------------------------------------------------


@query(
    "asof_click_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the user's most
    recent prior (or simultaneous) click — a backward as-of join, an
    operator Spark lacks as a builtin (implemented union+window in
    operators/asof.py; the oracle is DuckDB's native ASOF JOIN).

    Scale: ONE shuffle on user_id + a per-partition sort; a naive
    inequality join would be quadratic per hot user."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
        right_cols=["click_id", "c_ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        "click_id",
        F.unix_micros("c_ts").alias("click_ts_us"),
    )


@query(
    "range_join_click_to_purchase",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 10 MINUTE
    """,
)
def range_join_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 10 minutes after a click: a banded range join
    via time-bucket quantisation + equi-join (operators/asof.py), so the
    pair space is bounded by true matches, not |clicks|×|purchases| per
    user. The oracle is the naive inequality join, which DuckDB's
    IEJoin handles at test scale."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    joined = range_join_time_window(
        clicks, purchases, on="user_id", left_ts="c_ts", right_ts="p_ts",
        window_seconds=600,
    )
    return joined.select(
        "click_id",
        "user_id",
        F.col("r_purchase_id").alias("purchase_id"),
        (F.unix_micros("r_p_ts") - F.unix_micros("c_ts")).alias("delay_us"),
    )


# ---------------------------------------------------------------------------
# Window frames, pivot, cube, set ops, arrays, stats, CDC
# ---------------------------------------------------------------------------


@query(
    "moving_avg_and_gaps",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 4) AS mavg_7,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS gap_us
    FROM events
    """,
)
def moving_avg_and_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-event average + inter-event gap per user: ROWS-frame
    window aggregate and lag over the same ordering.

    Scale: both windows share one partition/ordering, so Spark plans a
    single shuffle + single sort and evaluates both functions in one
    Window operator pass."""
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_frame = (
        Window.partitionBy("user_id").orderBy(*order).rowsBetween(-6, 0)
    )
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w_frame), 4).alias("mavg_7"),
        (us - F.lag(us).over(w_lag)).alias("gap_us"),
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user event-type counts.

    Scale: the value list is EXPLICIT, which matters — without it Spark
    runs an extra distinct job to discover pivot columns. With explicit
    values the pivot compiles to conditional aggregates in one pass."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


@query(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all 2^d grouping-set marginals in one pass
    (rollup's sibling; completes the grouping-sets family with
    revenue_rollup).

    Scale: one Expand (4 grouping sets) + one aggregation shuffle —
    constant-factor data growth, not one job per marginal."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "user_days_click_no_purchase",
    oracle="""
    SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us
    FROM events WHERE event_type = 'purchase'
    """,
)
def user_days_click_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference at (user, day) granularity: days on which a user
    clicked but did not purchase (EXCEPT DISTINCT = aggregate + anti
    join over distinct keys).

    Scale: Spark plans EXCEPT as an anti join on the composite key —
    the shuffle carries distinct (user, day) pairs only."""
    ev = _t(spark, sf_dir, "events")
    day = F.unix_micros(F.date_trunc("day", "ts")).alias("day_us")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(purchases)


@query(
    "user_days_click_and_purchase",
    oracle="""
    SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us
    FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us
    FROM events WHERE event_type = 'purchase'
    """,
)
def user_days_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection at (user, day) granularity: days on which a user
    both clicked and purchased (INTERSECT DISTINCT = semi join over
    distinct keys)."""
    ev = _t(spark, sf_dir, "events")
    day = F.unix_micros(F.date_trunc("day", "ts")).alias("day_us")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.intersect(purchases)


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE) * x))),
                 3) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm of each embedding via array higher-order functions —
    entirely JVM-side (transform + aggregate), no Python in the loop.

    Scale: per-row O(dim) with no shuffle at all; for the 100 TB hot
    path the same expression runs inside whole-stage codegen."""
    emb = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id", "label", F.round(F.sqrt(sq_sum), 3).alias("l2_norm")
    )


@query(
    "stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(stddev_samp(l_extendedprice), 2)            AS sd_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / stddev / covariance) — mergeable
    one-pass moment sketches, so partial aggregation applies exactly as
    for sum/count.

    Scale: map-side partials shrink the shuffle to one moment tuple per
    (task, group)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cdc_apply_changelog",
    oracle="""
    WITH latest AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, event_type, round(value, 2) AS value,
           epoch_us(ts) AS ts_us
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert apply: treat events as a changelog keyed by user_id
    where 'error' acts as a tombstone — materialise the current state
    (latest non-deleted version per key). This is the HBase
    latest-version semantics (SURVEY.md §2 row 1) extended with delete
    markers, i.e. a Mongo-oplog/Debezium-style snapshot apply.

    Scale: one shuffle on the key; the tombstone filter runs after the
    per-key top-1, so a delete correctly suppresses older versions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.unix_micros("ts").alias("ts_us"),
        )
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT year(o_orderdate) AS o_year, o_orderpriority,
           GROUPING(year(o_orderdate), o_orderpriority) AS gid,
           round(sum(o_totalprice), 2) AS revenue, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not the rollup/cube lattices): revenue by
    year, by priority, and the grand total in ONE pass, with grouping_id
    disambiguating which marginal a NULL key row belongs to.

    Scale: one Expand (3 grouping sets -> 3x row growth pre-aggregation,
    map-side combined immediately) + one aggregation shuffle — versus
    three separate jobs re-scanning orders."""
    o = _t(spark, sf_dir, "orders")
    o = o.withColumn("o_year", F.year("o_orderdate"))
    return (
        o.groupingSets([["o_year"], ["o_orderpriority"], []], "o_year", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_year", "o_orderpriority", "gid", "revenue", "n")
    )


@query(
    "range_frame_trailing_sum",
    oracle="""
    SELECT event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1d
    FROM events
    """,
)
def range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, the trailing-24h sum of value —
    a VALUE-based frame (peers included, gaps respected), not the
    ROWS-based moving average the catalog already has.

    Scale: one shuffle on user_id + one sort per partition; the frame is
    evaluated with a sliding two-pointer pass over the sorted run, so
    cost is linear in events regardless of how many rows fall in each
    24h window."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)  # 1 day in microseconds
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("trailing_1d")
    )


@query(
    "ranking_family",
    oracle="""
    SELECT event_id,
           dense_rank()   OVER w AS drank,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    """,
)
def ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family beyond row_number: dense_rank,
    ntile, percent_rank, cume_dist over a deterministic (value, id)
    order per event_type.

    Scale: all four functions share ONE window spec, so Spark computes
    them in a single shuffle + sort pass — four analytic columns for the
    price of one exchange."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS valid_to_us,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history build — the lakehouse
    complement to cdc_apply_changelog (which materialises only the
    LATEST state): compress the changelog to state-CHANGE rows (each
    row where the tracked attribute differs from the previous version),
    then assign each change its validity interval [valid_from, valid_to)
    with the open (is_current) row carrying a NULL end. This is the
    standard warehouse dimension-history shape: an as-of lookup becomes
    a range probe into the interval table rather than a scan of the raw
    changelog.

    Scale: BOTH window passes (the change filter's lag and the interval
    lead) share the same partitioning key, so Catalyst plans exactly ONE
    shuffle on user_id and one sort per partition; the lead runs on the
    already-compressed change rows. No self-join, no per-key collect —
    at 100 TB this is a single exchange plus linear passes."""
    from .operators import scd2

    return scd2.build(_t(spark, sf_dir, "events"))


@query(
    "bloom_semijoin_reduction",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN REDUCTION (operators/bloom.py): the fact
    side (lineitem) is screened MAP-SIDE with a deterministic bit set
    built from the filtered dimension's keys (urgent orders), so rows
    that cannot match never enter the join's shuffle; the join then
    discards the bloom's false positives, making the result exactly the
    plain join (the oracle). This is the explicit, engine-portable form
    of Spark's runtime bloom injection — deterministic md5 bits, usable
    under any join shape, pinned below the exchange in tests.

    Scale: the build is one dimension scan to <= m bit positions
    (constant, bounded collect); the screen is pure codegen on the fact
    scan (one array-literal lookup per hash); the shuffle then carries
    |matching| + |FP| rows instead of the whole fact table — at 20%
    dimension selectivity that is an ~5x shuffle cut for one map pass."""
    from .operators import bloom

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = _t(spark, sf_dir, "lineitem")
    bits = bloom.bloom_build(o, "o_orderkey")
    screened = li.filter(bloom.bloom_might_contain(F.col("l_orderkey"), bits))
    return (
        screened.join(o.hint("merge"), screened.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "scd2_incremental",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS valid_to_us,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 merge (operators/scd2.merge_batch): the history
    is built over the first ~two-thirds of the changelog, then the
    remaining events arrive as an append-only batch merged in — only
    the touched keys' change rows re-run the window passes; every other
    key passes through a key anti-join untouched. The ORACLE is the
    full-from-scratch rebuild over ALL events: incremental merge and
    rebuild must agree row-for-row, which is the correctness contract a
    lakehouse MERGE pipeline runs on. The merge runs with
    ``validate=True``: the watermark guard (scd2.enforce_watermark, one
    key-sized extra job) raises loudly on a contract-violating late
    batch instead of quietly emitting divergent history — the timestamp
    split here satisfies the contract by construction, so the guard is
    pure insurance and the oracle stays green with it on.

    Scale: a daily batch touching 0.1% of keys re-windows ~0.1% of the
    history; the pass-through side never rewrites rows."""
    from .operators import scd2

    ev = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-21").cast("timestamp")
    old_changes = scd2.changes(ev.filter(F.col("ts") < split))
    batch = ev.filter(F.col("ts") >= split)
    return scd2.merge_batch(old_changes, batch, validate=True)
