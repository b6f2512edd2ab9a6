"""The remaining TPC-H query shapes (Q2, Q8, Q11, Q12, Q20, Q21), adapted
to the driver's schema (no partsupp table, no commit/receipt dates — the
structurally equivalent predicate is built from the columns that exist).
Together with queries.py / queries_joins.py this completes all 22 TPC-H
operator shapes.

Each query here exercises a DISTINCT operator class not covered by the
other 16:

- Q2  — correlated arg-min per group: join back on the per-group minimum
        (Catalyst plans the 1-row-per-group aggregate as a broadcast when
        small; the join is on (key, min) so no window materialisation).
- Q8  — share-of-total by year: conditional numerator over a star join.
- Q11 — HAVING against a GLOBAL scalar aggregate: the total is a 1-row
        subquery broadcast into every group's filter.
- Q12 — lateness bucketing with conditional counts (CASE inside SUM).
- Q20 — nested IN-subquery chain: parts-by-name -> qualifying suppliers
        -> supplier decoration; each IN becomes a left-semi join.
- Q21 — double correlation: EXISTS (another supplier on the order) AND
        NOT EXISTS (another *failing* supplier on the order), expressed
        as one per-order aggregate instead of two correlated rescans.

Scale notes sit on each query: which side broadcasts, where the
unavoidable shuffle is, and why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.portable import round_portable
from .queries import query
from .sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_cost) AS min_cost FROM offers GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
           (floor(o.unit_cost * 10000.0 + 0.5) / 10000.0) AS unit_cost
    FROM offers o
      JOIN best b  ON o.l_partkey = b.l_partkey AND o.unit_cost = b.min_cost
      JOIN part p  ON p.p_partkey = o.l_partkey
      JOIN supplier s ON s.s_suppkey = o.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size < 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: the 'supply offer' is the min unit
    price a supplier ever shipped a part at (lineitem-derived), and the
    answer is each part's cheapest offer with supplier/nation decoration.

    Scale: the offers aggregate shuffles on (partkey, suppkey) — partial
    aggregation first, so the shuffle carries one row per distinct pair,
    not per lineitem. The arg-min is a second small agg on partkey joined
    back on (partkey, min) — both sides are already co-partitioned on
    partkey so AQE plans a cheap join; part/supplier/nation/region are
    broadcast dims. The double equality on unit_cost is exact: both sides
    compute the identical IEEE division before any rounding."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") < 15) & (F.col("p_type") == "ECONOMY")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = offers.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        offers.join(
            best,
            (offers.l_partkey == best.l_partkey)
            & (offers.unit_cost == best.min_cost),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            # portable floor-round: per-row division is bit-identical
            # across engines, round() semantics are not (functions/portable)
            round_portable(F.col("unit_cost"), 4).alias("unit_cost"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue per year — a
    conditional-numerator ratio over a 6-table star join.

    Scale: lineitem is the only fact; orders co-shuffles on orderkey
    (the one big exchange), every other table is a broadcast dim. The
    share is computed in a single aggregation pass (conditional sum /
    total sum), not two queries."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    n1 = nat.select(
        F.col("n_nationkey").alias("c_nat_key"), F.col("n_regionkey").alias("c_reg_key")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("s_nat_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nat_key"))
        .join(F.broadcast(reg), F.col("c_reg_key") == F.col("r_regionkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nat_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    vol_if = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return joined.groupBy("o_year").agg(
        F.round(F.sum(vol_if) / F.sum("volume"), 4).alias("mkt_share")
    )


@query(
    "q11_important_suppliers",
    oracle="""
    WITH value_by_supp AS (
      SELECT l_suppkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT v.l_suppkey AS s_suppkey, s.s_name, round(v.value, 2) AS value
    FROM value_by_supp v JOIN supplier s ON s.s_suppkey = v.l_suppkey
    WHERE v.value > (SELECT avg(value) * 1.03 FROM value_by_supp)
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape without partsupp: suppliers whose shipped value
    exceeds 1.03x the GLOBAL mean supplier value — a HAVING filter against
    a one-row scalar aggregate. (Q11's fixed fraction-of-total cut is
    scale-DEpendent — it selects everything at sf0.01 and nothing at
    sf0.1 — so a mean-relative cut just above the uniform-data spread stays selective at
    every scale factor.)

    Scale: one shuffle for the per-supplier aggregate; the global total
    is a second aggregation over that (tiny) frame, cross-joined back as
    a broadcast single row — never a driver collect, so the same plan
    runs unchanged on a 1000-executor cluster."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    by_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    total = by_supp.agg((F.avg("value") * 1.03).alias("threshold"))
    return (
        by_supp.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("value", 2).alias("value"),
        )
    )


@query(
    "q12_shipping_lateness",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_shipping_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode/commitdate in this schema): bucket
    lineitems by shipping delay vs the order date and count high- vs
    low-priority lines per bucket — CASE-inside-SUM conditional counts.

    Scale: the l_shipdate range predicate is pushed to the parquet scan
    (row-group pruning); the single shuffle is the lineitem-orders join
    on orderkey; the 2-row aggregate is map-side combined."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "LATE"
            )
            .otherwise("ONTIME")
            .alias("ship_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@query(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 50
    )
    AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of promo-named
    parts in a year — a nested IN-subquery chain (parts by name ->
    qualifying shipments -> suppliers), each IN planned as a left-semi
    join.

    Scale: the part-name filter makes the inner partkey set small, so it
    broadcasts into the lineitem scan as a semi join BEFORE the
    aggregation; the HAVING runs on the already-reduced per-supplier
    frame; the final supplier IN is another broadcast semi join. No
    shuffle ever carries more than the filtered lineitem rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    qualifying = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        sup.join(
            F.broadcast(qualifying), sup.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per_supp ps
      JOIN per_order po ON ps.l_orderkey = po.l_orderkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.is_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped >60 days after the order
    date): count, per supplier, the multi-supplier orders where THEY were
    the only late one — EXISTS (another supplier on the order) AND NOT
    EXISTS (another late supplier).

    Scale: Q21's textbook form rescans lineitem twice for the correlated
    EXISTS/NOT EXISTS; here both correlations collapse into one per-order
    aggregate (n_supp, n_late) joined back — lineitem is read ONCE, and
    the per-supplier/per-order frames it derives are co-partitioned on
    orderkey so the back-join adds no extra full-size exchange."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    late = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, 1
    ).otherwise(0)
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        per_supp.filter(F.col("is_late") == 1)
        .join(per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)), "l_orderkey")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
