"""Relational surface beyond the reference (SURVEY.md §2.6 "absent" list):
window functions, grouping sets (rollup/cube), semi/anti joins, set
operations, multi-way star joins, multi-aggregate statistics.

Determinism notes: raw doubles read from parquet pass through untouched
(safe to hash — no arithmetic); computed money aggregates use exact
integer-cents sums (functions.money); counts are bigint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import REVENUE_CENTS as _REV_CENTS
from ..functions.money import REVENUE_CENTS_SCALE as _REV_SCALE
from ..functions.money import guarded_money_sum
from ..sources.catalog import load_table

ANTI_THRESHOLD = 450_000.0


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price — ranking window function.

    One shuffle on o_custkey; rank truncation happens inside the window
    operator (no global sort). The reference has no window functions at
    all; this is the Spark-native replacement for its two-job top-K
    whenever the K is per-group.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


WINDOW_RANK_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        FROM orders
    ) WHERE rnk <= 3
"""


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem → orders → customer → nation → region revenue.

    Scale shape: the two fact tables shuffle-join on their key; every
    dimension (customer/nation/region) is broadcast — Catalyst picks this
    from sizes, AQE demotes to broadcast at runtime if stats lie. No
    dimension causes a fact shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(_REV_CENTS).alias("rev")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    # Region-grain sums are the 100 TB global-sum regime where the
    # int-cents bound (~$9e11/group) is actually reachable, so this query
    # carries the runtime overflow guard (functions.money.guarded_money_sum:
    # COUNT·MAX cross-multiply in the same partial agg, raise on breach) —
    # bit-identical to the plain SUM within bounds, loud past them.
    return (
        joined.groupBy("r_name")
        .agg(guarded_money_sum(F.col("rev"), _REV_SCALE, "revenue"))
        .select("r_name", "revenue")
    )


REVENUE_BY_REGION_SQL = f"""
    SELECT r_name, CAST(SUM({_REV_CENTS}) / 10000.0 AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
"""


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(l_returnflag, l_linestatus): subtotal hierarchy in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            (F.sum(F.expr(_REV_CENTS)) / F.lit(_REV_SCALE)).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty", "revenue")
    )


ROLLUP_LINEITEM_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM({_REV_CENTS}) / 10000.0 AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(o_orderstatus, o_orderpriority): all grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
                / F.lit(100.0)
            ).alias("sum_totalprice"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "sum_totalprice")
    )


CUBE_ORDERS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS sum_totalprice
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers holding at least one open ('O') order.

    Semi joins never duplicate the left side — at scale this avoids the
    join-then-distinct blow-up entirely.
    """
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_JOIN_SQL = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no order above the price threshold."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > ANTI_THRESHOLD
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


ANTI_JOIN_SQL = f"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > {ANTI_THRESHOLD})
"""


def setop_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: nations with customers INTERSECT nations with
    suppliers, UNION nations with neither-side EXCEPT logic exercised via
    a tagged union. Output: nationkey + which set produced it."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust_n.intersect(supp_n).withColumn("which", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("which", F.lit("customer_only"))
    return both.unionByName(cust_only).select("nationkey", "which")


SETOP_NATIONS_SQL = """
    SELECT nationkey, 'both' AS which FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'customer_only' AS which FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
"""


def grouped_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate statistics per order status: COUNT / COUNT DISTINCT /
    MIN / MAX / exact-decimal AVG (A4-A6 of the reference's EDA surface,
    as a single grouped pass)."""
    orders = load_table(spark, sf_dir, "orders")
    sum_cents = F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        ((sum_cents / F.lit(100.0)) / F.count("*")).alias("avg_price"),
    )


GROUPED_STATS_SQL = """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
                AS DOUBLE) / count(*) AS avg_price
    FROM orders
    GROUP BY o_orderstatus
"""
