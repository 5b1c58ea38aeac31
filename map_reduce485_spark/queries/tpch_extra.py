"""Additional TPC-H-style analytics adapted to the testdata schema
(FIXTURES.md B1-B7; the schema lacks commitdate/shipmode/comment columns,
so each query keeps its TPC-H plan shape with predicates over available
columns).  Breadth for SURVEY.md §2.b: every one of these is a workload a
reference user would have hand-written as (mapper, reducer) chains."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T, dsum, oracle_dsum

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@query("q4_order_priority", _Q4_ORACLE, tags=("tpch",))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered priority counts (late-shipping
    orders).  Catalyst rewrites the correlated EXISTS into a semi join on
    orderkey — only keys cross the shuffle."""
    orders, li = T(spark, sf_dir, "orders", "lineitem")
    filtered = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    late = li.join(
        filtered.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    return (
        filtered.join(late.select("l_orderkey").distinct(), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {oracle_dsum('volume', 'revenue', 6)}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_5'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", _Q7_ORACLE, tags=("tpch",))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two nations
    (two broadcast nation joins under different aliases)."""
    supp, li, orders, cust, nation = T(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_5"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue", 6))
    )


_Q12_ORACLE = """
SELECT priority_class, COUNT(DISTINCT o_orderkey) AS n_orders
FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' ELSE 'low' END
           AS priority_class
  FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY priority_class
"""


@query("q12_late_shipment_priority", _Q12_ORACLE, tags=("tpch",))
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-line orders bucketed into priority classes."""
    orders, li = T(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select(
            "o_orderkey",
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .otherwise("low")
            .alias("priority_class"),
        )
        .groupBy("priority_class")
        .agg(F.countDistinct("o_orderkey").alias("n_orders"))
    )


_Q14_ORACLE = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
                     ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
       * 100 AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""


@query("q14_promo_revenue", _Q14_ORACLE, tags=("tpch",))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share (conditional decimal sums,
    broadcast part join)."""
    li, part = T(spark, sf_dir, "lineitem", "part")
    rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))"
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.expr(f"CASE WHEN p_type = 'PROMO' THEN {rev} ELSE CAST(0 AS DECIMAL(24,6)) END")).cast("double")
                / F.sum(F.expr(rev)).cast("double")
                * 100
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (10, 20, 30, 40)
GROUP BY p_brand, p_type, p_size
"""


@query("q16_parts_supplier_counts", _Q16_ORACLE, tags=("tpch",))
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute combo."""
    li, part = T(spark, sf_dir, "lineitem", "part")
    return (
        F.broadcast(
            part.filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(10, 20, 30, 40))
        )
        .join(li, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q17_ORACLE = """
SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
         AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) p ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


@query("q17_small_quantity_revenue", _Q17_ORACLE, tags=("tpch",))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of below-half-average-quantity lines.
    The per-part average is an agg-then-self-join (the scalable rewrite of
    the correlated subquery; exact decimal → double keeps the 0.5·avg
    threshold bit-identical across engines)."""
    (li,) = T(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        # integer-cents sum -> mutable long agg buffer (codegen HashAggregate);
        # see queries/_util.dsum for the strategy rationale
        (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0 / F.count("*")).alias(
            "avg_qty"
        )
    )
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0 / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_rows"),
        )
    )


_Q19_ORACLE = f"""
SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)},
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_predicates", _Q19_ORACLE, tags=("tpch",))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides (tests predicate
    normalization; Catalyst extracts the common join key and pushes the
    per-side conjuncts)."""
    li, part = T(spark, sf_dir, "lineitem", "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        dsum("l_extendedprice * (1 - l_discount)", "revenue", 6),
        F.count("*").alias("n_rows"),
    )


_Q22_ORACLE = """
SELECT n_name, COUNT(*) AS numcust,
       SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
"""


@query("q22_global_sales_opportunity", _Q22_ORACLE, tags=("tpch",))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich idle customers (above-average balance, no
    recent orders) per nation — scalar subquery + anti join + broadcast dim.

    The scalar average stays a DataFrame, joined in via crossJoin(broadcast)
    — a 1-row broadcast keeps the whole query one lazy job instead of a
    driver round-trip (single-action laziness at any scale)."""
    cust, nation, orders = T(spark, sf_dir, "customer", "nation", "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0 / F.count("*")).alias("_avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-01-01"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0).alias("totacctbal"),
        )
    )
