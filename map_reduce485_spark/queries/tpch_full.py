"""Remaining TPC-H query shapes (q2, q8, q9, q11, q13, q15, q20, q21) —
completes the 22-query suite together with ``relational.py`` and
``tpch_extra.py``.

The testdata schema (FIXTURES.md) has no ``partsupp`` table and no
receipt/commit dates, so the queries that need them (q2/q9/q11/q20/q21) are
*shape-preserving adaptations*: identical plan topology (min-cost correlated
agg, scalar-subquery threshold, double-EXISTS, …) with the missing inputs
derived from ``lineitem``/``part`` (e.g. unit cost = min observed
``l_extendedprice / l_quantity``; lateness = shipped >60 days after order
date).  Every one of these is a workload a reference user would express as
chained (mapper, reducer) jobs (`/root/reference/map_reduce/mapreduce/`,
worker contract at ``worker/__main__.py:104-125,193-202``); here each is a
single declarative plan that Catalyst optimizes (broadcast dims, semi joins,
partial aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce485_spark.queries import query
from map_reduce485_spark.queries._util import T, dsum, oracle_dsum

# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier.  partsupp.ps_supplycost is adapted as the
# minimum observed unit price per (part, supplier) in lineitem.
# --------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT l_partkey, l_suppkey, unit_cost, s_name, s_acctbal, n_name
  FROM supply
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_name, s_acctbal, n_name, p_partkey, p_name, unit_cost
FROM eu
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS mpk, MIN(unit_cost) AS min_cost FROM eu GROUP BY l_partkey) m
  ON p_partkey = mpk AND unit_cost = min_cost
WHERE p_size IN (10, 20, 30) AND p_type = 'LARGE'
"""


@query("q2_min_cost_supplier", _Q2_ORACLE, tags=("tpch",))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost EUROPE supplier (correlated MIN
    subquery → agg + self-join rewrite; nation/region broadcast).  MIN over
    identically-computed doubles is order-independent, so the cost-equality
    join is exact on both engines."""
    li, supp, nation, region, part = T(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        supply.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("l_partkey", "l_suppkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = eu.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    wanted = part.filter(F.col("p_size").isin(10, 20, 30) & (F.col("p_type") == "LARGE"))
    return (
        eu.join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            min_cost,
            (F.col("p_partkey") == F.col("mpk")) & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select("s_name", "s_acctbal", "n_name", "p_partkey", "p_name", "unit_cost")
    )


# --------------------------------------------------------------------------
# Q8 — national market share.
# --------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                     THEN CAST(volume AS DECIMAL(24,6))
                     ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_rows
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
"""


@query("q8_market_share", _Q8_ORACLE, tags=("tpch",))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of ECONOMY-part revenue sold into
    ASIA customers, per order year.  Six-way join — fact tables shuffle on
    their keys, all dims broadcast; the share ratio is computed from exact
    decimal partial sums so it hash-matches DuckDB."""
    li, part, supp, orders, cust, nation, region = T(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "customer", "nation", "region"
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    dec = "decimal(24,6)"
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("volume").cast(dec)).otherwise(
                        F.lit(0).cast(dec)
                    )
                ).cast("double")
                / F.sum(F.col("volume").cast(dec)).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit.  ps_supplycost adapted as 10% of p_retailprice.
# --------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n_name, o_year, {oracle_dsum('amount', 'sum_profit', 6)}
FROM (
  SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY n_name, o_year
"""


@query("q9_product_profit", _Q9_ORACLE, tags=("tpch",), bench=True)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and order
    year (supply cost proxied as 10% of p_retailprice — no partsupp table)."""
    li, part, supp, orders, nation = T(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("n_name", "o_year")
        .agg(dsum("amount", "sum_profit", 6))
    )


# --------------------------------------------------------------------------
# Q11 — important stock.  partsupp value adapted as revenue handled per part
# by suppliers of one nation; threshold is a scalar subquery over the total.
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH nat_supply AS (
  SELECT l_partkey, CAST(l_extendedprice * l_quantity AS DECIMAL(30,4)) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
FROM nat_supply
GROUP BY l_partkey
HAVING CAST(SUM(val) AS DOUBLE) >
       (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM nat_supply)
"""


@query("q11_important_stock", _Q11_ORACLE, tags=("tpch",))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_3-handled value exceeds a fraction
    of the national total — grouped agg HAVING a scalar subquery, executed as
    a broadcast cross-join of the 1-row total (no driver collect)."""
    li, supp, nation = T(spark, sf_dir, "lineitem", "supplier", "nation")
    dec = "decimal(30,4)"
    nat = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).cast(dec).alias("val"),
        )
    )
    per_part = nat.groupBy("l_partkey").agg(F.sum("val").cast("double").alias("part_value"))
    total = nat.agg((F.sum("val").cast("double") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("q13_customer_distribution", _Q13_ORACLE, tags=("tpch",))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts (left outer
    join with an ON-clause filter keeps order-less customers at c_count=0;
    two cascaded aggregations, the second over only ~distinct counts)."""
    cust, orders = T(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue.
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue', 6)}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", _Q15_ORACLE, tags=("tpch",))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max Q1-1997 revenue (revenue view +
    scalar MAX subquery as a broadcast 1-row join).  Revenue goes through
    exact decimal sums, so the MAX-equality predicate is deterministic on
    both engines."""
    li, supp = T(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum("l_extendedprice * (1 - l_discount)", "total_revenue", 6))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion.  ps_availqty adapted as a supplier's share
# of a part's 1997 sold quantity.
# --------------------------------------------------------------------------

_Q20_ORACLE = """
WITH sold AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey, l_partkey
),
big AS (
  SELECT DISTINCT l_suppkey
  FROM sold
  JOIN (SELECT l_partkey AS pk, SUM(qty) AS part_total FROM sold GROUP BY l_partkey) t
    ON l_partkey = pk
  WHERE qty > 0.2 * part_total
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT l_suppkey FROM big)
"""


@query("q20_potential_promotion", _Q20_ORACLE, tags=("tpch",))
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EUROPE suppliers holding >20% of any red part's 1997
    volume — nested semi-join chain (part filter → per-(supp,part) agg →
    per-part total self-join → DISTINCT supplier semi join)."""
    li, part, supp, nation, region = T(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    sold = (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg((F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0).alias("qty"))
    )
    totals = sold.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("part_total")
    )
    big = (
        sold.join(totals, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty") > 0.2 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting.  Lateness adapted as shipping
# >60 days after the order date (no receipt/commit dates in the schema).
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH lf AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
stats AS (
  SELECT l_orderkey AS ok,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lf GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM lf
JOIN stats ON ok = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late = 1 AND n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
"""


@query("q21_waiting_suppliers", _Q21_ORACLE, tags=("tpch",), bench=True)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a finished
    multi-supplier order shipping late.  The classic EXISTS / NOT-EXISTS
    pair is rewritten as one per-order aggregate (distinct suppliers vs
    distinct late suppliers), the scalable form at 100 TB.

    Round-14 rework (guide §2.3 aggregate-before-shuffle): the lineitem⋈
    orders row stream is pre-aggregated per (l_orderkey, l_suppkey) FIRST
    — map-side partial aggregation reduces lineitem-scale rows to
    order-supplier pairs before the only lineitem-scale exchange — and the
    per-order stats become plain count/sum over that group table computed
    by a WINDOW over l_orderkey (partition sizes = suppliers per order,
    bounded).  The previous shape derived the joined stream TWICE (stats
    aggregate + row stream joined back), paid an Expand (x2 row
    multiplication) for the two countDistincts, and shuffled lineitem-scale
    rows three times.  Equivalence: n_supp = COUNT(*) of (order, supplier)
    groups = COUNT(DISTINCT l_suppkey); n_late_supp = SUM(MAX(is_late)) =
    COUNT(DISTINCT late supplier); the late-row count rides as
    SUM(is_late) per group.  A/B (tools/ab_code.py, sf0.1): wall 0.89x,
    JVM CPU 0.66x, oracle-identical rows."""
    from pyspark.sql import Window as W

    li, orders, supp = T(spark, sf_dir, "lineitem", "orders", "supplier")
    g = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), 1
            )
            .otherwise(0)
            .alias("is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"), F.sum("is_late").alias("n_late_rows"))
    )
    w = W.partitionBy("l_orderkey")
    stats = g.select(
        "l_suppkey",
        "late",
        "n_late_rows",
        F.count("*").over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late_supp"),
    )
    return (
        stats.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        # coalesce(…, 0) pins the non-nullable LongType the previous
        # count(*) carried (groups are non-empty; schema-identity only)
        .agg(
            F.coalesce(F.sum("n_late_rows"), F.lit(0).cast("long")).alias("numwait")
        )
    )
