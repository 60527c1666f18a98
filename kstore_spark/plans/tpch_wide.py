"""Remaining classic TPC-H plan shapes (Q2/Q7/Q8/Q9/Q11/Q15/Q16/Q21),
re-expressed over the tables this corpus ships (no ``partsupp``: cost /
stock shapes read supply prices from ``lineitem`` instead — the plan
shape, which is what each query exists to exercise, is unchanged).

Every query follows the repo-wide determinism discipline (see
plans/analytics.py): money math in DECIMAL(18,4), ROUND(...,2) → DOUBLE
only at the very end, integer arithmetic for thresholds, deterministic
tie-breaks on every top-k. Broadcast hints only on bounded dimensions
(nation: 25 rows, region: 5) — fact-sized sides are left to AQE so the
same plan scales from sf0.01 to a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kstore_spark.plans.analytics import _dec
from kstore_spark.tables import table


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated scalar-min subquery — for each part in
    a type/size slice, the supplier quoting the minimum price (ties →
    lowest suppkey). Spark-first formulation: instead of the textbook
    aggregate-then-join-back (two shuffles over the priced rows), a
    single ``min(struct(price, suppkey))`` per part — lexicographic
    struct ordering gives exactly "min price, then min suppkey among
    ties" in ONE partial-aggregated shuffle.
    """
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    best = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(F.min(F.struct("l_extendedprice", "l_suppkey")).alias("best"))
    )
    return best.select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("best.l_extendedprice").cast("decimal(18,2)").cast("double").alias("min_price"),
        F.col("best.l_suppkey").alias("s_suppkey"),
    )


Q2_SQL = """
WITH pl AS (
  SELECT l_partkey, l_suppkey, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'ECONOMY' AND p_size <= 10),
m AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price FROM pl GROUP BY 1)
SELECT p.l_partkey AS p_partkey,
       CAST(CAST(m.min_price AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
       MIN(p.l_suppkey) AS s_suppkey
FROM pl p JOIN m ON p.l_partkey = m.l_partkey AND p.l_extendedprice = m.min_price
GROUP BY 1, 2
"""


def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation shipping volume by year. The nation
    filter is pushed BELOW the fact join: supplier and customer are each
    pre-joined (broadcast) to the two-nation slice, so lineitem/orders
    rows for other nation pairs never reach the big join's shuffle.
    ``supp_nation != cust_nation`` over the 2-nation slice is exactly the
    textbook OR-of-two-pairs predicate.
    """
    nations = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    revenue = F.round(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))),
        2,
    ).cast("double")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("o_year"))
        .agg(revenue.alias("revenue"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: market-share ratio per year (CASE-sum / sum over
    a 6-table join). Both volume sums are exact decimals rounded to
    2 places; the share divides the two ROUNDED doubles and rounds to 6,
    so both engines divide bit-identical inputs (IEEE-deterministic).
    Only nation/region (25/5 rows) are broadcast-hinted.
    """
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_region = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    v = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    nation_vol = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", v).otherwise(zero)), 2
    ).cast("double")
    total_vol = F.round(F.sum(v), 2).cast("double")
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(nation_vol.alias("nation_volume"), total_vol.alias("total_volume"))
        .withColumn("mkt_share", F.round(F.col("nation_volume") / F.col("total_volume"), 6))
    )


Q8_SQL = """
WITH vol AS (
  SELECT YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS v,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS nation_volume,
       CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total_volume,
       ROUND(CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
             / CAST(ROUND(SUM(v), 2) AS DOUBLE), 6) AS mkt_share
FROM vol GROUP BY 1
"""


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier-nation × year for a substring
    slice of parts (LIKE '%widget%' — not prefix, so no pushdown: the
    filter runs in the scan stage but touches every part row; part is
    pruned to 2 columns before it).
    """
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    supp_nation = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.round(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))),
        2,
    ).cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(profit.alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: groups exceeding a fraction of a GLOBAL
    aggregate (scalar subquery). The global total is a one-row aggregate
    cross-joined (auto-broadcast) against the per-part values — no
    driver round-trip. The fraction compare runs in integer cents
    (value has ≤2 effective decimals) so both engines compare exactly:
    ``val_cents * 1500 > total_cents`` ⇔ share > 1/1500.
    """
    li = table(spark, sf_dir, "lineitem")
    v = (
        li.groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("val"))
        .withColumn("val_cents", (F.col("val") * 100).cast("long"))
    )
    total = v.agg(F.sum("val_cents").alias("total_cents"))
    return (
        v.crossJoin(total)
        .filter(F.col("val_cents") * 1500 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val"), 2).cast("double").alias("part_value"),
        )
    )


Q11_SQL = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS val
  FROM lineitem GROUP BY 1),
c AS (SELECT l_partkey, val, CAST(val * 100 AS BIGINT) AS val_cents FROM v)
SELECT l_partkey AS p_partkey, CAST(ROUND(val, 2) AS DOUBLE) AS part_value
FROM c WHERE val_cents * 1500 > (SELECT SUM(val_cents) FROM c)
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: view-max — supplier(s) whose quarterly revenue
    equals the global max. Max is a one-row aggregate over the already-
    shuffled revenue frame, broadcast back; equality is on exact
    decimals so ties are reproducible (and all ties are returned, as in
    the spec).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))).alias("rev")
    )
    top = rev.agg(F.max("rev").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(top)
        .filter(F.col("rev") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round("rev", 2).cast("double").alias("total_revenue"))
    )


Q15_SQL = """
WITH r AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, CAST(ROUND(rev, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN r ON s_suppkey = l_suppkey
WHERE rev = (SELECT MAX(rev) FROM r)
"""


def q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    group, with an excluded-supplier NOT IN (s_suppkey is never null →
    exact anti-join). The anti side is 6 rows — broadcast by AQE; the
    distinct-count shuffles once on the group keys with partial
    distinct aggregation map-side.
    """
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finalized order ("late" = shipped >100 days after
    order date; this corpus has no commit/receipt dates). The textbook
    EXISTS + NOT EXISTS pair of correlated self-joins is re-expressed as
    ONE per-order aggregate — n_suppliers and n_late_suppliers — joined
    back: late=1 ∧ n_supp>1 ∧ n_late=1 is exactly "exists another
    supplier, not exists another late supplier", with two fewer shuffles
    of the fact table.
    """
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    ls = (
        li.join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        ls.join(per_order, "l_orderkey")
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


Q21_SQL = """
WITH ls AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
agg AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM ls GROUP BY 1)
SELECT s_name, COUNT(*) AS numwait
FROM ls JOIN agg USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count": q16_supplier_count,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_count": Q16_SQL,
    "q21_waiting_supplier": Q21_SQL,
}
