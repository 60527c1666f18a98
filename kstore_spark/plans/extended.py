"""Extended analytic operators — second wave of capabilities beyond the
reference's surface (SURVEY.md §2.8 lists every category below as absent
there): as-of joins, exact percentiles, rollup/grouping sets, pivot,
semi/anti joins, EXCEPT, JSON/string/date functions, token top-k.

Same determinism discipline as plans/analytics.py: integer or decimal
arithmetic inside, deterministic tie-breaks on every top-k/rank, floats
only as final exact casts.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kstore_spark.tables import table


# -- as-of join (events: each purchase → latest same-user signup) -------

def events_asof(spark, sf_dir):
    """As-of join via the union+running-last trick: tag both streams,
    sort-merge once per user, carry the last signup event_id forward.
    This is the shuffle-minimal distributed formulation (one window over
    (user_id, ts) — state is one value per partition key), vs. the naive
    per-row subquery which is O(n²).
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    tagged = purchases.select(
        "user_id", "ts", "event_id", F.lit(None).cast("long").alias("sig_id")
    ).unionByName(
        signups.select(
            "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("sig_id"),
        )
    )
    # at equal ts the signup row must sort BEFORE the purchase row so the
    # purchase sees it (ASOF >= semantics): purchases carry NULL sig_id →
    # nulls_last puts signups first
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("sig_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_signup", F.last("sig_id", ignorenulls=True).over(w))
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", F.col("last_signup").alias("signup_event_id"))
    )

EVENTS_ASOF_SQL = """
SELECT p.event_id,
       p.user_id,
       s.event_id AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# -- exact median (discrete percentile, fully deterministic) ------------

def median_price_by_segment(spark, sf_dir):
    """Exact lower-median per group via row_number — no interpolation, no
    approx sketch, so the result is a value that exists in the data."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    n = Window.partitionBy("c_mktsegment")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(n))
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        .select("c_mktsegment", F.col("o_totalprice").alias("median_price"))
    )

MEDIAN_SQL = """
WITH j AS (
  SELECT c_mktsegment, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT c_mktsegment, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
  FROM j
)
SELECT c_mktsegment, o_totalprice AS median_price
FROM r WHERE rn = FLOOR((cnt + 1) / 2)
"""


# -- histogram / date buckets / rollup / pivot --------------------------

def price_histogram(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

PRICE_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS bucket, COUNT(*) AS n
FROM orders GROUP BY 1
"""


def orders_by_month(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )

ORDERS_BY_MONTH_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""


def rollup_orders(spark, sf_dir):
    """ROLLUP (grouping sets): subtotals per (year, priority), per year,
    and grand total — NULL marks the rolled-up level in both engines."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup(F.year("o_orderdate").alias("y"), F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

ROLLUP_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY ROLLUP (1, 2)
"""


def pivot_event_types(spark, sf_dir):
    """Hourly counts pivoted to one column per event type (fixed pivot
    value list → the plan is a single pass, no second distinct scan)."""
    ev = table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )

PIVOT_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'view')     AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'error')    AS error
FROM events GROUP BY 1
"""


# -- semi / anti / except ----------------------------------------------

def semi_join_customers(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )

SEMI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def anti_join_customers(spark, sf_dir):
    """Customers with no high-value order (NOT EXISTS → left-anti join).
    The >400000 threshold keeps the result non-empty at every test SF so
    the oracle comparison is non-vacuous."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey"
    )

ANTI_JOIN_SQL = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def except_suppliers(spark, sf_dir):
    """Nations having suppliers but no high-balance (>9000) supplier
    (EXCEPT, set semantics). Non-empty at every test SF so the oracle
    comparison is non-vacuous."""
    supp = table(spark, sf_dir, "supplier")
    all_nations = supp.select(F.col("s_nationkey").alias("nationkey"))
    rich_nations = supp.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return all_nations.subtract(rich_nations)  # EXCEPT (set semantics)

EXCEPT_SQL = """
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
"""


# -- JSON / string functions -------------------------------------------

def events_json_extract(spark, sf_dir):
    """props is a JSON string; extract k and aggregate per type."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k"), F.max(k).alias("max_k")
    )

EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def string_funcs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.substring("text", 1, 12).alias("prefix"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("n_consonant_chars"),
    )

STRING_FUNCS_SQL = """
SELECT doc_id,
       UPPER(source) AS src_upper,
       SUBSTRING(text, 1, 12) AS prefix,
       lang || '|' || source AS tag,
       CAST(LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS n_consonant_chars
FROM documents
"""


# -- corpus token top-k -------------------------------------------------

def top_tokens(spark, sf_dir):
    """Global token frequencies, top 20 (deterministic tie-break). The
    explode→partial-agg plan map-side combines before the shuffle, so
    shuffle volume is |vocab|, not |tokens|."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )

TOP_TOKENS_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
"""


# -- scalar-subquery shapes (TPC-H Q17 / Q2 patterns) -------------------

def q17_small_quantity(spark, sf_dir):
    """Lineitems whose quantity is below 50%% of their part's average —
    the scalar-correlated-subquery shape, executed as aggregate + self
    broadcast-join (how Catalyst decorrelates it)."""
    li = table(spark, sf_dir, "lineitem")
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum(F.col("l_quantity").cast("decimal(18,4)"))
              / F.count(F.lit(1))).alias("avg_q"))
    )
    return (
        li.join(avg_q, li.l_partkey == avg_q.pk)
        .filter(F.col("l_quantity").cast("decimal(18,4)") * 2 < F.col("avg_q"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_small"),
             F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_small_qty"))
    )

Q17_SQL = """
WITH a AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*) AS avg_q
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, COUNT(*) AS n_small,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_small_qty
FROM lineitem JOIN a ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(18,4)) * 2 < avg_q
GROUP BY l_partkey
"""


def argmin_supplier_per_nation(spark, sf_dir):
    """Cheapest-supplier-per-nation (argmin via window rank — the TPC-H
    Q2 min-per-group pattern, deterministic tie-break on key)."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    best = (
        supp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_suppkey", "s_acctbal")
    )
    return best

ARGMIN_SQL = """
SELECT n_name, s_suppkey, s_acctbal
FROM (
  SELECT s_nationkey, s_suppkey, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM supplier
) s JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders with at least one late lineitem (EXISTS →
    left-semi join), counted per priority."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    late = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )

Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
GROUP BY o_orderpriority
"""


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of order counts per customer,
    including zero-order customers (left outer join + double group-by)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))

Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.round(F.sum(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ), 2).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )

Q10_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional CASE aggregation — counts split by a
    predicate inside the aggregate, one pass."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent).alias("high_line_count"),
            F.sum(1 - urgent).alias("low_line_count"),
        )
    )

Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional revenue to total revenue —
    two decimal sums in one pass, exact division only at the end."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        (F.round(F.sum(promo), 2).cast("double") * 100
         / F.round(F.sum(rev), 2).cast("double")).alias("promo_pct")
    )

Q14_SQL = """
SELECT CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) * 100
       / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS promo_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
"""


def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive predicates (brand ×
    quantity bands) — the OR-of-ANDs form Catalyst still pushes to the
    scan as a single combined filter."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_size") >= 45) & F.col("l_quantity").between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return j.filter(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )

Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem, part
WHERE l_partkey = p_partkey AND (
      (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_size >= 45 AND l_quantity BETWEEN 20 AND 30))
"""


def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: group-HAVING subquery driving a join — orders
    whose total quantity exceeds a threshold, with their customer. The
    HAVING aggregate runs map-side-partial before its shuffle; the big
    orders list then joins orders/customer (AQE picks broadcast while it
    fits, shuffle beyond — no hard hint)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(100)
    )

Q18_SQL = """
SELECT c_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       sum_qty
FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey ASC
LIMIT 100
"""


def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: doubly nested semi-join — suppliers that moved
    above-threshold volume of small parts. Inner IN-list is a left-semi
    join (part is prunable to p_partkey/p_size); outer IN is another
    semi against the HAVING aggregate. No correlated per-row subqueries
    — everything is two semi-joins plus one partial aggregate."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size").between(1, 15))
    sup = table(spark, sf_dir, "supplier")
    heavy = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 4500)
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )

Q20_SQL = """
SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size BETWEEN 1 AND 15)
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 4500)
"""


def q22_inactive_rich(spark, sf_dir):
    """TPC-H Q22 shape: anti-ish pattern per nation — well-funded
    customers with very few orders. The per-customer order count is a
    grouped aggregate joined back (left join + coalesce 0), never a
    correlated subquery; money sums are exact decimal, emitted as
    2-decimal doubles (oracle determinism)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    bal = F.round(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2
    ).cast("double")
    return (
        cust.filter(F.col("c_acctbal") > 3000)
        .join(cnt, cust.c_custkey == cnt.o_custkey, "left")
        .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 4)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), bal.alias("total_bal"))
    )

Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) oc ON c_custkey = o_custkey
WHERE c_acctbal > 3000 AND COALESCE(n_orders, 0) < 4
GROUP BY c_nationkey
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q18_large_volume": q18_large_volume,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q22_inactive_rich": q22_inactive_rich,
    "q14_promo_revenue": q14_promo_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity": q17_small_quantity,
    "argmin_supplier_per_nation": argmin_supplier_per_nation,
    "events_asof": events_asof,
    "median_price_by_segment": median_price_by_segment,
    "price_histogram": price_histogram,
    "orders_by_month": orders_by_month,
    "rollup_orders": rollup_orders,
    "pivot_event_types": pivot_event_types,
    "semi_join_customers": semi_join_customers,
    "anti_join_customers": anti_join_customers,
    "except_suppliers": except_suppliers,
    "events_json_extract": events_json_extract,
    "string_funcs": string_funcs,
    "top_tokens": top_tokens,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q18_large_volume": Q18_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q22_inactive_rich": Q22_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q17_small_quantity": Q17_SQL,
    "argmin_supplier_per_nation": ARGMIN_SQL,
    "events_asof": EVENTS_ASOF_SQL,
    "median_price_by_segment": MEDIAN_SQL,
    "price_histogram": PRICE_HISTOGRAM_SQL,
    "orders_by_month": ORDERS_BY_MONTH_SQL,
    "rollup_orders": ROLLUP_SQL,
    "pivot_event_types": PIVOT_SQL,
    "semi_join_customers": SEMI_JOIN_SQL,
    "anti_join_customers": ANTI_JOIN_SQL,
    "except_suppliers": EXCEPT_SQL,
    "events_json_extract": EVENTS_JSON_SQL,
    "string_funcs": STRING_FUNCS_SQL,
    "top_tokens": TOP_TOKENS_SQL,
}
