"""Analytic query suite — the capabilities the reference explicitly lacks
(SURVEY.md §2.8: no group-by, sorts, limits, distinct, windows, set ops),
built Spark-first as the engine's extension surface.

Determinism discipline for the DuckDB oracle: monetary doubles carry ≤2
decimal digits, so they cast exactly into DECIMAL(18,4); all sums/products
are computed in decimal (exact, order-independent) and only the final
result is cast back to double — bit-identical across engines regardless
of aggregation order. Doubles with arbitrary mantissas (events.value) are
only aggregated with order-independent functions (min/max/count).

Scale notes (100 TB design):
- group-bys are partial-aggregated map-side by Spark automatically;
- only genuinely bounded dimensions (region: 5 rows, nation: 25) carry
  an explicit broadcast hint; customer/orders/supplier grow with SF, so
  their join strategy is left to AQE (autoBroadcastJoinThreshold) — at
  small SF it picks broadcast, at cluster scale it degrades gracefully
  to shuffle joins instead of OOMing executors on a forced hint;
- top-k is TakeOrderedAndProject (per-partition heap + driver merge of
  k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.tables import table


def _dec(c, scale=4):
    return F.col(c).cast(f"decimal(18,{scale})")


# -- q1: pricing summary (grouped aggregation, TPC-H Q1 shape) ---------

def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    charge = disc * (F.lit(1).cast("decimal(18,4)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- q3: shipping priority (join + group + deterministic top-k) --------

def q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-06-15"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-06-15"))
    revenue = F.round(F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    ), 2).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )

Q3_SQL = """
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-06-15' AND l_shipdate > TIMESTAMP '1995-06-15'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# -- q5: local supplier volume (multi-way join chain) ------------------

def q5_local_supplier(spark, sf_dir):
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    revenue = F.round(F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    ), 2).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )

Q5_SQL = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# -- q6: forecast revenue (pure scan-filter-aggregate) -----------------

def q6_forecast_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2).cast("double").alias("revenue"))
    )

Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# -- top-k / distinct / set ops / windows ------------------------------

def top_customers(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("o_custkey"))
        .limit(20)
    )

TOP_CUSTOMERS_SQL = """
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey ASC LIMIT 20
"""


def distinct_segments(spark, sf_dir):
    return table(spark, sf_dir, "customer").select("c_mktsegment").distinct()

DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def set_ops_customers(spark, sf_dir):
    """INTERSECT: big-spender custkeys that are also BUILDING-segment."""
    cust = table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    return rich.intersect(bld)

SET_OPS_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


def window_top_orders_per_customer(spark, sf_dir):
    """Rank orders within each customer — window functions (absent in the
    reference). Deterministic: ties broken by orderkey."""
    from pyspark.sql.window import Window
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )

WINDOW_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


# -- events: grouped stats, time buckets, sessionization ---------------

def events_by_type(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # events.value has arbitrary mantissas → only order-independent aggs
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )

EVENTS_BY_TYPE_SQL = """
SELECT event_type, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def events_user_overlap(spark, sf_dir):
    """Audience overlap: distinct users shared by every pair of event
    types — the cohort-intersection question behind funnel design. One
    distinct pass collapses events to |users|×|types| rows; the
    self-join shuffles only (user_id, type) pairs, never events, and
    the pair aggregation runs on type-pair keys (tiny). At 100 TB the
    distinct is the only corpus-sized shuffle; the sketch family
    (functions/sketches.py) covers the per-type approximate counts but
    intersections need the exact pass (HLLs don't intersect)."""
    d = table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    a = d.select("user_id", F.col("event_type").alias("type_a"))
    b = d.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        # the join of two distinct (user, type) frames makes
        # (user, type_a, type_b) unique already — plain COUNT avoids a
        # second two-phase distinct aggregation
        .agg(F.count(F.lit(1)).alias("n_common_users"))
    )

EVENTS_USER_OVERLAP_SQL = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_common_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def events_hourly(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def events_anomaly_hours(spark, sf_dir):
    """Anomalous traffic hours per event type: hours whose count exceeds
    the type's mean + 2σ (population) over its hourly series. The
    2σ test is cross-multiplied into exact DECIMAL arithmetic —
    ``n·c − S > 0 AND (n·c − S)² > 4·(n·SS − S²)`` with S=Σc, SS=Σc² —
    so no float mean/stddev ever materializes and the flag is bit-exact
    in any engine (a float stddev would be summation-order hostage).
    The intermediates run in decimal(20,0)-derived precision on the
    Spark side and HUGEINT on DuckDB's (its SUM over BIGINT promotes
    automatically): int64 would silently WRAP once n·SS passes 2^63 —
    a year of hours needs only ~10^9 events/hour to get there — while
    decimal stays exact to 10^38 (≈10^14 events/hour over a decade of
    hours, beyond any real deployment; Spark returns NULL rather than
    a wrong flag if ever exceeded). Scale shape: one (type, hour)
    partial-agg shuffle, then a window over event_type — cardinality
    |types|×|hours|, tiny regardless of input volume."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return anomaly_flags(hourly)


def anomaly_flags(hourly):
    """The exact-decimal flag kernel over a (hour, event_type, c) frame
    — shared with streaming.windows.stream_anomaly_hours, whose hourly
    counts come from a watermarked streaming agg instead of a batch
    groupBy (the flags themselves are not incremental: one new hour
    shifts every flag of its type, so they are a batch window over the
    finished series in both variants)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type")
    c = F.col("c").cast("decimal(20,0)")
    n = F.count(F.lit(1)).over(w).cast("decimal(20,0)")
    s = F.sum(c).over(w)
    ss = F.sum(c * c).over(w)
    dev = n * c - s
    return (
        hourly.select(
            "event_type", "hour", F.col("c").alias("n_events"),
            ((dev > 0) & (dev * dev > 4 * (n * ss - s * s))).alias("is_anomaly"),
        )
    )


EVENTS_ANOMALY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, hour, c,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(c) OVER (PARTITION BY event_type) AS s,
         SUM(c * c) OVER (PARTITION BY event_type) AS ss
  FROM hourly
)
SELECT event_type, hour, c AS n_events,
       (n * c - s > 0) AND ((n * c - s) * (n * c - s) > 4 * (n * ss - s * s))
         AS is_anomaly
FROM st
"""


PATH_K = 20  # top-k event-type trigram paths


def events_top_paths(spark, sf_dir, k: int = PATH_K):
    """Top-k most common 3-step event-type paths (the clickstream
    path-mining staple the reference's agg set can't express): per user,
    events ordered by (ts, event_id) — event_id breaks timestamp ties
    deterministically — yield sliding (e1, e2, e3) transitions counted
    corpus-wide. Scale shape: one shuffle partitions by user_id for the
    window (users are high-cardinality → no skew wall), then the path
    agg map-side combines to |types|³ partials; the top-k over ≤ |types|³
    rows is driver-trivial at any input volume."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    return (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .groupBy(F.col("event_type").alias("e1"), "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(k)
    )


EVENTS_TOP_PATHS_SQL = f"""
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT event_type AS e1, e2, e3, COUNT(*) AS n_paths
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, e1, e2, e3
LIMIT {PATH_K}
"""


def events_cumulative_users(spark, sf_dir):
    """Daily new-user and cumulative-user counts (the growth-accounting
    series): distinct-over-an-expanding-window rewritten as first-seen
    date per user + a running sum — the only formulation that scales
    (a naive per-day COUNT(DISTINCT) over an expanding window re-scans
    every prefix). One user_id shuffle for the min-date agg, one
    |days|-row global window (tiny by construction). Output
    (day, n_new_users, n_cumulative_users)."""
    from pyspark.sql.window import Window

    firsts = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("day"))
    )
    daily = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("n_new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "n_new_users",
        F.sum("n_new_users").over(w).alias("n_cumulative_users"),
    )


EVENTS_CUMULATIVE_USERS_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS day FROM events GROUP BY 1
), daily AS (
  SELECT day, COUNT(*) AS n_new_users FROM firsts GROUP BY day
)
SELECT day, n_new_users,
       CAST(SUM(n_new_users) OVER (ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_cumulative_users
FROM daily
"""


def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity gap): a stateful
    pattern the reference cannot express. Batch formulation = windowed
    lag + running sum; the streaming twin lives in kstore_spark.streaming."""
    from pyspark.sql.window import Window
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(w)
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.max("n_events").alias("max_session_events"))
    )

EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), c AS (
  SELECT user_id, session_id, COUNT(*) AS n_events FROM s GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
FROM c GROUP BY user_id
"""


def events_gapfill(spark, sf_dir):
    """Time-bucket gap-fill (the hypertable `time_bucket_gapfill`
    pattern): hourly counts per type INCLUDING explicit zero rows for
    silent hours. The dense (hour × type) grid is generated, never
    scanned — sequence() over the corpus [min, max] hour bounds (one
    tiny agg) crossed with the distinct types, so grid size is
    |hours|·|types| regardless of event volume; real counts join in
    from the ordinary aggregate."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    grid = hours.crossJoin(ev.select("event_type").distinct())
    return grid.join(counts, ["hour", "event_type"], "left").select(
        "hour", "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )

EVENTS_GAPFILL_SQL = """
WITH counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), grid AS (
  SELECT hour, event_type
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events)
)
SELECT g.hour, g.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN counts c ON g.hour = c.hour AND g.event_type = c.event_type
"""


def events_gapfill_locf(spark, sf_dir):
    """Gap-fill with last-observation-carried-forward interpolation (the
    hypertable `locf()`): silent hours inherit the most recent observed
    hourly mean value per type. The carry is a per-type window over the
    DENSE grid (|hours|·|types| rows, not events), so the sort is tiny
    regardless of event volume; hours before a type's first observation
    stay NULL — LOCF has nothing to carry."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    # hourly mean in integer MICRO-units (floor(value*1e6) summed as
    # BIGINT, integer-divided by the count): double AVG is summation-
    # order-dependent across engines; the fixed-point form is
    # bit-deterministic (repo oracle convention)
    means = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.sum(F.floor(F.col("value") * 1000000)).alias("s"),
             F.count(F.lit(1)).alias("c"))
        .select("hour", "event_type", F.expr("s div c").alias("mean_micro"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    grid = hours.crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(means, ["hour", "event_type"], "left")
        .select(
            "hour", "event_type",
            F.col("mean_micro").isNotNull().alias("observed"),
            F.last("mean_micro", ignorenulls=True).over(w).alias("mean_micro"),
        )
    )

EVENTS_GAPFILL_LOCF_SQL = """
WITH means AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
           // COUNT(*) AS mean_micro
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), grid AS (
  SELECT hour, event_type
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events)
)
SELECT g.hour, g.event_type,
       m.mean_micro IS NOT NULL AS observed,
       CAST(LAST_VALUE(m.mean_micro IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mean_micro
FROM grid g LEFT JOIN means m ON g.hour = m.hour AND g.event_type = m.event_type
"""


def _funnel_levels(spark, sf_dir, names, hours=None):
    """Shared signup → view → purchase min-timestamp chain: a user
    reaches step k only with a step-k event STRICTLY AFTER their
    step-(k-1) time, and — when ``hours`` is set — within that many
    hours of it. Each step is a join keyed on user_id against the
    shrinking survivor set, so shuffle volume decreases monotonically
    down the funnel regardless of the bound."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    win = F.expr(f"INTERVAL {hours} HOURS") if hours is not None else None

    def step(etype, prev, tcol):
        out = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            cond = F.col("ts") > F.col("pt")
            if win is not None:
                cond = cond & (F.col("ts") <= F.col("pt") + win)
            out = out.join(prev.select("user_id", F.col(prev.columns[1])
                                       .alias("pt")), "user_id").filter(cond)
        return out.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = step("signup", None, "t1")
    s2 = step("view", s1, "t2")
    s3 = step("purchase", s2, "t3")

    def level(df, n, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(n).alias("step"), F.lit(name).alias("name"), "n_users"
        )

    return (
        level(s1, 1, names[0])
        .unionByName(level(s2, 2, names[1]))
        .unionByName(level(s3, 3, names[2]))
    )


def events_funnel(spark, sf_dir):
    """Ordered conversion funnel signup → view → purchase with
    lifetime conversion (no step-to-step deadline) — see
    _funnel_levels for the shared chain."""
    return _funnel_levels(
        spark, sf_dir, ("signup", "view_after_signup", "purchase_after_view"))

def events_ab_conversion(spark, sf_dir):
    """Experiment-arm conversion table: arm = parity of the JSON
    payload's ``k`` field (NULL when absent — kept as its own row, the
    instrumentation-gap bucket), per arm the distinct exposed users,
    distinct converted users (any ``purchase``), and the conversion
    rate in exact integer ppm — no float aggregation of events.value
    anywhere, so the whole table is bit-exact. Scale shape: the JSON
    extract is row-local at scan speed; both distincts are one
    user-keyed partial-agg shuffle; output is |arms| rows."""
    ev = table(spark, sf_dir, "events")
    arm = (F.get_json_object("props", "$.k").cast("long") % 2).alias("arm")
    # one scan, one shuffle: countDistinct ignores NULLs, so the
    # purchase-gated user column counts converters per arm in the same
    # agg (an arm with no purchases gets 0; the NULL arm — missing k —
    # is an ordinary group key, no null-safe join needed)
    return (
        ev.select(arm, "user_id", "event_type")
        .groupBy("arm")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("n_converted"),
        )
        .withColumn(
            "conv_ppm",
            F.floor(F.lit(1_000_000) * F.col("n_converted")
                    / F.col("n_users")).cast("long"),
        )
    )


EVENTS_AB_CONVERSION_SQL = """
WITH t AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS arm,
         user_id, event_type
  FROM events
), exposed AS (
  SELECT arm, COUNT(DISTINCT user_id) AS n_users FROM t GROUP BY arm
), conv AS (
  SELECT arm, COUNT(DISTINCT user_id) AS n_converted FROM t
  WHERE event_type = 'purchase' GROUP BY arm
)
SELECT e.arm, e.n_users, COALESCE(c.n_converted, 0) AS n_converted,
       CAST(FLOOR(1000000 * COALESCE(c.n_converted, 0) / e.n_users)
            AS BIGINT) AS conv_ppm
FROM exposed e LEFT JOIN conv c ON e.arm IS NOT DISTINCT FROM c.arm
"""


CONV_WINDOW_HOURS = 24  # max step-to-step conversion delay


def events_funnel_windowed(spark, sf_dir, hours: int = CONV_WINDOW_HOURS):
    """The funnel with a CONVERSION WINDOW — step k counts only within
    ``hours`` of the user's step-(k-1) time (the product-analytics
    default; events_funnel answers lifetime conversion). Same chain,
    same monotonically shrinking join shape — the bound just tightens
    each step's filter (see _funnel_levels)."""
    return _funnel_levels(
        spark, sf_dir,
        ("signup", "view_within_window", "purchase_within_window"),
        hours=hours)


EVENTS_FUNNEL_WINDOWED_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup'
  GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {CONV_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL {CONV_WINDOW_HOURS} HOURS
  GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS name, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT 2, 'view_within_window', COUNT(*) FROM s2
UNION ALL
SELECT 3, 'purchase_within_window', COUNT(*) FROM s3
"""


ATTR_TOUCH_TYPES = ("click", "view")  # marketing touches; purchases
                                      # with no preceding touch fall in
                                      # the 'direct' bucket


def events_attribution(spark, sf_dir):
    """Last-touch conversion attribution — the standard marketing-
    analytics credit model: every ``purchase`` is credited to the
    user's latest preceding touch event (click/view in (ts, event_id)
    order — event_id makes the tie-break total, so the answer is
    deterministic), purchases with no preceding touch to 'direct'.
    Output (touch_type, n_conversions, attributed_cents).

    Determinism discipline: events.value is a double with an arbitrary
    mantissa, so it is truncated to cents ROW-LOCALLY (floor(value*100)
    — the same IEEE multiply+floor in both engines) and summed as
    int64, which is order-independent; no float aggregation anywhere.
    Scale shape: ONE user_id shuffle for the window (running last-touch
    state is O(1) per row), then a |touch types|-row aggregate — the
    same single-pass formulation as events_sessionize, linear at any
    corpus size."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))  # strictly before
    touch = F.last(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES),
               F.col("event_type")),
        ignorenulls=True).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch_type"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch_type", F.lit("direct"))
                 .alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n_conversions"),
             F.sum(F.floor(F.col("value") * 100).cast("long"))
             .cast("long").alias("attributed_cents"))
    )


def events_attribution_first(spark, sf_dir):
    """FIRST-touch conversion attribution (r9 — the acquisition-credit
    twin of events_attribution's conversion credit): every purchase is
    credited to the user's EARLIEST preceding touch — the model that
    answers 'which channel brought this user in' where last-touch
    answers 'which channel closed'. Identical single-window pass and
    determinism discipline (row-local cents truncation, int64 sums,
    (ts, event_id) total order); only the running state flips from
    last-seen to FIRST-seen (F.first ignorenulls over the same frame —
    still O(1)/row)."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))  # strictly before
    touch = F.first(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES),
               F.col("event_type")),
        ignorenulls=True).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch_type"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch_type", F.lit("direct"))
                 .alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n_conversions"),
             F.sum(F.floor(F.col("value") * 100).cast("long"))
             .cast("long").alias("attributed_cents"))
    )


ATTR_WINDOW_HOURS = 24  # credit horizon — same operating point as the
                        # funnel's conversion window; at sf0.01 ~40% of
                        # purchases fall OUTSIDE it (the bound bites)


def events_attribution_windowed(spark, sf_dir,
                                hours: int = ATTR_WINDOW_HOURS):
    """Last-touch attribution with a CREDIT HORIZON (the
    product-analytics default; events_attribution answers lifetime
    credit): a purchase is credited to its latest preceding touch only
    if that touch happened within ``hours`` — older touches lapse to
    'direct'. Same single user-window pass — the horizon just carries
    the touch's epoch seconds alongside its type (two IGNORE-NULLS
    lasts over one window frame, one shuffle; epoch arithmetic via the
    sessionize pattern: Spark ts-cast-long == DuckDB epoch(ts))."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))  # strictly before
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    t_type = F.last(F.when(is_touch, F.col("event_type")),
                    ignorenulls=True).over(w)
    t_sec = F.last(F.when(is_touch, F.col("ts").cast("long")),
                   ignorenulls=True).over(w)
    purchases = (
        ev.select("event_type", "value", F.col("ts").cast("long").alias("sec"),
                  t_type.alias("t_type"), t_sec.alias("t_sec"))
        .filter(F.col("event_type") == "purchase")
    )
    credited = F.when(
        F.col("t_type").isNotNull()
        & ((F.col("sec") - F.col("t_sec")) <= hours * 3600),
        F.col("t_type")).otherwise(F.lit("direct"))
    return (
        purchases.groupBy(credited.alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n_conversions"),
             F.sum(F.floor(F.col("value") * 100).cast("long"))
             .cast("long").alias("attributed_cents"))
    )


def events_attribution_linear(spark, sf_dir, hours: int = ATTR_WINDOW_HOURS):
    """LINEAR multi-touch attribution (r9 — completes the attribution
    family: last-touch lifetime / last-touch horizon / linear split):
    every purchase's value is split EQUALLY across ALL its touch events
    (click/view) within the credit horizon — the model marketing teams
    run next to last-touch to see how much credit the last click steals.
    Output (touch_type, n_credits, attributed_ppm_cents): per touch
    type, how many touch events earned credit and the total credit in
    ppm-cents; purchases with no horizon touch fall in 'direct' with
    full value (n_credits counts the purchases there).

    Integer-exact split: cents = floor(value*100) row-locally (the
    family's discipline), each of the n touches gets
    (cents * 1e6) div n ppm-cents — both engines compute the identical
    truncating integer division (values are non-negative), remainders
    are dropped identically, and the final sum is int64
    order-independent.

    Scale shape: still ONE user_id shuffle — the horizon's touch list
    is a RANGE-frame window (rangeBetween(-hours*3600, -1) over epoch
    seconds), so per-row state is bounded by touches-per-horizon, the
    explode is row-local, and the tail aggregate is |touch types|+1
    rows. The frame is defined on SECONDS (strictly earlier second) —
    a same-second touch never credits, mirrored exactly in the oracle's
    t.sec < p.sec join bound."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-hours * 3600, -1))
    # collect_list drops nulls ⇒ exactly the horizon's touch types
    touches = F.collect_list(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES),
               F.col("event_type"))).over(w)
    purchases = (
        ev.select("event_type", "cents", touches.alias("touches"))
        .filter(F.col("event_type") == "purchase")
        .select("cents", "touches", F.size("touches").alias("n"))
    )
    credited = (
        purchases.filter(F.col("n") > 0)
        .select(F.explode("touches").alias("touch_type"),
                F.expr("(cents * 1000000) div n").alias("ppm"))
    )
    direct = purchases.filter(F.col("n") == 0).select(
        F.lit("direct").alias("touch_type"),
        (F.col("cents") * F.lit(1_000_000)).alias("ppm"))
    return (
        credited.unionByName(direct)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_credits"),
             F.sum("ppm").cast("long").alias("attributed_ppm_cents"))
    )


def events_attribution_position(spark, sf_dir,
                                hours: int = ATTR_WINDOW_HOURS):
    """POSITION-BASED (U-shaped, 40/20/40) multi-touch attribution (r9
    — the family's fifth and final standard model): within the credit
    horizon the FIRST touch earns 40% of the purchase, the LAST 40%,
    and the middles split the remaining 20% equally; a 2-touch journey
    splits 50/50, a 1-touch journey takes 100%, a touchless purchase
    is 'direct'. Output (touch_type, n_credits, attributed_ppm_cents)
    — same integer-exact ppm-cents discipline as the linear model
    (truncating div on non-negative cents, identical in both engines).

    Same scale shape as the linear op — ONE user_id shuffle; the
    horizon's touches arrive as a RANGE-frame collect_list of
    (sec, event_id, type) structs, array_sort makes the first/last
    identification total ((sec, event_id) — the family's tie-break),
    and the posexplode + weight CASE is row-local."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-hours * 3600, -1))
    # collect_list drops nulls ⇒ exactly the horizon's touches; the
    # struct sorts (sec, event_id, type) lexicographically → total order
    touches = F.array_sort(F.collect_list(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES),
               F.struct("sec", "event_id",
                        F.col("event_type").alias("t")))).over(w))
    purchases = (
        ev.select("event_type", "cents", touches.alias("touches"))
        .filter(F.col("event_type") == "purchase")
        .select("cents", "touches", F.size("touches").alias("n"))
    )
    credited = (
        purchases.filter(F.col("n") > 0)
        .select("cents", "n",
                F.posexplode("touches").alias("i", "touch"))
        .select(
            F.col("touch.t").alias("touch_type"),
            F.expr(
                "CASE WHEN n = 1 THEN cents * 1000000 "
                "WHEN n = 2 THEN cents * 500000 "
                "WHEN i = 0 OR i = n - 1 THEN cents * 400000 "
                "ELSE (cents * 200000) div (n - 2) END").alias("ppm"))
    )
    direct = purchases.filter(F.col("n") == 0).select(
        F.lit("direct").alias("touch_type"),
        (F.col("cents") * F.lit(1_000_000)).alias("ppm"))
    return (
        credited.unionByName(direct)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_credits"),
             F.sum("ppm").cast("long").alias("attributed_ppm_cents"))
    )


_ATTR_TOUCH_IN = ", ".join("'" + t + "'" for t in ATTR_TOUCH_TYPES)

EVENTS_ATTRIBUTION_POSITION_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id,
         event_type
  FROM events WHERE event_type IN ({_ATTR_TOUCH_IN})
), j AS (
  SELECT p.event_id, p.cents, t.event_type,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY t.sec, t.event_id) AS i,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.sec < p.sec AND t.sec >= p.sec - {ATTR_WINDOW_HOURS} * 3600
), credited AS (
  SELECT event_type AS touch_type,
         CASE WHEN n = 1 THEN cents * 1000000
              WHEN n = 2 THEN cents * 500000
              WHEN i = 1 OR i = n THEN cents * 400000
              ELSE (cents * 200000) // (n - 2) END AS ppm
  FROM j
), direct AS (
  SELECT 'direct' AS touch_type, p.cents * 1000000 AS ppm
  FROM p LEFT JOIN (SELECT DISTINCT event_id FROM j) jj USING (event_id)
  WHERE jj.event_id IS NULL
), allc AS (
  SELECT * FROM credited UNION ALL SELECT * FROM direct
)
SELECT touch_type, COUNT(*) AS n_credits,
       CAST(SUM(ppm) AS BIGINT) AS attributed_ppm_cents
FROM allc GROUP BY touch_type
"""


EVENTS_ATTRIBUTION_LINEAR_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_type
  FROM events WHERE event_type IN ({_ATTR_TOUCH_IN})
), j AS (
  SELECT p.event_id, p.cents, t.event_type
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.sec < p.sec AND t.sec >= p.sec - {ATTR_WINDOW_HOURS} * 3600
), n AS (
  SELECT event_id, COUNT(*) AS n FROM j GROUP BY event_id
), credited AS (
  SELECT j.event_type AS touch_type, (j.cents * 1000000) // n.n AS ppm
  FROM j JOIN n USING (event_id)
), direct AS (
  SELECT 'direct' AS touch_type, p.cents * 1000000 AS ppm
  FROM p LEFT JOIN n USING (event_id) WHERE n.event_id IS NULL
), allc AS (
  SELECT * FROM credited UNION ALL SELECT * FROM direct
)
SELECT touch_type, COUNT(*) AS n_credits,
       CAST(SUM(ppm) AS BIGINT) AS attributed_ppm_cents
FROM allc GROUP BY touch_type
"""


EVENTS_ATTRIBUTION_WINDOWED_SQL = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN
                         ({", ".join("'" + t + "'" for t in ATTR_TOUCH_TYPES)})
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS t_type,
         LAST_VALUE(CASE WHEN event_type IN
                         ({", ".join("'" + t + "'" for t in ATTR_TOUCH_TYPES)})
                         THEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                         END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS t_sec
  FROM events
)
SELECT CASE WHEN t_type IS NOT NULL
                 AND CAST(FLOOR(epoch(ts)) AS BIGINT) - t_sec
                     <= {ATTR_WINDOW_HOURS} * 3600
            THEN t_type ELSE 'direct' END AS touch_type,
       COUNT(*) AS n_conversions,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


EVENTS_ATTRIBUTION_FIRST_SQL = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type, value,
         FIRST_VALUE(CASE WHEN event_type IN
                         ({", ".join("'" + t + "'" for t in ATTR_TOUCH_TYPES)})
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events
)
SELECT COALESCE(touch_type, 'direct') AS touch_type,
       COUNT(*) AS n_conversions,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


EVENTS_ATTRIBUTION_SQL = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN
                         ({", ".join("'" + t + "'" for t in ATTR_TOUCH_TYPES)})
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events
)
SELECT COALESCE(touch_type, 'direct') AS touch_type,
       COUNT(*) AS n_conversions,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup'
  GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS name, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT 2, 'view_after_signup', COUNT(*) FROM s2
UNION ALL
SELECT 3, 'purchase_after_view', COUNT(*) FROM s3
"""


def events_retention(spark, sf_dir):
    """Cohort retention — the product-analytics staple the suite lacked:
    users are cohorted by the DATE of their first event; for every
    (cohort_date, day_n) cell, how many of that cohort's users were
    active day_n days later. Two grouped aggregations over (user, date)
    keys — the distinct activity frame is the only corpus-sized shuffle,
    and it carries 12-byte rows; the cohort join is user-keyed. Counts
    are exact ints, dates are exact — hash-stable across engines."""
    ev = table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .select("cohort", F.datediff("d", "cohort").alias("day_n"), "user_id")
        .groupBy("cohort", "day_n")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

EVENTS_RETENTION_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, d FROM ev)
SELECT f.cohort, CAST(datediff('day', f.cohort, a.d) AS INTEGER) AS day_n,
       COUNT(*) AS n_users
FROM activity a JOIN firsts f USING (user_id)
GROUP BY f.cohort, day_n
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top_customers": top_customers,
    "distinct_segments": distinct_segments,
    "set_ops_customers": set_ops_customers,
    "window_top_orders": window_top_orders_per_customer,
    "events_by_type": events_by_type,
    "events_user_overlap": events_user_overlap,
    "events_hourly": events_hourly,
    "events_anomaly_hours": events_anomaly_hours,
    "events_sessionize": events_sessionize,
    "events_gapfill": events_gapfill,
    "events_gapfill_locf": events_gapfill_locf,
    "events_funnel": events_funnel,
    "events_funnel_windowed": events_funnel_windowed,
    "events_ab_conversion": events_ab_conversion,
    "events_attribution": events_attribution,
    "events_attribution_windowed": events_attribution_windowed,
    "events_attribution_linear": events_attribution_linear,
    "events_attribution_first": events_attribution_first,
    "events_attribution_position": events_attribution_position,
    "events_retention": events_retention,
    "events_top_paths": events_top_paths,
    "events_cumulative_users": events_cumulative_users,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "top_customers": TOP_CUSTOMERS_SQL,
    "distinct_segments": DISTINCT_SEGMENTS_SQL,
    "set_ops_customers": SET_OPS_SQL,
    "window_top_orders": WINDOW_TOP_ORDERS_SQL,
    "events_by_type": EVENTS_BY_TYPE_SQL,
    "events_user_overlap": EVENTS_USER_OVERLAP_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_anomaly_hours": EVENTS_ANOMALY_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_gapfill": EVENTS_GAPFILL_SQL,
    "events_gapfill_locf": EVENTS_GAPFILL_LOCF_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_funnel_windowed": EVENTS_FUNNEL_WINDOWED_SQL,
    "events_ab_conversion": EVENTS_AB_CONVERSION_SQL,
    "events_attribution": EVENTS_ATTRIBUTION_SQL,
    "events_attribution_windowed": EVENTS_ATTRIBUTION_WINDOWED_SQL,
    "events_attribution_linear": EVENTS_ATTRIBUTION_LINEAR_SQL,
    "events_attribution_first": EVENTS_ATTRIBUTION_FIRST_SQL,
    "events_attribution_position": EVENTS_ATTRIBUTION_POSITION_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "events_top_paths": EVENTS_TOP_PATHS_SQL,
    "events_cumulative_users": EVENTS_CUMULATIVE_USERS_SQL,
}
