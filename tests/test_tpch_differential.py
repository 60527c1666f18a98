"""Randomized differential testing for the TPC-H-shaped query suite:
seeded random fact/mid tables with consistent foreign keys and the
testdata's value domains (2-decimal monetary doubles, 1995-2001 dates,
canonical dims), run through every relational oracled query in Spark
AND DuckDB on the same parquet files. Hardens the decimal/round/date
discipline off the fixed testdata (boundary .005 cents, empty filter
windows, skewed customers).
"""

from __future__ import annotations

import datetime
import math
import random
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SEEDS = (3, 31)
SRC = "/root/testdata/sf0.001"


def _money(rng, lo, hi):
    return round(rng.uniform(lo, hi), 2)


def _date(rng):
    base = datetime.datetime(1995, 1, 1)
    return base + datetime.timedelta(days=rng.randrange(0, 2400))


def _gen(dirpath: str, seed: int) -> None:
    rng = random.Random(seed)
    # canonical dims straight from the testdata (region/nation are the
    # fixed TPC-H 5/25 rows — queries filter on their names)
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{dirpath}/{t}.parquet")

    n_cust, n_supp, n_part, n_ord = 25, 12, 30, 150
    segs = ("MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE")
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array([rng.randrange(25) for _ in range(n_cust)], pa.int32()),
        "c_acctbal": [_money(rng, -999, 9999) for _ in range(n_cust)],
        "c_mktsegment": [rng.choice(segs) for _ in range(n_cust)],
    }), f"{dirpath}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array([rng.randrange(25) for _ in range(n_supp)], pa.int32()),
        "s_acctbal": [_money(rng, -999, 9999) for _ in range(n_supp)],
    }), f"{dirpath}/supplier.parquet")
    names = ("small widget", "blue rod", "hot rod", "cold anvil", "new bolt",
             "blue ring", "green gear", "old gear")
    types = ("LARGE", "STANDARD", "MEDIUM", "SMALL", "ECONOMY", "PROMO")
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [rng.choice(names) for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n_part)],
        "p_type": [rng.choice(types) for _ in range(n_part)],
        "p_size": pa.array([rng.choice((1, 5, 25, 50)) for _ in range(n_part)], pa.int32()),
        "p_retailprice": [_money(rng, 900, 2000) for _ in range(n_part)],
    }), f"{dirpath}/part.parquet")
    prios = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    # skew: a handful of hot customers own most orders
    hot = [rng.randrange(1, n_cust + 1) for _ in range(3)]
    custs = [rng.choice(hot) if rng.random() < 0.5
             else rng.randrange(1, n_cust + 1) for _ in range(n_ord)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(custs, pa.int64()),
        "o_orderstatus": [rng.choice("FPO") for _ in range(n_ord)],
        "o_totalprice": [_money(rng, 1000, 400000) for _ in range(n_ord)],
        "o_orderdate": pa.array([_date(rng) for _ in range(n_ord)], pa.timestamp("us")),
        "o_orderpriority": [rng.choice(prios) for _ in range(n_ord)],
    }), f"{dirpath}/orders.parquet")
    li = []
    for ok in range(1, n_ord + 1):
        for ln in range(1, rng.randrange(1, 6)):
            # .x05 boundary values land on ROUND half cases on purpose
            li.append((
                ok, rng.randrange(1, n_part + 1), rng.randrange(1, n_supp + 1),
                ln, float(rng.randrange(1, 51)),
                rng.choice((_money(rng, 900, 105000),
                            round(rng.randrange(1, 400) + 0.005, 3))),
                round(rng.choice((0, 0.02, 0.05, 0.06, 0.07, 0.1)), 2),
                round(rng.choice((0, 0.03, 0.08)), 2),
                rng.choice("NAR"), rng.choice("OF"), _date(rng),
            ))
    cols = list(zip(*li))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(cols[0], pa.int64()),
        "l_partkey": pa.array(cols[1], pa.int64()),
        "l_suppkey": pa.array(cols[2], pa.int64()),
        "l_linenumber": pa.array(cols[3], pa.int32()),
        "l_quantity": pa.array(cols[4], pa.float64()),
        "l_extendedprice": pa.array(cols[5], pa.float64()),
        "l_discount": pa.array(cols[6], pa.float64()),
        "l_tax": pa.array(cols[7], pa.float64()),
        "l_returnflag": pa.array(cols[8]),
        "l_linestatus": pa.array(cols[9]),
        "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
    }), f"{dirpath}/lineitem.parquet")


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


# every oracled query over the relational tables only
_OPS = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q4_order_priority", "q13_customer_distribution",
    "top_customers", "distinct_segments", "set_ops_customers",
    "window_top_orders", "argmin_supplier_per_nation", "price_histogram",
    "orders_by_month", "rollup_orders", "semi_join_customers",
    "anti_join_customers", "except_suppliers", "median_price_by_segment",
    "q12_shipmode_priority", "q14_promo_revenue", "q17_small_quantity",
    "q18_large_volume", "q19_discounted_revenue", "q10_returned_items",
    "q20_excess_suppliers", "q22_inactive_rich", "q2_min_cost_supplier",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q15_top_supplier", "q16_supplier_count",
    "q21_waiting_supplier",
)


@pytest.mark.parametrize("seed", SEEDS)
def test_tpch_ops_differential(spark, tmp_path, seed):
    from kstore_spark.plans import analytics, extended, tpch_wide

    queries = {**analytics.QUERIES, **extended.QUERIES, **tpch_wide.QUERIES}
    oracles = {**analytics.ORACLES, **extended.ORACLES, **tpch_wide.ORACLES}

    d = tmp_path / f"tpch{seed}"
    d.mkdir()
    _gen(str(d), seed)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    for op in _OPS:
        if op not in queries:
            continue
        df = queries[op](spark, str(d))
        got = _rowset(df.columns, [tuple(r) for r in df.collect()])
        res = con.execute(oracles[op])
        exp = _rowset([c[0] for c in res.description], res.fetchall())
        assert got == exp, f"{op} diverged at seed {seed}"
