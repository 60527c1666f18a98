"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, comparing row count + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

sys.path.insert(0, ".")


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; ints-as-floats normalize
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from kstore_spark.session import get_spark
    from kstore_spark.tables import TABLES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue  # partial dirs (e.g. docs-only replicas)
        if os.path.isdir(p):  # Spark-written table dir → glob the parts
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(s_rows)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            o = con.sql(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status, notes = "ok", []
        if sorted(s_cols) != sorted(o_cols):
            status = "FAIL"
            notes.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
        elif len(s_rows) != len(o_rows):
            status = "FAIL"
            notes.append(f"rowcount {len(s_rows)} vs {len(o_rows)}")
        else:
            a, b = rowset(s_cols, s_rows), rowset(o_cols, o_rows)
            if a != b:
                status = "FAIL"
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                notes.append(f"values differ, e.g. {diff}")
        if status == "FAIL":
            failures.append(name)
        print(f"{status:5} {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]"
              + ("  " + "; ".join(notes) if notes else ""))

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
