"""Dump the EXPLAIN FORMATTED plan (and optionally wall time) of any
driver query — the generic sibling of perftest_plan_dump.py, for
auditing scale properties (PushedFilters / Exchange count / join
strategies / WholeStageCodegen spans) of any `queries()` entry.

Usage: python tools/plan_dump.py <query_name> [sf_dir] [--time]
       (sf_dir defaults to /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--time"]
    timed = "--time" in sys.argv
    if not args:
        print(__doc__)
        return 1
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from kstore_spark.session import get_spark

    queries = entry.queries()
    if name not in queries:
        print(f"unknown query {name!r}; known: {sorted(queries)[:10]}...")
        return 1
    spark = get_spark("plan-dump")
    df = queries[name](spark, sf_dir)
    print(spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(f"-- Exchanges: {plan.count('Exchange')}  "
          f"PythonEvals: {plan.count('Python')}")
    if timed:
        for i in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.count()
            print(f"-- run {i}: {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
