"""Record EXPLAIN FORMATTED plans for the r13 optimization evidence.

One Spark session, many keys: writes <out_dir>/<key>_<tag>.txt with the
formatted plan plus an Exchange/PythonEval summary line — the files the
judge diffs against the OPTIMIZATION_r13.md plan claims. Run once from
the pre-optimization checkout with tag=before and once from the
optimized tree with tag=after.

Usage: python tools/record_r13_plans.py <out_dir> <tag> key [key ...]
       (sf_dir via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    out_dir, tag, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from kstore_spark.session import get_spark

    queries = entry.queries()
    spark = get_spark("record-r13-plans")
    for name in keys:
        if name not in queries:
            print(f"SKIP unknown {name}")
            continue
        try:
            df = queries[name](spark, sf_dir)
            formatted = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            plan = df._jdf.queryExecution().executedPlan().toString()
            summary = (f"-- Exchanges: {plan.count('Exchange')}  "
                       f"PythonEvals: {plan.count('Python')}\n")
        except Exception as exc:  # record the failure, keep going
            formatted, summary = f"ERROR: {exc}\n", ""
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted)
            f.write(summary)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
