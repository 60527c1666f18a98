"""Time selected bench keys with bench.py's exact methodology
(min-of-3, clearCache before every run, .count() materialization,
same session builder) — for before/after deltas during optimization
without paying a full 100-key bench.

Usage: python tools/time_keys.py [sf_dir] key [key ...]
Env:   SPARK_GRAFT_CPUS (same contract as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    from bench import headline_queries
    from kstore_spark.session import get_spark

    spark = get_spark("kstore-time-keys")
    spark.range(1).count()

    keys = args or []
    reg = headline_queries()
    missing = [k for k in keys if k not in reg]
    if missing:
        print(f"unknown keys: {missing}", file=sys.stderr)
        sys.exit(2)

    times = {}
    for name in keys:
        fn = reg[name]
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        times[name] = round(min(runs), 3)
        print(f"{name}: min={times[name]} runs={[round(r, 3) for r in runs]}",
              flush=True)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
