"""Dump the physical plan + min-of-N wall time of a kstore_perftest key
(VERDICT r5 item 5: perftest_sort drifted 2.93 -> 3.92 s over two
rounds; decide noise vs plan change).

Usage: python tools/perftest_plan_dump.py [hash|sort] [n_runs]
Prints the EXPLAIN FORMATTED text (for diffing across rounds) and each
run's wall time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def build(spark, algorithm: str):
    from bench import gen_perftest_frames
    from kstore_spark.operators import equijoin, fetch
    from kstore_spark.operators.output import zip_vectors
    from kstore_spark.operators.select import select_range
    from kstore_spark.operators.types import Prov

    r_df, s_df = gen_perftest_frames(spark)
    r_prov = Prov(frame=r_df, cols={c: c for c in ("ra", "rc", "rd")})
    s_prov = Prov(frame=s_df, cols={c: c for c in ("sa", "sf", "sg")})
    r_ids = select_range(None, 1, 9, prov=r_prov, column="rc")
    ra = fetch(None, r_ids, source_col="ra")
    s_ids = select_range(None, 31, 99, prov=s_prov, column="sf")
    sa = fetch(None, s_ids, source_col="sa")
    l_ids, r_ids2 = equijoin(ra, sa, algorithm=algorithm)
    rd = fetch(None, l_ids, source_col="rd")
    sg = fetch(None, r_ids2, source_col="sg")
    zipped = zip_vectors([rd, sg])
    return zipped.agg(
        F.max("c0").alias("max_rd"), F.min("c1").alias("min_sg"),
        F.count("c0").alias("cnt_rd"), F.count("c1").alias("cnt_sg"),
    )


def main() -> None:
    from kstore_spark.session import get_spark

    algo = sys.argv[1] if len(sys.argv) > 1 else "sort"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.range(1).count()
    agg = build(spark, algo)
    print(agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"))
    if n_runs < 1:  # plan-only mode: output is diffable across rounds
        return      # (snapshots live in tools/plans/, regenerated per
                    # round; `git diff` shows any plan drift)
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        build(spark, algo).collect()
        runs.append(round(time.time() - t0, 3))
    print(f"kstore_perftest_{algo} runs: {runs}  min: {min(runs)}")


if __name__ == "__main__":
    main()
