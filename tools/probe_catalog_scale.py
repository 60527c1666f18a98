"""Catalog zone-map probe: narrow-range select cost vs segment count.

Backs PERF.md's claim that at 100 TB the cost that grows with a
column's segment count is LISTING + PLANNING, and that the catalog
zone map (per-segment [min, max] recorded at write time) removes that
growth for selective range reads by dropping non-overlapping segments
before Spark ever lists their files.

Method: build catalogs whose column has N disjoint-value segments
(N = 8 → 512, a 64× sweep; 512 segments of a 4 GB-file column ≈ 2 TB —
the shape a 100 TB table's per-bucket column reaches), then time a
3-value range count twice:
- pruned:   Catalog.read(col, lo, hi)  (zone map drops segments first)
- unpruned: Catalog.read(col)          (all segments listed + planned)
Both apply the same predicate afterwards; results are identical.

Usage: python tools/probe_catalog_scale.py [max_n]
Prints one markdown table row per N.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

ROWS_PER_SEG = 2_000
SPAN = 10_000  # value stride between segments (disjoint zone maps)


def build(cat, n_segments: int) -> None:
    from kstore_spark.operators.types import POS, VAL

    cat.create("c", "sorted")
    for i in range(n_segments):
        lo = i * SPAN
        df = cat.spark.range(lo, lo + ROWS_PER_SEG).select(
            (F.col("id") - lo + i * ROWS_PER_SEG).cast("long").alias(POS),
            F.col("id").cast("int").alias(VAL),
        ).coalesce(1)
        cat.append_segment("c", df, rows=ROWS_PER_SEG)


def probe(spark, base_dir: str, n: int) -> tuple[float, float, int, int]:
    from kstore_spark.catalog import Catalog
    from kstore_spark.operators.types import VAL

    db = os.path.join(base_dir, f"db_{n}")
    cat = Catalog(spark, db)
    # the 100 TB claim concerns many LARGE immutable segments (4 GB-file
    # scale) that never qualify for size-tiered compaction; the probe's
    # segments are small stand-ins, so disable compaction to keep the
    # segment count what the sweep says it is (with it on, the catalog
    # folds the tiny segments 8-at-a-time and — correctly — bounds the
    # listing growth on its own; measured before this override: 512
    # appends settle at ~16 live segments)
    cat._COMPACT_MIN = 10**9
    build(cat, n)
    mid = (n // 2) * SPAN + 100
    lo, hi = mid, mid + 2

    def run(pruned: bool) -> tuple[float, int]:
        best, files = float("inf"), 0
        for _ in range(3):
            t0 = time.time()
            df = cat.read("c", lo=lo, hi=hi) if pruned else cat.read("c")
            got = df.filter(F.col(VAL).between(lo, hi)).count()
            best = min(best, time.time() - t0)
            files = len(df.inputFiles())
            assert got == 3, got
        return best, files

    t_pruned, f_pruned = run(True)
    t_full, f_full = run(False)
    cat.close()
    return t_pruned, t_full, f_pruned, f_full


def main():
    from kstore_spark.session import get_spark

    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spark = get_spark("catalog-scale-probe")
    spark.range(1).count()
    base = "/tmp/kstore_catprobe"
    shutil.rmtree(base, ignore_errors=True)
    print("| segments | pruned (s) | unpruned (s) | files pruned/full |")
    print("|---|---|---|---|")
    n = 8
    while n <= max_n:
        tp, tf, fp, ff = probe(spark, base, n)
        print(f"| {n} | {tp:.3f} | {tf:.3f} | {fp}/{ff} |", flush=True)
        n *= 4
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
