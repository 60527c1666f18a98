"""IVF coarse-quantizer cell-count probe (VERDICT r5 item 2).

Backs the r6 `_nearest_cells` rewrite: centroids now ride a Spark
BROADCAST ndarray into one BLAS matmul per Arrow batch instead of being
compiled into the Catalyst plan as an N_CELLS×dim literal struct array.
At the 16-cell toy size both forms work; at a realistic coarse-quantizer
size (√N ≈ 10⁴-10⁵ cells for a 10⁸-10¹⁰-vector corpus) the literal form
is a multi-hundred-MB expression tree — plan construction and compile
die long before the data does.

Measures, on an N× embeddings replica (default /tmp/sf10 = 200k vectors
× 64 dims, built by tools/gen_scale_probe.py):

1. broadcast-matmul assignment (nearest cell per vector, the IVF build
   step) at n_cells = 16 / 1024 / 4096 — wall time of a full count();
2. the literal-expression form of the same assignment at n_cells =
   64 / 256 / 1024 (the pre-r6 kernel, reconstructed here) — wall time
   including expression build + compile, with a hard timeout; 4096 is
   attempted only to demonstrate the cliff;
3. probe cost against the cell-partitioned store at 4096 cells
   (sim_ann_ivf_stored machinery: broadcast probe → dynamic partition
   pruning).

Usage: python tools/probe_ivf_cells.py [sf_dir] [n_queries]
Prints one markdown table row per measurement (for PERF.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def literal_nearest_cell(vcol, cents):
    """The pre-r6 literal-expression kernel, kept here (probe-only) to
    measure what the rewrite removed: one (cv, cell) struct per centroid
    compiled into the plan, cosine fold via transform."""
    from kstore_spark.functions.similarity import _cosine

    cents_arr = F.array(*[
        F.struct(
            F.array(*[F.lit(x) for x in cv]).alias("cv"),
            F.lit(cid).alias("cell"),
        )
        for cid, cv in cents
    ])
    scored = F.transform(cents_arr, lambda c: F.struct(
        _cosine(vcol, c["cv"]).alias("s"), c["cell"].alias("cell")))
    return F.slice(F.reverse(F.array_sort(scored)), 1, 1)[0]["cell"]


def main() -> None:
    from kstore_spark.functions.similarity import (
        _centroids, _emb, _nearest_cells)
    from kstore_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark()
    emb = _emb(spark, sf_dir).persist()
    n = emb.count()
    dim = len(emb.select("v").first()["v"])
    print(f"replica: {sf_dir}  vectors={n}  dim={dim}")
    print("| kernel | n_cells | wall (s) | note |")
    print("|---|---|---|---|")

    # 1. broadcast-matmul assignment
    for n_cells in (16, 1024, 4096):
        cents = _centroids(emb, n_cells)
        t0 = time.time()
        cnt = (
            emb.withColumn("cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
            .groupBy("cell").count().count()
        )
        dt = time.time() - t0
        print(f"| broadcast matmul | {n_cells} | {dt:.2f} | "
              f"{cnt} non-empty cells |")

    # 2. literal-expression assignment (the removed kernel)
    for n_cells in (64, 256, 1024):
        cents = _centroids(emb, n_cells)
        t0 = time.time()
        try:
            cnt = (
                emb.withColumn("cell", literal_nearest_cell(F.col("v"), cents))
                .groupBy("cell").count().count()
            )
            dt = time.time() - t0
            print(f"| plan literal | {n_cells} | {dt:.2f} | "
                  f"{cnt} non-empty cells |")
        except Exception as ex:  # noqa: BLE001 — probe records the failure mode
            dt = time.time() - t0
            print(f"| plan literal | {n_cells} | {dt:.2f} | "
                  f"FAILED: {type(ex).__name__} |")

    # 3. stored-probe at 4096 cells (build + probe, timed separately)
    from kstore_spark.functions.similarity import (
        ivf_store_dir, sim_ann_ivf_stored)

    t0 = time.time()
    ivf_store_dir(spark, sf_dir, n_cells=4096)
    t_build = time.time() - t0
    t0 = time.time()
    rows = sim_ann_ivf_stored(spark, sf_dir, n_cells=4096).count()
    t_probe = time.time() - t0
    print(f"| stored build | 4096 | {t_build:.2f} | partitionBy(cell) write |")
    print(f"| stored probe | 4096 | {t_probe:.2f} | {rows} result rows, "
          f"DPP-pruned scan |")
    emb.unpersist()


if __name__ == "__main__":
    main()
