"""Scale probes for the round-12 operators.

Usage: python tools/probe_r12_ops.py [probe_dir]
       (default /tmp/sfdocs100 — gen_scale_probe.py at factor 100 off
       sf0.01: 500k docs / 200k×64 embeddings)

Times (min-of-3 after a warm first run that pays one-time artifact
builds) the r12 ops at the probe scale, plus a CLUSTERED range-search
comparison: the spherical-triangle bound cannot prune near-uniform
Gaussian corpora (cell radii ≈ 90°), so the pruning win is measured on
a planted clustered corpus of the same size — the honest pair of
numbers (uniform: pruned ≈ brute + bound overhead; clustered: pruned
reads only the surviving cells' files).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, n=3):
    fn()  # warm: one-time artifact builds + JIT
    best = min(min(timeit(fn) for _ in range(n)), float("inf"))
    print(f"{label}: {best:.2f} s min-of-{n}")
    return best


def timeit(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def gen_clustered(spark, out, n=200_000, n_cells=16, dim=64):
    """Planted clustered embeddings at probe scale: n_cells tight
    clusters (noise 0.02) around unit Gaussian directions; ids 0..15
    are the exact directions (deterministic centroids + queries)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(out, "embeddings.parquet")):
        return out
    rng = np.random.default_rng(7)
    dirs = rng.standard_normal((n_cells, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    os.makedirs(out, exist_ok=True)
    cells = rng.integers(0, n_cells, n - n_cells)
    noise = 0.02 * rng.standard_normal((n - n_cells, dim))
    V = dirs[cells] + noise
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V = np.vstack([dirs, V]).astype("float32")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(V)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.ravel()), dim).cast(pa.list_(pa.float32())),
            "label": pa.array([0] * len(V), pa.int32()),
        }),
        os.path.join(out, "embeddings.parquet"))
    return out


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs100"

    from kstore_spark.functions import corpus, similarity, text
    from kstore_spark.session import get_spark
    from kstore_spark.streaming import indexing as sidx

    spark = get_spark("probe-r12")
    spark.range(1).count()

    print(f"== probe dir {probe}")
    timed("sim_range_search (brute, 200k x 64)",
          lambda: similarity.sim_range_search(spark, probe).count())
    timed("sim_range_search_pruned (uniform: bound keeps all cells)",
          lambda: similarity.sim_range_search_pruned(spark, probe).count())

    clustered = gen_clustered(spark, "/tmp/sfclustered200k")
    print("== clustered twin (200k x 64, 16 tight cells)")
    timed("sim_range_search (brute, clustered, t=0.5)",
          lambda: similarity.sim_range_search(spark, clustered, 0.5).count())
    timed("sim_range_search_pruned (clustered, t=0.5)",
          lambda: similarity.sim_range_search_pruned(
              spark, clustered, 0.5).count())

    print("== streaming takedown")
    timed("stream_store_retractions (200k vectors)",
          lambda: sidx.stream_store_retractions(spark, probe).count())
    timed("stream_index_retractions (500k docs)",
          lambda: sidx.stream_index_retractions(spark, probe).count())

    print("== diversified RAG + boolean/prefix search (500k docs)")
    timed("rag_context_diverse",
          lambda: corpus.rag_context_diverse(spark, probe).count())
    timed("text_search_negation",
          lambda: text.text_search_negation(spark, probe).count())
    timed("text_search_prefix",
          lambda: text.text_search_prefix(spark, probe).count())


if __name__ == "__main__":
    main()
