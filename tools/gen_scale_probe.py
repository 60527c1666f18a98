"""Generate an N× replica of a testdata sf dir for scale probing.

Usage: python tools/gen_scale_probe.py [out_dir] [factor] [src_dir]
       (defaults: /tmp/sf1  10  /root/testdata/sf0.1)

Replication strategy — linear growth, no cross-replica artifacts:
- fact/dim tables: union `factor` copies with every key column shifted
  by replica*stride (stride > max key), so joins stay within a replica
  and all join/agg cardinalities scale exactly linearly;
- nation/region: true dimensions, kept as-is (25/5 rows at any sf —
  same as TPC-H);
- documents: token-level perturbation per replica (deterministic hash of
  (token, position, replica) renames ~30% of tokens) so cross-replica
  near-5-gram-Jaccard collapses (~0.03 match prob per shingle) while
  intra-replica planted near-dups keep their overlap — dedup pair
  counts scale linearly, not quadratically;
- embeddings: fresh Gaussian vectors per extra replica (seeded) — the
  original cosine distribution, no cross-replica duplicates.

Everything is Spark-side except embedding generation (numpy, 64-dim ×
2k rows per replica — trivial).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

# Strides are per KEY FAMILY, not per table: both sides of every foreign
# key must shift identically or cross-table joins only match inside
# replica 0 (caught in round 2 — the per-table strides this replaces
# left part⋈lineitem and customer⋈orders at 1× cardinality while scans
# grew 10×).
_STRIDES = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
}

TABLES_SHIFT = {
    # table -> {key column: stride}
    "customer": {"c_custkey": _STRIDES["custkey"]},
    "supplier": {"s_suppkey": _STRIDES["suppkey"]},
    "part": {"p_partkey": _STRIDES["partkey"]},
    "orders": {"o_orderkey": _STRIDES["orderkey"], "o_custkey": _STRIDES["custkey"]},
    "lineitem": {
        "l_orderkey": _STRIDES["orderkey"],
        "l_partkey": _STRIDES["partkey"],
        "l_suppkey": _STRIDES["suppkey"],
    },
    "events": {"event_id": _STRIDES["event_id"], "user_id": _STRIDES["user_id"]},
}


def _shift_union(spark, src, out, table, strides, factor):
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    parts = [df]
    for r in range(1, factor):
        shifted = df
        for k, stride in strides.items():
            shifted = shifted.withColumn(k, F.col(k) + F.lit(r * stride))
        parts.append(shifted)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))


def _perturb_docs(spark, src, out, factor):
    df = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = df.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [df]
    for r in range(1, factor):
        # rename ~30% of tokens, chosen by a hash independent of the doc
        # (so near-dup doc pairs inside the replica perturb identically
        # at shared positions and keep their Jaccard overlap)
        toks = F.split(F.col("text"), " ")
        perturbed = F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(
                    F.pmod(F.xxhash64(t, i, F.lit(r)), F.lit(10)) < 3,
                    F.concat(t, F.lit(f"_{r}")),
                ).otherwise(t),
            ),
            " ",
        )
        parts.append(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(r * n))
            .withColumn("text", perturbed)
            .withColumn("n_chars", F.length(F.col("text")).cast("long"))
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))


def _fresh_embeddings(spark, src, out, factor):
    import numpy as np
    import pandas as pd

    df = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    pdf = df.toPandas()
    n, dim = len(pdf), len(pdf["embedding"].iloc[0])
    frames = [pdf]
    for r in range(1, factor):
        rng = np.random.default_rng(1000 + r)
        X = rng.standard_normal((n, dim)).astype("float32")
        frames.append(pd.DataFrame({
            "vec_id": pdf["vec_id"].to_numpy() + r * n,
            "embedding": [list(row) for row in X],
            "label": pdf["label"].to_numpy(),
        }))
    spark.createDataFrame(pd.concat(frames, ignore_index=True)).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from kstore_spark.session import get_spark

    spark = get_spark("scale-probe-gen")
    os.makedirs(out, exist_ok=True)
    for table in ("region", "nation"):
        spark.read.parquet(os.path.join(src, f"{table}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{table}.parquet"))
    for table, strides in TABLES_SHIFT.items():
        _shift_union(spark, src, out, table, strides, factor)
    _perturb_docs(spark, src, out, factor)
    _fresh_embeddings(spark, src, out, factor)
    for t in sorted(os.listdir(out)):
        cnt = spark.read.parquet(os.path.join(out, t)).count()
        print(f"{t}: {cnt}")


if __name__ == "__main__":
    main()
