"""Big-factor replica generator (documents + embeddings) for 1000×
probes.

gen_scale_probe.py unions `factor` shifted plan branches — fine at
10-100×, but at 1000× the 1000-branch union is its own plan explosion
(the same disease as the r5 centroid literal). This generator builds
ONE plan: source ⨯ spark.range(factor), with the replica id as a
COLUMN driving the id shift and the token perturbation — constant plan
size at any factor.

Semantics match gen_scale_probe's documents treatment: ~30% of tokens
renamed per replica, chosen by xxhash64(token, position, replica) —
independent of the doc, so intra-replica near-dup pairs keep their
Jaccard overlap while cross-replica 5-gram overlap collapses; dedup
pair counts scale linearly. Embeddings: replica 0 is the original;
replicas ≥ 1 get deterministic hash-derived Box-Muller Gaussians
(fresh vectors, no cross-replica duplicates — same intent, different
RNG than the numpy small-factor path, so use ONE generator per corpus
and don't mix).

Usage: python tools/gen_scale_probe_big.py [out_dir] [factor] [src_dir]
       (defaults: /tmp/sfdocs1000  1000  /root/testdata/sf0.1)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def gen_documents(spark, src, out, factor):
    df = spark.read.parquet(os.path.join(src, "documents.parquet"))
    n = df.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(factor).withColumnRenamed("id", "_r")
    toks = F.split(F.col("text"), " ")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                (F.col("_r") > 0)
                & (F.pmod(F.xxhash64(t, i, F.col("_r")), F.lit(10)) < 3),
                F.concat(t, F.lit("_"), F.col("_r").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    (
        df.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * F.lit(n))
        .withColumn("text", perturbed)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_r")
        .repartition(max(32, factor // 8))
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )


def gen_embeddings(spark, src, out, factor):
    df = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n = df.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = df.selectExpr("size(embedding) d").first()["d"]
    reps = spark.range(factor).withColumnRenamed("id", "_r")
    # Box-Muller from two hash-uniforms per component: u in (0,1] via
    # (pmod(hash)+1)/2^31; deterministic in (vec_id, replica, dim idx)
    m31 = float(2**31)

    def gauss(i):
        u1 = (F.pmod(F.xxhash64(F.col("vec_id"), F.col("_r"), F.lit(2 * i)),
                     F.lit(2**31)) + 1.0) / m31
        u2 = (F.pmod(F.xxhash64(F.col("vec_id"), F.col("_r"), F.lit(2 * i + 1)),
                     F.lit(2**31)) + 1.0) / m31
        z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2 * math.pi) * u2)
        return z.cast("float")

    fresh = F.array(*[gauss(i) for i in range(dim)])
    (
        df.crossJoin(reps)
        .withColumn(
            "embedding",
            F.when(F.col("_r") == 0, F.col("embedding")).otherwise(fresh))
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * F.lit(n))
        .drop("_r")
        .repartition(max(32, factor // 16))
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )


def main():
    from kstore_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs1000"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark()
    gen_documents(spark, src, out, factor)
    gen_embeddings(spark, src, out, factor)
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
