"""Index-vs-scan on a ZIPF vocabulary — the realistic case.

The gen_scale_probe replicas have a ~3k-word near-uniform vocabulary
where every query term's postings cover a large corpus fraction — the
index's documented WORST case. Real corpora are Zipf: most query terms
are far down the tail and their postings are tiny. This probe
generates a Zipf corpus in-plan (rank = V^u inverse-CDF for s≈1, u
from xxhash64(doc_id, position) — fully deterministic, no driver RNG),
builds the index, and compares probe vs scan for query terms drawn
from the head, middle, and tail of the distribution.

Usage: python tools/probe_zipf_search.py [n_docs] [out_dir]
       (defaults: 500000  /tmp/zipfdocs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

VOCAB = 100_000     # distinct words
DOC_LEN = 200       # tokens per doc


def gen(spark, n_docs: int, out: str) -> None:
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.floor(F.pow(
                F.lit(float(VOCAB)),
                (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1_000_000))
                 .cast("double") + 0.5) / 1_000_000.0,
            )).cast("long"),
        ),
    )
    (spark.range(n_docs)
     .select(F.col("id").alias("doc_id"),
             F.concat_ws(" ", toks).alias("text"),
             F.lit("en").alias("lang"), F.lit("s0").alias("source"))
     .withColumn("n_chars", F.length("text"))
     .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zipfdocs"
    from kstore_spark.functions.text import (
        _tok, text_search_bm25, text_search_indexed, token_index_dir)
    from kstore_spark.session import get_spark

    spark = get_spark("zipf-probe")
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        t0 = time.monotonic()
        gen(spark, n_docs, out)
        print(f"generated {n_docs} docs in {time.monotonic() - t0:.1f} s")

    t0 = time.monotonic()
    token_index_dir(spark, out)
    print(f"index build: {time.monotonic() - t0:.1f} s")

    # head / middle / tail query mixes (w1 ~ most common; w50000 deep tail)
    MIXES = {
        "head (w1,w2,w3)": ("w1", "w2", "w3"),
        "mid (w500,w1000,w2000)": ("w500", "w1000", "w2000"),
        "tail (w20000,w50000,w90000)": ("w20000", "w50000", "w90000"),
    }

    def scan_conj(terms):
        t = _tok(spark, out)
        return (
            t.select("doc_id", F.explode("t").alias("tok"))
            .filter(F.col("tok").isin(list(terms)))
            .groupBy("doc_id")
            .agg(F.countDistinct("tok").alias("nt"),
                 F.count(F.lit(1)).alias("n_hits"))
            .filter(F.col("nt") == len(terms))     # conjunctive, same as index
            .select("doc_id", "n_hits")
        )

    for label, terms in MIXES.items():
        for side, fn in (
            ("index", lambda t=terms: text_search_indexed(spark, out, terms=t)),
            ("scan", lambda t=terms: scan_conj(t)),
        ):
            ts = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                n = fn().count()
                ts.append(round(time.monotonic() - t0, 2))
            print(f"{label:28s} {side:5s}: {ts} rows={n}")

    ts = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        text_search_bm25(spark, out, terms=("w500", "w20000", "w90000")).count()
        ts.append(round(time.monotonic() - t0, 2))
    print(f"bm25 (mid+tail mix): {ts}")


if __name__ == "__main__":
    main()
