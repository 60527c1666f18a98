"""Steady-state BM25 probes at a big documents replica.

Mirrors the fifth-session search-probe methodology (PERF.md):
index/artifact path = 2nd call (steady state), scan path = min-of-3
over a twin that computes the SAME fixed-point formula from a raw
text scan (postings, dl, and corpus stats all derived query-time —
what you pay with no index), plus the incremental refresh at a 90/10
history/increment split, plus a DuckDB hash-compare of the index-path
result on the replica.

Usage: python tools/probe_bm25_scale.py [replica_dir]
       (default /tmp/sfdocs100 — generate with gen_scale_probe_big.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def scan_twin(spark, sf_dir, k):
    """BM25 with NO artifacts: postings/norms/stats from the text scan."""
    from kstore_spark.functions.text import RANKED_TERMS, _bm25_topk, _tok

    docs = _tok(spark, sf_dir)
    hits = (
        docs.select("doc_id", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(list(RANKED_TERMS)))
        .groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    )
    norms = docs.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = norms.agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("dl").alias("total_tokens"))
    # dl joined onto the hits (what the p2 index schema denormalizes
    # away) — this join is exactly the scan path's extra cost
    return _bm25_topk(hits.join(norms, "doc_id"), stats, k)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs100"
    from kstore_spark.functions.text import (
        RANKED_K, TEXT_SEARCH_BM25_SQL, text_search_bm25,
        text_search_bm25_incremental)
    from kstore_spark.session import get_spark

    spark = get_spark()
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).count()
    print(f"replica: {sf_dir} n_docs={n_docs}")

    def run(label, fn, reps):
        times, rows = [], None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows = sorted(tuple(r) for r in fn().collect())
            times.append(time.monotonic() - t0)
        print(f"{label}: {[round(t, 2) for t in times]} s -> "
              f"{'min' if reps > 2 else 'steady'}="
              f"{min(times[1:] or times):.2f} s, {len(rows)} rows")
        return rows

    scan_rows = run("scan twin (min-of-3)",
                    lambda: scan_twin(spark, sf_dir, RANKED_K), 3)
    idx_rows = run("index+norms path (2nd = steady)",
                   lambda: text_search_bm25(spark, sf_dir), 2)
    assert idx_rows == scan_rows, "index path != scan twin"

    new_min = int(n_docs * 0.9)
    inc_rows = run(f"incremental (history<{new_min}, 2nd = steady)",
                   lambda: text_search_bm25_incremental(
                       spark, sf_dir, new_min=new_min), 2)
    assert inc_rows == idx_rows, "incremental != full"

    # compaction (VERDICT r6 item 5): fold the 10% increment into the
    # boundary artifacts, then the incremental query at the new
    # boundary must return to the indexed floor (empty increment leg)
    from kstore_spark.functions.text import compact_token_index
    t0 = time.monotonic()
    compact_token_index(spark, sf_dir, new_min, n_docs)
    print(f"compaction fold {new_min}->{n_docs}: {time.monotonic()-t0:.2f} s")
    post_rows = run(f"incremental AFTER fold (history<{n_docs}, 2nd = steady)",
                    lambda: text_search_bm25_incremental(
                        spark, sf_dir, new_min=n_docs), 2)
    assert post_rows == idx_rows, "post-compaction != full"

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet/**/*.parquet')")
    t0 = time.monotonic()
    orc = sorted(tuple(r) for r in con.execute(TEXT_SEARCH_BM25_SQL).fetchall())
    print(f"duckdb oracle: {time.monotonic() - t0:.1f} s")
    assert idx_rows == orc, "spark != duckdb on the replica"
    print("ALL EQUAL (scan twin == index path == incremental == duckdb)")


if __name__ == "__main__":
    main()
