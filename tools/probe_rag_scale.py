"""100x probe for the RAG assembly pair (VERDICT r8 item 5).

rag_context's per-query corpus scan was the one r8-new shape that
would not survive 100 TB as a QUERY-time op; rag_context_indexed
replaces it with the chunk-index access path. This probe times both at
a replica dir (min-of-3, clearCache between runs; the index build is
reported separately — it is the one-time ingest cost), hash-compares
them against each other, and cross-checks the indexed path against the
DuckDB RAG_CONTEXT_SQL oracle at the same scale.

Usage: python tools/probe_rag_scale.py [sf_dir]
       (default /tmp/sfdocs100 — generate with gen_scale_probe_big.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs100"

    import duckdb

    from kstore_spark.functions.corpus import (
        RAG_CONTEXT_SQL, chunk_index_dir, rag_context, rag_context_indexed)
    from kstore_spark.session import get_spark

    spark = get_spark("rag-scale")
    spark.range(1).count()

    # one-time ingest cost, reported apart from the query timings
    t0 = time.time()
    chunk_index_dir(spark, sf)
    print(f"index build/reuse: {time.time() - t0:.1f}s", flush=True)

    def best3(fn):
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn(spark, sf).collect()
            runs.append(round(time.time() - t0, 2))
        return rows, runs

    scan_rows, scan_t = best3(rag_context)
    idx_rows, idx_t = best3(rag_context_indexed)
    same = {tuple(r) for r in scan_rows} == {tuple(r) for r in idx_rows}
    print(f"scan : min={min(scan_t)} runs={scan_t}", flush=True)
    print(f"index: min={min(idx_t)} runs={idx_t}  (== scan: {same})",
          flush=True)

    con = duckdb.connect()
    p = os.path.join(sf, "documents.parquet")
    if os.path.isdir(p):
        p = p + "/*.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    res = con.execute(RAG_CONTEXT_SQL)
    cols = [c[0] for c in res.description]
    exp = res.fetchall()
    print(f"duckdb oracle: {time.time() - t0:.1f}s", flush=True)

    def rowset(names, rows):
        order = sorted(range(len(names)), key=lambda i: names[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    ok = rowset(idx_rows[0].__fields__ if idx_rows else cols,
                [tuple(r) for r in idx_rows]) == rowset(cols, exp)
    print(f"oracle hash-compare: {'OK' if ok else 'MISMATCH'}", flush=True)
    return 0 if (same and ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
