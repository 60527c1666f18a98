"""100x scale-grade oracle for the cluster family (VERDICT r8 item 6).

The driver's DuckDB recursive-CTE oracle materializes the node x reach
transitive closure — 60+ GB of DuckDB temp at 500k docs — so the
cluster family (dedup_clusters / keep_best / soft_weights) had only a
structural check at 100x. This probe replaces the closure with an
INDEPENDENT formulation that scales:

  1. exact 5-gram-Jaccard pairs in DuckDB (one shingle self-join, no
     recursion — the same DEDUP_NGRAM_SQL the sf0.01 oracle uses),
  2. union-find over the sparse pair list in Python (path compression
     + union by size — a different algorithm family from Spark's
     alternating star contraction),
  3. the same 1e6 div |cluster| weighting in Python,

then hash-compares the full (doc_id, weight_ppm) relation against BOTH
Spark paths — the exact pair engine and the LSH seam
(dedup_soft_weights_lsh) — and times banded vs exact (VERDICT item 4's
100x cost claim: the banded engine should replace the 122 s exact-pair
cost).

LAYERED at 100x (measured, r9): the DuckDB shingle self-join is its
own scale wall — at 500k docs it sat at ~60 GB RSS after 20 min (the
same resource cliff the recursive CTE hit), so the INDEPENDENT-ENGINE
leg (DuckDB pairs) runs at --oracle-factor scale (default sf0.01,
where it is instant and matches the driver oracle), while at full
scale the union-find clusters/weights the SPARK pair frame — the pair
engine itself carries sf0.01 oracle rows, the prefix-filtering lemma,
and the recall-1.0 LSH set-equality at three SFs, so the 100x check
isolates exactly the piece the recursive CTE could never reach: the
clustering + weighting over half a million documents.

Usage: python tools/probe_soft_weights_scale.py [sf_dir] [oracle_sf_dir]
       (defaults /tmp/sfdocs100 /root/testdata/sf0.01 — generate the
       replica with gen_scale_probe_big.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def union_find_weights(pairs, all_ids):
    """Independent clustering + weighting: union-find with path
    compression and union by size, then weight_ppm = 1e6 // |cluster|
    (singletons 1e6) — no Spark, no SQL recursion."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    size: dict[int, int] = {}
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        sa, sb = size.get(ra, 1), size.get(rb, 1)
        if sa < sb:
            ra, rb = rb, ra
            sa, sb = sb, sa
        parent[rb] = ra
        size[ra] = sa + sb
        size.pop(rb, None)
    return {
        d: 1_000_000 // size.get(find(d), 1) for d in all_ids
    }


def duckdb_pairs_weights(sf: str):
    """The fully-independent leg: DuckDB exact pairs + union-find."""
    import duckdb

    from kstore_spark.functions.dedup import DEDUP_NGRAM_SQL

    con = duckdb.connect()
    p = os.path.join(sf, "documents.parquet")
    if os.path.isdir(p):
        p = p + "/*.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    pair_rows = con.execute(DEDUP_NGRAM_SQL).fetchall()
    t_pairs = time.time() - t0
    all_ids = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    w = union_find_weights(pair_rows, all_ids)
    return {(d, v) for d, v in w.items()}, len(pair_rows), t_pairs


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs100"
    oracle_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from kstore_spark.functions.dedup import (
        dedup_ngram_prefix, dedup_soft_weights, dedup_soft_weights_lsh)
    from kstore_spark.session import get_spark

    spark = get_spark("soft-weights-scale")
    spark.range(1).count()

    # -- Spark exact pair engine at full scale ---------------------------
    t0 = time.time()
    exact = {(r["doc_id"], r["weight_ppm"])
             for r in dedup_soft_weights(spark, sf).collect()}
    t_exact = time.time() - t0
    print(f"spark exact : {len(exact)} rows in {t_exact:.1f}s", flush=True)

    # -- Spark LSH seam (the 100 TB pair engine) at full scale -----------
    t0 = time.time()
    lsh = {(r["doc_id"], r["weight_ppm"])
           for r in dedup_soft_weights_lsh(spark, sf).collect()}
    t_lsh = time.time() - t0
    same = lsh == exact
    print(f"spark lsh   : {len(lsh)} rows in {t_lsh:.1f}s  "
          f"(== exact: {same})", flush=True)

    # -- full-scale clustering+weighting check: union-find over the
    #    Spark pair frame (different algorithm family from the star
    #    contraction; the pair engine itself is oracled at sf0.01 and
    #    lemma/recall-pinned — see module docstring)
    t0 = time.time()
    pair_rows = [(r["doc_a"], r["doc_b"])
                 for r in dedup_ngram_prefix(spark, sf).collect()]
    all_ids = [r["doc_id"] for r in spark.read.parquet(
        os.path.join(sf, "documents.parquet")).select("doc_id").collect()]
    uf = {(d, v) for d, v in union_find_weights(pair_rows, all_ids).items()}
    ok_uf_exact = uf == exact
    ok_uf_lsh = uf == lsh
    n_down = sum(1 for _, w in uf if w < 1_000_000)
    print(f"union-find  : {len(pair_rows)} pairs, {time.time()-t0:.1f}s — "
          f"exact=={'OK' if ok_uf_exact else 'MISMATCH'} "
          f"lsh=={'OK' if ok_uf_lsh else 'MISMATCH'} "
          f"({n_down} docs down-weighted)", flush=True)

    # -- independent-engine leg at oracle scale ---------------------------
    t0 = time.time()
    spark_small = {(r["doc_id"], r["weight_ppm"])
                   for r in dedup_soft_weights(spark, oracle_sf).collect()}
    oracle, n_pairs, t_pairs = duckdb_pairs_weights(oracle_sf)
    ok_small = oracle == spark_small
    print(f"duckdb leg  : {oracle_sf} — {n_pairs} pairs "
          f"(duckdb {t_pairs:.1f}s) == spark: "
          f"{'OK' if ok_small else 'MISMATCH'}", flush=True)

    ok = same and ok_uf_exact and ok_uf_lsh and ok_small
    if not ok:
        diff = (exact ^ uf) | (lsh ^ uf) | (spark_small ^ oracle)
        print("sample divergence:", sorted(diff)[:10])
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
