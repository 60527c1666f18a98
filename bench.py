"""Benchmark harness. Stdout contract (r10 — VERDICT r9 item 1):
  - an EARLY line with the full per-key JSON map (also written to
    BENCH_FULL.json for round-over-round diffs), then
  - a FINAL compact JSON line (<1.9 KB by construction):
    {"metric": ..., "value": N, "unit": "sec",
     "queries": {kstore_perftest_* + top-5 expensive}, "sf": ...,
     "n_keys": N, "full_map": "BENCH_FULL.json"}
  The driver records only the last ~2,000 chars of stdout; r9's 78-key
  single-line output outgrew that tail (BENCH_r09.json parsed:null),
  so the full map must never be the final line.

Two workload groups:
1. kstore_perftest — the reference's canonical perftest join workload
   (BASELINE.md; reference perftests/gen.py defaults: numr=600k,
   nums=10k, selrater=0.75, selrates=1.0, amax=1000, seed=42),
   regenerated with the same distributions and run through the operator
   layer exactly as the reference plan does (select→fetch→join→fetch→
   aggs→tuple). Baseline to beat: hash 9.86 s / sort 9.88 s (includes
   load, 2014 hardware).
2. Headline engine queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Each query is timed to full materialization (count/collect), cold plans,
shared SparkSession (JVM startup excluded — the reference baseline also
excludes server startup).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NUMR, NUMS, AMAX, SEED = 600_000, 10_000, 1000, 42
SELRATER = 0.75


def gen_perftest_frames(spark):
    """Same distributions as the reference's perftests/gen.py (seed 42):
    ra/sa uniform join keys in [0, amax]; rc selective in [1,9] for 75%
    of rows else 10; sf in [31,99]; rd negative / sg positive payloads.

    Generated cluster-side (VERDICT r6 item 7): spark.range partitions
    the id space across executors and every column is a deterministic
    xxhash64(pos, seed, tag) derivation — no driver-side numpy array and
    no 600k-row createDataFrame upload, so the generator itself scales
    with the cluster (at numr=10⁹ the old path would serialize 16 GB
    through the driver). Same uniform distributions and selectivities as
    before; values differ from the numpy stream (hash- vs MT-derived),
    which changes no timing — the operators see identical cardinalities,
    key ranges, and join fan-out."""
    def u(tag: str, lo: int, hi: int):
        # uniform integer in [lo, hi] derived from (pos, SEED, tag)
        return (F.pmod(F.xxhash64(F.col("pos"), F.lit(SEED), F.lit(tag)),
                       F.lit(hi - lo + 1)) + lo).cast("int")

    n_sel = int(NUMR * SELRATER)
    r = spark.range(NUMR).withColumnRenamed("id", "pos").select(
        "pos",
        u("ra", 0, AMAX).alias("ra"),
        F.when(F.col("pos") < n_sel, u("rc", 1, 9))
         .otherwise(F.lit(10)).cast("int").alias("rc"),
        (-u("rd", 0, 2**30 - 1)).cast("int").alias("rd"),
    )
    s = spark.range(NUMS).withColumnRenamed("id", "pos").select(
        "pos",
        u("sa", 0, AMAX).alias("sa"),
        u("sf", 31, 99).alias("sf"),
        u("sg", 0, 2**30 - 1).alias("sg"),
    )
    return r, s


def write_perftest_tables(spark, base: str) -> tuple[str, str]:
    """Materialize the generated r/s tables to parquet ONCE (untimed) —
    the reference's perftests/gen.py writes files and its 9.86/9.88 s
    baseline includes loading them, so the timed region here is
    load-from-parquet + query, the same shape."""
    r, s = gen_perftest_frames(spark)
    rp, sp = os.path.join(base, "r"), os.path.join(base, "s")
    r.write.mode("overwrite").parquet(rp)
    s.write.mode("overwrite").parquet(sp)
    return rp, sp


def perftest_query(spark, algorithm: str, r_df=None, s_df=None):
    """select(rc,1,9) → fetch(ra) ; select(sf,31,99) → fetch(sa) ;
    join ; fetch(rd), fetch(sg) ; max/min/count/count → one row.
    r_df/s_df default to in-memory generation (plan-dump tooling); the
    bench passes parquet-backed frames so load cost is in the timing,
    like the reference's."""
    from kstore_spark.operators import equijoin, fetch
    from kstore_spark.operators.output import zip_vectors
    from kstore_spark.operators.select import select_range
    from kstore_spark.operators.types import Prov

    if r_df is None or s_df is None:
        r_df, s_df = gen_perftest_frames(spark)
    # late-materialization provenance: selects/fetches/join compose into
    # ONE shuffle join over the two frames (see operators/types.Prov)
    r_prov = Prov(frame=r_df, cols={c: c for c in ("ra", "rc", "rd")})
    s_prov = Prov(frame=s_df, cols={c: c for c in ("sa", "sf", "sg")})

    r_ids = select_range(None, 1, 9, prov=r_prov, column="rc")
    ra = fetch(None, r_ids, source_col="ra")
    s_ids = select_range(None, 31, 99, prov=s_prov, column="sf")
    sa = fetch(None, s_ids, source_col="sa")
    l_ids, r_ids2 = equijoin(ra, sa, algorithm=algorithm)
    rd = fetch(None, l_ids, source_col="rd")
    sg = fetch(None, r_ids2, source_col="sg")
    zipped = zip_vectors([rd, sg])  # shared-frame fast path: one select
    return zipped.agg(
        F.max("c0").alias("max_rd"), F.min("c1").alias("min_sg"),
        F.count("c0").alias("cnt_rd"), F.count("c1").alias("cnt_sg"),
    ).collect()


def headline_queries():
    from kstore_spark.functions import (
        bpe, corpus, dedup, lm, pipeline, sampling, similarity, text)
    from kstore_spark.plans import analytics, extended, kparity, ranges, tpch_wide
    from kstore_spark.streaming import indexing as stream_indexing
    from kstore_spark.streaming import sessions as stream_sessions

    return {
        "q1_pricing_summary": analytics.q1_pricing_summary,
        "q3_shipping_priority": analytics.q3_shipping_priority,
        "q5_local_supplier": analytics.q5_local_supplier,
        "q6_forecast_revenue": analytics.q6_forecast_revenue,
        "events_sessionize": analytics.events_sessionize,
        "join_hash": kparity.q_join_hash,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        # dedup_ngram_jaccard (inverted-index tier) retired from the
        # bench in r5 (VERDICT r4): it OOMs at 100× and the prefix tier
        # below produces IDENTICAL output (prefix-filtering lemma) 2×
        # faster — it stays as a test/driver-only oracle twin
        "sim_topk_bruteforce": similarity.sim_topk_bruteforce,
        "sim_topk_matmul": similarity.sim_topk_matmul,
        # pure projection — same count()-pruning honesty fix as pii_scrub
        # below (round 3; earlier rounds' 0.14-0.24s values timed only
        # the row count, so this key's series resets here)
        "text_quality": lambda s, sf: text.text_quality(s, sf).agg(
            F.sum("n_tokens").alias("toks"),
            F.sum("stopword_ratio").alias("sr"),
            F.sum("mean_token_len").alias("mtl"),
        ),
        # round-2 additions (keys above stay comparable round-over-round)
        "embedding_neardup_lsh": similarity.embedding_neardup_lsh,
        "q18_large_volume": extended.q18_large_volume,
        "q21_waiting_supplier": tpch_wide.q21_waiting_supplier,
        "decontaminate_ngram": dedup.decontaminate_ngram,
        "dedup_passages": corpus.dedup_passages,
        "tfidf_top_terms": corpus.tfidf_top_terms,
        # round-3 additions (keys above stay comparable round-over-round)
        # pii_scrub is a pure projection query: under a bare count()
        # Catalyst prunes the regex work entirely, so the bench key
        # consumes every output column to time the real scrub
        "pii_scrub": lambda s, sf: text.pii_scrub(s, sf).agg(
            F.sum(F.length("clean")).alias("total_chars"),
            F.sum(F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("hits"),
        ),
        "dedup_simhash_wide": dedup.dedup_simhash_wide,
        # dedup_semantic (weak-gap 0.47 tier) retired from the bench in
        # r6 (VERDICT r5 item 4), same treatment as dedup_ngram_jaccard:
        # its own PERF.md row shows 12.5× wall at 10× data — it is the
        # documented near-quadratic STRESS configuration, kept as a
        # driver/pytest oracle entry; dedup_semantic_strong below is the
        # benched production operating point (2.1× at 10×)
        "corpus_temperature_sample": corpus.corpus_temperature_sample,
        # round-4 additions (keys above stay comparable round-over-round)
        # dedup_semantic_strong is the semantic-dedup HEADLINE (VERDICT
        # r3 item 4): the production operating point (cos ≥ 0.9, w=16/
        # b=32 — strong band selectivity, near-linear candidate volume);
        # dedup_semantic above stays as the weak-gap stress case
        "dedup_semantic_strong": similarity.dedup_semantic_strong,
        "dedup_keep_best_lsh": dedup.dedup_keep_best_lsh,
        # exact substring-span dedup (Lee et al. shape): digest-keyed
        # inverted-index join over per-row sha2 sliding windows
        "dedup_substring": dedup.dedup_substring,
        # late-r4 second wave (keys above stay comparable): the keyless
        # binned range join and the corpus-trained bigram-LM scorer —
        # both aggregate-consumed so Catalyst can't prune the work
        # (a bare count() would let the left-join / sum columns drop)
        # exact prefix-filtering tier: same output as dedup_ngram_jaccard
        # (theorem-exact), sub-quadratic candidates via df-ordered prefixes
        "dedup_ngram_prefix": dedup.dedup_ngram_prefix,
        "events_range_join": lambda s, sf: ranges.events_range_join(s, sf).agg(
            F.sum("n_clicks").alias("nc"), F.max("last_click_id").alias("lc"),
        ),
        "text_lm_score": lambda s, sf: lm.text_lm_score(s, sf).agg(
            F.sum("lm_score_ppm").alias("sp"), F.sum("n_bigrams").alias("nb"),
        ),
        # round-5 additions (keys above stay comparable round-over-round)
        "dedup_cross_source": dedup.dedup_cross_source,
        "knn_label_vote": similarity.knn_label_vote,
        # first run pays the one-time partitioned-store write; min-of-2
        # reports the steady-state dynamic-partition-pruned probe
        "sim_ann_ivf_stored": similarity.sim_ann_ivf_stored,
        "text_lm_score_trusted": lambda s, sf: lm.text_lm_score_trusted(s, sf).agg(
            F.sum("lm_score_ppm").alias("sp"), F.sum("n_bigrams").alias("nb"),
        ),
        # round-6 additions (keys above stay comparable round-over-round)
        # incremental IVF: history store probe + query-time increment
        # assignment (first run pays the one-time history-store write)
        "sim_ann_ivf_incremental": similarity.sim_ann_ivf_incremental,
        # product-quantized ANN: 8-byte codes + corpus-scaled exact re-rank
        "sim_ann_pq": similarity.sim_ann_pq,
        # r10: k-means-refined codebooks — identical query cost, the
        # timed delta is the 4-iteration distributed Lloyd training
        "sim_ann_pq_kmeans": similarity.sim_ann_pq_kmeans,
        # r9: the IVF+PQ composition — cell-pruned AND compressed scan
        "sim_ann_ivf_pq": similarity.sim_ann_ivf_pq,
        # r10: IVFADC proper — residual encoding; same scan shape as
        # the raw composition + a per-probe bias join
        "sim_ann_ivf_pq_res": similarity.sim_ann_ivf_pq_res,
        # r10: the persisted residual inverted list (ingest-time
        # assignment+encoding; first run pays the one-time store build)
        "sim_ann_ivf_pq_res_stored": similarity.sim_ann_ivf_pq_res_stored,
        # r9: the persisted inverted list (assignment+encoding at
        # ingest; first run pays the one-time store build, min-of-2
        # reports the DPP-pruned compressed-scan steady state)
        "sim_ann_ivf_pq_stored": similarity.sim_ann_ivf_pq_stored,
        # r9: the ANN store lifecycle (history build -> fold -> exact
        # query off the folded inverted list; session artifact base)
        "lifecycle_fold_ann": similarity.lifecycle_fold_ann,
        # r10: the residual-store lifecycle twin
        "lifecycle_fold_ann_res": similarity.lifecycle_fold_ann_res,
        # r11: the kmeans-store lifecycle (train-on-history -> persist
        # -> fold WITHOUT retraining -> widened-knobs exact query)
        "lifecycle_fold_ann_kmeans": similarity.lifecycle_fold_ann_kmeans,
        # the composed 9-stage curation pipeline end to end (exact dedup →
        # LSH near-dup → decontaminate → quality/quota/LM cut → boilerplate
        # strip → PII scrub → sample → leakage-safe split → packing) — the
        # engine's end-to-end-throughput headline, oracled in
        # functions/pipeline.py
        "curate_survivors": pipeline.curate_survivors,
        # r6 third-session additions (keys above stay comparable):
        # path mining, the corpus n-gram table, and pre-filtered vector
        # search — all sublinear at 10× (PERF.md)
        "events_top_paths": analytics.events_top_paths,
        # round-8: last-touch attribution (one user-window pass)
        "events_attribution": analytics.events_attribution,
        "corpus_trigrams": corpus.corpus_trigrams,
        "corpus_collocations": corpus.corpus_collocations,
        "hybrid_search": similarity.hybrid_search,
        "text_ngram_novelty": corpus.text_ngram_novelty,
        # r6 fourth-session additions (keys above stay comparable):
        # the all-vectors neighbor graph (cell-cogrouped BLAS) and the
        # bucket-prefiltered decontamination tier
        "knn_graph_ivf": similarity.knn_graph_ivf,
        "decontaminate_bloom": dedup.decontaminate_bloom,
        # persisted inverted text index: first run pays the one-time
        # postings write; min-of-2 reports the partition-pruned probe
        "text_search_indexed": text.text_search_indexed,
        "text_search_ranked": text.text_search_ranked,
        "text_search_bm25": text.text_search_bm25,
        "text_search_snippets": text.text_search_snippets,
        "text_search_fuzzy": text.text_search_fuzzy,
        "bpe_pair_counts": bpe.bpe_pair_counts,
        "importance_weights_hashed": sampling.importance_weights_hashed,
        "bpe_token_counts": bpe.bpe_token_counts,
        "text_search_phrase": text.text_search_phrase,
        "text_search_incremental": text.text_search_incremental,
        "hybrid_search_indexed": similarity.hybrid_search_indexed,
        "hybrid_search_rrf": similarity.hybrid_search_rrf,
        "rerank_cross_encoder": similarity.rerank_cross_encoder,
        # round-7 additions (keys above stay comparable round-over-round):
        # multi-term fuzzy (2-typo neighborhood resolution + OR search)
        # and incremental BM25 (history artifacts + query-side increment
        # — the pre-compaction steady state; the post-fold floor is
        # text_search_bm25 above)
        "text_search_fuzzy_multi": text.text_search_fuzzy_multi,
        "text_search_bm25_incremental": text.text_search_bm25_incremental,
        # round-9 standing keys for the r8-new ops (VERDICT r8 item 3:
        # PERF.md probes are point-in-time; round-over-round drift needs
        # bench keys). Projection-shaped outputs are aggregate-consumed
        # (same honesty rule as pii_scrub/text_quality above) so column
        # pruning can't drop the work being timed.
        "rag_context": lambda s, sf: corpus.rag_context(s, sf).agg(
            F.sum(F.length("context_text")).alias("ctx_chars"),
            F.sum("n_hits").alias("hits"),
        ),
        "events_attribution_windowed": analytics.events_attribution_windowed,
        # r9: equal-split multi-touch credit — same one-window pass,
        # range frame bounded by touches-per-horizon
        "events_attribution_linear": analytics.events_attribution_linear,
        # r9: first-touch (acquisition credit) — same window, first-seen
        # state
        "events_attribution_first": analytics.events_attribution_first,
        # r9: U-shaped 40/20/40 position credit — range-frame struct
        # list + row-local posexplode weight CASE
        "events_attribution_position": analytics.events_attribution_position,
        "lifecycle_fold_search": text.lifecycle_fold_search,
        "stream_deletion_variants": stream_indexing.stream_deletion_variants,
        "dedup_soft_weights": lambda s, sf: dedup.dedup_soft_weights(s, sf).agg(
            F.sum("weight_ppm").alias("wsum"),
            F.count(F.lit(1)).alias("n"),
        ),
        "decontaminate_semantic": similarity.decontaminate_semantic,
        "stream_attribution": stream_sessions.stream_attribution,
        # round-9 additions: the LSH seam through soft dedup (the 100 TB
        # pair engine replacing the exact one) and the index-backed RAG
        # assembly (first run pays the one-time chunk-index build;
        # min-of-2 reports the pruned-probe steady state)
        "dedup_soft_weights_lsh": lambda s, sf: dedup.dedup_soft_weights_lsh(
            s, sf).agg(
            F.sum("weight_ppm").alias("wsum"),
            F.count(F.lit(1)).alias("n"),
        ),
        "rag_context_indexed": lambda s, sf: corpus.rag_context_indexed(
            s, sf).agg(
            F.sum(F.length("context_text")).alias("ctx_chars"),
            F.sum("n_hits").alias("hits"),
        ),
        # r9: typo-robust RAG — deletion-index term resolution feeding
        # the chunk-index assembly (both stages are index probes)
        "rag_context_fuzzy": lambda s, sf: corpus.rag_context_fuzzy(
            s, sf).agg(
            F.sum(F.length("context_text")).alias("ctx_chars"),
            F.sum("n_hits").alias("hits"),
        ),
        # distance-2 fuzzy: first run pays the one-time depth-2 deletion
        # index build; min-of-2 reports the pruned-probe steady state
        "text_search_fuzzy2": text.text_search_fuzzy2,
        # round-8: the combined shape — >=2 terms at distance 2, one
        # depth-2 index probe (shares fuzzy2's index build above)
        "text_search_fuzzy2_multi": text.text_search_fuzzy2_multi,
        # round-8: fuzzy neighborhood feeding the TF-IDF top-k
        "text_search_fuzzy_ranked": text.text_search_fuzzy_ranked,
        # r11 proximity (slop) search: two pruned postings reads + one
        # doc_id join + row-local pair count over sorted positions
        "text_search_near": text.text_search_near,
        # r11 MMR diversification: top-pool pass + pool^2-per-query
        # grid + one applyInPandas greedy per query
        "sim_mmr_diversify": similarity.sim_mmr_diversify,
        # r12 index-served MMR: pool candidates from the persisted
        # store's pruned probe instead of the corpus cross-product
        "sim_mmr_diversify_indexed": similarity.sim_mmr_diversify_indexed,
        # r11 takedown lifecycle: first run pays the one-time
        # retraction rewrite (index bytes only); min-of-3 reports the
        # pruned probe off the retracted artifacts
        "text_search_retracted": text.text_search_retracted,
        # r11 ANN takedown twin: anti-filter rewrite of the inverted
        # list, widened-knobs exact query over the survivors
        "sim_ann_retracted": similarity.sim_ann_retracted,
        # r11 BM25 off the retracted artifacts (survivor avgdl/stats)
        "text_search_bm25_retracted": text.text_search_bm25_retracted,
        # r12 takedown against the production kmeans store: sidecar
        # carried verbatim, serving loads the tensor from the
        # RETRACTED artifact (VERDICT r11 item 3)
        "sim_ann_retracted_kmeans": similarity.sim_ann_retracted_kmeans,
        # r11: the persisted KMEANS-trained inverted list — the
        # production shape sim_ann_pq_kmeans's key lacked: training
        # runs ONCE at ingest (first run pays store build incl. 4
        # Lloyd sweeps; min-of-3 reports the load-books + DPP-pruned
        # serving steady state)
        "sim_ann_ivf_pq_kmeans_stored":
            similarity.sim_ann_ivf_pq_kmeans_stored,
        # r11: streaming ANN store maintenance — row-local assign +
        # encode against broadcast ingest-time artifacts, file-sink
        # exactly-once; consume via an aggregate like other streams
        "stream_vector_assignments": lambda s, sf: (
            stream_indexing.stream_vector_assignments(s, sf).agg(
                F.sum("code_j").alias("code_sum"),
                F.count(F.lit(1)).alias("n"))),
        # r12 range search: brute twin = one broadcast-query corpus
        # scan (no shuffle, no window); pruned twin adds the exact
        # spherical-triangle cell bound off the IVF-Flat store (first
        # run pays store+sidecar build; min-of-3 reports the
        # partition-pruned steady state)
        "sim_range_search": similarity.sim_range_search,
        "sim_range_search_pruned": similarity.sim_range_search_pruned,
        # r12 streaming DELETE: tombstone-log maintenance (per-id
        # dedup state bounded by the takedown set) + broadcast
        # anti-join serve off the ingest-time store/index
        "stream_store_retractions":
            stream_indexing.stream_store_retractions,
        "stream_index_retractions":
            stream_indexing.stream_index_retractions,
        # r12 diversified RAG: one scoring scan + pool²-bounded
        # token-Jaccard grid + single-group greedy + O(k) stitch
        "rag_context_diverse": corpus.rag_context_diverse,
        # r12 boolean NOT: |pos|+|neg| pruned postings partitions +
        # one AQE-chosen anti-join on doc_id (text never read)
        "text_search_negation": text.text_search_negation,
        # r12 prefix query: one vocab-sidecar partition listing +
        # the resolved terms' postings partitions (fuzzy's
        # resolve-then-probe shape, lexicographic neighborhood)
        "text_search_prefix": text.text_search_prefix,
        # r12 scalar quantization: dim-byte codes, zero training
        # floats (per-dim min/max are order-independent aggregates),
        # one zip_with fold per candidate + exact re-rank
        "sim_ann_sq8": similarity.sim_ann_sq8,
    }


def compact_line(times: dict, total: float, sf_dir: str) -> str:
    """Compact FINAL stdout line for the driver's tail parser: total +
    the four baseline-gated perftest keys + the top-5 expensive keys.
    Size is bounded by construction (~9 fixed-ish keys ≈ 500 chars <<
    the driver's ~2,000-char tail); the assert keeps future edits
    honest. Tested in tests/test_bench_contract.py."""
    top5 = dict(sorted(times.items(), key=lambda kv: -kv[1])[:5])
    compact = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": {
            **{k: v for k, v in times.items()
               if k.startswith("kstore_perftest_")},
            **top5,
        },
        "sf": sf_dir,
        "n_keys": len(times),
        "full_map": "BENCH_FULL.json",
    }
    line = json.dumps(compact)
    if len(line) >= 1900:
        # Degrade, never die (ADVICE r10): raising here would kill the
        # process AFTER the full per-key map already printed as the
        # last complete stdout line — recreating exactly the
        # parsed:null tail-truncation failure this contract prevents.
        # Drop the top-5/perftest block; metric/value/n_keys/full_map
        # (~200 chars) always fit. The <1900 invariant itself is
        # asserted in tests/test_bench_contract.py, not in production.
        compact = {k: compact[k] for k in
                   ("metric", "value", "unit", "sf", "n_keys", "full_map")}
        line = json.dumps(compact)
    return line


def main():
    from kstore_spark.session import get_spark

    spark = get_spark("kstore-bench")
    spark.range(1).count()  # warm the JVM/session before timing

    times: dict[str, float] = {}

    # The perftest keys are the baseline-gated numbers; min-of-3 (r6 —
    # was min-of-2; VERDICT r5 item 5 flagged two rounds of sort drift
    # as likely host noise) damps shared-infra noise spikes (observed
    # ±2× run-to-run on a loaded host) without changing the workload.
    # r7 (VERDICT r6 item 7): input tables are generated cluster-side
    # and written to parquet once (untimed); each timed run loads them
    # from parquet — the reference shape (gen.py writes, perftest loads).
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="kstore_perftest_")
    try:
        rp, sp = write_perftest_tables(spark, base)
        # all four reference join keywords — BASELINE.md gates each
        # (hash 9.86 / sort 9.88 / tree 72.32 / loop 22.08 s)
        for algo in ("hash", "sort", "tree", "loop"):
            runs = []
            for _ in range(3):
                t0 = time.time()
                perftest_query(spark, algo,
                               spark.read.parquet(rp), spark.read.parquet(sp))
                runs.append(time.time() - t0)
            times[f"kstore_perftest_{algo}"] = round(min(runs), 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # min-of-N on every headline key (min-of-2 since VERDICT r2 item 7;
    # min-of-3 since r10, below): shared-host load inflates identical
    # workloads up to 3× run-to-run, and the repeat runs also absorb
    # one-time Python-worker spinup for the Arrow/mapInArrow paths —
    # min reflects the steady state a cluster
    # would see. clearCache() before EVERY timed run: several dedup ops
    # return persisted frames (deliberately — callers reuse them), and
    # Spark's CacheManager matches the second run's equivalent plan to
    # the first run's cache, silently skipping the join/agg stages the
    # benchmark exists to measure (confirmed: dedup_substring run 2
    # drops to cache-read cost). Each timed run is cold-cache/warm-JVM.
    # Drift hygiene, r10 (VERDICT r9 item 4): EVERY key is min-of-3.
    # The r6-r9 protocol ran sub-second keys min-of-2, and both of the
    # last two rounds' drift adjudications concluded the same thing —
    # one loaded-host run shifts a sub-second key ±50% and min-of-2
    # can't damp it. A uniform third run costs ~+40 s on a ~125 s wall
    # and removes the two-tier protocol the adjudications kept blaming.
    for name, fn in headline_queries().items():
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF_DIR).count()
            runs.append(time.time() - t0)
        times[name] = round(min(runs), 3)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
    }
    # Full per-key map: written to a repo file for round-over-round
    # diffs AND printed on an EARLY stdout line. The driver keeps only
    # the LAST ~2,000 chars of stdout (BENCH_r09.json came back
    # parsed:null when the 78-key one-line JSON outgrew that tail), so
    # the full map must never be the final line.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as fh:
        json.dump(full, fh)
        fh.write("\n")
    print(json.dumps(full))
    print(compact_line(times, total, SF_DIR))


if __name__ == "__main__":
    main()
