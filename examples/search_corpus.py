"""End-to-end retrieval stack: the engine's search access paths, start
to finish, on one corpus.

Composes the persisted-index search family into the request flow a
production retrieval service runs:

    documents
      1. index build        positional inverted index (postings carry
                            tf, positions, and the BM25 dl norm — p2
                            schema) + the 1-row corpus-stats artifact
                            + the SymSpell deletion index; all
                            ArtifactStore-registered, built once,
                            reused across every query below
      2. term resolution    a misspelled query term resolves through
                            the deletion index (exact levenshtein
                            verify)
      3. candidate recall   boolean (AND / min-should-match), ranked
                            (TF-IDF, BM25), and exact-phrase retrieval
                            — each reading only its terms' hash
                            partitions, never document text
      4. fusion             reciprocal-rank fusion of the BM25 list
                            with each query vector's exact cosine
                            top-k (hybrid retrieval)
      5. precision rerank   cross-encoder boundary: the k winners'
                            texts are point-gathered (pushed literal
                            IN) and scored pairwise in an
                            Arrow-batched mapInPandas
      6. presentation       snippets extracted at the first hit
                            position FROM THE INDEX, text fetched for
                            k docs only
      7. ingest lifecycle   incremental BM25 (history artifacts +
                            query-side increment), then
                            compact_token_index folds the increment
                            into the boundary artifacts — query cost
                            returns to the indexed floor
      8. takedown (DELETE)  retract_token_index rewrites postings +
                            norms minus the takedown set (index bytes
                            only); the ranked search off the retracted
                            artifacts re-derives df from survivors —
                            and the vector store takes the same
                            tombstone pass (sim_ann_retracted)

Stage 3 also runs the proximity (slop) query and stage 4 the MMR
de-redundancy pass over the cosine pool. Every stage is either
index/artifact-resident or k-bounded — document
text is read only by the point-gathers in stages 5-6. Run:

    python examples/search_corpus.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from kstore_spark.functions.corpus import rag_context_diverse
    from kstore_spark.functions.similarity import (
        RANGE_COS, RETRACT_VEC_IDS, hybrid_search_rrf,
        rerank_cross_encoder, sim_ann_retracted, sim_mmr_diversify,
        sim_range_search_pruned)
    from kstore_spark.streaming.indexing import stream_store_retractions
    from kstore_spark.functions.text import (
        INCR_DOC_MIN, RETRACT_IDS, compact_token_index, text_search_bm25,
        text_search_bm25_incremental, text_search_fuzzy,
        text_search_fuzzy_multi, text_search_fuzzy2,
        text_search_fuzzy2_multi, text_search_fuzzy_ranked,
        text_search_indexed, text_search_min_should_match, text_search_near,
        text_search_negation, text_search_phrase, text_search_prefix,
        text_search_ranked, text_search_retracted, text_search_snippets)
    from kstore_spark.session import get_spark

    spark = get_spark("search-example")

    print("== 2. fuzzy term resolution ('joib' → edit-distance-1 terms)")
    text_search_fuzzy(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 2b. multi-term fuzzy ('joib','scam' → union neighborhood)")
    text_search_fuzzy_multi(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 2c. distance-2 fuzzy ('jion' → 'join': a transposition,"
          " invisible at distance 1)")
    text_search_fuzzy2(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 2d. multi-term distance-2 ('jion','scna' in one probe)")
    text_search_fuzzy2_multi(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 2e. fuzzy RANKED ('joib' neighborhood → TF-IDF top-k)")
    text_search_fuzzy_ranked(spark, sf_dir).show(5)

    print("== 3a. conjunctive AND")
    text_search_indexed(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 3b. min-should-match (2 of 4)")
    text_search_min_should_match(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 3b'. prohibited clause (+dup +join -merge)")
    text_search_negation(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 3b''. prefix query ('jo*' via the vocab sidecar)")
    text_search_prefix(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 3c. ranked TF-IDF top-k")
    text_search_ranked(spark, sf_dir).show(5)

    print("== 3d. BM25 top-k (dl from the posting row)")
    text_search_bm25(spark, sf_dir).show(5)

    print("== 3e. exact phrase")
    text_search_phrase(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 3f. proximity: 'dup' within 5 tokens of 'join'")
    text_search_near(spark, sf_dir).orderBy("doc_id").show(5)

    print("== 4. hybrid fusion (BM25 ⊕ cosine, RRF)")
    hybrid_search_rrf(spark, sf_dir).orderBy("query_id", "rank").show(10)

    print("== 4b. MMR de-redundancy over the cosine pool (λ=0.7)")
    sim_mmr_diversify(spark, sf_dir).orderBy("query_id", "rank").show(10)

    print("== 5. cross-encoder rerank of the BM25 top-k")
    rerank_cross_encoder(spark, sf_dir).show(5)

    print("== 6. snippets (positions from the index, k-row text fetch)")
    text_search_snippets(spark, sf_dir).show(5, truncate=60)

    print("== 7. ingest lifecycle: incremental query, then fold")
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).count()
    print("   7a. BM25 over history index + query-side increment "
          f"(history<{INCR_DOC_MIN}):")
    text_search_bm25_incremental(spark, sf_dir).show(5)
    print(f"   7b. compact_token_index({INCR_DOC_MIN} -> {n_docs}): "
          "merge boundary artifacts + increment postings/norms")
    compact_token_index(spark, sf_dir, INCR_DOC_MIN, n_docs)
    print("   7c. same query served entirely from the folded index:")
    text_search_bm25_incremental(spark, sf_dir, new_min=n_docs).show(5)

    print("== 8. takedown: retract docs/vectors, search the survivors")
    print(f"   8a. ranked search minus the takedown set {RETRACT_IDS}:")
    text_search_retracted(spark, sf_dir).show(5)
    print("   8b. ANN top-k off the retracted inverted list "
          f"(minus {RETRACT_VEC_IDS}):")
    sim_ann_retracted(spark, sf_dir).orderBy("query_id", "rank").show(10)
    print("   8c. STREAMING takedown: tombstone log + anti-join serve "
          "(== the batch rewrite):")
    stream_store_retractions(spark, sf_dir).orderBy(
        "query_id", "rank").show(10)

    print(f"== 9. range search: all neighbors with cos >= {RANGE_COS} "
          "(exact cell-bound pruning off the IVF-Flat store)")
    sim_range_search_pruned(spark, sf_dir).orderBy(
        "query_id", "neighbor_id").show(10)

    print("== 10. MMR-diversified RAG contexts (token-Jaccard "
          "redundancy, λ=0.7)")
    rag_context_diverse(spark, sf_dir).orderBy("rank").show(
        5, truncate=60)


if __name__ == "__main__":
    main()
