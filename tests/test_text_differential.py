"""Randomized differential testing for the text-pipeline operators:
seeded random corpora (word salad + planted PII + planted duplicates +
degenerate one-token docs) written to parquet, then each operator runs
in Spark AND its registered DuckDB oracle SQL on the same file — the
fuzz analogue of the driver's t2 gate, off the fixed testdata. Catches
regex-dialect and tokenization edge cases no fixed corpus pins.
"""

from __future__ import annotations

import datetime
import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SEEDS = (11, 23, 47)

VOCAB = ("the", "spark", "join", "a", "data", "row", "key", "merge",
         "x1", "B", "...", "!!", "café", "row,col", "a-b", "3.14")


def _gen_corpus(seed: int) -> list[str]:
    rng = random.Random(seed)
    texts = []
    for i in range(40):
        n = rng.choice((1, 2, 8, 40))
        toks = [rng.choice(VOCAB) for _ in range(n)]
        if rng.random() < 0.3:  # plant PII mid-document
            toks.insert(
                rng.randrange(len(toks) + 1),
                rng.choice((
                    f"user{i}@ex{i}.org",
                    f"10.{i % 256}.0.{i % 200}",
                    f"+{100 + i}-555-{1000 + i}",
                    f"{100 + i} 555 {2000 + i}",
                )),
            )
        texts.append(" ".join(toks))
    for _ in range(6):  # planted exact duplicates
        texts.append(texts[rng.randrange(len(texts))])
    return texts


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


# every oracled documents-table operator that is pure text-in, rows-out
_OPS = ("pii_scrub", "text_tokens", "text_quality", "text_fingerprint",
        "text_repetition", "text_rarity", "text_langid", "dedup_exact",
        "text_gopher_quality")


@pytest.mark.parametrize("seed", SEEDS)
def test_text_ops_differential(spark, tmp_path, seed):
    from kstore_spark.functions import dedup, text

    queries = {**text.QUERIES, **dedup.QUERIES}
    oracles = {**text.ORACLES, **dedup.ORACLES}

    texts = _gen_corpus(seed)
    d = tmp_path / f"corpus{seed}"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }),
        str(d / "documents.parquet"),
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for op in _OPS:
        df = queries[op](spark, str(d))
        got = _rowset(df.columns, [tuple(r) for r in df.collect()])
        res = con.execute(oracles[op])
        exp = _rowset([c[0] for c in res.description], res.fetchall())
        assert got == exp, f"{op} diverged at seed {seed}"


# corpus-wide operators: recursive-CTE clustering, LATERAL-unnest
# passages, ordered string_agg, ppm weighting — the SQL mirrors most
# likely to diverge on corpora the fixed testdata never shows
# (multimodal_features_checksum is deliberately absent: its oracle
# documents an ASCII-only equivalence and this corpus plants unicode)
_CORPUS_OPS = ("dedup_ngram_jaccard", "dedup_ngram_prefix",
               "dedup_clusters", "dedup_keep_best",
               # soft dedup (r8): planted duplicate clusters give
               # 1e6 div sz weights; salad docs stay singleton 1e6
               "dedup_soft_weights",
               "dedup_substring", "dedup_substring_spans",
               "dedup_substring_strip",
               "decontaminate_ngram", "decontaminate_bloom",
               "dedup_passages", "corpus_mixture",
               "corpus_temperature_weights", "corpus_temperature_sample",
               "tfidf_top_terms", "sample_stratified", "pack_token_budget",
               "shuffle_shards", "split_train_holdout",
               "string_funcs", "top_tokens",
               "multimodal_bytes", "multimodal_dedup_exact",
               "text_lm_score", "text_lm_buckets", "source_quota_cap",
               "sample_weighted", "text_heavy_hitters", "chunk_documents",
               # RAG assembly (r8): word salad plants 'merge'/'join'
               # across chunk boundaries — neighbor stitching and the
               # (n_hits, doc, idx) tie-break both get real work
               "rag_context",
               # r9: the chunk-index access path is EXACT (pruned
               # postings + winner-doc re-chunk), so it carries the
               # same oracle on any corpus (LSH-fed ops stay out —
               # their oracle equivalence is recall-dependent)
               "rag_context_indexed",
               # r9: typo-robust RAG — word salad plants distance-1
               # neighbors of 'mergr'/'joib' at random, so resolution
               # width varies per corpus; empty neighborhoods are a
               # valid empty==empty differential
               "rag_context_fuzzy",
               # r12: MMR-diversified RAG — every score integer
               # (n_hits, ppm rel, token-set Jaccard), so the chained
               # greedy CTEs are exact on ANY corpus; planted
               # duplicate docs make redundancy demotion real work
               "rag_context_diverse",
               # round-5 additions: cross-source pair audit (random s0/s1
               # tags exercise the straddle filter), trusted-slice LM
               "dedup_cross_source", "text_lm_score_trusted",
               # r6 continuation: corpus-wide trigram top-k + per-doc
               # trigram novelty (1/2-token docs exercise the short-doc
               # guard; planted exact duplicates plant df>1 trigrams)
               "corpus_trigrams", "text_ngram_novelty",
               # collocation lift: planted duplicate docs push real
               # bigrams over the min-count floor; empty corpora at the
               # floor are a valid empty==empty differential
               "corpus_collocations",
               # fuzzy term search: 'joib' resolves to VOCAB's 'join'
               # through the deletion index; word-salad corpora also
               # plant other distance-1 neighbors at random
               "text_search_fuzzy",
               # multi-term fuzzy (r7): 'joib'+'scam' resolve per-term
               # neighborhoods in one deletion-index probe; on corpora
               # where 'scam' has no edit-1 neighbor the result equals
               # the single-term search — mirrored exactly by the OR in
               # the oracle
               "text_search_fuzzy_multi",
               # distance-2 fuzzy (r7): depth-2 deletion index; word
               # salad plants distance-2 neighbors of 'jion' at random
               # (e.g. 'join' itself); completeness of the deletion
               # lemma at d=2 is exactly what the oracle's brute-force
               # levenshtein cross-checks
               "text_search_fuzzy2",
               # combined shape (r8): ≥2 terms at distance 2 — both
               # depth-2 neighborhoods resolve in one probe; word salad
               # plants distance-≤2 neighbors of 'jion'/'scna' at random
               "text_search_fuzzy2_multi",
               # fuzzy + ranking composition (r8): the resolved
               # neighborhood feeds the TF-IDF top-k; word salad plants
               # multi-term neighborhoods so idf differentiates ranks
               "text_search_fuzzy_ranked",
               # cross-encoder rerank boundary: unicode corpora pin the
               # ord()/ascii() code-point equivalence of the fake scorer
               "rerank_cross_encoder",
               # r6 fifth session: the persisted-inverted-index search
               # paths ('join' is in VOCAB → ranked returns rows; the
               # conjunctive default is empty on this vocab — empty ==
               # empty is still a valid differential)
               "text_search_indexed", "text_search_ranked",
               # min-should-match: 2-of-4 on VOCAB tokens → real rows
               "text_search_min_should_match",
               # r12 prohibited clause: 'merge' is a VOCAB token, so
               # the NOT side excludes real docs on most draws
               "text_search_negation",
               # r12 prefix query through the vocab sidecar: salad
               # corpora carry 'join'/'joib'-family tokens, so 'jo*'
               # resolves to a draw-dependent term set
               "text_search_prefix",
               # BM25 through the same index + the norms artifact: the
               # fuzz corpora's skewed dl distribution (1-token salad
               # docs vs long planted dups) exercises the length
               # normalization the fixed testdata barely moves
               "text_search_bm25",
               # same all-history degenerate note as text_search_incremental
               "text_search_bm25_incremental",
               # late-materialized snippets: index-ranked top-k, k-row
               # text fetch; fuzz corpora exercise window clamping at
               # doc edges (1-token docs) and absent-term LEAST/NULLIF
               "text_search_snippets",
               # DSIR-style hashed-bigram importance weights: fuzz
               # corpora exercise empty/1-word docs (no features → row
               # absent in both engines) and bucket collisions
               "importance_weights_hashed",
               # phrase default ('join','key') is two VOCAB tokens →
               # word salad plants real (and back-to-back) occurrences
               "text_search_phrase",
               # r11 proximity: ('dup','join') both land in the fuzz
               # vocab; random position scatter exercises the
               # |i−j| ≤ slop bound from both sides of each anchor
               "text_search_near",
               # r11 takedown: the fixed retraction set lands on
               # different random docs each seed — the survivor-derived
               # df shift is inside the hash comparison
               "text_search_retracted",
               # ...and the BM25 leg: survivor avgdl/stats too
               "text_search_bm25_retracted",
               # incremental == full-corpus ranked SQL (fuzz corpora sit
               # entirely below INCR_DOC_MIN → all-history degenerate)
               "text_search_incremental")


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_corpus_ops_differential(spark, tmp_path, seed):
    from kstore_spark.functions import (
        corpus, dedup, lm, multimodal, sampling, similarity, text)
    from kstore_spark.plans import extended

    # rerank_cross_encoder is the one similarity-module op that reads
    # ONLY the documents table (BM25 recall + text point-gather), so it
    # fuzzes with the corpus family rather than the embeddings one
    queries = {**dedup.QUERIES, **corpus.QUERIES, **sampling.QUERIES,
               **multimodal.QUERIES, **extended.QUERIES, **lm.QUERIES,
               "rerank_cross_encoder":
                   similarity.QUERIES["rerank_cross_encoder"],
               **text.QUERIES}
    oracles = {**dedup.ORACLES, **corpus.ORACLES, **sampling.ORACLES,
               **multimodal.ORACLES, **extended.ORACLES, **lm.ORACLES,
               "rerank_cross_encoder":
                   similarity.ORACLES["rerank_cross_encoder"],
               **text.ORACLES}

    rng = random.Random(seed * 7)
    texts = _gen_corpus(seed)
    d = tmp_path / f"ccorpus{seed}"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": [rng.choice(("en", "es", "de")) for _ in texts],
            "source": [rng.choice(("s0", "s1")) for _ in texts],
            "n_chars": [len(t) for t in texts],
        }),
        str(d / "documents.parquet"),
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for op in _CORPUS_OPS:
        df = queries[op](spark, str(d))
        got = _rowset(df.columns, [tuple(r) for r in df.collect()])
        res = con.execute(oracles[op])
        exp = _rowset([c[0] for c in res.description], res.fetchall())
        assert got == exp, f"{op} diverged at seed {seed}"


@pytest.mark.parametrize("seed", (13, 29))
def test_embedding_ops_differential(spark, tmp_path, seed):
    """Random Gaussian embeddings (continuous sims → no ties): exact
    top-k (both the fold and the BLAS path), threshold near-dup, and
    the deterministic IVF variants (r6 oracle upgrade — incl. the
    incremental path, whose vec_id >= 400 increment branch is
    exercised by n=500) must match DuckDB's list_cosine_similarity
    bit-for-bit."""
    import numpy as np

    from kstore_spark.functions import similarity

    rng = np.random.default_rng(seed)
    n, dim = 500, 64
    V = rng.standard_normal((n, dim)).astype("float32")
    d = tmp_path / f"emb{seed}"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.ravel()), dim).cast(pa.list_(pa.float32())),
            # random labels exercise knn_label_vote's majority +
            # tie-break; the other ops never read the column
            "label": pa.array([int(x) % 4 for x in rng.integers(0, 4, n)],
                              pa.int32()),
        }),
        str(d / "embeddings.parquet"),
    )
    # a documents twin keyed doc_id == vec_id: random texts where the
    # hybrid_search keyword lands in ~half the docs — exercises the
    # token filter + semi-join over a random candidate set
    trng = random.Random(seed)
    texts = [
        " ".join(
            (["vector"] if trng.random() < 0.5 else ["scan"])
            + [trng.choice(("a", "b", "vectors"))]
        )
        for _ in range(n)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()), "text": texts,
            "lang": ["en"] * n, "source": ["s0"] * n,
            "n_chars": [len(t) for t in texts],
        }),
        str(d / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for op in ("sim_topk_bruteforce", "sim_topk_matmul", "embedding_neardup",
               # semantic decontamination (r8): random Gaussians make
               # the eval-vs-corpus cosine filter a real bit-equality
               # test (same guarantee embedding_neardup rides)
               "decontaminate_semantic",
               "cluster_balanced_sample", "knn_label_vote",
               # r11 MMR: the greedy is integer-ppm on both sides, so
               # random corpora only stress the pinned float seams
               # (pool ranks + ppm floors)
               "sim_mmr_diversify",
               # r11 ANN takedown: widened knobs ⇒ exact over the
               # survivors of the fixed retraction set on every draw
               "sim_ann_retracted",
               # r12 range search: threshold filter on continuous
               # Gaussian cosines — a flip needs a draw within ~1e-15
               # of RANGE_COS, the same basis as embedding_neardup
               "sim_range_search",
               "sim_ann_ivf", "sim_ann_ivf_incremental", "hybrid_search",
               # RRF fuses this corpus's BM25 list (the 'scan' RANKED
               # term lands in ~half the docs) with the cosine top-k
               "hybrid_search_indexed", "hybrid_search_rrf"):
        df = similarity.QUERIES[op](spark, str(d))
        got = _rowset(df.columns, [tuple(r) for r in df.collect()])
        res = con.execute(similarity.ORACLES[op])
        exp = _rowset([c[0] for c in res.description], res.fetchall())
        assert got == exp, f"{op} diverged at seed {seed}"
    # r11: the streaming ANN maintainer's exact SQL twin on the random
    # corpus — assignment and per-subspace argmin margins are
    # continuous Gaussian draws, orders of magnitude above engine
    # summation-order noise (the same margin basis the batch
    # assignment oracles ride)
    from kstore_spark.streaming import indexing as stream_indexing

    df = stream_indexing.QUERIES["stream_vector_assignments"](spark, str(d))
    got = _rowset(df.columns, [tuple(r) for r in df.collect()])
    res = con.execute(stream_indexing.ORACLES["stream_vector_assignments"])
    exp = _rowset([c[0] for c in res.description], res.fetchall())
    assert got == exp, f"stream_vector_assignments diverged at seed {seed}"
    # r10: the pruned ANN compositions' degeneration property, FUZZED —
    # the standing gates prove widened-knobs == brute force on the
    # testdata corpus; here the same identity must hold on every random
    # Gaussian corpus (codebook/centroid quality varies with the draw,
    # but with every vector a candidate the exact re-rank decides all
    # ranks regardless). Spark-vs-Spark equality; no DuckDB twin needed.
    truth = {tuple(r)
             for r in similarity.sim_topk_bruteforce(spark, str(d)).collect()}
    wide = similarity.N_CELLS
    for name, fn in (
        ("sim_ann_pq",
         lambda: similarity.sim_ann_pq(spark, str(d), rerank=10**9)),
        # r12: SQ8's widened-rerank degeneration on every random
        # corpus — per-draw bounds vary, the identity must not
        ("sim_ann_sq8",
         lambda: similarity.sim_ann_sq8(spark, str(d), rerank=10**9)),
        ("sim_ann_pq_kmeans",
         lambda: similarity.sim_ann_pq_kmeans(spark, str(d), rerank=10**9)),
        ("sim_ann_ivf_pq",
         lambda: similarity.sim_ann_ivf_pq(
             spark, str(d), n_probe=wide, rerank=10**9)),
        ("sim_ann_ivf_pq_res",
         lambda: similarity.sim_ann_ivf_pq_res(
             spark, str(d), n_probe=wide, rerank=10**9)),
    ):
        got = {tuple(r) for r in fn().collect()}
        assert got == truth, f"{name} degeneration diverged at seed {seed}"
    # r11: the persisted kmeans store's degeneration, fuzzed through a
    # seed-local artifact base (each random corpus trains + persists its
    # own codebooks; the store must serve brute force at widened knobs
    # whatever the trained tensor looks like)
    from kstore_spark.catalog import artifact_base

    with artifact_base(str(d / "arts")):
        got = {tuple(r) for r in similarity.sim_ann_ivf_pq_kmeans_stored(
            spark, str(d), n_probe=wide, rerank=10**9).collect()}
    assert got == truth, (
        f"sim_ann_ivf_pq_kmeans_stored degeneration diverged at seed {seed}")
    # r12: the exact-bound pruned range search must equal its brute
    # twin on every random corpus — cell radii and query-centroid
    # angles vary with the draw, the spherical-triangle bound may not
    # (a false prune surfaces as a missing row here)
    rtruth = {tuple(r)
              for r in similarity.sim_range_search(spark, str(d)).collect()}
    with artifact_base(str(d / "arts_range")):
        rgot = {tuple(r) for r in similarity.sim_range_search_pruned(
            spark, str(d)).collect()}
    assert rgot == rtruth, (
        f"sim_range_search_pruned diverged at seed {seed}")


def test_fuzzy_multi_unions_both_neighborhoods(spark):
    """VERDICT r6 item 8 pin: the 2-typo query ('joib','scam') must
    cover BOTH terms' edit-1 neighborhoods — its doc set is exactly the
    union of the single-term searches' doc sets, and on docs hit by
    only one neighborhood the occurrence counts agree (testdata corpus,
    where both typos resolve: joib→join, scam→scan)."""
    from kstore_spark.functions.text import (
        text_search_fuzzy, text_search_fuzzy_multi)

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"]: r["n_hits"]
         for r in text_search_fuzzy(spark, sf, term="joib").collect()}
    b = {r["doc_id"]: r["n_hits"]
         for r in text_search_fuzzy(spark, sf, term="scam").collect()}
    multi = {r["doc_id"]: r["n_hits"]
             for r in text_search_fuzzy_multi(spark, sf).collect()}
    assert a and b, "both typos must resolve on the testdata vocabulary"
    assert set(multi) == set(a) | set(b)
    for d, n in multi.items():
        if d in a and d not in b:
            assert n == a[d]
        elif d in b and d not in a:
            assert n == b[d]
        else:  # hit by both neighborhoods: counts add unless overlap
            assert n <= a[d] + b[d]


def test_fuzzy2_catches_transpositions_distance1_misses(spark):
    """'jion' is levenshtein-2 from 'join' (transposition): the
    distance-1 search must NOT resolve it, the depth-2 deletion index
    must; and the distance-2 neighborhood is a superset of the
    distance-1 one for the same query term."""
    from kstore_spark.functions.text import (
        _fuzzy_neighborhood, text_search_fuzzy, text_search_fuzzy2)

    sf = "/root/testdata/sf0.001"
    n1 = _fuzzy_neighborhood(spark, sf, ("jion",), 64, max_dist=1)
    n2 = _fuzzy_neighborhood(spark, sf, ("jion",), 64, max_dist=2)
    assert "join" not in n1 and "join" in n2
    assert set(n1) <= set(n2)
    d1 = {r["doc_id"] for r in
          text_search_fuzzy(spark, sf, term="jion").collect()}
    d2 = {r["doc_id"] for r in text_search_fuzzy2(spark, sf).collect()}
    assert d1 <= d2 and d2  # strictly more reachable docs at distance 2


def test_fuzzy2_multi_unions_both_neighborhoods(spark):
    """VERDICT r7 item 8 pin — the combined shape: ≥2 query terms at
    distance 2. The 2-transposition query ('jion','scna') must cover
    the union of the single-term distance-2 searches' doc sets with
    agreeing counts on single-neighborhood docs."""
    from kstore_spark.functions.text import (
        text_search_fuzzy2, text_search_fuzzy2_multi)

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"]: r["n_hits"]
         for r in text_search_fuzzy2(spark, sf, term="jion").collect()}
    b = {r["doc_id"]: r["n_hits"]
         for r in text_search_fuzzy2(spark, sf, term="scna").collect()}
    multi = {r["doc_id"]: r["n_hits"]
             for r in text_search_fuzzy2_multi(spark, sf).collect()}
    assert a and b, "both transpositions must resolve on the testdata vocab"
    assert set(multi) == set(a) | set(b)
    for d, n in multi.items():
        if d in a and d not in b:
            assert n == a[d]
        elif d in b and d not in a:
            assert n == b[d]
        else:
            assert n <= a[d] + b[d]


def test_deletion_index_caps_pathological_tokens(spark, tmp_path):
    """VERDICT r7 item 6 pin: one 1,000-char garbage token (URL /
    base64 blob — normal in crawl corpora) must NOT blow up the depth-2
    deletion-index build (~|t|²/2 ≈ 500k variant rows from a single
    explode). The cap keeps over-length terms findable at distance 0
    only — lossless for query terms within the enforced length bound —
    and the query side REJECTS terms outside that bound instead of
    silently losing recall."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.text import (
        FUZZY_MAX_TERM_LEN, _fuzzy_neighborhood, deletion_index_dir,
        text_search_fuzzy2)

    blob = "x" * 1000  # pathological crawl token
    d = tmp_path / "pathocorpus"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": [f"join the {blob}", "scan it"],
                  "lang": ["en", "en"], "source": ["s0", "s0"],
                  "n_chars": [10 + len(blob), 7]}),
        str(d / "documents.parquet"))

    idx = spark.read.parquet(deletion_index_dir(spark, str(d), 64, depth=2))
    per_term = {r["term"]: r["n"] for r in
                idx.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    assert per_term[blob] == 1  # the blob emits ONLY itself
    # short terms keep their full depth-2 expansion: 1 + |t| + C(|t|,2)
    assert per_term["join"] == 1 + 4 + 6
    # resolution through the capped index is still exact for in-bound
    # queries ('jion' → 'join'), and the blob never appears
    n2 = _fuzzy_neighborhood(spark, str(d), ("jion",), 64, max_dist=2)
    assert "join" in n2 and blob not in n2
    assert {r["doc_id"] for r in
            text_search_fuzzy2(spark, str(d), term="jion").collect()} == {0}
    # out-of-bound query terms are rejected, not silently degraded
    with pytest.raises(ValueError, match="exceed"):
        _fuzzy_neighborhood(
            spark, str(d), ("y" * (FUZZY_MAX_TERM_LEN + 1),), 64, max_dist=2)


def test_symspell_deletion_lemma_distance2():
    """The completeness lemma fuzzy2's candidate generation rests on
    (Garbe): if levenshtein(a, b) <= 2 then the <=2-deletion variant
    sets of a and b intersect — so the deletion-index probe can never
    miss a true distance-2 neighbor (false candidates are killed by the
    exact verify). Property-tested over random strings with <=2 random
    edits applied (insert / delete / substitute / adjacent transpose)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kstore_spark.functions.text import _del_variants

    alphabet = "abcdefg"

    def edit(rng, s):
        ops = ["ins", "sub", "tr"] + (["del"] if s else [])
        op = rng.choice(ops)
        if op == "ins":
            i = rng.randrange(len(s) + 1)
            return s[:i] + rng.choice(alphabet) + s[i:]
        if op == "del":
            i = rng.randrange(len(s))
            return s[:i] + s[i + 1:]
        if op == "sub" and s:
            i = rng.randrange(len(s))
            return s[:i] + rng.choice(alphabet) + s[i + 1:]
        if op == "tr" and len(s) >= 2:  # transposition = 2 edits
            i = rng.randrange(len(s) - 1)
            return s[:i] + s[i + 1] + s[i] + s[i + 2:]
        return s

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=1, max_size=10),
           st.integers(0, 2**31), st.integers(0, 2))
    def check(a, seed, n_edits):
        rng = random.Random(seed)
        b = a
        budget = n_edits
        while budget > 0:
            nxt = edit(rng, b)
            # a transposition spends both remaining edits
            cost = 2 if (len(nxt) == len(b) and nxt != b
                         and sorted(nxt) == sorted(b)
                         and sum(x != y for x, y in zip(nxt, b)) == 2) else 1
            if cost > budget:
                break
            b, budget = nxt, budget - cost
        assert _del_variants(a, 2) & _del_variants(b, 2), (a, b)

    check()


def test_python_xxh64_matches_spark(spark):
    """The driver-side bucket hash (functions/xxh.py — r12: replaces a
    one-task Spark job per index probe) must equal the engine's
    xxhash64/pmod EXACTLY, or partition pruning would silently read the
    wrong bucket and drop every posting for the affected term. Covers
    every length class of the XXH64 finalization ladder (0, <4, <8,
    8-31, >=32 bytes), multi-byte UTF-8 (the hash runs over UTF-8
    bytes, not code points), and the two live modulus values."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.text import FUZZY_BUCKETS, TOKEN_BUCKETS
    from kstore_spark.functions.xxh import bucket_of, spark_xxhash64

    cases = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
             "abcdefgh", "abcdefghi", "hello world", "x" * 13, "y" * 16,
             "z" * 31, "w" * 32, "v" * 33, "t" * 64, "s" * 100,
             "naïve", "héllo wörld",
             "日本語テスト",
             "emoji \U0001f642 test", "ship", "special", "pmod"]
    rows = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(TOKEN_BUCKETS)).alias("bt"),
        F.pmod(F.xxhash64("s"), F.lit(FUZZY_BUCKETS)).alias("bf"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["s"]) == r["h"], r["s"]
        assert bucket_of(r["s"], TOKEN_BUCKETS) == r["bt"], r["s"]
        assert bucket_of(r["s"], FUZZY_BUCKETS) == r["bf"], r["s"]
