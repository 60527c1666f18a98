"""Planted-data and property tests for the corpus-level curation
operators (functions/corpus.py). Value-level equality with DuckDB is
covered by the oracle gate; these pin the semantics on corpora where the
right answer is known by construction.
"""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

BOILER = "b0 b1 b2 b3 b4 b5"  # one full passage at width=6


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Four docs, passage boundaries aligned to width=6: the BOILER
    passage appears in docs 0,1,2 (>= min_docs=3); doc 3 is unique; doc
    2 is *only* boilerplate and must survive as an empty string."""
    texts = {
        0: BOILER + " " + "a0 a1 a2 a3 a4 a5",
        1: "c0 c1 c2 c3 c4 c5" + " " + BOILER,
        2: BOILER,
        3: "d0 d1 d2 d3 d4 d5",
    }
    path = str(tmp_path_factory.mktemp("corpus"))
    spark.createDataFrame(
        [(i, t, "en", "planted") for i, t in texts.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(path + "/documents.parquet")
    return path


def test_dedup_passages_strips_planted_boilerplate(spark, planted):
    from kstore_spark.functions.corpus import dedup_passages

    got = {r["doc_id"]: r for r in dedup_passages(spark, planted).collect()}
    assert got[0]["clean_text"] == "a0 a1 a2 a3 a4 a5"
    assert got[1]["clean_text"] == "c0 c1 c2 c3 c4 c5"
    assert got[2]["clean_text"] == ""  # all-boilerplate doc kept, emptied
    assert got[3]["clean_text"] == "d0 d1 d2 d3 d4 d5"
    for i, (n_p, n_r) in {0: (2, 1), 1: (2, 1), 2: (1, 1), 3: (1, 0)}.items():
        assert (got[i]["n_passages"], got[i]["n_removed"]) == (n_p, n_r)


def test_dedup_passages_short_final_chunk(spark, planted):
    """A passage shorter than the width (final chunk) still counts and
    still dedups — width=4 misaligns every boundary in the planted
    corpus, so n_passages must be ceil(tokens/4) for every doc."""
    from kstore_spark.functions.corpus import dedup_passages

    got = {r["doc_id"]: r["n_passages"]
           for r in dedup_passages(spark, planted, width=4).collect()}
    assert got == {0: 3, 1: 3, 2: 2, 3: 2}


def test_corpus_mixture_partitions_the_corpus(spark):
    """Strata tile the corpus exactly: doc counts sum to the table size
    and token shares sum to 1 (each share a single double division)."""
    from kstore_spark.functions.corpus import corpus_mixture
    from kstore_spark.tables import table

    rows = corpus_mixture(spark, SF_DIR).collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert math.isclose(sum(r["token_share"] for r in rows), 1.0,
                        rel_tol=1e-9)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_tfidf_ranks_are_deterministic(spark):
    """Per doc: ranks are contiguous from 1, ordered by score_ppm desc
    then term asc — the integer-ppm scoring leaves no float ties for the
    oracle to disagree on."""
    from kstore_spark.functions.corpus import TFIDF_K, tfidf_top_terms

    by_doc = {}
    for r in tfidf_top_terms(spark, SF_DIR).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= TFIDF_K
        keys = [(-r["score_ppm"], r["term"]) for r in rows]
        assert keys == sorted(keys)
        for r in rows:
            assert r["score_ppm"] == (r["tf"] * 1_000_000) // r["df"]


def test_temperature_sample_rebalances(spark):
    """α=0.5 must flatten the mixture: for any two strata, the weight
    ratio is the sqrt of the token-share ratio — small strata gain
    relative weight. The realized sample must be deterministic, never
    exceed a stratum's natural size, and land near the global target.
    (Per-stratum realized fractions are 0-or-1 noise for the 1-doc
    strata at this sf, so the flattening check runs on the weights.)"""
    from kstore_spark.functions.corpus import (
        TEMP_TARGET_PPM, corpus_temperature_sample, corpus_temperature_weights)

    wts = corpus_temperature_weights(spark, SF_DIR).collect()
    by_tokens = sorted(wts, key=lambda r: r["n_tokens"])
    small, big = by_tokens[0], by_tokens[-1]
    assert small["n_tokens"] < big["n_tokens"]
    # flattening: w_small/w_big ≈ sqrt(share_small/share_big) > share ratio
    ratio_w = small["weight_ppm"] / big["weight_ppm"]
    ratio_share = small["n_tokens"] / big["n_tokens"]
    assert ratio_share < ratio_w < 1.0
    assert abs(ratio_w - ratio_share ** 0.5) < 0.01

    a = {r["doc_id"] for r in corpus_temperature_sample(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in corpus_temperature_sample(spark, SF_DIR).collect()}
    assert a == b and a
    sizes = {(r["source"], r["lang"]): r["n_docs"] for r in wts}
    kept: dict = {}
    for r in corpus_temperature_sample(spark, SF_DIR).collect():
        k = (r["source"], r["lang"])
        kept[k] = kept.get(k, 0) + 1
    for k, n in kept.items():
        assert n <= sizes[k]
    total = sum(sizes.values())
    assert 0.5 * TEMP_TARGET_PPM / 1e6 <= len(a) / total <= 1.6 * TEMP_TARGET_PPM / 1e6


def test_corpus_trigrams_mass_conservation(spark):
    """Unlimited trigram counts sum to Σ_doc max(0, n_tokens − 2) —
    every in-doc window counted once, short docs contribute nothing —
    and the shipped top-k is the prefix of the full (n desc, trigram)
    ordering."""
    from kstore_spark.functions.corpus import TRIGRAM_K, corpus_trigrams
    from kstore_spark.tables import table

    full = corpus_trigrams(spark, SF_DIR, k=1_000_000_000).collect()
    docs = table(spark, SF_DIR, "documents")
    lens = docs.select(F.size(F.split("text", " ")).alias("n")).collect()
    assert sum(r["n"] for r in full) == sum(max(0, r["n"] - 2) for r in lens)
    assert all(len(r["trigram"].split(" ")) == 3 for r in full)

    order = sorted(((-r["n"], r["trigram"]) for r in full))
    top = [(-r["n"], r["trigram"]) for r in corpus_trigrams(spark, SF_DIR).collect()]
    assert top == order[: min(TRIGRAM_K, len(full))]


def test_ngram_novelty_bounds_and_duplicates(spark):
    """Novelty is scored exactly for the >=3-token docs, bounded in
    [0, 1e6] ppm, and a doc with an exact text duplicate has zero novel
    trigrams (its trigram set is shared verbatim)."""
    from kstore_spark.functions.corpus import text_ngram_novelty
    from kstore_spark.tables import table

    out = {r["doc_id"]: r for r in text_ngram_novelty(spark, SF_DIR).collect()}
    docs = table(spark, SF_DIR, "documents")
    eligible = {
        r["doc_id"]
        for r in docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id").collect()
    }
    assert set(out) == eligible
    for r in out.values():
        assert 0 <= r["n_novel"] <= r["n_trigrams"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000

def test_ngram_novelty_planted_extremes(spark, tmp_path):
    """Exact duplicates share every trigram (novelty 0); a doc over a
    private vocabulary is fully novel (novelty 1e6); a 2-token doc is
    not scored."""
    from kstore_spark.functions.corpus import text_ngram_novelty

    texts = {
        0: "a b c d",      # exact duplicate of 1
        1: "a b c d",
        2: "p q r s t",    # private vocabulary → fully novel
        3: "a b",          # too short to score
    }
    path = str(tmp_path / "nv")
    spark.createDataFrame(
        [(i, t, "en", "s0") for i, t in texts.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(path + "/documents.parquet")

    out = {r["doc_id"]: r for r in text_ngram_novelty(spark, path).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_novel"] == 0 and out[0]["novelty_ppm"] == 0
    assert out[1]["n_novel"] == 0
    assert out[2]["novelty_ppm"] == 1_000_000
    assert out[2]["n_novel"] == out[2]["n_trigrams"] == 3


def test_rag_context_indexed_equals_scan_path(spark):
    """The chunk-index access path must return EXACTLY the scan path's
    contexts (same ranking, same neighbor stitch) — the index changes
    where the postings come from, never the answer."""
    from kstore_spark.functions.corpus import rag_context, rag_context_indexed

    scan = {tuple(r) for r in rag_context(spark, SF_DIR).collect()}
    idx = {tuple(r) for r in rag_context_indexed(spark, SF_DIR).collect()}
    assert idx == scan
    assert len(idx) == 10


def test_rag_context_indexed_unknown_terms_empty(spark):
    """Query terms hashing to absent buckets short-circuit to an
    exactly-empty result without listing the index directory."""
    from kstore_spark.functions.corpus import rag_context_indexed

    out = rag_context_indexed(
        spark, SF_DIR, terms=("zzznotaterm", "qqqalsonot"))
    assert out.count() == 0


def test_dedup_soft_weights_lsh_equals_exact(spark):
    """LSH-fed soft weights == exact-pair soft weights on the shipped
    testdata (the recall-1.0 pair-graph equivalence that backs
    dedup_keep_best_lsh extends to the weighting core unchanged)."""
    from kstore_spark.functions.dedup import (
        dedup_soft_weights, dedup_soft_weights_lsh)

    exact = {tuple(r) for r in dedup_soft_weights(spark, SF_DIR).collect()}
    lsh = {tuple(r) for r in dedup_soft_weights_lsh(spark, SF_DIR).collect()}
    assert lsh == exact
    # planted duplicates ⇒ at least one down-weighted doc; singletons 1e6
    weights = {w for _, w in exact}
    assert 1_000_000 in weights and any(w < 1_000_000 for w in weights)


def test_rag_context_indexed_duplicate_terms_match_scan(spark):
    """r9 review regression: a DUPLICATED query term must double its
    occurrences' weight in both paths (the scan path scores per term
    INSTANCE; the index path weights tf by term multiplicity) — a bare
    isin() on the postings would silently dedupe and re-rank."""
    from kstore_spark.functions.corpus import rag_context, rag_context_indexed

    terms = ("merge", "merge", "join")
    scan = {tuple(r) for r in rag_context(spark, SF_DIR, terms=terms).collect()}
    idx = {tuple(r) for r in
           rag_context_indexed(spark, SF_DIR, terms=terms).collect()}
    assert idx == scan and len(idx) == 10
