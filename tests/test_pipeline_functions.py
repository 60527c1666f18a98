"""Recall/property gates for the approximate pipeline operators (the ones
without a SQL oracle) plus spot checks of the exact ones, at sf0.001."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r[0], r[1]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark):
    from kstore_spark.functions.dedup import dedup_ngram_jaccard

    return _pairs(dedup_ngram_jaccard(spark, SF_DIR))


def test_minhash_lsh_recall(spark, exact_pairs):
    """Every reported pair must be a true pair (verification step makes
    precision exact); recall ≥ 0.9 at the J≥0.8 threshold."""
    from kstore_spark.functions.dedup import dedup_minhash_lsh

    got = _pairs(dedup_minhash_lsh(spark, SF_DIR))
    assert got <= exact_pairs  # no false positives, ever
    assert len(got) >= 0.9 * len(exact_pairs)


def test_simhash_finds_neardups(spark, exact_pairs):
    """SimHash(hamming≤3) targets a different similarity notion than
    Jaccard, but on this corpus (planted ~0.97 near-dups) it must
    recover most of the planted pairs."""
    from kstore_spark.functions.dedup import dedup_simhash

    got = _pairs(dedup_simhash(spark, SF_DIR))
    assert len(got & exact_pairs) >= 0.8 * len(exact_pairs)


def test_ann_ivf_full_probe_is_exact(spark):
    """Probing every cell must reproduce brute-force top-k exactly — the
    IVF machinery adds no approximation beyond cell pruning."""
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf, sim_topk_bruteforce)

    truth = {tuple(r) for r in sim_topk_bruteforce(spark, SF_DIR).collect()}
    full = {tuple(r) for r in sim_ann_ivf(spark, SF_DIR, n_probe=N_CELLS).collect()}
    assert full == truth


def test_ann_ivf_partial_probe_recall(spark):
    """nprobe=4/16 on structureless random embeddings (LSH/IVF worst
    case): recall is data-dependent but must beat the 25% a random cell
    subset would give, and every reported neighbor must be a real vector
    ranked by true cosine."""
    from kstore_spark.functions.similarity import sim_ann_ivf, sim_topk_bruteforce

    truth = {(r[0], r[1]) for r in sim_topk_bruteforce(spark, SF_DIR).collect()}
    approx = {(r[0], r[1]) for r in sim_ann_ivf(spark, SF_DIR).collect()}
    assert len(approx & truth) >= 0.25 * len(truth)


def test_simhash_is_locality_sensitive(spark):
    """Property: hamming distance between planted near-dup docs is far
    below the distance between random doc pairs."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.dedup import dedup_ngram_jaccard, simhash

    sims = {r[0]: r[1] for r in simhash(spark, SF_DIR).collect()}
    near = _pairs(dedup_ngram_jaccard(spark, SF_DIR))
    if not near:
        pytest.skip("no planted near-dups at this sf")

    def ham(a, b):
        return bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1")

    near_d = sum(ham(a, b) for a, b in near) / len(near)
    ids = sorted(sims)[:40]
    rand = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:] if (a, b) not in near]
    rand_d = sum(ham(a, b) for a, b in rand) / len(rand)
    assert near_d < rand_d / 3


def test_exact_dedup_identity(spark):
    """No exact dups in the corpus ⇒ dedup_exact is the identity on ids."""
    from kstore_spark.functions.dedup import dedup_exact
    from kstore_spark.tables import table

    got = dedup_exact(spark, SF_DIR)
    assert got.count() == table(spark, SF_DIR, "documents").count()
    assert got.agg({"n_dups": "max"}).collect()[0][0] == 1
