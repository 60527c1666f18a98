"""DuckDB differentials + property pins for the round-5 additions
(dedup_cross_source, knn_label_vote, text_lm_score_trusted) at
sf0.001 — the same side-by-side the driver runs at sf0.01."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _diff(df, con, sql):
    rows = sorted(tuple(r) for r in df.collect())
    orc = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert rows == orc, (rows[:5], orc[:5])
    return rows


def test_cross_source_matches_oracle(spark, con):
    from kstore_spark.functions.dedup import (
        DEDUP_CROSS_SOURCE_SQL, dedup_cross_source, dedup_ngram_prefix)

    rows = _diff(dedup_cross_source(spark, SF_DIR), con, DEDUP_CROSS_SOURCE_SQL)
    # property pins: sources differ on every pair; pairs ⊆ the exact
    # near-dup pair graph
    assert all(sa != sb for _, _, sa, sb in rows)
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_prefix(spark, SF_DIR).collect()}
    assert {(a, b) for a, b, _, _ in rows} <= exact


def test_knn_label_vote_matches_oracle(spark, con):
    from kstore_spark.functions.similarity import (
        KNN_LABEL_VOTE_SQL, N_QUERIES, TOP_K, knn_label_vote,
        sim_topk_bruteforce)
    from kstore_spark.tables import table

    rows = _diff(knn_label_vote(spark, SF_DIR), con, KNN_LABEL_VOTE_SQL)
    assert len(rows) == N_QUERIES and all(1 <= n <= TOP_K for _, _, n in rows)
    # property pin: recount the majority from the exact top-k neighbors
    labels = {r["vec_id"]: r["label"]
              for r in table(spark, SF_DIR, "embeddings")
              .select("vec_id", "label").collect()}
    votes = {}
    for r in sim_topk_bruteforce(spark, SF_DIR).collect():
        votes.setdefault(r["query_id"], []).append(labels[r["neighbor_id"]])
    expected = {
        q: min(((-ls.count(x), x) for x in set(ls)))[1]
        for q, ls in votes.items()
    }
    assert {q: lb for q, lb, _ in rows} == expected


def test_lm_trusted_matches_oracle(spark, con):
    from kstore_spark.functions.lm import (
        TEXT_LM_SCORE_TRUSTED_SQL, text_lm_score_trusted)

    rows = _diff(text_lm_score_trusted(spark, SF_DIR), con,
                 TEXT_LM_SCORE_TRUSTED_SQL)
    assert rows  # trusted slice must cover some scoring mass


def test_incremental_dedup_matches_restricted_full(spark, con):
    """Incremental dedup (persisted index for doc_id < N, in-flight
    bands for the increment) == the full-corpus exact pairs restricted
    to increment-touching, at a sf0.001-sized split point."""
    from kstore_spark.functions.dedup import (
        DEDUP_NGRAM_SQL, dedup_minhash_incremental)

    new_min = 25
    rows = sorted(
        tuple(r)
        for r in dedup_minhash_incremental(spark, SF_DIR, new_min).collect())
    exp = sorted(con.execute(
        f"WITH p AS ({DEDUP_NGRAM_SQL}) "
        f"SELECT doc_a, doc_b FROM p WHERE doc_b >= {new_min}").fetchall())
    assert rows == exp
    assert rows  # the split must cut through some planted pairs
    # and every pair touches the increment
    assert all(b >= new_min for _, b in rows)


def test_incremental_search_matches_full(spark, con):
    """Incremental ranked search (persisted positional index for
    doc_id < N, query-side postings for the increment) must equal the
    FULL-corpus ranked search exactly — scores included, because
    history-pruned ∪ increment is the full postings for the query
    terms — at an all-history, mid-corpus, and near-all-increment
    split. (r6 addition; lives here with its incremental siblings.)"""
    from kstore_spark.functions.text import (
        text_search_incremental, text_search_ranked)

    full = sorted(tuple(r) for r in text_search_ranked(spark, SF_DIR).collect())
    assert full
    for new_min in (1, 25, 10**9):
        rows = sorted(
            tuple(r)
            for r in text_search_incremental(spark, SF_DIR,
                                             new_min=new_min).collect())
        assert rows == full, new_min


def test_incremental_bm25_matches_full_and_oracle(spark, con):
    """Incremental BM25 (bounded postings + bounded norms artifacts,
    increment postings/dl/stats-delta computed query-side) must equal
    the FULL-corpus BM25 exactly — scores included, because df, dl, N
    and total_tokens all reconstruct their full-corpus values — at an
    all-increment, mid-corpus, and all-history split; the full path
    itself is differentialed against the DuckDB scan SQL."""
    from kstore_spark.functions.text import (
        TEXT_SEARCH_BM25_SQL, text_search_bm25, text_search_bm25_incremental)

    full = _diff(text_search_bm25(spark, SF_DIR), con, TEXT_SEARCH_BM25_SQL)
    assert full
    # 0 = EMPTY history slice: the bounded norms artifact's stats row
    # has NULL total_tokens (SUM over zero rows) — pins the coalesce
    # guard in text_search_bm25_incremental (ADVICE r6)
    for new_min in (0, 1, 25, 10**9):
        rows = sorted(
            tuple(r)
            for r in text_search_bm25_incremental(
                spark, SF_DIR, new_min=new_min).collect())
        assert rows == full, new_min


def test_incremental_bm25_never_retokenizes_history(spark):
    """Every text scan in the incremental-BM25 plan must carry the
    pushed doc_id >= new_min bound — history reaches the plan only as
    the index's pruned postings + the norms artifact's (doc_id, dl)
    rows, never as a text scan."""
    from kstore_spark.functions.text import text_search_bm25_incremental

    df = text_search_bm25_incremental(spark, SF_DIR, new_min=25)
    plan = df._jdf.queryExecution().executedPlan().toString()
    text_scans = [ln for ln in plan.splitlines()
                  if "FileScan" in ln and "text#" in ln]
    assert text_scans, plan
    assert all(">= 25" in ln for ln in text_scans), text_scans


def test_incremental_search_never_retokenizes_history(spark):
    """The increment branch's documents scan must carry the pushed
    doc_id >= new_min filter — history text reaches the plan only as
    the index's pruned postings partitions, never as a text scan."""
    from kstore_spark.functions.text import text_search_incremental

    df = text_search_incremental(spark, SF_DIR, new_min=25)
    plan = df._jdf.queryExecution().executedPlan().toString()
    text_scans = [ln for ln in plan.splitlines()
                  if "FileScan" in ln and "text#" in ln]
    # the df-agg and join-back consumers each scan the increment (two
    # scans), but EVERY text scan must carry the pushed doc_id bound —
    # history text never reaches a scan
    assert text_scans, plan
    assert all(">= 25" in ln for ln in text_scans), text_scans


def test_incremental_substring_matches_restricted_full(spark, con):
    """Incremental exact substring dedup (persisted digest index for
    doc_id < N) == the full keep-first span cuts restricted to the
    increment, at a sf0.001-sized split point."""
    from kstore_spark.functions.dedup import dedup_substring_incremental
    from kstore_spark.streaming.dedup import _stream_dedup_spans_sql

    new_min = 25
    rows = sorted(
        tuple(r)
        for r in dedup_substring_incremental(spark, SF_DIR, new_min).collect())
    exp = sorted(con.execute(
        f"SELECT * FROM ({_stream_dedup_spans_sql()})"
        f" WHERE doc_id >= {new_min}").fetchall())
    assert rows == exp
    assert rows  # the split must cut through some duplicated spans
    assert all(d >= new_min for d, _ in rows)
