"""Structured Streaming tests: the windowed aggregation equals its batch
twin, and the stateful sessionizer's closed sessions agree with the batch
window formulation."""

SF_DIR = "/root/testdata/sf0.001"


def test_stream_hourly_equals_batch(spark):
    from pyspark.sql import functions as F

    from kstore_spark.streaming.windows import stream_hourly_counts
    from kstore_spark.tables import table

    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in stream_hourly_counts(spark, SF_DIR).collect()
    }
    exp = {
        (r["hour"], r["event_type"]): r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_stream_topk_trending_equals_batch(spark):
    """The streamed sliding-window top-k must equal the batch twin
    (same F.window spec + same deterministic rank) tuple-for-tuple —
    every row, not a sample, including the tie-break order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kstore_spark.streaming.windows import TRENDING_K, stream_topk_trending
    from kstore_spark.tables import table

    got = {
        (r["win_start"], r["event_type"], r["n"], r["rk"])
        for r in stream_topk_trending(spark, SF_DIR).collect()
    }
    rk = F.row_number().over(
        Window.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type")))
    exp = {
        (r["win_start"], r["event_type"], r["n"], r["rk"])
        for r in table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n",
                rk.alias("rk"))
        .filter(F.col("rk") <= TRENDING_K)
        .collect()
    }
    assert got == exp and len(got) > 0


def test_stream_sessionize_matches_batch(spark):
    """Closed streaming sessions must be a subset of the batch sessions
    with identical (user, start, count) tuples; only end-of-stream open
    sessions may be missing."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kstore_spark.streaming.sessions import GAP_SECONDS, stream_sessionize
    from kstore_spark.tables import table

    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in stream_sessionize(spark, SF_DIR).collect()
    }

    ev = table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > GAP_SECONDS), 1).otherwise(0)
    ).over(w)
    batch = (
        ev.withColumn("sid", sess)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    exp_all = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    # every user's LAST session never closes in the stream (no later event
    # pushes the watermark past its timeout) — exclude them from the
    # expectation
    from pyspark.sql import functions as F2

    last = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.withColumn(
            "rn",
            F2.row_number().over(
                Window.partitionBy("user_id").orderBy(F2.desc("session_start"))
            ),
        ).filter("rn = 1").collect()
    }
    exp_closed = exp_all - last
    # gap-closed sessions must ALL be emitted; the only extra emissions
    # allowed are last-sessions closed by the final watermark's timeout
    assert exp_closed <= got <= exp_all
    assert got - exp_closed <= last
    assert len(got) > 0


def test_stream_dedup_matches_batch_distinct(spark):
    """First-touch streaming dedup == batch COUNT(DISTINCT) per type."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.dedup import stream_dedup_counts
    from kstore_spark.tables import table

    got = {r["event_type"]: r["n_first"]
           for r in stream_dedup_counts(spark, SF_DIR).collect()}
    want = {r["event_type"]: r["n"] for r in
            table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want


def test_stream_dedup_watermark_containment(spark):
    """Watermark-bounded dedup admits each key at least once per horizon
    re-entry: n_admitted >= global distinct count, <= raw event count."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.dedup import (
        stream_dedup_counts, stream_dedup_within_watermark)
    from kstore_spark.tables import table

    wm = {r["event_type"]: r["n_admitted"]
          for r in stream_dedup_within_watermark(spark, SF_DIR).collect()}
    first = {r["event_type"]: r["n_first"]
             for r in stream_dedup_counts(spark, SF_DIR).collect()}
    raw = {r["event_type"]: r["n"] for r in
           table(spark, SF_DIR, "events")
           .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(wm) == set(first)
    for et in wm:
        assert first[et] <= wm[et] <= raw[et]


def test_stream_range_join_matches_batch(spark):
    """Keyless binned stream-stream range join over the availableNow
    backlog equals the batch inequality join pair-for-pair — the bin
    key changes WHERE state lives, never WHAT matches."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.joins import RANGE_WINDOW_S, stream_range_join
    from kstore_spark.tables import table

    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in stream_range_join(spark, SF_DIR).collect()
    )
    ev = table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("ts").alias("c_ts"))
    want = sorted(
        (r["pid"], r["cid"])
        for r in p.join(
            c,
            (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {RANGE_WINDOW_S} SECONDS"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_interval_join_matches_batch(spark):
    """Stream-stream interval join (purchase→signups within 7 days) over
    the availableNow backlog equals the batch interval join: every match
    emitted exactly once (append mode), none dropped by the watermark in
    the single-microbatch backfill."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.joins import stream_interval_join
    from kstore_spark.tables import table

    got = sorted(
        (r["purchase_id"], r["signup_id"])
        for r in stream_interval_join(spark, SF_DIR).collect()
    )
    ev = table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts"))
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"), F.col("user_id").alias("su"),
        F.col("ts").alias("s_ts"))
    want = sorted(
        (r["pid"], r["sid"])
        for r in p.join(
            s,
            (F.col("user_id") == F.col("su"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
        ).collect()
    )
    assert len(got) > 0
    assert got == want


def test_stream_hourly_approx_users_error_bound(spark):
    """The streaming HLL++ per-window distinct must be within 3*rsd of the
    exact batch distinct for every (hour, type) group, with identical
    group keys."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.windows import stream_hourly_approx_users
    from kstore_spark.tables import table

    got = {
        (r["hour"], r["event_type"]): r["n_users_approx"]
        for r in stream_hourly_approx_users(spark, SF_DIR).collect()
    }
    exact = {
        (r["hour"], r["event_type"]): r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(3 * 0.02 * n, 2), (k, got[k], n)


def test_stream_neardup_matches_batch_lsh(spark):
    """r5 exactified op: (1) the stateful candidate stage emits EXACTLY
    the batch band-collision set, independent of micro-batch boundaries
    (a pair appears when both docs share a band bucket, whether the
    partner is in state or a batch-mate); (2) after the shared
    exact-Jaccard verify, the public op is pair-for-pair equal to
    dedup_minhash_lsh — no estimator deviation left to bound."""
    from kstore_spark.functions.dedup import (
        _shingle_arrays, dedup_minhash_lsh, lsh_candidates,
        minhash_signatures)
    from kstore_spark.streaming.dedup import (
        _stream_candidates, stream_neardup_pairs)

    got_cands = {
        (r["doc_a"], r["doc_b"])
        for r in _stream_candidates(spark, SF_DIR).collect()
    }
    expected_cands = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidates(
            minhash_signatures(_shingle_arrays(spark, SF_DIR))).collect()
    }
    assert got_cands == expected_cands
    assert expected_cands  # the planted near-dups must band-collide

    got = {(r["doc_a"], r["doc_b"])
           for r in stream_neardup_pairs(spark, SF_DIR).collect()}
    batch = {(r["doc_a"], r["doc_b"])
             for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert got == batch
    assert batch  # the planted near-dups must verify


def test_stream_dedup_spans_matches_keep_first_batch(spark):
    """Streaming keep-first span dedup == the batch rule (every span
    occurrence except the digest's minimum doc's) on the backfill."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.dedup import SPAN_WIDTH, _tokens
    from kstore_spark.streaming.dedup import stream_dedup_spans

    got = {
        (r["doc_id"], r["span_pos"])
        for r in stream_dedup_spans(spark, SF_DIR).collect()
    }
    sp = (
        _tokens(spark, SF_DIR).filter(F.size("t") >= SPAN_WIDTH)
        .select(
            "doc_id",
            F.posexplode(F.expr(
                f"transform(sequence(1, size(t)-{SPAN_WIDTH}+1),"
                f" i -> sha2(array_join(slice(t, i, {SPAN_WIDTH}), ' '), 256))"
            )).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("span_pos"), "h")
    )
    mins = sp.groupBy("h").agg(F.min("doc_id").alias("m"))
    expected = {
        (r["doc_id"], r["span_pos"])
        for r in sp.join(mins, "h").filter(F.col("doc_id") > F.col("m"))
        .select("doc_id", "span_pos").collect()
    }
    assert got == expected
    assert expected


def test_span_state_retro_emits_on_late_smaller_doc():
    """The arrival-order-independence crux: when a SMALLER doc_id shows
    up in a LATER micro-batch, the previously-stored minimum's
    positions are retro-emitted and the newcomer becomes the keeper —
    so the emitted set equals the batch keep-first rule under any
    batching."""
    import pandas as pd

    from kstore_spark.streaming.dedup import _span_state

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

    st = FakeState()

    def run(batch):  # {digest: {doc: [pos...]}} -> emitted set
        rows = [
            (h, d, p)
            for h, docs in batch.items()
            for d, ps in docs.items()
            for p in ps
        ]
        pdf = pd.DataFrame(rows, columns=["h", "doc_id", "span_pos"])
        out = pd.concat(list(_span_state((0,), iter([pdf]), st)))
        return set(zip(out["doc_id"], out["span_pos"]))

    def kept():  # state as {digest: (min_doc, positions)}
        hs, min_docs, min_pos = st.get
        return {h: (m, list(ps)) for h, m, ps in zip(hs, min_docs, min_pos)}

    assert run({"h0": {5: [1, 2]}}) == set()          # first doc: stored
    assert kept()["h0"][0] == 5
    assert run({"h0": {7: [9]}}) == {(7, 9)}          # later, larger: cut
    assert run({"h0": {3: [4]}}) == {(5, 1), (5, 2)}  # SMALLER: retro-cut 5
    assert kept()["h0"] == (3, [4])
    # keeper grows, larger batch-mate cut; a SECOND digest sharing the
    # bucket keeps independent keep-first state
    assert run({"h0": {3: [6], 8: [1]}, "h1": {9: [2]}}) == {(8, 1)}
    assert kept()["h0"] == (3, [4, 6])
    assert kept()["h1"] == (9, [2])


def test_chunked_staging_is_event_time_ordered_and_reused(spark):
    """The r5 backfill guard's load-bearing invariants: chunk files are
    non-interleaving ts ranges whose mtime order IS event-time order
    (so maxFilesPerTrigger=1 replays advance the watermark and no row
    is ever late), and the staged dir is reused across calls."""
    import os

    from pyspark.sql import functions as F

    from kstore_spark.streaming.windows import _stage_ts_chunked_parquet

    path = os.path.join(SF_DIR, "events.parquet")
    stage = _stage_ts_chunked_parquet(spark, path, 4)
    parts = sorted(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet"))
    assert len(parts) > 1
    mtimes = [os.path.getmtime(os.path.join(stage, f)) for f in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    spans = [
        spark.read.parquet(os.path.join(stage, f))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
        for f in parts
    ]
    for prev, nxt in zip(spans, spans[1:]):
        assert prev["hi"] <= nxt["lo"]  # ranges never interleave
    # no rows lost or duplicated by the rewrite
    n_src = spark.read.parquet(path).count()
    assert spark.read.parquet(stage).count() == n_src
    # keyed reuse: a second call must not rewrite (same mtimes)
    again = _stage_ts_chunked_parquet(spark, path, 4)
    assert again == stage
    assert [os.path.getmtime(os.path.join(stage, f)) for f in parts] == mtimes


def test_stream_anomaly_hours_equals_batch(spark):
    """The streaming anomaly monitor is row-for-row equal to the batch
    twin: streamed hourly counts equal the batch groupBy under replay,
    and both run the shared exact-decimal flag kernel."""
    from kstore_spark.plans.analytics import events_anomaly_hours
    from kstore_spark.streaming.windows import stream_anomaly_hours

    got = {tuple(r) for r in stream_anomaly_hours(spark, SF_DIR).collect()}
    want = {tuple(r) for r in events_anomaly_hours(spark, SF_DIR).collect()}
    assert got == want and got
    assert any(r[3] for r in got) or len(got) < 50  # flags exist at scale


def test_run_to_memory_fixed_sink_reuse(spark):
    """Repeated invocations of a memory-sink streaming op reuse ONE
    fixed per-operator table (drop-then-start) instead of leaking a
    uuid-named table per call, and return identical results."""
    from kstore_spark.streaming.windows import stream_hourly_counts

    a = {tuple(r) for r in stream_hourly_counts(spark, SF_DIR).collect()}
    b = {tuple(r) for r in stream_hourly_counts(spark, SF_DIR).collect()}
    assert a == b and a
    tabs = [t.name for t in spark.catalog.listTables()
            if t.name.startswith("kstore_stream_hourly")]
    assert tabs == ["kstore_stream_hourly"]


def test_stream_token_postings_equals_batch_index(spark):
    """The streamed postings (row-local, stateless append) must be
    row-for-row equal — tf, positions, AND the p2 norms column dl — to
    the batch-built positional index, regardless of micro-batch
    boundaries (a stream-maintained index must be able to serve BM25)."""
    from kstore_spark.functions.text import token_index_dir
    from kstore_spark.streaming.dedup import _doc_stream, _run_to_parquet
    from kstore_spark.streaming.indexing import _postings_expr
    from pyspark.sql import functions as F

    stream = _doc_stream(spark, SF_DIR)
    postings = (
        stream.select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", F.size("t").cast("long").alias("dl"),
                F.explode(_postings_expr()).alias("p"))
        .select("doc_id", F.col("p.tok").alias("tok"),
                F.col("p.tf").cast("long").alias("tf"),
                F.col("p.positions").alias("positions"), "dl")
    )
    res = _run_to_parquet(postings, "stream_tokidx_pin")
    got = sorted((r["tok"], r["doc_id"], r["tf"], tuple(r["positions"]),
                  r["dl"]) for r in res.collect())
    batch = spark.read.parquet(token_index_dir(spark, SF_DIR))
    want = sorted((r["tok"], r["doc_id"], r["tf"], tuple(r["positions"]),
                   r["dl"]) for r in batch.collect())
    assert got == want and got


def test_stream_vector_assignments_equals_batch_store(spark):
    """The streamed (vec_id, cell, code) rows must equal the batch
    inverted list (ivf_pq_store_dir kind="raw") row-for-row regardless
    of micro-batch boundaries — the ANN twin of the
    stream_token_postings == batch-index pin, closing the vector
    store's lifecycle the same way (build → probe → fold → STREAMING
    maintenance)."""
    from kstore_spark.functions.similarity import ivf_pq_store_dir
    from kstore_spark.streaming.indexing import stream_vector_assignments

    got = sorted((r["vec_id"], int(r["cell"]), r["j"], r["code_j"])
                 for r in stream_vector_assignments(spark, SF_DIR).collect())
    batch = spark.read.parquet(ivf_pq_store_dir(spark, SF_DIR))
    want = sorted((r["vec_id"], int(r["cell"]), j, int(c))
                  for r in batch.collect()
                  for j, c in enumerate(r["code"]))
    assert got == want and got


def test_stream_attribution_matches_batch(spark):
    """Last-touch credited at arrival over the 4-chunk ts-ordered
    replay (state carries the touch across 3 micro-batch boundaries)
    must equal the batch window formulation exactly — same credited
    counts AND the same row-locally-truncated cents sums."""
    from kstore_spark.plans.analytics import events_attribution
    from kstore_spark.streaming.sessions import stream_attribution

    got = sorted(tuple(r) for r in
                 stream_attribution(spark, SF_DIR).collect())
    want = sorted(tuple(r) for r in
                  events_attribution(spark, SF_DIR).collect())
    assert got == want and got


def test_stream_deletion_variants_equals_batch_index(spark):
    """The stream-maintained deletion expansion must equal the batch
    deletion index's (term, variant) relation exactly (df/bucket are
    build-side bookkeeping the probe never reads), regardless of
    micro-batch boundaries — a stream-maintained fuzzy vocabulary
    serves the same neighborhood resolution as the batch artifact."""
    from kstore_spark.functions.text import deletion_index_dir
    from kstore_spark.streaming.indexing import stream_deletion_variants

    got = sorted({(r["term"], r["variant"]) for r in
                  stream_deletion_variants(spark, SF_DIR).collect()})
    batch = spark.read.parquet(deletion_index_dir(spark, SF_DIR))
    want = sorted({(r["term"], r["variant"]) for r in batch.collect()})
    assert got == want and got


def test_postings_expr_empty_token_array(spark):
    """ADVICE r7: an EMPTY token array must emit zero postings — the
    batch posexplode path emits nothing for it, and the unguarded
    sequence(0, size-1) would generate the descending [0, -1] range and
    a bogus null-token posting. Unreachable via split() today; the
    expression must match batch on every input regardless."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.indexing import _postings_expr

    df = spark.createDataFrame(
        [(0, []), (1, ["a"])], "doc_id int, t array<string>")
    got = sorted(
        (r["doc_id"], r["p"]["tok"], r["p"]["tf"], tuple(r["p"]["positions"]))
        for r in df.select(
            "doc_id", F.explode(_postings_expr()).alias("p")).collect())
    assert got == [(1, "a", 1, (0,))]


def test_postings_expr_linear_long_document(spark):
    """The r7 linear postings expression (sort + boundary split) must
    match the posexplode+groupBy derivation on a LONG document with
    heavy token repetition — group boundaries, tf, and ascending
    positions at a length/distinct ratio the corpus never shows (and
    where the old per-distinct-token shape was quadratic)."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.indexing import _postings_expr

    # 30k tokens over a 500-word vocab, deterministic
    doc = spark.range(1).select(
        F.lit(0).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(29_999)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(i), F.lit(500)).cast("string")),
        ).alias("t"))
    got = sorted(
        (r["p"]["tok"], r["p"]["tf"], tuple(r["p"]["positions"]))
        for r in doc.select(F.explode(_postings_expr()).alias("p")).collect())
    want = sorted(
        (r["tok"], r["tf"], tuple(r["positions"]))
        for r in (
            doc.select("doc_id", F.posexplode("t").alias("p", "tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.sort_array(F.collect_list("p")).cast("array<long>")
                 .alias("positions"))
        ).collect())
    assert got == want and len(got) == 500


def test_tombstone_log_idempotent_and_complete(spark):
    """The tombstone maintainer's log must contain each takedown id
    EXACTLY once even though the staged request feed carries every id
    twice across separate micro-batch files (client retries /
    multi-region fan-in) — the idempotence half of streaming DELETE.
    Completeness (no dropped request) rides the same assertion."""
    from kstore_spark.functions.similarity import RETRACT_VEC_IDS
    from kstore_spark.streaming.indexing import _tombstone_log

    log = sorted(r["doc_id"]
                 for r in _tombstone_log(spark, RETRACT_VEC_IDS,
                                         "vec").collect())
    assert log == sorted(set(RETRACT_VEC_IDS))
    # 1-file-per-trigger replay (requests crossing micro-batch
    # boundaries) == the serving path's single availableNow drain —
    # the boundary-crossing half of the pin now that the serving path
    # no longer pays one micro-batch per staged file (r12 optimization)
    log1 = sorted(r["doc_id"]
                  for r in _tombstone_log(spark, RETRACT_VEC_IDS,
                                          "vec", files_per_trigger=1
                                          ).collect())
    assert log1 == log


def test_stream_retractions_equal_batch_compaction(spark):
    """Log-served takedown == batch-rewrite takedown, both families:
    the tombstone log's anti-join serve and the physically compacted
    store (retract_ivf_pq_store / retract_token_index) must answer
    identically — the log/compaction equivalence that makes the
    streaming DELETE leg a faithful half of the Lucene applyDeletes
    design rather than a second delete semantics."""
    from kstore_spark.functions.similarity import sim_ann_retracted
    from kstore_spark.functions.text import text_search_retracted
    from kstore_spark.streaming.indexing import (
        stream_index_retractions, stream_store_retractions)

    got = sorted(map(tuple,
                     stream_store_retractions(spark, SF_DIR).collect()))
    want = sorted(map(tuple, sim_ann_retracted(spark, SF_DIR).collect()))
    assert got == want and got
    got = sorted(map(tuple,
                     stream_index_retractions(spark, SF_DIR).collect()))
    want = sorted(map(tuple, text_search_retracted(spark, SF_DIR).collect()))
    assert got == want and got
