"""Round-4 second-wave operators: binned range join, bigram-LM quality
scoring, per-source quota capping, deterministic weighted sampling.

Each op's DuckDB oracle is the driver's gate; these tests pin the
engine-side properties the oracle can't see — plan shape (no nested
loop), equality with the naive formulation, determinism, and the
behavioral guarantees (quota bounds, weight monotonicity)."""

from pyspark.sql import functions as F

from kstore_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- binned range join -------------------------------------------------

def test_range_join_matches_naive_inequality_join(spark):
    """The binned equi-join rewrite must return exactly what the naive
    inequality join returns (bin candidacy is a superset of containment;
    the exact filter decides)."""
    from kstore_spark.plans.ranges import RANGE_WINDOW_S, events_range_join

    ev = table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
    naive = (
        p.join(
            c,
            (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {RANGE_WINDOW_S} SECONDS"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks"),
             F.max("click_id").alias("last_click_id"))
    )
    got = {tuple(r) for r in events_range_join(spark, SF_DIR).collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point of the binned rewrite: the plan must contain NO
    BroadcastNestedLoopJoin / CartesianProduct (what the naive keyless
    inequality join compiles to) — every join is a bin-keyed equi-join,
    so AQE/skew handling apply and candidates stay bin-bounded."""
    from kstore_spark.plans.ranges import events_range_join

    plan = _plan(events_range_join(spark, SF_DIR))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_interval_covers_exactly_two_bins(spark):
    """With bin width == interval length, each interval explodes to
    exactly 2 bin rows — the duplication factor the docstring promises
    (candidate volume is 2x|intervals| join-keyed rows, not |p|x|c|)."""
    from kstore_spark.plans.ranges import binned_range_join

    iv = spark.range(1).select(
        F.lit(7).alias("iid"),
        F.to_timestamp(F.lit("2024-01-01 10:30:00")).alias("s"),
        F.to_timestamp(F.lit("2024-01-01 11:30:00")).alias("e"),
    )
    pt = spark.range(1).select(
        F.lit(1).alias("pid"),
        F.to_timestamp(F.lit("2024-01-01 11:00:00")).alias("ts"),
    )
    # expose candidate count by joining a point that hits one bin
    cands = binned_range_join(pt, iv, "ts", "s", "e", 3600)
    assert cands.count() == 1  # point bin 11:00 ∈ {10:xx, 11:xx} once
    # interval alone explodes to exactly two bins
    bins = iv.select(
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("s") / 3_600_000_000),
                F.floor(F.unix_micros("e") / 3_600_000_000),
            )
        )
    )
    assert bins.count() == 2


# -- bigram LM scoring -------------------------------------------------

def test_lm_score_bounds_and_bigram_counts(spark):
    """Scores are exact-ppm probabilities: 0 < score <= 1e6 (every
    observed bigram has count >= 1 so probability > 0), and a doc's
    n_bigrams is exactly its token count - 1."""
    from kstore_spark.functions.lm import text_lm_score

    scored = text_lm_score(spark, SF_DIR)
    toks = table(spark, SF_DIR, "documents").select(
        "doc_id", (F.size(F.split("text", " ")) - 1).cast("long").alias("want"))
    rows = scored.join(toks, "doc_id").collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["lm_score_ppm"] <= 1_000_000
        assert r["n_bigrams"] == r["want"]


def test_lm_score_ranks_repetition_above_shuffle(spark, tmp_path):
    """Monotonicity sanity on a controlled corpus: a document that
    repeats one bigram scores the ppm ceiling; a document of the same
    vocabulary in an unseen-bigram-rich order scores strictly lower."""
    d = tmp_path / "lmtest"
    spark.createDataFrame(
        [
            (1, "a b a b a b a b", "en", "s", 15),
            (2, "b b a a b a b b", "en", "s", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from kstore_spark.functions.lm import text_lm_score

    got = {r["doc_id"]: r["lm_score_ppm"] for r in text_lm_score(spark, str(d)).collect()}
    assert got[1] > got[2]


def test_lm_buckets_are_balanced_per_lang(spark):
    """NTILE property: per language, bucket sizes differ by at most 1
    and bucket 1 holds the highest scores (head = most predictable)."""
    from kstore_spark.functions.lm import N_BUCKETS, text_lm_buckets, text_lm_score

    rows = text_lm_buckets(spark, SF_DIR).collect()
    scores = {r["doc_id"]: r["lm_score_ppm"]
              for r in text_lm_score(spark, SF_DIR).collect()}
    per_lang: dict[str, dict[int, list]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            scores[r["doc_id"]])
    for lang, buckets in per_lang.items():
        sizes = [len(v) for _, v in sorted(buckets.items())]
        assert max(sizes) - min(sizes) <= 1
        assert set(buckets) <= set(range(1, N_BUCKETS + 1))
        if len(buckets) == N_BUCKETS:
            assert min(buckets[1]) >= max(buckets[N_BUCKETS])


def test_heavy_hitters_exact_vs_full_groupby(spark):
    """The candidate sketch must change NOTHING: output equals the full
    groupBy + global-share filter computed naively."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.text import HH_K, text_heavy_hitters

    toks = table(spark, SF_DIR, "documents").select(
        F.explode(F.split("text", " ")).alias("tok"))
    n = toks.count()
    want = {(r["tok"], r["cnt"]) for r in
            toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * HH_K > n).collect()}
    got = {(r["tok"], r["cnt"]) for r in text_heavy_hitters(spark, SF_DIR).collect()}
    assert got == want and len(got) > 0


# -- per-source quota cap ----------------------------------------------

def test_source_quota_cap_bounds_and_keeps_longest(spark):
    from kstore_spark.functions.sampling import QUOTA_PER_SOURCE, source_quota_cap

    kept = source_quota_cap(spark, SF_DIR).collect()
    per_src: dict[str, list] = {}
    for r in kept:
        per_src.setdefault(r["source"], []).append(r)
    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars").collect()
    all_src: dict[str, list] = {}
    for r in docs:
        all_src.setdefault(r["source"], []).append(r)
    for src, rows in all_src.items():
        want = sorted(rows, key=lambda r: (-r["n_chars"], r["doc_id"]))
        want_ids = [r["doc_id"] for r in want[:QUOTA_PER_SOURCE]]
        got = sorted(per_src.get(src, []), key=lambda r: r["rk"])
        assert [r["doc_id"] for r in got] == want_ids
        assert len(got) <= QUOTA_PER_SOURCE


# -- deterministic weighted sampling -----------------------------------

def test_sample_weighted_is_deterministic_bottom_k(spark):
    """The selection equals the brute-force bottom-k of the same integer
    priority (computed driver-side), and reruns agree exactly."""
    from kstore_spark.functions.sampling import (
        _MASK, _MIX, PPM_W, WEIGHTED_K, sample_weighted)

    docs = table(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()
    pri = sorted(
        ((((r["doc_id"] * _MIX) & _MASK) * PPM_W) // r["n_chars"], r["doc_id"])
        for r in docs
    )[:WEIGHTED_K]
    want = [(d, p) for p, d in pri]
    got1 = [(r["doc_id"], r["priority"]) for r in sample_weighted(spark, SF_DIR).collect()]
    got2 = [(r["doc_id"], r["priority"]) for r in sample_weighted(spark, SF_DIR).collect()]
    assert got1 == got2
    assert sorted(got1, key=lambda t: (t[1], t[0])) == want


def test_micros_bin_is_floor_division_including_negatives(spark):
    """The ADVICE-r4 fix: bin ids must equal mathematical floor(micros/w)
    in pure integer arithmetic — pre-epoch (negative) timestamps round
    toward -inf, never toward zero, and no double precision is involved."""
    import random

    from pyspark.sql import functions as F

    from kstore_spark.plans.ranges import micros_bin

    rng = random.Random(99)
    w = 3600 * 1_000_000
    vals = ([rng.randint(-2**62, 2**62) for _ in range(200)]
            + [0, -1, 1, w, -w, w - 1, -w + 1, 2**62, -2**62])
    df = spark.createDataFrame([(v,) for v in vals], "m long")
    got = [r["b"] for r in
           df.select(micros_bin("m", w).alias("b")).collect()]
    assert got == [v // w for v in vals]  # Python // is floor division
