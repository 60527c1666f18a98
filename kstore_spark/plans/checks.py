"""Driver-visible equivalence checks for the approximate operators.

The engine's approximate operators (SimHash bands, IVF probes, media
LSH, HLL++/KLL sketches, streaming HLL) have no SQL oracle by design —
sketch internals and Spark-side hash families are engine-specific, so
a DuckDB twin cannot reproduce their values. Their correctness instead
rests on EQUIVALENCE GATES against exact twins (full-probe == brute
force, banded == brute-force hamming, estimate within the configured
error bound), which until round 5 lived only in pytest — driver
evidence stopped at a rows-only count.

This module surfaces every one of those gates as ONE oracled driver
entry (the driver window is 50 slots; one consolidated frame buys
driver-visible evidence for every gate in CHECK_NAMES — one row per
gate — at the cost of one slot).
Each gate contributes a (check_name, n_diff) row where n_diff counts
violations — symmetric-difference rows for exact-equivalence gates,
out-of-bound groups for sketch-error gates — and the DuckDB oracle is
the constant all-zeros table. This is the same acceptance shape as the
reference's test harness (reference test.sh:24-43 falls back to a
sorted diff and accepts iff it is empty).

All comparison work runs as DataFrame plans (joins/excepts/aggs over
the two sides); nothing corpus-sized is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.tables import table


# Largest documents-table size the quadratic exact twins may run at
# (sf0.1 = 5k docs is the measured ~8-min ceiling; see the guard below).
_MAX_CHECK_DOCS = 5_000


def _count_as(name: str, violations: DataFrame) -> DataFrame:
    """1-row (check_name, n_diff) frame counting ``violations`` rows."""
    return violations.agg(F.count(F.lit(1)).alias("n_diff")).select(
        F.lit(name).alias("check_name"), "n_diff")


def _symdiff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset symmetric difference of two same-schema frames."""
    b = b.select(a.columns)
    return a.exceptAll(b).union(b.exceptAll(a))


def _simhash_brute(sims: DataFrame, radius: int) -> DataFrame:
    """Brute-force hamming <= radius self-join over (doc_id, sim) — the
    exact twin of the banded ops. Quadratic by construction: this is a
    test-scale oracle (the banded ops exist so it never runs at scale)."""
    a = sims.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"))
    b = sims.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= radius)
        .select("doc_a", "doc_b")
    )


# -- per-gate builders --------------------------------------------------
# Each builder: (spark, sf_dir, ctx) -> violations DataFrame. ``ctx`` is
# a shared lazy cache: the consolidated entry computes the expensive
# helper frames (simhash signatures, brute-force top-k truth, media
# embeddings) ONCE across gates; a per-gate driver entry builds only
# what its own gate needs. Persisted helpers are tracked in
# ctx["_free"] and released after the result materializes.


def _shared(ctx, key, build):
    if key not in ctx:
        frame = build().persist()
        ctx[key] = frame
        ctx["_free"].append(frame)
    return ctx[key]


def _gate_simhash(spark, sf_dir, ctx, wide: bool = False):
    from kstore_spark.functions.dedup import (
        HAMMING_MAX, WIDE_HAMMING_MAX, dedup_simhash, dedup_simhash_wide,
        simhash)

    sims = _shared(ctx, "sims", lambda: simhash(spark, sf_dir))
    fn, radius = ((dedup_simhash_wide, WIDE_HAMMING_MAX) if wide
                  else (dedup_simhash, HAMMING_MAX))
    got = fn(spark, sf_dir)  # returns persisted
    ctx["_free"].append(got)
    return _symdiff(got, _simhash_brute(sims, radius))


def _gate_ivf(spark, sf_dir, ctx, variant: str):
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf, sim_ann_ivf_incremental, sim_ann_ivf_kmeans,
        sim_ann_ivf_stored, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    fn = {"base": sim_ann_ivf, "kmeans": sim_ann_ivf_kmeans,
          "stored": sim_ann_ivf_stored,
          "incremental": sim_ann_ivf_incremental}[variant]
    return _symdiff(fn(spark, sf_dir, n_probe=N_CELLS), truth)


def _gate_pq(spark, sf_dir, ctx):
    """PQ with the re-rank pool widened to the whole corpus IS brute
    force: table-lookup scores only choose candidates, and with every
    vector a candidate the exact-cosine re-rank decides all ranks."""
    from kstore_spark.functions.similarity import (
        sim_ann_pq, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(sim_ann_pq(spark, sf_dir, rerank=10**9), truth)


def _gate_sq8(spark, sf_dir, ctx):
    """SQ8 with the re-rank pool widened to the whole corpus IS brute
    force — same degeneration theorem as PQ: the affine 8-bit scores
    only choose candidates; with every vector a candidate the
    exact-cosine re-rank decides all ranks, whatever the per-dim
    bounds look like."""
    from kstore_spark.functions.similarity import (
        sim_ann_sq8, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(sim_ann_sq8(spark, sf_dir, rerank=10**9), truth)


def _gate_ivf_pq(spark, sf_dir, ctx):
    """IVF+PQ with BOTH approximation knobs widened — all cells probed,
    re-rank pool = corpus — IS brute force: cell pruning drops nothing
    and the exact-cosine re-rank decides every rank (the two knobs
    degenerate independently; this composition closes both at once)."""
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf_pq, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(
        sim_ann_ivf_pq(spark, sf_dir, n_probe=N_CELLS, rerank=10**9), truth)


def _gate_pq_kmeans(spark, sf_dir, ctx):
    """k-means-refined PQ (r10) with the pool widened to the corpus IS
    brute force, exactly like the first-K parent: codebooks only ORDER
    candidates, and with every vector a candidate the exact-cosine
    re-rank decides all ranks — codebook quality cannot change the
    output. Proves the refined-books path keeps a complete,
    duplicate-free candidate set."""
    from kstore_spark.functions.similarity import (
        sim_ann_pq_kmeans, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(sim_ann_pq_kmeans(spark, sf_dir, rerank=10**9), truth)


def _gate_ivf_pq_res(spark, sf_dir, ctx):
    """IVFADC-residual (r10) with both knobs widened IS brute force for
    the same reason as the raw parent: all cells probed ⇒ pruning drops
    nothing, corpus-wide re-rank ⇒ the exact-cosine pass decides every
    rank — the residual codes only ORDER the candidate pool, and a
    corpus-wide pool makes that order irrelevant. This also proves the
    q·c_cell bias + residual-LUT score produces a complete, duplicate-
    free candidate set (a bias bug that dropped or doubled a cell's
    candidates would surface here)."""
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf_pq_res, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(
        sim_ann_ivf_pq_res(spark, sf_dir, n_probe=N_CELLS, rerank=10**9),
        truth)


def _gate_ivf_pq_res_stored(spark, sf_dir, ctx):
    """The persisted RESIDUAL inverted list with both knobs widened IS
    brute force — and proves the stored (vec_id, cell, code) artifact
    carries the same assignments/residual codes the in-memory residual
    composition computes (same centroids + offset-sample codebooks by
    construction)."""
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf_pq_res_stored, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(
        sim_ann_ivf_pq_res_stored(
            spark, sf_dir, n_probe=N_CELLS, rerank=10**9),
        truth)


def _gate_ivf_pq_stored(spark, sf_dir, ctx):
    """The persisted inverted list with both knobs widened IS brute
    force too — and additionally proves the stored cell+code artifact
    carries the same assignments/codes the in-memory composition
    computes (same first-K centroids/codebooks by construction)."""
    from kstore_spark.functions.similarity import (
        N_CELLS, sim_ann_ivf_pq_stored, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    return _symdiff(
        sim_ann_ivf_pq_stored(spark, sf_dir, n_probe=N_CELLS, rerank=10**9),
        truth)


def _gate_ivf_pq_kmeans_stored(spark, sf_dir, ctx):
    """The persisted KMEANS-trained inverted list (r11), two halves in
    one violations union:
    (a) widened knobs == brute force — codebook quality cannot change
        the output when every cell is probed and every vector is a
        re-rank candidate (the degeneration theorem all PQ gates use);
    (b) default knobs: stored == sim_ann_ivf_pq(books=<the store's own
        persisted tensor>) — the serving path and an inline re-encode
        from the SAME tensor must agree row-for-row, which pins both
        the sidecar round-trip and that the store's codes really came
        from that tensor. (An inline RETRAIN comparison would be flaky
        by design: distributed Lloyd averages are not bit-reproducible
        — that is exactly why the tensor is persisted.)"""
    from kstore_spark.functions.similarity import (
        N_CELLS, ivf_pq_store_dir, load_pq_books, sim_ann_ivf_pq,
        sim_ann_ivf_pq_kmeans_stored, sim_topk_bruteforce)

    truth = _shared(ctx, "truth", lambda: sim_topk_bruteforce(spark, sf_dir))
    widened = _symdiff(
        sim_ann_ivf_pq_kmeans_stored(spark, sf_dir, n_probe=N_CELLS,
                                     rerank=10**9),
        truth)
    books = load_pq_books(spark, ivf_pq_store_dir(spark, sf_dir,
                                                  kind="kmeans"))
    equal_knobs = _symdiff(
        sim_ann_ivf_pq_kmeans_stored(spark, sf_dir),
        sim_ann_ivf_pq(spark, sf_dir, books=books))
    return widened.union(equal_knobs)


def _gate_multimodal(spark, sf_dir, ctx):
    from kstore_spark.functions.multimodal import (
        MEDIA_BANDS, MEDIA_NEARDUP_COS, MEDIA_ROWS, binary_payloads,
        media_embeddings)
    from kstore_spark.functions.similarity import _cosine, neardup_lsh_pairs

    emb = _shared(ctx, "media_emb",
                  lambda: media_embeddings(binary_payloads(spark, sf_dir)))
    lsh = neardup_lsh_pairs(emb, MEDIA_NEARDUP_COS,
                            bands=MEDIA_BANDS, rows=MEDIA_ROWS)
    ctx["_free"].append(lsh)
    ma = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    mb = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    media_brute = (
        ma.join(mb, F.col("vec_a") < F.col("vec_b"))
        .filter(_cosine(F.col("va"), F.col("vb")) > MEDIA_NEARDUP_COS)
        .select("vec_a", "vec_b")
    )
    return lsh.exceptAll(media_brute)


def _gate_approx_distinct(spark, sf_dir, ctx):
    from kstore_spark.functions.sketches import (
        events_approx_distinct, events_distinct_users)

    exact_d = events_distinct_users(spark, sf_dir).select(
        "event_type", "n_users", F.col("n_events").alias("ne_x"))
    approx_d = events_approx_distinct(spark, sf_dir).select(
        "event_type", "n_users_approx", F.col("n_events").alias("ne_a"))
    return exact_d.join(approx_d, "event_type", "full").filter(
        F.col("n_users").isNull() | F.col("n_users_approx").isNull()
        | (F.col("ne_x") != F.col("ne_a"))
        | (10 * F.abs(F.col("n_users_approx") - F.col("n_users"))
           > F.greatest(F.lit(10), F.col("n_users")))
    )


def _gate_approx_quantiles(spark, sf_dir, ctx):
    from kstore_spark.functions.sketches import (
        PCTL_ACCURACY, events_approx_quantiles)

    q = events_approx_quantiles(spark, sf_dir)
    melted = q.select(
        "event_type", "n_events",
        F.expr("stack(3, 50, p50, 90, p90, 99, p99) AS (pq, qv)"))
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    # With ties the returned value qv occupies the whole rank interval
    # [n_lt+1, n_le]; a correct approx quantile only needs that interval
    # to INTERSECT [p/100 - eps, p/100 + eps] — testing n_le alone flags
    # correct results whose value has multiplicity > the eps tolerance
    # near the target rank (r5 ADVICE).  Violation iff the interval lies
    # entirely below (n_le/N < p - eps) or entirely above (n_lt/N > p+eps).
    ranks = (
        melted.join(ev, "event_type")
        .groupBy("event_type", "pq", "qv", "n_events")
        .agg(F.sum(F.when(F.col("value") <= F.col("qv"), 1)
                   .otherwise(0)).alias("n_le"),
             F.sum(F.when(F.col("value") < F.col("qv"), 1)
                   .otherwise(0)).alias("n_lt"))
    )
    eps = F.lit(1.0 / PCTL_ACCURACY) + F.lit(1.0) / F.col("n_events")
    target = F.col("pq") / F.lit(100.0)
    return ranks.filter(
        (F.col("n_le") / F.col("n_events") < target - eps)
        | (F.col("n_lt") / F.col("n_events") > target + eps))


def _gate_stream_hll(spark, sf_dir, ctx):
    from kstore_spark.streaming.windows import stream_hourly_approx_users

    got_h = stream_hourly_approx_users(spark, sf_dir)
    exact_h = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    return got_h.join(exact_h, ["hour", "event_type"], "full").filter(
        F.col("n").isNull() | F.col("n_users_approx").isNull()
        | (10 * F.abs(F.col("n_users_approx") - F.col("n"))
           > F.greatest(F.lit(20), F.col("n")))
    )


def _gate_bpe_merges(spark, sf_dir, ctx):
    """Spark's vocab-sized BPE training loop == the driver-side Python
    reference on the collected word-frequency table (vocab-bounded
    collect — the same boundary the training loop's own 1-row-per-round
    argmax uses; corpus size is irrelevant past the one word count)."""
    from kstore_spark.functions.bpe import (
        N_MERGES, _word_freqs, bpe_learn_merges, py_bpe_reference)

    wf = _shared(ctx, "bpe_wf", lambda: _word_freqs(spark, sf_dir))
    freqs = {r["word"]: r["f"] for r in wf.collect()}
    merges, syms = py_bpe_reference(freqs, N_MERGES)
    ctx["bpe_syms"] = syms
    exp = spark.createDataFrame(
        merges, "merge_rank int, sym_a string, sym_b string, n long")
    return _symdiff(bpe_learn_merges(spark, sf_dir, N_MERGES), exp)


def _gate_bpe_token_counts(spark, sf_dir, ctx):
    """bpe_token_counts == per-doc sums of the Python reference's
    encoded word lengths (the per-word table is vocab-bounded and
    broadcast; the per-doc summation stays a Spark plan)."""
    from kstore_spark.functions.bpe import (
        N_MERGES, _word_freqs, bpe_token_counts, py_bpe_reference)

    if "bpe_syms" not in ctx:
        wf = _shared(ctx, "bpe_wf", lambda: _word_freqs(spark, sf_dir))
        _, ctx["bpe_syms"] = py_bpe_reference(
            {r["word"]: r["f"] for r in wf.collect()}, N_MERGES)
    enc = spark.createDataFrame(
        [(w, len(s)) for w, s in ctx["bpe_syms"].items()],
        "word string, enc_len long")
    exp = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(F.sum("enc_len").cast("long").alias("n_bpe_tokens"))
    )
    return _symdiff(bpe_token_counts(spark, sf_dir, N_MERGES), exp)


GATES = {
    "dedup_simhash": lambda s, d, c: _gate_simhash(s, d, c, wide=False),
    "dedup_simhash_wide": lambda s, d, c: _gate_simhash(s, d, c, wide=True),
    "sim_ann_ivf": lambda s, d, c: _gate_ivf(s, d, c, "base"),
    "sim_ann_ivf_kmeans": lambda s, d, c: _gate_ivf(s, d, c, "kmeans"),
    "sim_ann_ivf_stored": lambda s, d, c: _gate_ivf(s, d, c, "stored"),
    "sim_ann_ivf_incremental":
        lambda s, d, c: _gate_ivf(s, d, c, "incremental"),
    "sim_ann_pq": _gate_pq,
    "sim_ann_sq8": _gate_sq8,
    "sim_ann_pq_kmeans": _gate_pq_kmeans,
    "sim_ann_ivf_pq": _gate_ivf_pq,
    "sim_ann_ivf_pq_res": _gate_ivf_pq_res,
    "sim_ann_ivf_pq_res_stored": _gate_ivf_pq_res_stored,
    "sim_ann_ivf_pq_stored": _gate_ivf_pq_stored,
    "sim_ann_ivf_pq_kmeans_stored": _gate_ivf_pq_kmeans_stored,
    "multimodal_neardup": _gate_multimodal,
    "events_approx_distinct": _gate_approx_distinct,
    "events_approx_quantiles": _gate_approx_quantiles,
    "stream_hourly_approx_users": _gate_stream_hll,
    "bpe_learn_merges": _gate_bpe_merges,
    "bpe_token_counts": _gate_bpe_token_counts,
}


def _guard(spark, sf_dir) -> None:
    # Guard: the exact twins are deliberately quadratic (brute hamming /
    # brute cosine self-joins) — a test-scale oracle, not a scale path.
    # sf0.01 (500 docs) is the intended operating point; sf0.1 already
    # costs ~8 min (PERF.md). Refuse anything bigger so nobody points
    # this at a production SF_DIR by accident.
    import os
    n_docs = table(spark, sf_dir, "documents").count()
    if n_docs > _MAX_CHECK_DOCS and not os.environ.get(
            "KSTORE_ALLOW_LARGE_CHECKS"):
        raise ValueError(
            f"equivalence checks run O(n^2) exact twins; "
            f"{sf_dir} has {n_docs} documents (> {_MAX_CHECK_DOCS}). "
            "Set KSTORE_ALLOW_LARGE_CHECKS=1 to force.")


def _run_gates(spark: SparkSession, sf_dir: str, names) -> DataFrame:
    _guard(spark, sf_dir)
    ctx: dict = {"_free": []}
    parts = [_count_as(n, GATES[n](spark, sf_dir, ctx)) for n in names]
    res = parts[0]
    for p in parts[1:]:
        res = res.union(p)
    res = res.persist()
    res.count()  # materialize the one-row-per-gate result, then free helpers
    for frame in ctx["_free"]:  # cache (signatures, truth ranks, embeddings)
        frame.unpersist()
    return res


def approx_equivalence_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, n_diff) — one row per approximate-op equivalence
    gate, all of which must be zero:

    - dedup_simhash / dedup_simhash_wide: banded output == brute-force
      hamming <= 7 / <= 3 pairs (pigeonhole recall is a theorem at
      radius <= bands-1; verification is exact popcount, so equality —
      not containment — is required).
    - sim_ann_ivf / sim_ann_ivf_kmeans / sim_ann_ivf_stored /
      sim_ann_ivf_incremental: probing ALL cells == exact brute-force
      top-k (the IVF machinery — incl. the cell-partitioned store +
      dynamic partition pruning, and the history-store + increment
      union — adds no approximation beyond cell pruning).
    - sim_ann_pq: product-quantized top-k with the re-rank pool
      widened to the whole corpus == brute force (the compressed
      scores only pick candidates; exact re-rank decides ranks).
    - sim_ann_ivf_pq (r9): the IVF+PQ composition with all cells
      probed AND the pool widened == brute force (both knobs closed
      at once — cell pruning drops nothing, re-rank decides all).
    - sim_ann_ivf_pq_stored (r9): the persisted inverted list
      (cell-partitioned codes) under the same widened knobs == brute
      force — also proves the stored assignments/codes match the
      in-memory composition's.
    - sim_ann_pq_kmeans (r10): PQ with k-means-refined codebooks,
      pool widened == brute force — codebook quality cannot change
      the output when every vector is a candidate.
    - sim_ann_ivf_pq_res (r10): the IVFADC-residual composition,
      both knobs widened == brute force — also proves the q·c_cell
      bias + residual-LUT score keeps a complete, duplicate-free
      candidate set.
    - sim_ann_ivf_pq_res_stored (r10): the persisted RESIDUAL
      inverted list under widened knobs == brute force — also proves
      the stored residual assignments/codes match the in-memory
      residual composition's.
    - sim_ann_ivf_pq_kmeans_stored (r11): the persisted KMEANS-trained
      inverted list — widened knobs == brute force, AND at default
      knobs stored == inline re-encode from the store's own persisted
      codebook tensor (see _gate_ivf_pq_kmeans_stored for why the
      inline side loads rather than retrains).
    - multimodal_neardup: LSH pairs ⊆ brute-force cosine pairs over
      the same media embeddings (precision is exact by the cosine
      verify; recall is the probabilistic part, pinned on planted
      payloads in pytest).
    - events_approx_distinct: HLL++ per-type estimate within
      max(1, 10%) of the exact distinct count, exact row counts equal.
    - events_approx_quantiles: each reported quantile's true rank
      interval within the percentile_approx guarantee
      (1/accuracy + one value).
    - stream_hourly_approx_users: the streaming HLL++ per-window
      estimate within max(2, 10%) of the exact batch distinct, with
      identical group keys.
    - bpe_learn_merges / bpe_token_counts: the iterative (hence
      non-SQL) BPE training loop == the driver-side Python reference
      on the collected vocab (merge table row-for-row; per-doc subword
      counts via the reference's encoded word lengths).

    Each pre-r9 gate also earned its own ``check_<name>`` driver row
    in r7 (all 13 then-extant gates green — CORRECTNESS_r07; the five
    r9/r10 ANN-composition gates joined this consolidated entry
    directly). Per VERDICT r7 item 3 the split
    entries are now folded back out of the driver surface: this
    consolidated entry is the standing per-round evidence (one window
    slot for all gates), the splits stay importable via
    ``single_gate_query`` and run every session through
    tests/test_checks.py's consolidated all-zeros pin (same GATES
    builders, so the split and the fold cannot diverge).
    """
    return _run_gates(spark, sf_dir, CHECK_NAMES)


def single_gate_query(name: str):
    """Build a one-gate callable (used by tests/examples to exercise a
    single equivalence gate in isolation; no longer a driver entry —
    each earned its green r7 row and was folded per VERDICT r7 item 3)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run_gates(spark, sf_dir, (name,))
    q.__name__ = f"check_{name}"
    q.__doc__ = (f"Single-gate query for the {name!r} equivalence "
                 "gate — see approx_equivalence_checks.")
    return q


CHECK_NAMES = (
    "dedup_simhash", "dedup_simhash_wide", "sim_ann_ivf",
    "sim_ann_ivf_kmeans", "sim_ann_ivf_stored", "sim_ann_ivf_incremental",
    "sim_ann_pq", "sim_ann_sq8", "sim_ann_pq_kmeans", "sim_ann_ivf_pq",
    "sim_ann_ivf_pq_res", "sim_ann_ivf_pq_res_stored",
    "sim_ann_ivf_pq_stored", "sim_ann_ivf_pq_kmeans_stored",
    "multimodal_neardup",
    "events_approx_distinct", "events_approx_quantiles",
    "stream_hourly_approx_users",
    "bpe_learn_merges", "bpe_token_counts",
)

APPROX_CHECKS_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"('{n}', CAST(0 AS BIGINT))" for n in CHECK_NAMES
) + ") t(check_name, n_diff)"


QUERIES = {
    "approx_equivalence_checks": approx_equivalence_checks,
}

ORACLES = {
    "approx_equivalence_checks": APPROX_CHECKS_SQL,
}
