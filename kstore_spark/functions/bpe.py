"""BPE tokenizer training over the ``documents`` table.

A training-data pipeline doesn't just count tokens — it trains the
tokenizer. The classic BPE recipe (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", 2016) is:

1. build the word-frequency table (ONE corpus-scale aggregation);
2. iterate on the VOCABULARY (distinct words + frequencies — orders of
   magnitude smaller than the corpus): count adjacent symbol pairs,
   merge the most frequent pair, repeat;
3. encode the corpus by applying the learned merges to each distinct
   word once and joining back.

That structure is exactly the Spark-friendly one: the corpus is
touched once for step 1 and once (join-back) for step 3; every merge
round runs on the vocab-sized relation. The merge application itself
is a row-local left-to-right fold over the symbol array
(``F.aggregate`` — codegen'd, no Python in the loop); the only driver
traffic is ONE (pair, count) row per merge round, the same bounded
boundary as the ANN query vectors.

Oracle strategy: ``bpe_pair_counts`` (the round-0 pair table, where
every symbol is a single character so a 2-char substring IS the pair)
carries an exact DuckDB SQL oracle. The iterative ops
(``bpe_learn_merges``, ``bpe_token_counts``) are genuinely
non-SQL-expressible — data-dependent merges learned at runtime — so
they are rows-only driver entries, pinned in pytest against a
pure-Python reference BPE on the same word-frequency table
(tests/test_bpe.py), our standard pattern for iterative algorithms.

Reference parity note: the reference has no tokenizer training; this
is part of the large-scale pipeline extension surface (brief §text
analysis / token counting).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kstore_spark.tables import table

PAIR_TOP_N = 20   # bpe_pair_counts output size
N_MERGES = 8      # merge rounds for the learned-merges ops


def _word_freqs(spark, sf_dir):
    """(word, f): the vocabulary-with-frequencies table — the only
    corpus-scale aggregation in BPE training."""
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def _char_pairs(word_col):
    """All adjacent character pairs of a word (overlapping, one per
    position) — valid only while symbols are single characters."""
    return F.when(
        F.length(word_col) >= 2,
        F.expr("transform(sequence(1, length(word) - 1),"
               " i -> substring(word, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(spark, sf_dir, top_n: int = PAIR_TOP_N):
    """Round-0 BPE pair statistics: the corpus-weighted frequency of
    every adjacent character pair, top-``top_n`` by (count DESC, pair)
    — the table whose argmax is the first BPE merge. Runs as
    vocab-sized work after the one corpus aggregation; exact SQL
    oracle (characters are single symbols, so the 2-char substring at
    each position IS the pair — no ambiguity yet)."""
    wf = _word_freqs(spark, sf_dir)
    pairs = (
        wf.select(F.explode(_char_pairs(F.col("word"))).alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").cast("long").alias("n"))
    )
    top = pairs.orderBy(F.col("n").desc(), F.col("pair")).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        top.withColumn("rank", F.row_number().over(w))  # top_n rows only
        .select("rank", "pair", "n")
    )


BPE_PAIR_COUNTS_SQL = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT word, COUNT(*) AS f FROM w GROUP BY word
), p AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, f
  FROM wf, LATERAL (SELECT unnest(range(1, len(word))) AS i) r
), c AS (
  SELECT pair, CAST(SUM(f) AS BIGINT) AS n FROM p GROUP BY pair
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS INT) AS rank,
       pair, n
FROM c
ORDER BY n DESC, pair
LIMIT {PAIR_TOP_N}
"""


def _chars(word_col):
    """Split a word into its single-character symbol array."""
    return F.when(
        F.length(word_col) >= 1,
        F.expr("transform(sequence(1, length(word)), "
               "i -> substring(word, i, 1))"),
    ).otherwise(F.array().cast("array<string>"))


def _sym_pairs_col():
    """(a, b) symbol pairs of a symbol array — struct-keyed, because
    after the first merge a concatenated string key would conflate
    e.g. ('ab','c') with ('a','bc')."""
    return F.expr(
        "CASE WHEN size(sym) >= 2 THEN "
        "transform(sequence(0, size(sym) - 2),"
        " i -> struct(sym[i] AS a, sym[i + 1] AS b)) "
        "ELSE CAST(array() AS array<struct<a: string, b: string>>) END"
    )


def _apply_merge(sym_col, a: str, b: str):
    """Apply ONE merge (a, b) → a||b to a symbol array: the standard
    greedy left-to-right non-overlapping pass, as a row-local
    ``F.aggregate`` fold (accumulator = (emitted symbols, pending
    symbol)); codegen'd, no Python, no explode."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        hit = acc["pend"].eqNullSafe(F.lit(a)) & (s == F.lit(b))
        out2 = (
            F.when(hit, F.concat(acc["out"], F.array(F.lit(merged))))
            .when(acc["pend"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
        )
        pend2 = F.when(hit, F.lit(None).cast("string")).otherwise(s)
        return F.struct(out2.alias("out"), pend2.alias("pend"))

    return F.aggregate(
        sym_col, init, step,
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )


def _learn(spark, sf_dir, n_merges: int):
    """Run the BPE training loop; returns (merges, final symbol table).
    merges = [(rank, a, b, count)]; one 1-row driver collect per round
    (the argmax pair — bounded driver traffic by construction).

    Action discipline (r12, guide §1.2: per-round cost here is Spark
    ACTIONS on a vocab-sized frame, not data): ONE job per round — the
    round's argmax collect scans every row of the current symbol table,
    so it MATERIALIZES that table's persist as a side effect; the
    parent generation is unpersisted only after that scan has filled
    the child's cache (unpersisting earlier would chain recomputation
    of every fold back to the corpus aggregation). The pre-r12 shape
    paid 2 jobs per round (argmax + an explicit count()) plus two
    warm-up counts — 2n+2 jobs for n rounds vs n+2 now. The final
    count() materializes the LAST generation before its parent cache
    is dropped, so consumers (bpe_token_counts' lazy join) read one
    cached table, not an n-deep fold chain."""
    wf = _word_freqs(spark, sf_dir)  # single-use: cached via syms below
    syms = wf.select("word", "f", _chars(F.col("word")).alias("sym")).persist()
    prev = None
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            syms.select(F.explode(_sym_pairs_col()).alias("p"), "f")
            .groupBy("p")
            .agg(F.sum("f").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )  # full scan of syms ⇒ its persist is materialized now
        if prev is not None:
            prev.unpersist()
            prev = None  # consumed: the argmax scan above materialized
            # syms, so a break below must not re-unpersist this frame
            # or re-count an already-materialized generation (ADVICE
            # r12 — keeps the one-job-per-round discipline exact)
        if not best:
            break
        a, b, n = best[0]["p"]["a"], best[0]["p"]["b"], best[0]["n"]
        merges.append((r, a, b, int(n)))
        prev = syms
        syms = syms.withColumn("sym", _apply_merge(F.col("sym"), a, b)).persist()
    if prev is not None:
        syms.count()  # materialize the final generation from prev's cache
        prev.unpersist()
    return merges, syms


def bpe_learn_merges(spark, sf_dir, n_merges: int = N_MERGES):
    """The learned BPE merge table: ``n_merges`` rounds of
    (most-frequent symbol pair → merge), ties broken (count DESC,
    a ASC, b ASC). Iterative and data-dependent → rows-only driver
    entry; pinned against a pure-Python reference BPE in
    tests/test_bpe.py, and at every round the merge count is the
    corpus-exact pair frequency at that round's vocabulary state."""
    merges, syms = _learn(spark, sf_dir, n_merges)
    syms.unpersist()
    return spark.createDataFrame(
        [(r, a, b, n) for r, a, b, n in merges],
        "merge_rank int, sym_a string, sym_b string, n long")


def bpe_token_counts(spark, sf_dir, n_merges: int = N_MERGES):
    """Per-document token count AFTER BPE encoding with the learned
    merges — the number a packing/budgeting stage would use with a
    subword tokenizer instead of the whitespace count. Encoding
    happens once per DISTINCT word (vocab-sized), then joins back to
    the corpus (broadcast — the encoded vocab is small); per-doc sum
    of encoded lengths. Rows-only (data-dependent merges); pinned vs
    the Python reference encode + invariants (#words ≤ n_bpe_tokens ≤
    #chars) in tests/test_bpe.py."""
    # syms stays persisted: the returned frame reads it lazily (same
    # deliberate persisted-return pattern as the dedup family; bench
    # clearCache()s between timed runs)
    _, syms = _learn(spark, sf_dir, n_merges)
    enc = syms.select("word", F.size("sym").alias("enc_len"))
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(F.sum("enc_len").cast("long").alias("n_bpe_tokens"))
    )


def py_bpe_reference(word_freqs: dict, n_merges: int):
    """Driver-side reference BPE (the equivalence-gate twin in
    plans/checks.py — vocab-bounded input, same (count DESC, a, b)
    tie-break and greedy left-to-right merge as the Spark loop).
    Returns (merges, final word→symbols dict). tests/test_bpe.py keeps
    its own independent copy on purpose."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for r in range(1, n_merges + 1):
        counts: dict = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, int(n)))
        for w, s in syms.items():
            out, pend = [], None
            for c in s:
                if pend == a and c == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = c
            if pend is not None:
                out.append(pend)
            syms[w] = out
    return merges, syms


QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_learn_merges": bpe_learn_merges,
    "bpe_token_counts": bpe_token_counts,
}

ORACLES = {
    "bpe_pair_counts": BPE_PAIR_COUNTS_SQL,
    # bpe_learn_merges / bpe_token_counts: iterative, data-dependent
    # merges — genuinely non-SQL-expressible; rows-only driver check +
    # pure-Python reference differential in tests/test_bpe.py.
}
