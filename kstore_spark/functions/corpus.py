"""Corpus-level curation operators over the ``documents`` table.

Cross-document statistics a training-data pipeline runs corpus-wide
(vs. functions/text.py, whose signals are row-local):

- passage-level boilerplate removal (the RefinedWeb/CCNet "line dedup"
  adapted to newline-free text): fixed-width token passages hashed
  across the corpus; passages recurring in >= BOILER_MIN_DOCS distinct
  docs are stripped from every doc
- corpus mixture statistics: docs/tokens (and token share) per
  (source, lang) stratum — the input to training-mix weighting
- TF-IDF distinctive terms: top-k terms per doc scored in exact
  integer arithmetic (parts-per-million), no float ordering anywhere

Scale shape: everything shuffles on fixed-size keys (passage strings,
terms, (source,lang) pairs) — document text is never a shuffle key; the
boilerplate/df side tables grow with the corpus, so join strategy is
left to AQE (broadcast while small, shuffle join at 100 TB) rather than
hard hints. All outputs are exact-integer or single-division doubles,
so every query here is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kstore_spark.tables import table

PASSAGE_W = 6        # tokens per passage (non-overlapping chunks)
BOILER_MIN_DOCS = 3  # passage in >= this many distinct docs ⇒ boilerplate

TFIDF_K = 3          # distinctive terms kept per doc
_PPM = 1_000_000     # integer score scale: score = tf * PPM div df


def _chunks(spark, sf_dir, width: int):
    """(doc_id, idx, p) — non-overlapping ``width``-token passages in
    document order. Row-local array ops (split → slice → concat) over
    the scan's own partitions — no pre-shuffle (the passage explode is
    map-side; the first shuffle in any consumer is on the passage key,
    which redistributes regardless, so a doc_id repartition here would
    just move the full text one extra time; measured 2-4× slower at
    10×)."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.floor((F.size("t") + width - 1) / width).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        # slice() is 1-based and tolerates a short final chunk
        lambda i: F.concat_ws(" ", F.slice("t", i * width + 1, width)),
    )
    return t.select("doc_id", F.posexplode(passages).alias("idx", "p"))


def dedup_passages(spark, sf_dir, width: int = PASSAGE_W,
                   min_docs: int = BOILER_MIN_DOCS):
    """Strip cross-document boilerplate passages; per doc returns the
    passage counts and the cleaned text (kept passages in original
    order). A doc whose every passage is boilerplate survives with
    clean_text = '' — curation drops it downstream, the operator never
    loses the row.

    Reference scope: the reference engine has no text operators at all
    (SURVEY.md §2.8) — this is a pipeline extension; the spiritual
    sibling is dedup_exact (functions/dedup.py) at passage granularity.
    """
    ch = _chunks(spark, sf_dir, width)
    boiler = (
        ch.groupBy("p")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("p", F.lit(1).alias("bad"))
    )
    # one left join marks boilerplate chunks; one groupBy rebuilds docs.
    # collect_list is bounded by the doc's own passage count — per-doc
    # state, never corpus-sized.
    marked = ch.join(boiler, "p", "left")
    kept = F.when(F.col("bad").isNull(), F.struct("idx", "p"))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count("bad").alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["p"]
                ),
            ).alias("clean_text"),
        )
    )


DEDUP_PASSAGES_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
ch AS (
  SELECT doc_id, i AS idx,
         array_to_string(t[(i*{PASSAGE_W}+1):(i*{PASSAGE_W}+{PASSAGE_W})], ' ') AS p
  FROM tok, LATERAL unnest(generate_series(0, (len(t)+{PASSAGE_W}-1)//{PASSAGE_W} - 1)) u(i)
),
boiler AS (
  SELECT p, 1 AS bad FROM ch GROUP BY p
  HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
)
SELECT ch.doc_id,
       COUNT(*) AS n_passages,
       COUNT(bad) AS n_removed,
       COALESCE(string_agg(CASE WHEN bad IS NULL THEN p END, ' ' ORDER BY idx), '')
         AS clean_text
FROM ch LEFT JOIN boiler USING (p)
GROUP BY ch.doc_id
"""


def corpus_mixture(spark, sf_dir):
    """Docs / tokens / token share per (source, lang) stratum — the
    statistics a mixture-weighting step consumes. One scan, one groupBy
    on a tiny key; the share's global window runs over the aggregated
    frame (|sources|x|langs| rows), not the corpus."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "source", "lang", "n_docs", "n_tokens",
        (F.col("n_tokens").cast("double") / total).alias("token_share"),
    )


CORPUS_MIXTURE_SQL = """
WITH per AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
FROM per
"""


TEMP_ALPHA_PCT = 50   # mixture temperature α as a percent (50 → α=0.5,
                      # the sqrt rebalancing multilingual training uses)
TEMP_TARGET_PPM = 400_000  # resampled corpus budget: 40% of input docs


def corpus_temperature_weights(spark, sf_dir):
    """Temperature-rebalanced mixture weights per (source, lang)
    stratum: w_i ∝ share_i^α with α=0.5 — the standard upweighting of
    low-resource strata (α=1 keeps natural proportions, α→0 goes
    uniform). α=0.5 is computed as sqrt(), bit-identical across IEEE
    engines, and weights are emitted in exact parts-per-million of the
    renormalized mixture so the driver can hash them. All arithmetic
    runs on the aggregated |sources|×|langs| frame — the corpus is
    touched by exactly one scan + one groupBy.

    The normalizer z = Σ√share is summed by an EXPLICIT left fold over
    the strata sorted by (source, lang) — not a plain SUM, whose float
    summation order is partition-dependent in Spark and engine-specific
    in DuckDB. A floor(1e6·w/z) landing within an ulp of an integer
    boundary could otherwise flip between engines or reruns (ADVICE
    r3); the fold order here matches the oracle's list_reduce exactly,
    and Spark's 0.0 seed is a no-op under IEEE (+0.0 + x == x). The
    frame is tiny, so the coalesced sort costs nothing.

    The strata frame feeds TWO consumers (the z-fold and the final
    weight projection): localCheckpoint it eagerly so the corpus scan
    + groupBy run once and both branches read the |sources|×|langs|
    materialization — without it each branch re-derives the whole
    corpus aggregation (4 scans measured)."""
    mix = corpus_mixture(spark, sf_dir)
    w = F.sqrt(F.col("token_share"))
    withw = mix.select(
        "source", "lang", "n_docs", "n_tokens", w.alias("w")
    ).localCheckpoint(eager=True)
    zdf = withw.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "lang", "w"))),
                lambda s: s["w"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z")
    )
    return withw.crossJoin(F.broadcast(zdf)).select(
        "source", "lang", "n_docs", "n_tokens",
        F.floor(F.lit(1_000_000) * F.col("w") / F.col("z"))
        .cast("long").alias("weight_ppm"),
    )


CORPUS_TEMPERATURE_SQL = f"""
WITH per AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
), sh AS (
  SELECT source, lang, n_docs, n_tokens,
         sqrt(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()) AS w
  FROM per
), norm AS (
  -- explicit left fold in (source, lang) order: bit-identical to the
  -- Spark side's F.aggregate over the array_sort'ed strata
  SELECT list_reduce(list(w ORDER BY source, lang), (a, x) -> a + x) AS z
  FROM sh
)
SELECT source, lang, n_docs, n_tokens,
       CAST(FLOOR(1000000 * w / z) AS BIGINT) AS weight_ppm
FROM sh, norm
"""


def corpus_temperature_sample(spark, sf_dir, target_ppm: int = TEMP_TARGET_PPM):
    """The resample the weights imply: doc-level deterministic sampling
    at per-stratum rates so the OUTPUT mixture follows the α=0.5
    weights while the total stays ≈ ``target_ppm`` of the input. The
    accept test is a Knuth-mix bucket of doc_id against an integer ppm
    threshold — no RNG, rerun- and engine-stable, and the per-doc work
    is one hash + one compare (the stratum-rate table is a handful of
    rows, broadcast by AQE). rate_ppm is capped at 1e6: a stratum whose
    target exceeds its natural share keeps all its docs (sampling can
    only drop — upsampling is the training loader's job)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    wts = corpus_temperature_weights(spark, sf_dir)
    # stratum target (docs) = total_docs * target_ppm * weight; rate
    # within stratum = target / n_docs — all in exact integer ppm
    total = F.sum("n_docs").over(Window.partitionBy())
    rates = wts.select(
        "source", "lang",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(total * F.col("weight_ppm") * F.lit(target_ppm)
                    / F.lit(1_000_000) / F.col("n_docs")).cast("long"),
        ).alias("rate_ppm"),
    )
    mix = (F.col("doc_id").cast("long") * F.lit(2654435761)).bitwiseAND(
        F.lit((1 << 32) - 1))
    return (
        docs.join(rates, ["source", "lang"])
        .filter(F.pmod(mix, F.lit(1_000_000)) < F.col("rate_ppm"))
        .select("doc_id", "source", "lang")
    )


CORPUS_TEMPERATURE_SAMPLE_SQL = f"""
WITH per AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
), sh AS (
  SELECT source, lang, n_docs,
         sqrt(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()) AS w
  FROM per
), norm AS (
  SELECT list_reduce(list(w ORDER BY source, lang), (a, x) -> a + x) AS z
  FROM sh
), wts AS (
  SELECT source, lang, n_docs,
         CAST(FLOOR(1000000 * w / z) AS BIGINT) AS weight_ppm
  FROM sh, norm
), rates AS (
  SELECT source, lang,
         LEAST(CAST(1000000 AS BIGINT),
               CAST(FLOOR(SUM(n_docs) OVER () * weight_ppm * {TEMP_TARGET_PPM}
                          / 1000000 / n_docs) AS BIGINT)) AS rate_ppm
  FROM wts
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN rates r ON d.source = r.source AND d.lang = r.lang
WHERE ((CAST(d.doc_id AS BIGINT) * 2654435761) & 4294967295) % 1000000 < r.rate_ppm
"""


def tfidf_top_terms(spark, sf_dir, k: int = TFIDF_K):
    """Top-k distinctive terms per doc, TF-IDF-ranked without floats:
    score_ppm = tf * 1e6 div df (exact integer division), tie-broken by
    term. Two key-shuffles (term counts, document frequency) plus a
    per-doc window — df is a corpus-sized side table, so the join is
    AQE's choice, not a broadcast hint."""
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df from tf, not from raw terms: tf rows are unique (doc, term)
    # pairs, so count(*) per term == countDistinct(doc_id) — the raw
    # terms shuffle once (map-side combined into tf) instead of twice,
    # and no two-phase distinct expansion
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score_ppm", F.expr(f"(tf * {_PPM}) div df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score_ppm")
    )


TFIDF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term
), scored AS (
  SELECT doc_id, term, tf, df, (tf * {_PPM}) // df AS score_ppm,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY (tf * {_PPM}) // df DESC, term) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, score_ppm
FROM scored WHERE rank <= {TFIDF_K}
"""


CHUNK_WIDTH = 64   # tokens per retrieval chunk
CHUNK_STRIDE = 48  # overlap = width - stride


def _chunk_frame(docs, width: int, stride: int):
    """Chunking core over a (doc_id, text) frame — shared by the
    corpus-wide chunk_documents and the winner-docs-only re-chunk in
    rag_context_indexed (where the input frame carries a pushed-down
    doc_id filter, so only k documents are ever tokenized)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(stride))
    chunks = toks.select(
        "doc_id", "t", F.posexplode(starts).alias("chunk_idx", "s"))
    piece = F.slice("t", F.col("s") + 1, width)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def chunk_documents(spark, sf_dir, width: int = CHUNK_WIDTH,
                    stride: int = CHUNK_STRIDE):
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text) — sliding-window
    document chunking, the retrieval/embedding prep stage (RAG indexing,
    chunk-level embedding tables): windows of ``width`` tokens every
    ``stride`` tokens (overlap = width - stride keeps boundary context),
    final window truncated at the document end. Entirely ROW-LOCAL —
    starts = sequence(0, n-1, stride), chunks sliced out of the token
    array in place — so chunking streams at scan speed at any corpus
    size; the chunk id is (doc_id, chunk_idx), deterministic for
    downstream embedding joins."""
    return _chunk_frame(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        width, stride)


CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
starts AS (
  SELECT doc_id, tok,
         UNNEST(range(0, len(tok), {CHUNK_STRIDE})) AS s,
         UNNEST(range(0, CAST(ceil(len(tok) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
  FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(tok[s + 1 : s + {CHUNK_WIDTH}]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(tok[s + 1 : s + {CHUNK_WIDTH}], ' ') AS chunk_text
FROM starts
"""


RAG_TERMS = ("merge", "join")  # retrieval query over the chunk table
RAG_K = 10                     # contexts returned


def rag_context(spark, sf_dir, terms: tuple[str, ...] = RAG_TERMS,
                k: int = RAG_K, width: int = CHUNK_WIDTH,
                stride: int = CHUNK_STRIDE):
    """RAG context assembly (r8 — the last r9 roadmap candidate):
    rank retrieval chunks by query-term occurrences, take the top-k,
    and stitch each winner with its ±1 NEIGHBOR chunks (same doc,
    chunk_idx distance ≤ 1, in order) into one context string — the
    standard trick that hands the generator boundary context the
    winning chunk alone would cut off. Output
    (rank, doc_id, chunk_idx, n_hits, context_text).

    Scale shape: chunking and scoring are row-local at scan speed (the
    per-term occurrence count is a codegen'd filter+size over the
    chunk's own tokens); the top-k is TakeOrderedAndProject; the
    neighbor stitch joins the k-row winner table (broadcast) back to
    the chunk relation and aggregates ≤3 rows per winner — cost is
    O(corpus) scan + O(k) assembly, no corpus shuffle. At index-backed
    scale, swap the scoring scan for the token-index probe
    (text_search_* access path) — the assembly stage is unchanged."""
    chunks = chunk_documents(spark, sf_dir, width, stride)
    tok = F.split("chunk_text", " ")
    n_hits = None
    for t in terms:
        h = F.size(F.filter(tok, lambda x: x == F.lit(t)))
        n_hits = h if n_hits is None else n_hits + h
    scored = (
        chunks.select("doc_id", "chunk_idx",
                      n_hits.cast("long").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )
    top = scored.orderBy(F.col("n_hits").desc(), "doc_id",
                         "chunk_idx").limit(k)
    w = Window.orderBy(F.col("n_hits").desc(), "doc_id", "chunk_idx")
    top = top.withColumn("rank", F.row_number().over(w))  # k rows only
    nb = chunks.select(F.col("doc_id").alias("nb_doc"),
                       F.col("chunk_idx").alias("nb_idx"), "chunk_text")
    stitched = (
        nb.join(F.broadcast(top),
                (F.col("nb_doc") == F.col("doc_id"))
                & (F.abs(F.col("nb_idx") - F.col("chunk_idx")) <= 1))
        .groupBy("rank", "doc_id", "chunk_idx", "n_hits")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("nb_idx", "chunk_text"))),
                lambda s: s["chunk_text"]),
            " ").alias("context_text"))
    )
    return stitched.select("rank", "doc_id", "chunk_idx", "n_hits",
                           "context_text")


RAG_CONTEXT_SQL = f"""
WITH chunks AS (
  {CHUNK_DOCUMENTS_SQL}
), scored AS (
  SELECT doc_id, chunk_idx,
         CAST({" + ".join(
             "len(list_filter(string_split(chunk_text, ' '), "
             f"x -> x = '{t}'))" for t in RAG_TERMS)} AS BIGINT) AS n_hits
  FROM chunks
), top AS (
  SELECT doc_id, chunk_idx, n_hits,
         ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id, chunk_idx)
           AS rank
  FROM scored WHERE n_hits > 0
  ORDER BY n_hits DESC, doc_id, chunk_idx
  LIMIT {RAG_K}
)
SELECT CAST(t.rank AS INTEGER) AS rank, t.doc_id, t.chunk_idx, t.n_hits,
       string_agg(c.chunk_text, ' ' ORDER BY c.chunk_idx)
         AS context_text
FROM top t JOIN chunks c
  ON c.doc_id = t.doc_id AND abs(c.chunk_idx - t.chunk_idx) <= 1
GROUP BY t.rank, t.doc_id, t.chunk_idx, t.n_hits
"""


CHUNK_BUCKETS = 64  # token-hash partition count of the chunk index


def chunk_index_dir(spark, sf_dir, width: int = CHUNK_WIDTH,
                    stride: int = CHUNK_STRIDE,
                    buckets: int = CHUNK_BUCKETS) -> str:
    """Build (once) and register the CHUNK-level inverted index:
    postings (tok, doc_id, chunk_idx, tf) written partitionBy("bucket")
    with bucket = pmod(xxhash64(tok), buckets) — the retrieval-side
    twin of text.token_index_dir (same ArtifactStore crash-safe
    register-after-build contract, same content-derived versioning, so
    re-chunking parameters or a changed documents table version the
    artifact apart). One corpus pass at ingest; every rag query after
    that reads only its terms' hash partitions."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    params = f"rc{width}s{stride}b{buckets}"
    version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        (
            chunk_documents(spark, sf_dir, width, stride)
            .select("doc_id", "chunk_idx",
                    F.explode(F.split("chunk_text", " ")).alias("tok"))
            .groupBy("tok", "doc_id", "chunk_idx")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(buckets)))
            .write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
        )

    return store.get_or_build(
        f"chunkidx:{src}:{params}", version, build, src=src)


def _rag_indexed_top(spark, sf_dir, terms: tuple[str, ...] = RAG_TERMS,
                     k: int = RAG_K, width: int = CHUNK_WIDTH,
                     stride: int = CHUNK_STRIDE,
                     buckets: int = CHUNK_BUCKETS):
    """The LAZY scoring stage of rag_context_indexed (pruned chunk
    postings → multiplicity-weighted n_hits → top-k limit), exposed so
    the plan pins can assert the access path (literal bucket
    PartitionFilters, TakeOrderedAndProject, no Python) on the exact
    frame the op collects."""
    return rag_context_indexed(spark, sf_dir, terms, k, width, stride,
                               buckets, _return_top_frame=True)


def rag_context_indexed(spark, sf_dir, terms: tuple[str, ...] = RAG_TERMS,
                        k: int = RAG_K, width: int = CHUNK_WIDTH,
                        stride: int = CHUNK_STRIDE,
                        buckets: int = CHUNK_BUCKETS,
                        _return_top_frame: bool = False):
    """rag_context through the persisted chunk index (VERDICT r8 item
    5): the per-query corpus scan was the one r8-new shape that would
    not survive 100 TB as a QUERY-time op — here chunk scoring reads
    ONLY the query terms' hash partitions of the chunk-postings
    artifact (O(|terms|) partition discovery, document text untouched),
    the top-k is TakeOrderedAndProject over those postings, and the
    neighbor stitch re-chunks ONLY the k winner documents (their ids
    push down to the documents scan as literal filters). Query cost is
    O(query-term postings) + O(k docs), near-flat in corpus size like
    text_search_fuzzy_ranked's index path (PERF.md r9 probe). Output
    and oracle are identical to rag_context — same ordering, same
    stitch, same (rank, doc_id, chunk_idx, n_hits, context_text).

    Lazy-semantics deviation (ADVICE r9, deliberate): unlike every
    other registry entry, this op COLLECTS the k-row top-k at
    DataFrame-CONSTRUCTION time (one bounded collect, commented below)
    so the stitch can rebuild the winners as literals instead of
    executing the index-scan subplan twice. Consequence: the returned
    frame snapshots the winners as of the call — a documents-table /
    chunk-index change between construction and a later action is NOT
    reflected. Callers needing action-time freshness should re-call
    this function (cheap: the collect is the k-bounded pruned probe)."""
    from kstore_spark.functions.text import _fs_exists

    import os

    from kstore_spark.functions.xxh import bucket_of

    base = chunk_index_dir(spark, sf_dir, width, stride, buckets)
    # driver-side bucket map (pure-Python xxhash64 twin, engine-pinned)
    # — r12: same Spark-job-per-probe removal as text._pruned_postings
    term_buckets = sorted({bucket_of(t, buckets) for t in terms})
    paths = [p for p in (os.path.join(base, f"bucket={b}")
                         for b in term_buckets) if _fs_exists(spark, p)]
    if paths:
        idx = spark.read.option("basePath", base).parquet(*paths)
    else:  # no probed bucket exists ⇒ exactly-empty postings
        idx = spark.createDataFrame(
            [], "tok string, doc_id bigint, chunk_idx int, tf bigint, "
                "bucket bigint")
    # per-term MULTIPLICITY (r9 review): the scan path scores each
    # term INSTANCE (a duplicated query term counts its occurrences
    # twice); a bare isin() would dedupe and silently break the
    # output-identical contract on such inputs — weight tf by the
    # term's multiplicity via a |distinct terms|-entry LITERAL map
    # lookup (row-local, stays in codegen; no join, no local relation)
    from collections import Counter

    counts = Counter(terms)
    mult_map = F.create_map(
        *[x for t, m in counts.items() for x in (F.lit(t), F.lit(int(m)))])
    hits = (
        idx.filter(F.col("bucket").isin(term_buckets))  # partition pruning
        .filter(F.col("tok").isin(list(counts)))         # exact, in-partition
        .withColumn("mult", F.element_at(mult_map, F.col("tok")))
    )
    scored = (
        hits.groupBy("doc_id", "chunk_idx")
        .agg(F.sum(F.col("tf") * F.col("mult")).cast("long").alias("n_hits"))
    )
    top = scored.orderBy(F.col("n_hits").desc(), "doc_id",
                         "chunk_idx").limit(k)
    # k-bounded collect (house rule: bounded + commented) — ONE
    # materialization of the pruned-postings top-k: the rank is
    # assigned driver-side over the k collected rows (same (n_hits
    # DESC, doc_id, chunk_idx) total order) and the winner frame is
    # rebuilt as literals, so the stitch join below does NOT re-run
    # the index scan + aggregation a second time (r9 review: the
    # lazy-frame formulation executed the subplan twice per query).
    # ``top`` is returned lazily by _rag_indexed_top for the plan pins.
    if _return_top_frame:
        return top
    top_rows = top.collect()
    top_rows.sort(key=lambda r: (-r["n_hits"], r["doc_id"], r["chunk_idx"]))
    if top_rows:
        # JVM-side literal rebuild (explode of a k-struct literal array
        # — stays a pure expression, no local Python RDD in the plan)
        top = spark.range(1).select(F.explode(F.array(*[
            F.struct(
                F.lit(i + 1).cast("int").alias("rank"),
                F.lit(int(r["doc_id"])).cast("long").alias("doc_id"),
                F.lit(int(r["chunk_idx"])).cast("int").alias("chunk_idx"),
                F.lit(int(r["n_hits"])).cast("long").alias("n_hits"))
            for i, r in enumerate(top_rows)])).alias("t")).select("t.*")
    else:
        top = spark.createDataFrame(
            [], "rank int, doc_id bigint, chunk_idx int, n_hits bigint")
    # the winner doc ids become literal pushdown filters on the
    # documents scan, so the stitch tokenizes k documents, not the corpus
    win_ids = sorted({r["doc_id"] for r in top_rows})
    winner_docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isin(win_ids)).select("doc_id", "text")
    nb = _chunk_frame(winner_docs, width, stride).select(
        F.col("doc_id").alias("nb_doc"),
        F.col("chunk_idx").alias("nb_idx"), "chunk_text")
    stitched = (
        nb.join(F.broadcast(top),
                (F.col("nb_doc") == F.col("doc_id"))
                & (F.abs(F.col("nb_idx") - F.col("chunk_idx")) <= 1))
        .groupBy("rank", "doc_id", "chunk_idx", "n_hits")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("nb_idx", "chunk_text"))),
                lambda s: s["chunk_text"]),
            " ").alias("context_text"))
    )
    return stitched.select("rank", "doc_id", "chunk_idx", "n_hits",
                           "context_text")


RAG_FUZZY_TERMS = ("mergr", "joib")  # 1-edit typos of the RAG query
                                     # ('merge', 'join') — what a user
                                     # actually types into a search box


def rag_context_fuzzy(spark, sf_dir, terms: tuple[str, ...] = RAG_FUZZY_TERMS,
                      k: int = RAG_K, width: int = CHUNK_WIDTH,
                      stride: int = CHUNK_STRIDE,
                      buckets: int = CHUNK_BUCKETS):
    """Typo-robust RAG (r9 — the composition the ROADMAP named): the
    query terms resolve to their edit-distance-1 VOCABULARY
    neighborhoods through the SymSpell deletion index (ONE probe,
    text._fuzzy_neighborhood — the exact machinery text_search_fuzzy
    uses), and the resolved terms feed the chunk-index RAG assembly
    unchanged (rag_context_indexed: pruned chunk postings → top-k →
    winner-doc re-chunk stitch). n_hits counts every occurrence of any
    neighborhood term. Both stages are index probes, so the query cost
    is Σ|variants| deletion partitions + |resolved| chunk-postings
    partitions + O(k) — corpus text is never scanned. Exact oracle: the
    fuzzy ops' brute-force-levenshtein resolution over the distinct-
    term vocab, then the RAG SQL's scoring/stitch over the resolved
    set — identical DP and identical assembly in both engines."""
    from kstore_spark.functions.text import FUZZY_BUCKETS, _fuzzy_neighborhood

    resolved = _fuzzy_neighborhood(
        spark, sf_dir, tuple(terms), FUZZY_BUCKETS, max_dist=1)
    if not resolved:  # no vocabulary term within distance 1 of any typo
        return spark.createDataFrame(
            [], "rank int, doc_id bigint, chunk_idx int, n_hits bigint, "
                "context_text string")
    return rag_context_indexed(
        spark, sf_dir, terms=resolved, k=k, width=width, stride=stride,
        buckets=buckets)


RAG_CONTEXT_FUZZY_SQL = f"""
WITH chunks AS (
  {CHUNK_DOCUMENTS_SQL}
), vocab AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents
), resolved AS (
  SELECT term FROM vocab
  WHERE {" OR ".join(f"levenshtein(term, '{t}') <= 1"
                     for t in RAG_FUZZY_TERMS)}
), toks AS (
  SELECT doc_id, chunk_idx, unnest(string_split(chunk_text, ' ')) AS tok
  FROM chunks
), scored AS (
  SELECT doc_id, chunk_idx, COUNT(*) AS n_hits
  FROM toks JOIN resolved ON tok = term
  GROUP BY doc_id, chunk_idx
), top AS (
  SELECT doc_id, chunk_idx, CAST(n_hits AS BIGINT) AS n_hits,
         ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id, chunk_idx)
           AS rank
  FROM scored WHERE n_hits > 0
  ORDER BY n_hits DESC, doc_id, chunk_idx
  LIMIT {RAG_K}
)
SELECT CAST(t.rank AS INTEGER) AS rank, t.doc_id, t.chunk_idx, t.n_hits,
       string_agg(c.chunk_text, ' ' ORDER BY c.chunk_idx)
         AS context_text
FROM top t JOIN chunks c
  ON c.doc_id = t.doc_id AND abs(c.chunk_idx - t.chunk_idx) <= 1
GROUP BY t.rank, t.doc_id, t.chunk_idx, t.n_hits
"""


RAG_MMR_POOL = 20  # diversification pool: top-n_hits chunks fed to MMR


def rag_context_diverse(spark, sf_dir, terms: tuple[str, ...] = RAG_TERMS,
                        k: int = RAG_K, pool: int = RAG_MMR_POOL,
                        lam_ppm: int | None = None,
                        width: int = CHUNK_WIDTH,
                        stride: int = CHUNK_STRIDE):
    """MMR-DIVERSIFIED RAG context assembly (r12) — the fourth member
    of the rag_context family (scan / indexed / fuzzy / diverse): a
    relevance-only top-k hands the generator k near-copies whenever
    one boilerplate pattern dominates the hit list; this entry takes
    the top-``pool`` chunks by query-term occurrences, then selects k
    by Carbonell–Goldstein MMR where REDUNDANCY is the token-set
    Jaccard between chunks — integer ppm on BOTH axes (rel_ppm =
    n_hits·10⁶ DIV max-pool-hits, sim_ppm = |A∩B|·10⁶ DIV |A∪B|), so
    the greedy is float-free and exact on any data, unlike the
    embedding MMR whose floats need margin pins. The selection loop IS
    similarity._mmr_greedy_from_grid — the same kernel the embedding
    entries run (single-kernel discipline: a tie-break fix there fixes
    this entry too); the winner stitch is rag_context's ±1-neighbor
    assembly verbatim. Exact oracle: the greedy unrolled into k
    chained CTEs over the same integer quantities, then the assembly
    join. Scale shape: one corpus-scan scoring pass (the indexed probe
    composes exactly as in rag_context_indexed), a pool²-bounded grid,
    one single-group greedy, O(k) assembly — diversification adds
    nothing corpus-sized."""
    from pyspark.sql import Window

    from kstore_spark.functions.similarity import (
        MMR_LAMBDA_PPM, _mmr_greedy_from_grid)

    if lam_ppm is None:
        lam_ppm = MMR_LAMBDA_PPM
    chunks = chunk_documents(spark, sf_dir, width, stride)
    tok = F.split("chunk_text", " ")
    n_hits = None
    for t in terms:
        h = F.size(F.filter(tok, lambda x: x == F.lit(t)))
        n_hits = h if n_hits is None else n_hits + h
    scored = (
        chunks.select("doc_id", "chunk_idx",
                      n_hits.cast("long").alias("n_hits"),
                      F.array_distinct(tok).alias("toks"))
        .filter(F.col("n_hits") > 0)
    )
    top = scored.orderBy(F.col("n_hits").desc(), "doc_id",
                         "chunk_idx").limit(pool)
    # composite chunk key for the shared greedy kernel (decoded by the
    # winner join below; chunk_idx < 10⁶ by the chunk-id contract)
    pool_df = (
        top.withColumn("key", F.col("doc_id") * F.lit(1_000_000)
                       + F.col("chunk_idx"))
        .withColumn("max_hits",
                    F.max("n_hits").over(Window.partitionBy(F.lit(0))))
        .withColumn("rel", F.expr(
            "CAST((n_hits * 1000000) DIV max_hits AS BIGINT)"))
    )
    a = pool_df.select(F.lit(0).alias("query_id"),
                       F.col("key").alias("doc_a"),
                       F.col("rel").alias("rel_a"),
                       F.col("toks").alias("ta"))
    b = pool_df.select(F.col("key").alias("doc_b"),
                       F.col("toks").alias("tb"))
    # LEFT join: a single-chunk pool still emits its rank-1 row via
    # the null-partner path (same shape as _mmr_over_pool's grid)
    grid = a.join(b, F.col("doc_a") != F.col("doc_b"), "left").select(
        "query_id", "doc_a", "rel_a", "doc_b",
        F.expr("CAST((size(array_intersect(ta, tb)) * 1000000) "
               "DIV size(array_union(ta, tb)) AS BIGINT)")
        .alias("sim_ppm"))
    sel = _mmr_greedy_from_grid(grid, k, lam_ppm)
    winners = (
        sel.select("rank", F.col("doc_id").alias("key"))
        .join(F.broadcast(pool_df.select("key", "doc_id", "chunk_idx",
                                         "n_hits")), "key")
    )
    nb = chunks.select(F.col("doc_id").alias("nb_doc"),
                       F.col("chunk_idx").alias("nb_idx"), "chunk_text")
    stitched = (
        nb.join(F.broadcast(winners),
                (F.col("nb_doc") == F.col("doc_id"))
                & (F.abs(F.col("nb_idx") - F.col("chunk_idx")) <= 1))
        .groupBy("rank", "doc_id", "chunk_idx", "n_hits")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("nb_idx", "chunk_text"))),
                lambda s: s["chunk_text"]),
            " ").alias("context_text"))
    )
    return stitched.select("rank", "doc_id", "chunk_idx", "n_hits",
                           "context_text")


def _rag_diverse_sql(terms=RAG_TERMS, k: int = RAG_K,
                     pool: int = RAG_MMR_POOL,
                     lam: int | None = None) -> str:
    """rag_context_diverse's greedy unrolled into k chained CTE steps
    (the _mmr_sql pattern over chunk keys): pool cut by (n_hits DESC,
    doc_id, chunk_idx) — all-integer, so no margin pins are needed
    anywhere — then sel{t} = argmax of λ·rel − (1−λ)·max token-set
    Jaccard to the selected, ties toward the lower composite key,
    then rag_context's assembly join keyed by greedy rank."""
    if lam is None:
        from kstore_spark.functions.similarity import MMR_LAMBDA_PPM
        lam = MMR_LAMBDA_PPM
    inv = 1_000_000 - lam
    hits_expr = " + ".join(
        "len(list_filter(string_split(chunk_text, ' '), "
        f"x -> x = '{t}'))" for t in terms)
    sql = f"""
WITH chunks AS MATERIALIZED (
  {CHUNK_DOCUMENTS_SQL}
), scored AS MATERIALIZED (
  SELECT doc_id, chunk_idx, CAST({hits_expr} AS BIGINT) AS n_hits,
         list_distinct(string_split(chunk_text, ' ')) AS toks
  FROM chunks
), cut AS MATERIALIZED (
  SELECT doc_id, chunk_idx, n_hits, toks,
         doc_id * 1000000 + chunk_idx AS key,
         ROW_NUMBER() OVER (ORDER BY n_hits DESC, doc_id, chunk_idx)
           AS rn
  FROM scored WHERE n_hits > 0
), pool AS MATERIALIZED (
  SELECT doc_id, chunk_idx, n_hits, toks, key,
         CAST((n_hits * 1000000) // MAX(n_hits) OVER () AS BIGINT)
           AS rel
  FROM cut WHERE rn <= {pool}
), sims AS MATERIALIZED (
  SELECT a.key AS da, b.key AS db,
         CAST((len(list_intersect(a.toks, b.toks)) * 1000000)
              // len(list_distinct(list_concat(a.toks, b.toks)))
              AS BIGINT) AS sp
  FROM pool a JOIN pool b ON a.key <> b.key
), sel1 AS MATERIALIZED (
  SELECT key FROM (
    SELECT key, ROW_NUMBER() OVER (ORDER BY rel DESC, key ASC) AS rn
    FROM pool) WHERE rn = 1
)"""
    for t in range(2, k + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT key FROM sel{i}" for i in range(1, t))
        sql += f""", all{t - 1} AS MATERIALIZED (
  {prev_union}
), sel{t} AS MATERIALIZED (
  SELECT key FROM (
    SELECT x.key, ROW_NUMBER() OVER (ORDER BY x.score DESC, x.key ASC)
             AS rn
    FROM (
      SELECT p.key, {lam} * p.rel - {inv} * MAX(s.sp) AS score
      FROM pool p
      JOIN sims s ON s.da = p.key
      JOIN all{t - 1} sel ON sel.key = s.db
      WHERE NOT EXISTS (SELECT 1 FROM all{t - 1} z WHERE z.key = p.key)
      GROUP BY p.key, p.rel
    ) x) WHERE rn = 1
)"""
    ranked_union = "\nUNION ALL ".join(
        f"SELECT key, CAST({t} AS INTEGER) AS rank FROM sel{t}"
        for t in range(1, k + 1))
    sql += f""", ranked AS (
{ranked_union}
)
SELECT r.rank, p.doc_id, p.chunk_idx, p.n_hits,
       string_agg(c.chunk_text, ' ' ORDER BY c.chunk_idx)
         AS context_text
FROM ranked r
JOIN pool p ON p.key = r.key
JOIN chunks c
  ON c.doc_id = p.doc_id AND abs(c.chunk_idx - p.chunk_idx) <= 1
GROUP BY r.rank, p.doc_id, p.chunk_idx, p.n_hits
"""
    return sql


TRIGRAM_K = 20  # top-k corpus trigrams


def trigram_expr(col: str = "t"):
    """Row-local trigram expansion over a token-array column — the ONE
    boundary definition corpus_trigrams and text_ngram_novelty share
    (same anti-drift rule as sampling's SQL templates). sequence(1, n)
    DESCENDS for n < 1, so callers filter size(col) >= 3 first."""
    return F.transform(
        F.sequence(F.lit(1), F.size(col) - 2),
        lambda i: F.concat_ws(" ", F.slice(col, i, 3)),
    )


# the DuckDB twin of trigram_expr over a `tok` list column (1-based,
# range() excludes its stop — i runs 1..len-2)
TRIGRAM_SQL_EXPR = ("list_transform(range(1, len(tok) - 1), "
                    "i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])")


def corpus_trigrams(spark, sf_dir, k: int = TRIGRAM_K):
    """Top-k corpus-wide token trigrams (the n-gram frequency table a
    contamination/memorization audit starts from; unigram twin is
    plans/extended.top_tokens, bigrams feed functions/lm). Trigram
    expansion is ROW-LOCAL (sequence + slice over the token array, no
    pre-shuffle), the count map-side combines before the single shuffle
    on the trigram key, and only the ≤|vocab|³-bounded (in practice
    Zipf-tiny) aggregate ever moves."""
    docs = table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t"))
    return (
        docs.filter(F.size("t") >= 3)
        .select(F.explode(trigram_expr()).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(k)
    )


CORPUS_TRIGRAMS_SQL = f"""
SELECT trigram, COUNT(*) AS n
FROM (
  SELECT unnest({TRIGRAM_SQL_EXPR}) AS trigram
  FROM (SELECT string_split(text, ' ') AS tok FROM documents)
  WHERE len(tok) >= 3
)
GROUP BY trigram ORDER BY n DESC, trigram ASC LIMIT {TRIGRAM_K}
"""


COLLOC_K = 20        # top-k collocations
COLLOC_MIN_COUNT = 5  # bigram support floor (kills one-off noise)


def corpus_collocations(spark, sf_dir, k: int = COLLOC_K,
                        min_count: int = COLLOC_MIN_COUNT):
    """Top-k collocations: adjacent word pairs ranked by PMI-style
    lift in exact fixed point —

      lift_ppm = ((c_ab·10⁶) div c_a) · N div c_b

    where c_ab is the bigram count, c_a/c_b the unigram counts and N
    the corpus token total (the true PMI argument c_ab·N²/(N_bi·c_a·c_b)
    differs only by the pair-independent factor N_bi/N, so up to the
    fixed-point truncation the ranking is PMI's; the log is dropped — monotone — and the two sequential
    truncating divs keep every intermediate ≤ 10⁶·N, int64-safe to
    ~10¹² tokens). Bigram expansion is row-local; the unigram and
    bigram count tables shuffle once each on their keys; the join back
    onto the (Zipf-tiny) bigram aggregate broadcasts the unigram side
    only when AQE sees it small. Ties (lift DESC, w1, w2). Exact
    DuckDB oracle with the same expression."""
    docs = table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t"))
    uni = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_tokens"))
    bi = (
        docs.filter(F.size("t") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.struct(F.col("t")[i].alias("w1"),
                               F.col("t")[i + 1].alias("w2")),
        )).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")),
                "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")),
              "w2")
        .join(F.broadcast(n_uni))
        .select(
            "w1", "w2", F.col("c_ab").cast("long").alias("c_ab"),
            F.expr("((c_ab * 1000000) div c_a) * n_tokens div c_b")
            .cast("long").alias("lift_ppm"))
    )
    return (
        scored.orderBy(F.desc("lift_ppm"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


CORPUS_COLLOCATIONS_SQL = f"""
WITH t AS (
  SELECT string_split(text, ' ') AS tok FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c FROM (SELECT unnest(tok) AS w FROM t) GROUP BY w
), n AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni
), bi AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM (
    SELECT tok[CAST(i AS INT)] AS w1, tok[CAST(i AS INT) + 1] AS w2
    FROM t, LATERAL (SELECT unnest(range(1, len(tok))) AS i) r
    WHERE len(tok) >= 2)
  GROUP BY w1, w2
  HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(((c_ab * 1000000) // a.c) * n_tokens // b.c AS BIGINT)
         AS lift_ppm
FROM bi JOIN uni a ON bi.w1 = a.w JOIN uni b ON bi.w2 = b.w CROSS JOIN n
ORDER BY lift_ppm DESC, w1 ASC, w2 ASC
LIMIT {COLLOC_K}
"""


def text_ngram_novelty(spark, sf_dir):
    """Per-document trigram novelty (a memorization/duplication proxy
    finer than whole-doc dedup): the share of a doc's DISTINCT trigrams
    that appear in no other document, in exact integer ppm. Docs with
    fewer than 3 tokens have no trigrams and are not scored.

    Scale shape: within-doc dedup is ROW-LOCAL (array_distinct — no
    corpus-wide DISTINCT shuffle), and because a df==1 trigram has
    exactly one owner, novelty needs NO join back onto the exploded
    rows: ONE map-side-combined shuffle on the trigram key yields
    (df, owner) per trigram, and everything after is |docs|-sized
    id-keyed aggs. The first cut joined the 50M-row explode back on
    the string key — 47 s at 100× (500k docs); this shape runs the
    same corpus in 14 s with identical output."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t"))
    dt = (
        docs.filter(F.size("t") >= 3)
        .select("doc_id",
                F.explode(F.array_distinct(trigram_expr())).alias("trigram"))
    )
    per_doc = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_trigrams"))
    novel = (
        dt.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .withColumn("n_novel", F.coalesce("n_novel", F.lit(0)))
        .withColumn(
            "novelty_ppm",
            F.floor(F.lit(_PPM) * F.col("n_novel")
                    / F.col("n_trigrams")).cast("long"),
        )
    )


TEXT_NGRAM_NOVELTY_SQL = f"""
WITH dt AS (
  SELECT doc_id, unnest(list_distinct({TRIGRAM_SQL_EXPR})) AS trigram
  FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
  WHERE len(tok) >= 3
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_trigrams FROM dt GROUP BY doc_id
), novel AS (
  SELECT owner AS doc_id, COUNT(*) AS n_novel FROM (
    SELECT trigram, COUNT(*) AS df, MIN(doc_id) AS owner
    FROM dt GROUP BY trigram
  ) WHERE df = 1 GROUP BY owner
)
SELECT p.doc_id, p.n_trigrams,
       COALESCE(n.n_novel, 0) AS n_novel,
       CAST(FLOOR({_PPM} * COALESCE(n.n_novel, 0) / p.n_trigrams)
            AS BIGINT) AS novelty_ppm
FROM per_doc p LEFT JOIN novel n USING (doc_id)
"""


QUERIES = {
    "dedup_passages": dedup_passages,
    "corpus_mixture": corpus_mixture,
    "corpus_temperature_weights": corpus_temperature_weights,
    "corpus_temperature_sample": corpus_temperature_sample,
    "tfidf_top_terms": tfidf_top_terms,
    "chunk_documents": chunk_documents,
    "rag_context": rag_context,
    "rag_context_indexed": rag_context_indexed,
    "rag_context_fuzzy": rag_context_fuzzy,
    "rag_context_diverse": rag_context_diverse,
    "corpus_trigrams": corpus_trigrams,
    "corpus_collocations": corpus_collocations,
    "text_ngram_novelty": text_ngram_novelty,
}

ORACLES = {
    "dedup_passages": DEDUP_PASSAGES_SQL,
    "corpus_mixture": CORPUS_MIXTURE_SQL,
    "corpus_temperature_weights": CORPUS_TEMPERATURE_SQL,
    "corpus_temperature_sample": CORPUS_TEMPERATURE_SAMPLE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "rag_context": RAG_CONTEXT_SQL,
    # the index path only changes the ACCESS PATH (pruned chunk
    # postings + k-doc re-chunk); output is the scan path's exactly
    "rag_context_indexed": RAG_CONTEXT_SQL,
    # typo-robust RAG: brute-force-levenshtein vocab resolution + the
    # same RAG assembly, mirrored exactly
    "rag_context_fuzzy": RAG_CONTEXT_FUZZY_SQL,
    # MMR-diversified RAG: every quantity integer (n_hits, ppm rel,
    # token-set Jaccard), the greedy unrolled into k CTE steps — exact
    # on any data, no margin pins required
    "rag_context_diverse": _rag_diverse_sql(),
    "corpus_trigrams": CORPUS_TRIGRAMS_SQL,
    "corpus_collocations": CORPUS_COLLOCATIONS_SQL,
    "text_ngram_novelty": TEXT_NGRAM_NOVELTY_SQL,
}
