"""Text analysis operators over the ``documents`` table.

All of these run entirely in JVM expressions (split / filter /
aggregate — whole-stage-codegen'd, no Python UDFs), so they stream at
scan speed on any corpus size:

- token counting (total + distinct, whitespace and BPE-ish regex)
- quality scoring (length / stopword-ratio / mean token length)
- language ID (marker-word n-gram heuristic, deterministic tie-break)
- document fingerprint (sequential 31-ary rolling hash — a stand-in for
  rolling content-defined chunking signatures)
- repetition filter (duplicate 3-gram ratio, Gopher/C4-style)

Ratios are single double divisions of exact integers → bit-identical in
any IEEE engine, so everything here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kstore_spark.tables import table

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

# marker vocab per language for the heuristic language guesser
LANG_MARKERS = {
    "en": ("the", "and", "of", "to"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}

_FP_MOD = 2147483647  # 2^31-1, Mersenne prime


def _tok(spark, sf_dir):
    return table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("t")
    )


def _count_in(tokens_col, words: tuple[str, ...]):
    """Occurrence count (not distinct) of any of `words` among tokens."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda x: F.array_contains(arr, x)))


def text_tokens(spark, sf_dir):
    return _tok(spark, sf_dir).select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )

TEXT_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct
FROM documents
"""


def text_quality(spark, sf_dir):
    t = _tok(spark, sf_dir)
    n_tokens = F.size("t")
    stop = _count_in(F.col("t"), STOPWORDS)
    # mean token length from exact ints: (chars - separators) / tokens
    mean_len = (F.length("text") - n_tokens + 1).cast("double") / n_tokens.cast("double")
    return t.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
    )

TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tok FROM documents)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(len(tok) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(tok, x -> x IN {STOPWORDS!r})) AS DOUBLE) / len(tok) AS stopword_ratio,
       CAST(length(text) - len(tok) + 1 AS DOUBLE) / len(tok) AS mean_token_len
FROM t
"""


def text_langid(spark, sf_dir):
    """Deterministic marker-count argmax; ties resolve in fixed lang
    order en > es > de > fr, then 'unk' when all scores are zero."""
    t = _tok(spark, sf_dir)
    scores = {lang: _count_in(F.col("t"), words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("unk"))
    for lang in ("en", "es", "de", "fr"):
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return t.select("doc_id", pred.alias("pred_lang"))


def _langid_sql():
    cnt = {
        lang: f"len(list_filter(tok, x -> x IN {words!r}))"
        for lang, words in LANG_MARKERS.items()
    }
    best = f"greatest({cnt['en']}, {cnt['es']}, {cnt['de']}, {cnt['fr']})"
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
SELECT doc_id,
       CASE WHEN {best} = 0 THEN 'unk'
            WHEN {cnt['en']} = {best} THEN 'en'
            WHEN {cnt['es']} = {best} THEN 'es'
            WHEN {cnt['de']} = {best} THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM t
"""

TEXT_LANGID_SQL = _langid_sql()


def text_fingerprint(spark, sf_dir):
    """Order-sensitive rolling hash over token lengths: a cheap stable
    content fingerprint (reordering tokens changes it, unlike bag-of-words
    digests). Sequential left fold — same associativity in DuckDB."""
    t = _tok(spark, sf_dir)
    fp = F.aggregate(
        F.transform("t", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _FP_MOD,
    )
    return t.select("doc_id", fp.alias("fingerprint"))

TEXT_FINGERPRINT_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT), list_transform(tok, x -> CAST(length(x) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % {_FP_MOD}
       ) AS fingerprint
FROM t
"""


_BPE_RE = "[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^a-zA-Z0-9 ]"


def text_tokens_regex(spark, sf_dir):
    """BPE-ish subword tokenization via regex (the GPT-2-style pretoken
    split, simplified): counts per doc, computed with the JVM regex
    engine — the cheap first stage of any tokenizer-throughput estimate."""
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_subtokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_subtokens"),
    )

TEXT_TOKENS_REGEX_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS n_subtokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS INTEGER) AS n_distinct_subtokens
FROM documents
"""


def text_repetition(spark, sf_dir):
    """Intra-document repetition (Gopher/C4-style quality signal): the
    fraction of word 3-grams that are duplicates of an earlier 3-gram in
    the same doc. Row-local array ops only — no explode, no shuffle; the
    ratio is one double division of two exact ints (oracle-exact). Docs
    above the usual ~0.2 cut are flagged with an integer comparison
    (5*dups >= total) so the filter itself never touches floats."""
    tok = _tok(spark, sf_dir).filter(F.size("t") >= 3)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 3),
        lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1], F.col("t")[i + 2]),
    )
    g = tok.select("doc_id", grams.alias("g"))
    total = F.size("g")
    dups = total - F.size(F.array_distinct("g"))
    return g.select(
        "doc_id",
        total.alias("n_grams"),
        dups.alias("n_dup"),
        (dups.cast("double") / total).alias("dup_ratio"),
        (F.lit(5) * dups >= total).alias("flag_repetitive"),
    )


TEXT_REPETITION_SQL = """
WITH g AS (
  SELECT doc_id,
         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          FOR i IN generate_series(1, len(t)-2)] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3)
SELECT doc_id,
       CAST(len(g) AS INTEGER) AS n_grams,
       CAST(len(g) - len(list_distinct(g)) AS INTEGER) AS n_dup,
       CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g) AS dup_ratio,
       5 * (len(g) - len(list_distinct(g))) >= len(g) AS flag_repetitive
FROM g
"""


# -- PII scrubbing -----------------------------------------------------
#
# Regex-based redaction of the classic structured-PII shapes a training
# corpus must not ship: emails, IPv4 addresses, phone numbers. The
# patterns are deliberately RE2-compatible (no lookaround / backrefs) so
# Spark's Java regex and DuckDB's RE2 agree token-for-token, which is
# what lets the driver hash-check the scrubbed text itself. Counts are
# taken on the progressively-scrubbed text (emails first — an address
# can contain an IP-shaped domain) and the SQL oracle mirrors the same
# three-stage order. Pure JVM regexp_replace — streams at scan speed;
# no Python in the loop.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def scrub_pii(docs, text_col: str = "text"):
    """Frame-level scrub core: any frame with a text column in, the same
    frame (minus ``text_col``) out with n_emails / n_ips / n_phones
    counts and the redacted ``clean`` column. Used by the pii_scrub
    query below and as a stage of examples/curate_corpus.py."""
    others = [c for c in docs.columns if c != text_col]
    s1 = docs.select(
        *others,
        F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.regexp_replace(text_col, PII_EMAIL, "<EMAIL>").alias("__t1"),
    )
    s2 = s1.select(
        *others, "n_emails",
        F.size(F.regexp_extract_all("__t1", F.lit(PII_IPV4), 0)).alias("n_ips"),
        F.regexp_replace("__t1", PII_IPV4, "<IP>").alias("__t2"),
    )
    return s2.select(
        *others, "n_emails", "n_ips",
        F.size(F.regexp_extract_all("__t2", F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.regexp_replace("__t2", PII_PHONE, "<PHONE>").alias("clean"),
    )


def pii_scrub(spark, sf_dir):
    """(doc_id, n_emails, n_ips, n_phones, clean) — per-doc PII match
    counts plus the redacted text. On the synthetic corpus the counts
    are zero and clean == text (pinned); redaction behavior itself is
    pinned on planted PII in tests/test_pii.py."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return scrub_pii(docs)


PII_SCRUB_SQL = f"""
WITH s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER) AS n_emails,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{PII_IPV4}')) AS INTEGER) AS n_ips,
         regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '{PII_PHONE}')) AS INTEGER) AS n_phones,
       regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS clean
FROM s2
"""


# -- corpus-driven rarity score ----------------------------------------

RARE_MAX_COUNT = 20  # a token seen <= this many times corpus-wide is rare


def text_rarity(spark, sf_dir, max_count: int = RARE_MAX_COUNT):
    """(doc_id, n_tokens, n_rare, rare_ppm) — the fraction of a doc's
    tokens that are corpus-rare (total occurrences ≤ ``max_count``), in
    exact parts-per-million. The corpus-driven cousin of text_quality's
    row-local signals: a high rare/OOV ratio marks noisy or
    out-of-distribution docs (the unigram-LM quality proxy, kept in
    integer arithmetic end to end — a float log-prob would be 1-ulp
    hostage to each engine's libm, floor(ppm) of exact ints is not).
    Scale shape: one token shuffle for the count table, one for the
    doc re-aggregation; the rare set is count-filtered BEFORE the join
    back (typically the long tail by type but a small minority of
    occurrences — and AQE picks the join strategy, no hint)."""
    terms = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = terms.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    rare = counts.filter(F.col("c") <= max_count).select("w")
    n_rare = (
        terms.join(rare, "w", "left_semi")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rare"))
    )
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    return (
        toks.join(n_rare, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_rare", F.lit(0)).cast("int").alias("n_rare"),
            # `div` = exact integer division, mirroring DuckDB's `//`
            F.expr(
                "coalesce(n_rare, 0) * 1000000 div n_tokens"
            ).cast("long").alias("rare_ppm"),
        )
    )


TEXT_RARITY_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), rare AS (
  SELECT w FROM terms GROUP BY w HAVING COUNT(*) <= {RARE_MAX_COUNT}
), nr AS (
  SELECT doc_id, COUNT(*) AS n_rare FROM terms
  WHERE w IN (SELECT w FROM rare) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       CAST(COALESCE(nr.n_rare, 0) AS INTEGER) AS n_rare,
       CAST(COALESCE(nr.n_rare, 0) * 1000000
            // len(string_split(d.text, ' ')) AS BIGINT) AS rare_ppm
FROM documents d LEFT JOIN nr ON d.doc_id = nr.doc_id
"""


# -- Gopher rule filter ------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
# the canonical required-stopword list (Rae et al. 2021, §A1.1.2)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def text_gopher_quality(spark, sf_dir):
    """Per-doc Gopher rule flags (Rae et al. 2021, the rule set Dolma /
    RefinedWeb reuse): word-count bounds, mean-word-length bounds,
    alphabetic-word ratio >= 0.8, >= 2 required stopwords, symbol
    ('#'/'...') to word ratio < 0.1 — plus the conjunction
    ``pass_gopher``. Every flag is an integer cross-multiplied
    comparison (``10*alpha >= 8*n`` instead of a float ratio), so the
    output is bit-exact in any engine and the op carries a plain SQL
    oracle. Row-local array/regex expressions only — no shuffle, no
    Python; streams at scan speed like the rest of this module."""
    t = _tok(spark, sf_dir)
    n = F.size("t")
    # chars minus single-space separators = total word chars
    word_chars = F.length("text") - n + 1
    alpha = F.size(F.filter(F.col("t"), lambda x: x.rlike("[A-Za-z]")))
    stops = F.size(F.array_intersect(
        F.array_distinct("t"), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    symbols = (F.size(F.regexp_extract_all("text", F.lit("#"), 0))
               + F.size(F.regexp_extract_all("text", F.lit(r"\.\.\."), 0)))
    ok_wc = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    ok_mwl = (3 * n <= word_chars) & (word_chars <= 10 * n)
    ok_alpha = 10 * alpha >= 8 * n
    ok_stop = stops >= 2
    ok_sym = 10 * symbols < n
    return t.select(
        "doc_id",
        n.alias("n_words"),
        alpha.alias("n_alpha_words"),
        stops.alias("n_stop_types"),
        symbols.alias("n_symbols"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_ratio"),
        ok_stop.alias("ok_stopwords"),
        ok_sym.alias("ok_symbol_ratio"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop & ok_sym).alias("pass_gopher"),
    )


TEXT_GOPHER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         len(tok) AS n_words,
         length(text) - len(tok) + 1 AS word_chars,
         len(list_filter(tok, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
         len(list_intersect(list_distinct(tok), {list(GOPHER_STOPWORDS)!r})) AS n_stop_types,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tok FROM documents)
), flags AS (
  SELECT doc_id,
         CAST(n_words AS INTEGER) AS n_words,
         CAST(n_alpha_words AS INTEGER) AS n_alpha_words,
         CAST(n_stop_types AS INTEGER) AS n_stop_types,
         CAST(n_symbols AS INTEGER) AS n_symbols,
         n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_word_count,
         3 * n_words <= word_chars AND word_chars <= 10 * n_words AS ok_mean_word_len,
         10 * n_alpha_words >= 8 * n_words AS ok_alpha_ratio,
         n_stop_types >= 2 AS ok_stopwords,
         10 * n_symbols < n_words AS ok_symbol_ratio
  FROM m
)
SELECT *, ok_word_count AND ok_mean_word_len AND ok_alpha_ratio
          AND ok_stopwords AND ok_symbol_ratio AS pass_gopher
FROM flags
"""


HH_K = 1000  # report tokens with corpus share > 1/HH_K


def text_heavy_hitters(spark, sf_dir, k: int = HH_K):
    """(tok, cnt) for every token with corpus share strictly above 1/k —
    the mergeable-summary answer to "what dominates the corpus" when the
    vocabulary is too large to groupBy outright (URLs, hashes, OCR junk
    make web-corpus vocabularies ~corpus-sized).

    Two-pass sketch: (1) an Arrow-batched candidate pass emits, per
    batch, only the tokens whose IN-BATCH share exceeds 1/k (< k rows
    per batch whatever the batch's vocabulary — this is the Misra-Gries
    guarantee shape); by pigeonhole any token with GLOBAL share > 1/k
    exceeds 1/k in at least one batch, so the candidate union is a
    superset of the true heavy hitters. (2) an exact recount restricted
    to candidates (semi-join) + the global-share filter. Output is
    therefore EXACT — candidates are a batching-dependent superset, but
    the final filter is global — which is what lets a sketch op carry a
    plain SQL oracle. The full-vocabulary shuffle never happens: the
    only grouped key set is the candidate set (≤ k-ish tokens)."""
    import pandas as pd

    # three consumers (candidate pass, recount, total) — one cached
    # tokenize+explode instead of three corpus scans, freed once the
    # (tiny) heavy-hitter result materializes
    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")).persist()

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            vc = pdf["tok"].value_counts()
            yield pd.DataFrame({"tok": vc[vc * k > n].index})

    cands = toks.mapInPandas(gen, "tok string").distinct()
    counts = (
        toks.join(cands, "tok", "left_semi")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    res = (
        counts.crossJoin(total)
        .filter(F.col("cnt") * k > F.col("n"))
        .select("tok", "cnt")
        .persist()
    )
    res.count()
    toks.unpersist()
    return res


TEXT_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks),
c AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
SELECT tok, cnt FROM c, tot WHERE cnt * {HH_K} > n
"""


# -- persisted inverted text index (index-vs-scan access path) ---------

TOKEN_BUCKETS = 64            # token-hash partition count of the index
SEARCH_TERMS = ("dup", "window")  # default conjunctive query: one rare
                                  # term ('dup' ⇒ planted-duplicate docs)
                                  # + one common term


def token_index_dir(spark, sf_dir, buckets: int = TOKEN_BUCKETS,
                    max_doc: int | None = None) -> str:
    """Build (once) and register the inverted text index: postings
    (tok, doc_id, tf) written ``partitionBy("bucket")`` with
    bucket = pmod(xxhash64(tok), buckets), ArtifactStore-keyed by the
    documents table's content version (same crash-safe register-after-
    build + epoch-GC contract as the IVF/LSH/span index artifacts).

    This is the text analogue of the reference's b+tree access path
    (ref src/server/storage.c:462-560 — pick the index when selectivity
    pays): a conjunctive term query READS only its terms' hash
    partitions, while the scan path reads every document's full text.
    (Partition discovery is O(|terms|) too: _index_postings hands the
    probed buckets' paths to the reader directly, so bucket count no
    longer penalizes the probe — b=1024 measured equal to b=64 after
    the change, PERF.md; size buckets for write-side balance.)
    One batch write at ingest; Zipf makes the
    bucket sizes uneven but bounded (the head token's postings list is
    ≤ |docs| ids — ids-only rows, not text)."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    # p2 = positional postings schema + per-posting dl (the Lucene
    # "norms" trick, denormalized at build time: BM25's length
    # normalization needs dl per candidate, and carrying it on the
    # posting row turns a corpus-sized query-time join into 8 bytes of
    # prunable column — index path 4.17→2.30 s at 500k and flat 2.63 s at 5M, PERF.md);
    # m<N> = history slice (doc_id <
    # max_doc only — the incremental search's already-indexed corpus).
    # The history slice versions over only the files that can hold
    # doc_id < max_doc (footer min stats), so appending a new crawl
    # does NOT invalidate the history index — the whole point of the
    # incremental path.
    params = f"b{buckets}p2" + (f"m{max_doc}" if max_doc is not None else "")
    if max_doc is not None:
        version = ArtifactStore.source_version_bounded(
            src, params, "doc_id", max_doc)
    else:
        version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        _postings_frame(spark, sf_dir, buckets, hi=max_doc).write.mode(
            "overwrite").partitionBy("bucket").parquet(out_dir)

    return store.get_or_build(f"tokidx:{src}:{params}", version, build, src=src)


def _postings_frame(spark, sf_dir, buckets, lo=None, hi=None):
    """The postings relation for documents with lo ≤ doc_id < hi (either
    bound optional): (tok, doc_id, tf, positions, dl, bucket). Shared by
    the full/history index build and the compaction's increment leg."""
    docs = _tok(spark, sf_dir)
    if lo is not None:
        docs = docs.filter(F.col("doc_id") >= lo)
    if hi is not None:
        docs = docs.filter(F.col("doc_id") < hi)
    return (
        docs
        .select("doc_id", F.size("t").cast("long").alias("dl"),
                F.posexplode("t").alias("p", "tok"))
        .groupBy("tok", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # 0-based in-doc positions, sorted — phrase queries
            # intersect shifted copies of these (column pruned away
            # for the tf-only searches: ids+counts stay the scan)
            F.sort_array(F.collect_list("p")).alias("positions"),
            # doc length rides the posting (p2 schema) — pruned
            # away by every non-BM25 consumer
            F.first("dl").alias("dl"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(buckets)))
    )


def compact_token_index(spark, sf_dir, old_min: int, new_min: int,
                        buckets: int = TOKEN_BUCKETS) -> tuple[str, str]:
    """Fold the increment into the index (VERDICT r6 item 5): advance
    the history boundary from ``old_min`` to ``new_min`` by MERGING the
    existing boundary artifacts with freshly-indexed postings/norms for
    old_min ≤ doc_id < new_min, registered as the m{new_min} artifacts.
    After compaction the steady-state query cost of the *_incremental
    searches (called with new_min) returns to the indexed floor — the
    increment leg is empty — matching the reference's b+tree, which
    stays query-fast because inserts maintain the index (ref
    src/server/storage.c:1624-1626).

    Cost contract: compaction tokenizes ONLY the increment's text; the
    history contributes its already-built postings/dl rows (ids+counts,
    not text — a Lucene-style segment merge). Both merged artifacts go
    through the standard ArtifactStore build contract (anonymous build
    dir, atomic register-after-build, crash mid-fold leaves an orphan
    that is never reused and the old boundary fully serviceable —
    pinned in test_artifacts.py), and the same content-derived bounded
    version a from-scratch m{new_min} build would get, so later
    token_index_dir/token_norms_dir calls at new_min reuse it verbatim.
    The superseded m{old_min} artifacts are retired (tombstone +
    session-epoch GC; live readers finish their session on them).

    If the old boundary was never built (or its source changed), the
    increment-only cost contract cannot hold — asking for it would
    silently tokenize ALL history text (ADVICE r7). In that case the
    fold skips straight to a from-scratch m{new_min} build, which costs
    the same tokenization but says so (one warning) and registers the
    identical artifacts."""
    import os
    import warnings

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    old_params = f"b{buckets}p2m{old_min}"
    old_nparams = f"norms1m{old_min}"
    old_registered = store.is_registered(
        f"tokidx:{src}:{old_params}",
        ArtifactStore.source_version_bounded(src, old_params, "doc_id",
                                             old_min),
    ) and store.is_registered(
        f"toknorms:{src}:{old_nparams}",
        ArtifactStore.source_version_bounded(src, old_nparams, "doc_id",
                                             old_min))
    if not old_registered:
        warnings.warn(
            f"compact_token_index: no m{old_min} boundary registered — "
            f"falling back to a from-scratch m{new_min} build (full "
            "history tokenization, not increment-only)", stacklevel=2)
        out = (token_index_dir(spark, sf_dir, buckets, max_doc=new_min),
               token_norms_dir(spark, sf_dir, max_doc=new_min))
        # a HALF-present old boundary (idx without norms or vice versa)
        # would otherwise linger registered forever; retire is a no-op
        # for absent names, so this keeps the one-live-boundary
        # invariant on every path
        store.retire(f"tokidx:{src}:{old_params}")
        store.retire(f"toknorms:{src}:{old_nparams}")
        return out
    old_idx = token_index_dir(spark, sf_dir, buckets, max_doc=old_min)
    old_norms = token_norms_dir(spark, sf_dir, max_doc=old_min)

    params = f"b{buckets}p2m{new_min}"
    version = ArtifactStore.source_version_bounded(
        src, params, "doc_id", new_min)

    def build_idx(out_dir: str) -> None:
        hist = (spark.read.option("basePath", old_idx).parquet(old_idx)
                .withColumn("bucket", F.col("bucket").cast("long")))
        inc = _postings_frame(spark, sf_dir, buckets, lo=old_min, hi=new_min)
        (hist.unionByName(inc).write.mode("overwrite")
         .partitionBy("bucket").parquet(out_dir))

    idx_dir = store.get_or_build(
        f"tokidx:{src}:{params}", version, build_idx, src=src)

    nparams = "norms1" + f"m{new_min}"
    nversion = ArtifactStore.source_version_bounded(
        src, nparams, "doc_id", new_min)

    def build_norms(out_dir: str) -> None:
        hist_dl = spark.read.parquet(os.path.join(old_norms, "dl"))
        inc_dl = (
            _tok(spark, sf_dir)
            .filter((F.col("doc_id") >= old_min) & (F.col("doc_id") < new_min))
            .select("doc_id", F.size("t").cast("long").alias("dl")))
        (hist_dl.unionByName(inc_dl).write.mode("overwrite")
         .parquet(os.path.join(out_dir, "dl")))
        (spark.read.parquet(os.path.join(out_dir, "dl"))
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("dl").alias("total_tokens"))
         .write.mode("overwrite").parquet(os.path.join(out_dir, "stats")))

    norms_dir = store.get_or_build(
        f"toknorms:{src}:{nparams}", nversion, build_norms, src=src)

    store.retire(f"tokidx:{src}:b{buckets}p2m{old_min}")
    store.retire(f"toknorms:{src}:norms1m{old_min}")
    return idx_dir, norms_dir


def _fs_exists(spark, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — one
    getFileStatus RPC per path, which IS a HEAD request on object
    stores (s3a/gs/abfs) and a stat on local/HDFS paths, so the
    O(|terms|) probe contract in _index_postings holds on every
    storage scheme, not just the driver's local filesystem. Local
    os.path only as a last-resort fallback if the JVM gateway is
    unreachable."""
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))
    except Exception:
        import os
        return os.path.isdir(path)


def _index_postings(spark, sf_dir, terms, buckets, max_doc=None):
    """Pruned postings scan shared by the index-path searches: the
    terms' bucket ids are computed up front (|terms| rows —
    driver-trivial) and ONLY those buckets' partition directories are
    handed to the reader (``basePath`` keeps the bucket partition
    column), so both discovery AND reading are O(|terms|) — the full
    bucket-dir walk that made b=1024 slower than b=64 on a tiny
    vocabulary (PERF.md) is gone; per probed path the cost is one
    existence check through the Hadoop FileSystem API (_fs_exists — a
    HEAD request on an object store, a stat locally). The literal
    bucket filter stays on top (PartitionFilters plan-pinned) and the
    exact term filter runs in-partition."""
    import os

    base = token_index_dir(spark, sf_dir, buckets, max_doc)
    return _pruned_postings(spark, base, terms, buckets)


def _pruned_postings(spark, base, terms, buckets):
    """The O(|terms|) pruned read of _index_postings against an
    EXPLICIT index dir — split out (r11) so derived indexes (the
    retracted takedown artifacts) share the identical probe path.

    r12 (guide §1.2): the term→bucket map is computed DRIVER-side with
    the pure-Python XXH64 twin of Spark's xxhash64 (functions/xxh.py,
    engine-pinned) instead of a createDataFrame+collect round-trip —
    that one-task Spark job was ~0.1-0.2 s of pure scheduling overhead
    on EVERY indexed-search call (~17 bench keys probe through here)."""
    import os

    from kstore_spark.functions.xxh import bucket_of

    term_buckets = sorted({bucket_of(t, buckets) for t in terms})
    paths = [p for p in (os.path.join(base, f"bucket={b}")
                         for b in term_buckets) if _fs_exists(spark, p)]
    if paths:
        idx = spark.read.option("basePath", base).parquet(*paths)
    else:
        # No probed bucket partition exists — a term's postings can
        # only live in its own hash bucket, so the result is exactly
        # empty; return it without any directory listing (also covers
        # the zero-row index a max_doc=0 history slice writes, which
        # has no part files to infer a schema from).
        idx = spark.createDataFrame(
            [], "tok string, doc_id bigint, tf bigint, "
                "positions array<int>, dl bigint, bucket bigint")
    return (
        idx.filter(F.col("bucket").isin(term_buckets))   # partition pruning
        .filter(F.col("tok").isin(list(terms)))          # exact, in-partition
    )


def text_search_indexed(spark, sf_dir, terms: tuple[str, ...] = SEARCH_TERMS,
                        buckets: int = TOKEN_BUCKETS):
    """Conjunctive (AND) term search through the persisted inverted
    index: docs containing EVERY term, with n_hits = total occurrences
    of the query terms. The term buckets are computed up front (one
    row per term — driver-trivial) and reach the index scan as literal
    partition predicates, so only |terms| of the ``buckets`` partitions
    are LISTED, let alone read (PartitionFilters plan-pinned); document
    text is never touched. Exact oracle: the contains-scan SQL over the
    documents table produces the identical (doc_id, n_hits) relation."""
    hits = _index_postings(spark, sf_dir, terms, buckets)
    return (
        hits
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("n_hits"))
        .filter(F.col("n_terms") == len(terms))          # conjunctive
        .select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))
    )


TEXT_SEARCH_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t
WHERE tok IN ({", ".join("'" + t + "'" for t in SEARCH_TERMS)})
GROUP BY doc_id
HAVING COUNT(DISTINCT tok) = {len(SEARCH_TERMS)}
"""


MSM_TERMS = ("dup", "join", "scan", "merge")  # 4 terms, require any 2
MSM_MIN = 2


def text_search_min_should_match(spark, sf_dir,
                                 terms: tuple[str, ...] = MSM_TERMS,
                                 min_match: int = MSM_MIN,
                                 buckets: int = TOKEN_BUCKETS):
    """Boolean min-should-match retrieval (the Lucene `minimumShouldMatch`
    operator — between pure AND and pure OR): docs matching at least
    ``min_match`` of the query terms, with the distinct-term and total
    occurrence counts. Same pruned-postings plan as the conjunctive
    search — the boolean mode only changes the HAVING bound, not the
    access path. Exact oracle: the scan SQL with the same bound."""
    hits = _index_postings(spark, sf_dir, terms, buckets)
    return (
        hits
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("n_hits"))
        .filter(F.col("n_terms") >= min_match)
        .select("doc_id", F.col("n_terms").cast("long").alias("n_terms"),
                F.col("n_hits").cast("long").alias("n_hits"))
    )


TEXT_SEARCH_MSM_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, COUNT(DISTINCT tok) AS n_terms, COUNT(*) AS n_hits
FROM t
WHERE tok IN ({", ".join("'" + t + "'" for t in MSM_TERMS)})
GROUP BY doc_id
HAVING COUNT(DISTINCT tok) >= {MSM_MIN}
"""


NEG_POS_TERMS = ("dup", "join")  # must contain ALL of these...
NEG_NEG_TERMS = ("merge",)       # ...and NONE of these (Lucene +a +b -c);
                                 # survivors 4/21 (sf0.001) and 7/20
                                 # (sf0.01): nonempty at both SFs AND
                                 # the prohibited clause visibly bites


def text_search_negation(spark, sf_dir,
                         pos_terms: tuple[str, ...] = NEG_POS_TERMS,
                         neg_terms: tuple[str, ...] = NEG_NEG_TERMS,
                         buckets: int = TOKEN_BUCKETS):
    """Boolean NOT retrieval (the Lucene `+a +b -c` prohibited clause
    — with AND=text_search_indexed and min-should-match this completes
    the boolean query algebra the index serves): docs containing EVERY
    positive term and NONE of the negative terms, n_hits counting
    positive occurrences only. Access path: |pos|+|neg| pruned
    postings partitions (the negative side reads doc_id ONLY — a
    prohibited clause never needs tf/positions), then one LEFT ANTI
    join on doc_id; join strategy left to AQE (a rare negative term
    broadcasts, a corpus-common one shuffle-joins ids — either way
    document text is never touched). Exact oracle: the contains-scan
    SQL with the NOT-IN subquery."""
    pos = _index_postings(spark, sf_dir, pos_terms, buckets)
    neg = (_index_postings(spark, sf_dir, neg_terms, buckets)
           .select("doc_id").distinct())
    return (
        pos.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("n_hits"))
        .filter(F.col("n_terms") == len(pos_terms))
        .join(neg, "doc_id", "left_anti")
        .select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))
    )


TEXT_SEARCH_NEGATION_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t
WHERE tok IN ({", ".join("'" + t + "'" for t in NEG_POS_TERMS)})
  AND doc_id NOT IN (
    SELECT DISTINCT doc_id FROM t
    WHERE tok IN ({", ".join("'" + t + "'" for t in NEG_NEG_TERMS)}))
GROUP BY doc_id
HAVING COUNT(DISTINCT tok) = {len(NEG_POS_TERMS)}
"""


PREFIX_QUERY = "jo"   # the prefix query ('jo*' → join, joib, ...)
VOCAB_PREFIX_LEN = 2  # vocab sidecar partition key = first 2 chars


def vocab_index_dir(spark, sf_dir, buckets: int = TOKEN_BUCKETS) -> str:
    """Prefix-partitioned VOCABULARY sidecar of the token index — the
    TermsEnum/term-dictionary analog the hash-bucketed postings can't
    provide (xxhash64 destroys lexicographic locality, so a prefix
    query against the postings alone would list every bucket): (term,
    df) partitioned by the term's first VOCAB_PREFIX_LEN characters.
    Built from the INDEX's postings rows (one groupBy over ids+counts
    — the corpus text is not re-tokenized), registered under the
    standard ArtifactStore contract against the same documents
    version. A prefix probe then LISTS exactly the partitions covering
    the prefix and resolves matching terms with a vocab-bounded read —
    the same resolve-then-probe shape as the SymSpell deletion index
    (text_search_fuzzy), with lexicographic instead of edit-distance
    neighborhoods."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    params = f"vocab{VOCAB_PREFIX_LEN}b{buckets}"
    version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        idx = spark.read.parquet(token_index_dir(spark, sf_dir, buckets))
        (idx.groupBy("tok")
         .agg(F.count(F.lit(1)).alias("df"))
         .withColumn("p", F.substring("tok", 1, VOCAB_PREFIX_LEN))
         .write.mode("overwrite").partitionBy("p").parquet(out_dir))

    return store.get_or_build(f"vocabidx:{src}:{params}", version, build,
                              src=src)


def text_search_prefix(spark, sf_dir, prefix: str = PREFIX_QUERY,
                       buckets: int = TOKEN_BUCKETS):
    """Prefix retrieval (the Lucene PrefixQuery `jo*`): resolve the
    prefix to its VOCABULARY terms through the prefix-partitioned
    sidecar (vocab_index_dir — for a prefix of ≥ VOCAB_PREFIX_LEN
    chars exactly ONE partition is listed; shorter prefixes list the
    partitions sharing the leading chars, still pruned at LISTING time
    via the partition-column startswith filter), then OR-probe the
    postings with the resolved set — text_search_fuzzy's
    resolve-then-probe shape with a lexicographic neighborhood.
    Output (doc_id, n_terms, n_hits): distinct matching terms and
    total occurrences per doc. The resolved-terms collect is
    vocab-prefix-bounded driver state, the same bound the fuzzy
    family's neighborhood collect carries. Exact oracle: the LIKE-scan
    SQL over the documents table."""
    vdir = vocab_index_dir(spark, sf_dir, buckets)
    vocab = (spark.read.parquet(vdir)
             .filter(F.col("p").startswith(prefix[:VOCAB_PREFIX_LEN]))
             .filter(F.col("tok").startswith(prefix)))
    terms = tuple(sorted(r["tok"] for r in vocab.select("tok").collect()))
    if not terms:
        return spark.createDataFrame(
            [], "doc_id bigint, n_terms bigint, n_hits bigint")
    hits = _index_postings(spark, sf_dir, terms, buckets)
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("n_hits"))
        .select("doc_id", F.col("n_terms").cast("long").alias("n_terms"),
                F.col("n_hits").cast("long").alias("n_hits"))
    )


TEXT_SEARCH_PREFIX_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id, COUNT(DISTINCT tok) AS n_terms, COUNT(*) AS n_hits
FROM t
WHERE tok LIKE '{PREFIX_QUERY}%'
GROUP BY doc_id
"""


RANKED_TERMS = ("dup", "join", "scan")  # one rare + two common terms:
                                        # the low-df term dominates the
                                        # idf-weighted score, as it should
RANKED_K = 15


def text_search_ranked(spark, sf_dir, terms: tuple[str, ...] = RANKED_TERMS,
                       k: int = RANKED_K, buckets: int = TOKEN_BUCKETS):
    """Ranked (OR) retrieval through the persisted inverted index:
    top-k docs by the repo's float-free TF-IDF score —
    score_ppm = Σ_t (tf · 1e6 div df_t) — with (score DESC, doc_id)
    tie-break. Everything is index-resident: per-term df IS the
    postings-row count of the already-pruned partitions (no corpus
    pass), the |terms|-row df table broadcasts back onto the same
    pruned scan, and the global top-k runs as TakeOrderedAndProject
    (per-partition heaps, no global sort) — document text is never
    touched. Exact oracle: the scan-path SQL over the documents table
    yields the identical (rank, doc_id, score_ppm) relation."""
    hits = _index_postings(spark, sf_dir, terms, buckets)
    return _ranked_topk(hits, k)


def _ranked_topk(hits, k):
    """Score and top-k a (tok, doc_id, tf) hits relation: float-free
    TF-IDF sum, TakeOrderedAndProject top-k, rank over the k rows."""
    df_t = hits.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "tok")
        .withColumn("term_score", F.expr("(tf * 1000000) div df"))
        .groupBy("doc_id")
        .agg(F.sum("term_score").cast("long").alias("score_ppm"))
    )
    top = scored.orderBy(F.col("score_ppm").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score_ppm").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))  # k rows only
        .select("rank", "doc_id", "score_ppm")
    )


INCR_DOC_MIN = 400  # doc_id >= this plays the "new crawl increment"
                    # (same operating point as the dedup/span/IVF
                    # incremental family — dedup.py INCR_NEW_MIN)


def text_search_incremental(spark, sf_dir, terms: tuple[str, ...] = RANKED_TERMS,
                            k: int = RANKED_K, buckets: int = TOKEN_BUCKETS,
                            new_min: int = INCR_DOC_MIN):
    """Ranked search over history + a fresh increment WITHOUT
    re-indexing: documents with doc_id >= ``new_min`` are "today's
    crawl"; the rest is the already-indexed corpus whose positional
    postings are on disk. The increment's postings are computed
    query-side (the doc_id >= new_min filter pushes to the documents
    scan, so history text is never re-tokenized — pinned), filtered to
    the query terms, and unioned with the history index's pruned
    partitions. For the query terms, history-pruned ∪ increment IS the
    full-corpus postings, so per-term df — and therefore every score —
    is exact: the oracle is text_search_ranked's full-corpus SQL
    verbatim. Same contract as dedup_minhash_incremental /
    dedup_substring_incremental / sim_ann_ivf_incremental: the
    increment pays increment-sized work, the answer is corpus-exact."""
    hist = (
        _index_postings(spark, sf_dir, terms, buckets, max_doc=new_min)
        .select("tok", "doc_id", "tf")
    )
    inc = (
        _tok(spark, sf_dir)
        .filter(F.col("doc_id") >= new_min)          # pushed to the scan
        .select("doc_id", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(list(terms)))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _ranked_topk(hist.unionByName(inc), k)


def _ranked_sql(terms: tuple[str, ...], k: int) -> str:
    """Full-corpus ranked-search oracle SQL (float-free TF-IDF top-k) —
    shared by text_search_ranked, the incremental search (whose
    history ∪ increment postings ARE the full-corpus postings for the
    query terms) and the lifecycle-fold entry."""
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM t
  WHERE tok IN ({", ".join("'" + t + "'" for t in terms)})
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), s AS (
  SELECT doc_id, CAST(SUM((tf * 1000000) // df) AS BIGINT) AS score_ppm
  FROM tf JOIN df USING (tok) GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT) AS rank,
       doc_id, score_ppm
FROM s
ORDER BY score_ppm DESC, doc_id
LIMIT {k}
"""


TEXT_SEARCH_RANKED_SQL = _ranked_sql(RANKED_TERMS, RANKED_K)


FOLD_OLD_MIN = 300  # the lifecycle entry's pre-fold history boundary
FOLD_TERMS = ("dup", "merge", "scan")  # distinct from RANKED_TERMS so
                                       # the entry is not a duplicate
                                       # row of text_search_ranked


def lifecycle_fold_search(spark, sf_dir, terms: tuple[str, ...] = FOLD_TERMS,
                          k: int = RANKED_K, buckets: int = TOKEN_BUCKETS):
    """The index LIFECYCLE as one driver-visible op (VERDICT r7 item
    4): build the history boundary at doc_id < FOLD_OLD_MIN, answer a
    ranked query incrementally off it, FOLD the increment into the
    boundary (compact_token_index — the maintenance unit matching the
    reference's b+tree, which stays query-fast because inserts maintain
    the index, ref src/server/storage.c:1624-1626), and answer the same
    query at the advanced boundary: the returned result is served off
    the FOLDED m{INCR_DOC_MIN} artifacts (same content version a
    from-scratch build gets — from-scratch-equality pinned in
    test_artifacts.py). Scores are corpus-exact at every boundary, so
    the oracle is the plain full-corpus ranked SQL.

    Runs inside a session-scoped artifact base (catalog.artifact_base):
    the fold RETIRES its old boundary, and retiring a SHARED boundary
    from a repeatable driver entry would churn artifacts other queries
    reuse (r7 ROADMAP candidate #2). Within one session repeat calls
    re-register the folded boundary instantly (content-version hit)."""
    import os
    import tempfile

    from kstore_spark.catalog import artifact_base

    base = os.path.join(
        tempfile.gettempdir(),
        f"kstore_fold_{spark.sparkContext.applicationId}")
    with artifact_base(base):
        # 1. the history boundary's artifacts (postings index + norms)
        token_index_dir(spark, sf_dir, buckets, max_doc=FOLD_OLD_MIN)
        token_norms_dir(spark, sf_dir, max_doc=FOLD_OLD_MIN)
        # 2. pre-fold: the increment (doc_id >= FOLD_OLD_MIN) is
        #    resolved query-side against the history index
        text_search_incremental(
            spark, sf_dir, terms, k, buckets, new_min=FOLD_OLD_MIN).count()
        # 3. the fold advances the boundary to INCR_DOC_MIN: history
        #    contributes built postings (never re-tokenized), only
        #    FOLD_OLD_MIN <= doc_id < INCR_DOC_MIN text is indexed
        compact_token_index(spark, sf_dir, FOLD_OLD_MIN, INCR_DOC_MIN,
                            buckets)
        # 4. post-fold: the same query now reads the folded artifacts
        #    with a small steady-state increment leg
        return text_search_incremental(
            spark, sf_dir, terms, k, buckets, new_min=INCR_DOC_MIN)


LIFECYCLE_FOLD_SEARCH_SQL = _ranked_sql(FOLD_TERMS, RANKED_K)


BM25_K1_MILLI = 1200  # k1 = 1.2 — the classic tf-saturation knob
BM25_B_MILLI = 750    # b = 0.75 — the classic length-normalization knob


def token_norms_dir(spark, sf_dir, max_doc: int | None = None) -> str:
    """Build (once) and register the document-norms artifact:
    ``stats/`` holds the single (n_docs, total_tokens) row BM25 needs
    for its corpus constants, and ``dl/`` holds (doc_id, dl) — per-doc
    token count — for consumers that want norms without postings (the
    query-time dl itself rides each posting row since the p2 index
    schema). Both are written at index time so a query never aggregates
    (or even scans) the corpus for its normalization constants. Same ArtifactStore contract as the token
    index (crash-safe register-after-build, epoch GC, content-version
    key). At 100 TB this is the standard "norms file" of a search
    engine: N rows of two ints next to a corpus of full documents."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    # m<N> = history slice (doc_id < max_doc), versioned over only the
    # files that can hold history rows so appends don't invalidate it —
    # same contract as the token index's history slice.
    params = "norms1" + (f"m{max_doc}" if max_doc is not None else "")
    if max_doc is not None:
        version = ArtifactStore.source_version_bounded(
            src, params, "doc_id", max_doc)
    else:
        version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        docs = _tok(spark, sf_dir)
        if max_doc is not None:
            docs = docs.filter(F.col("doc_id") < max_doc)
        norms = docs.select(
            "doc_id", F.size("t").cast("long").alias("dl"))
        norms.write.mode("overwrite").parquet(os.path.join(out_dir, "dl"))
        (spark.read.parquet(os.path.join(out_dir, "dl"))
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("dl").alias("total_tokens"))
         .write.mode("overwrite").parquet(os.path.join(out_dir, "stats")))

    return store.get_or_build(f"toknorms:{src}:{params}", version, build, src=src)


def _bm25_topk(hits, stats, k):
    """Score a (tok, doc_id, tf, dl) hits relation with fixed-point
    BM25 and return the top-k. dl rides on every hit row (p2 posting
    schema — the Lucene norms trick), so scoring never joins a
    corpus-sized norms relation. All arithmetic is int64 with
    truncating div, so the DuckDB mirror is exact:

      dl_ratio_ppk = dl·N·1000 div total_tokens          (≈ 1000·dl/avgdl)
      tfsat_ppm    = tf·(1000+k1)·10⁶ div
                     (tf·1000 + k1·(1000−b + b·dl_ratio_ppk div 1000) div 1000)
      idf_milli    = (2N−2df+1)·1000 div (2df+1) + 1000
      score_ppm    = Σ_t idf_milli·tfsat_ppm div 1000

    idf is the rational odds ratio (N−df+0.5)/(df+0.5)+1 WITHOUT the
    log — a log has no exact fixed-point mirror; per-term ordering is
    the same monotone-in-df order, and BM25's actual contributions over
    TF-IDF (tf saturation at k1, dl normalization at b) are exact.
    Overflow bound: idf_milli·tfsat_ppm ≤ 2N·1000·2.2·10⁶ — int64-safe
    to N ≈ 2·10⁹ docs per index shard (document-count, not bytes)."""
    df_t = hits.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(stats))
        .withColumn("dl_ratio_ppk",
                    F.expr("(dl * n_docs * 1000) div total_tokens"))
        .withColumn("tfsat_ppm", F.expr(
            f"(tf * {1000 + BM25_K1_MILLI} * 1000000) div "
            f"(tf * 1000 + ({BM25_K1_MILLI} * ({1000 - BM25_B_MILLI} + "
            f"({BM25_B_MILLI} * dl_ratio_ppk) div 1000)) div 1000)"))
        .withColumn("idf_milli", F.expr(
            "((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1) + 1000"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("(idf_milli * tfsat_ppm) div 1000"))
             .cast("long").alias("score_ppm"))
    )
    top = scored.orderBy(F.col("score_ppm").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score_ppm").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))  # k rows only
        .select("rank", "doc_id", "score_ppm")
    )


def text_search_bm25(spark, sf_dir, terms: tuple[str, ...] = RANKED_TERMS,
                     k: int = RANKED_K, buckets: int = TOKEN_BUCKETS):
    """BM25 ranked (OR) retrieval through the persisted inverted index,
    float-free (see _bm25_topk for the exact fixed-point formula and
    the documented no-log idf). Everything is index/artifact-resident:
    the postings scan prunes to the query terms' bucket partitions,
    per-term df is the pruned postings count, dl rides each posting row
    (p2 schema — the Lucene norms trick, so there is NO corpus-sized
    join at query time), and the corpus constants (N, total tokens)
    come from the norms artifact's 1-row stats table, broadcast — a
    query never aggregates the corpus and never touches document text.
    Global top-k is TakeOrderedAndProject. Exact oracle: the scan-path
    SQL with the same integer formula."""
    hits = _index_postings(spark, sf_dir, terms, buckets).select(
        "tok", "doc_id", "tf", "dl")
    import os

    nd = token_norms_dir(spark, sf_dir)
    stats = spark.read.parquet(os.path.join(nd, "stats"))
    return _bm25_topk(hits, stats, k)


def text_search_bm25_incremental(spark, sf_dir,
                                 terms: tuple[str, ...] = RANKED_TERMS,
                                 k: int = RANKED_K,
                                 buckets: int = TOKEN_BUCKETS,
                                 new_min: int = INCR_DOC_MIN):
    """BM25 over history + a fresh increment WITHOUT re-indexing and
    WITHOUT re-deriving the corpus constants: history postings and
    history norms come from the bounded on-disk artifacts; the
    increment's postings, dl rows, and (n_docs, total_tokens) delta are
    computed query-side behind a pushed doc_id bound (history text
    never reaches a scan); the 1-row corpus stats are history-stats +
    increment-delta — so df, dl, N and total_tokens all equal their
    full-corpus values and every score is corpus-exact. Oracle: the
    full-corpus BM25 scan SQL verbatim. Same increment-pays-increment
    contract as the rest of the *_incremental family."""
    import os

    hist = (
        _index_postings(spark, sf_dir, terms, buckets, max_doc=new_min)
        .select("tok", "doc_id", "tf", "dl")
    )
    inc_docs = _tok(spark, sf_dir).filter(F.col("doc_id") >= new_min)
    inc = (
        inc_docs
        .select("doc_id", F.size("t").cast("long").alias("dl"),
                F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(list(terms)))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    nd = token_norms_dir(spark, sf_dir, max_doc=new_min)
    inc_norms = inc_docs.select(
        "doc_id", F.size("t").cast("long").alias("dl"))
    stats = (
        spark.read.parquet(os.path.join(nd, "stats"))
        .join(F.broadcast(
            inc_norms.agg(
                F.count(F.lit(1)).alias("inc_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("inc_tokens"))))
        .select(
            (F.col("n_docs") + F.col("inc_docs")).alias("n_docs"),
            # an EMPTY history slice (new_min ≤ min doc_id) writes its
            # stats row as SUM over zero rows → NULL total_tokens;
            # coalesce so the whole-corpus-as-increment case stays exact
            (F.coalesce(F.col("total_tokens"), F.lit(0))
             + F.col("inc_tokens")).alias("total_tokens"))
    )
    return _bm25_topk(hist.unionByName(inc), stats, k)


def _bm25_sql(terms, k, not_in=()) -> str:
    """The float-free BM25 scan oracle, optionally minus a takedown
    set: the exclusion lands in the t CTE, so dl, stats (N,
    total_tokens → avgdl), tf AND df all derive from survivors —
    mirroring what the retracted artifacts carry."""
    excl = (f"\n  WHERE doc_id NOT IN ({', '.join(map(str, sorted(not_in)))})"
            if not_in else "")
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents{excl}
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY doc_id
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM t
  WHERE tok IN ({", ".join("'" + t + "'" for t in terms)})
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), s AS (
  SELECT tf.doc_id,
         CAST(SUM(
           ((((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1) + 1000)
            * ((tf * {1000 + BM25_K1_MILLI} * 1000000) //
               (tf * 1000 + ({BM25_K1_MILLI} * ({1000 - BM25_B_MILLI} +
                ({BM25_B_MILLI} * ((dl.dl * n_docs * 1000) // total_tokens))
                // 1000)) // 1000)))
           // 1000
         ) AS BIGINT) AS score_ppm
  FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT) AS rank,
       doc_id, score_ppm
FROM s
ORDER BY score_ppm DESC, doc_id
LIMIT {k}
"""


TEXT_SEARCH_BM25_SQL = _bm25_sql(RANKED_TERMS, RANKED_K)


FUZZY_TERM = "joib"   # a 1-substitution typo of the common term 'join'
FUZZY_BUCKETS = 64    # deletion-index hash partitions (tracks vocab)
# Deletion-variant expansion cap (VERDICT r7 item 6): a term longer
# than this emits ONLY itself into the index (no deletion variants) —
# one 1,000-char garbage token (URL, base64 blob — normal in crawl
# corpora) would otherwise explode into ~|t|²/2 ≈ 500k depth-2 variant
# rows. The cap is LOSSLESS for any query term with
# len(q) <= FUZZY_MAX_TERM_LEN - max_dist: levenshtein(a, b) >=
# abs(len(a) - len(b)), so a capped term could only match a query
# within distance d if len(q) >= cap - d; _fuzzy_neighborhood enforces
# that bound on query terms, making the exact-recall guarantee a
# precondition rather than a hope. (SymSpell practice is a prefix cap
# with approximate recall; the length filter keeps recall exact.)
FUZZY_MAX_TERM_LEN = 32


# depth-1 deletions of `term`, as a SQL array expression
_DEL1_EXPR = ("transform(sequence(1, length(term)),"
              " i -> concat(substring(term, 1, i - 1),"
              "             substring(term, i + 1, length(term))))")
# depth-2 deletions (delete positions i < j, both 1-based): keep
# [1..i-1] ∪ [i+1..j-1] ∪ [j+1..n]. Guarded: sequence(a, b) with a > b
# generates a DESCENDING range in Spark, so both loops are clamped.
_DEL2_EXPR = (
    "CASE WHEN length(term) >= 2 THEN flatten("
    " transform(sequence(1, length(term) - 1),"
    "  i -> transform(sequence(i + 1, length(term)),"
    "   j -> concat(substring(term, 1, i - 1),"
    "               substring(term, i + 1, j - i - 1),"
    "               substring(term, j + 1, length(term))))))"
    " ELSE CAST(array() AS array<string>) END")


def deletion_index_dir(spark, sf_dir, buckets: int = FUZZY_BUCKETS,
                       depth: int = 1) -> str:
    """Build (once) and register the SymSpell deletion index: for every
    DISTINCT corpus term, one row per ≤``depth``-deletion variant (plus
    the term itself) → (variant, term, df), written partitionBy(pmod(
    xxhash64(variant), buckets)). Two terms are within edit distance d
    iff their ≤d-deletion sets intersect (Garbe's SymSpell
    observation), so a fuzzy lookup reads only the query's own
    variants' partitions — vocab-sized build (×~|t|²/2 rows at
    depth 2, still vocab-bounded), k-partition probe. Same
    ArtifactStore contract as the token/norms indexes."""
    import os

    from kstore_spark.catalog import ArtifactStore

    assert depth in (1, 2)
    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    params = f"fz{buckets}d{depth}L{FUZZY_MAX_TERM_LEN}"
    version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        vocab = (
            _tok(spark, sf_dir)
            .select(F.explode("t").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        var_expr = F.array_union(
            F.array(F.col("term")), F.expr(_DEL1_EXPR))
        if depth == 2:
            var_expr = F.array_union(var_expr, F.expr(_DEL2_EXPR))
        # over-length terms are EXCLUDED from fuzzy matching entirely
        # (they emit only themselves, and _fuzzy_neighborhood rejects
        # query terms longer than FUZZY_MAX_TERM_LEN - max_dist with a
        # ValueError) — exact/indexed search remains their access path
        var_expr = F.when(
            F.length("term") <= FUZZY_MAX_TERM_LEN, var_expr
        ).otherwise(F.array(F.col("term")))
        variants = vocab.select(
            "term", "df", F.explode(var_expr).alias("variant"),
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("variant"), F.lit(buckets)))
        variants.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)

    return store.get_or_build(f"delidx:{src}:{params}", version, build,
                              src=src)


def _del_variants(t: str, depth: int) -> set[str]:
    """{t} ∪ all strings reachable by ≤depth single-char deletions."""
    out, frontier = {t}, {t}
    for _ in range(depth):
        frontier = {v[:i] + v[i + 1:] for v in frontier for i in range(len(v))}
        out |= frontier
    return out


def _fuzzy_neighborhood(spark, sf_dir, q_terms: tuple[str, ...],
                        buckets: int, max_dist: int = 1) -> tuple[str, ...]:
    """Resolve the union of the query terms' edit-distance-≤max_dist
    vocabulary neighborhoods through the SymSpell deletion index in ONE
    probe: every query term's ≤max_dist-deletion variants become
    literal partition predicates (vocabulary never scanned), candidates
    are verified with EXACT levenshtein ≤ max_dist against ANY query
    term. Returns the matched vocabulary terms (bounded driver collect:
    a union of edit-≤max_dist neighborhoods)."""
    too_long = [t for t in q_terms
                if len(t) > FUZZY_MAX_TERM_LEN - max_dist]
    if too_long:  # outside the index's exact-recall precondition
        raise ValueError(
            f"fuzzy query terms exceed {FUZZY_MAX_TERM_LEN - max_dist} "
            f"chars (deletion index caps variant expansion at "
            f"{FUZZY_MAX_TERM_LEN}): {too_long}")
    idx = spark.read.parquet(
        deletion_index_dir(spark, sf_dir, buckets, depth=max_dist))
    from kstore_spark.functions.xxh import bucket_of

    q_vars = sorted({v for t in q_terms for v in _del_variants(t, max_dist)})
    # driver-side bucket map (pure-Python xxhash64 twin, engine-pinned)
    # — same r12 job-overhead removal as _pruned_postings
    var_buckets = sorted({bucket_of(v, buckets) for v in q_vars})
    lev_min = F.least(*[F.levenshtein(F.col("term"), F.lit(t))
                        for t in q_terms]) if len(q_terms) > 1 else \
        F.levenshtein(F.col("term"), F.lit(q_terms[0]))
    matched = (
        idx.filter(F.col("bucket").isin(var_buckets))  # partition pruning
        .filter(F.col("variant").isin(q_vars))
        .select("term").distinct()
        .filter(lev_min <= max_dist)  # exact verification
    )
    return tuple(sorted(r["term"] for r in matched.collect()))  # bounded


def _fuzzy_search(spark, sf_dir, q_terms: tuple[str, ...],
                  buckets: int, tok_buckets: int, max_dist: int = 1):
    """Shared OR-search over the resolved fuzzy neighborhood: per-doc
    total occurrences of any matched term, via the token index's
    pruned postings. Document text is never scanned in either stage."""
    terms = _fuzzy_neighborhood(spark, sf_dir, q_terms, buckets, max_dist)
    if not terms:  # empty neighborhood → empty (doc_id, n_hits) frame
        return spark.createDataFrame([], "doc_id bigint, n_hits bigint")
    hits = _index_postings(spark, sf_dir, terms, tok_buckets)
    return (
        hits.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_hits"))
    )


def text_search_fuzzy(spark, sf_dir, term: str = FUZZY_TERM,
                      buckets: int = FUZZY_BUCKETS,
                      tok_buckets: int = TOKEN_BUCKETS):
    """Spelling-tolerant search: docs containing ANY vocabulary term
    within edit distance 1 of ``term``, with per-doc occurrence counts.
    Stage 1 (term resolution) is the SymSpell deletion index
    (_fuzzy_neighborhood); stage 2 the token index's pruned OR search.
    The oracle needs no index: it brute-forces levenshtein over the
    (vocab-sized) distinct-term relation — identical DP in Spark and
    DuckDB."""
    return _fuzzy_search(spark, sf_dir, (term,), buckets, tok_buckets)


FUZZY_TERMS = ("joib", "scam")  # two 1-edit typos ('join', 'scan') —
                                # the multi-term query shape real fuzzy
                                # retrieval sends (VERDICT r6 item 8)


def text_search_fuzzy_multi(spark, sf_dir,
                            terms: tuple[str, ...] = FUZZY_TERMS,
                            buckets: int = FUZZY_BUCKETS,
                            tok_buckets: int = TOKEN_BUCKETS):
    """Multi-term fuzzy retrieval (VERDICT r6 item 8): per-term edit-1
    neighborhood resolution over the WHOLE query list in one deletion-
    index probe, then one OR search over the union neighborhood —
    Σ(|qᵢ|+1) variant partitions + |matched terms| token partitions
    read, independent of corpus size. n_hits counts every occurrence
    of any neighborhood term (a doc matching both typos' neighborhoods
    counts both)."""
    return _fuzzy_search(spark, sf_dir, tuple(terms), buckets, tok_buckets)


FUZZY2_TERM = "jion"  # a transposition typo of 'join' — levenshtein 2
                      # (one deletion + one insertion), invisible to the
                      # distance-1 search: the case depth 2 exists for


def text_search_fuzzy2(spark, sf_dir, term: str = FUZZY2_TERM,
                       buckets: int = FUZZY_BUCKETS,
                       tok_buckets: int = TOKEN_BUCKETS):
    """Distance-2 fuzzy search — SymSpell's standard operating point
    (Garbe: deletion depth = max edit distance): candidates are terms
    whose ≤2-deletion sets intersect the query's ≤2-deletion set
    (depth-2 deletion index, ~|t|²/2 variants per vocab term — still
    vocab-bounded; the probe reads only the query's own
    1+|q|+C(|q|,2) variants' partitions), verified with EXACT
    levenshtein ≤ 2. Catches transpositions ('jion'→'join'), which are
    distance 2 under plain edit distance and invisible to the
    distance-1 search. Oracle: brute-force levenshtein ≤ 2 over the
    distinct-term relation."""
    return _fuzzy_search(spark, sf_dir, (term,), buckets, tok_buckets,
                         max_dist=2)


FUZZY2_TERMS = ("jion", "scna")  # transposition typos of 'join' and
                                 # 'scan' — both levenshtein 2, so a
                                 # distance-1 multi search finds neither


def text_search_fuzzy2_multi(spark, sf_dir,
                             terms: tuple[str, ...] = FUZZY2_TERMS,
                             buckets: int = FUZZY_BUCKETS,
                             tok_buckets: int = TOKEN_BUCKETS):
    """The combined shape (VERDICT r7 item 8): MULTI-term fuzzy
    retrieval at distance 2 — `_fuzzy_search` was always
    (terms tuple × max_dist)-general; this entry exercises both axes at
    once. All query terms' ≤2-deletion variant sets resolve in ONE
    depth-2 index probe (Σᵢ (1+|qᵢ|+C(|qᵢ|,2)) variants' partitions
    read), exact levenshtein ≤ 2 vs ANY query term verifies, then one
    OR search over the union neighborhood through the token index.
    Oracle: brute-force min-levenshtein ≤ 2 over the distinct-term
    relation (identical DP both engines)."""
    return _fuzzy_search(spark, sf_dir, tuple(terms), buckets, tok_buckets,
                         max_dist=2)


TEXT_SEARCH_FUZZY_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT DISTINCT tok AS term FROM t
  WHERE levenshtein(tok, '{FUZZY_TERM}') <= 1
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t JOIN m ON t.tok = m.term
GROUP BY doc_id
"""


TEXT_SEARCH_FUZZY2_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT DISTINCT tok AS term FROM t
  WHERE levenshtein(tok, '{FUZZY2_TERM}') <= 2
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t JOIN m ON t.tok = m.term
GROUP BY doc_id
"""


def text_search_fuzzy_ranked(spark, sf_dir, term: str = FUZZY_TERM,
                             k: int = RANKED_K,
                             buckets: int = FUZZY_BUCKETS,
                             tok_buckets: int = TOKEN_BUCKETS):
    """Fuzzy retrieval with RANKING (r8): the query term's edit-1
    vocabulary neighborhood (SymSpell deletion-index probe + exact
    levenshtein verify) feeds the float-free TF-IDF top-k instead of
    the flat OR search — what a search box actually wants back for a
    typo ('joib' ranks docs by tf·idf over {{join, ...}}). Access path
    is the composition of two already-pinned pieces: |q|+1 deletion
    partitions + |neighborhood| token partitions read, document text
    never scanned, top-k as TakeOrderedAndProject. Oracle: brute-force
    levenshtein neighborhood + the ranked SQL, both engine-exact."""
    terms = _fuzzy_neighborhood(spark, sf_dir, (term,), buckets, 1)
    if not terms:
        return spark.createDataFrame(
            [], "rank int, doc_id bigint, score_ppm bigint")
    hits = _index_postings(spark, sf_dir, terms, tok_buckets).select(
        "tok", "doc_id", "tf")
    return _ranked_topk(hits, k)


TEXT_SEARCH_FUZZY_RANKED_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT DISTINCT tok AS term FROM t
  WHERE levenshtein(tok, '{FUZZY_TERM}') <= 1
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM t
  JOIN m ON t.tok = m.term
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), s AS (
  SELECT doc_id, CAST(SUM((tf * 1000000) // df) AS BIGINT) AS score_ppm
  FROM tf JOIN df USING (tok) GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT) AS rank,
       doc_id, score_ppm
FROM s
ORDER BY score_ppm DESC, doc_id
LIMIT {RANKED_K}
"""


TEXT_SEARCH_FUZZY2_MULTI_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT DISTINCT tok AS term FROM t
  WHERE {" OR ".join(f"levenshtein(tok, '{q}') <= 2" for q in FUZZY2_TERMS)}
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t JOIN m ON t.tok = m.term
GROUP BY doc_id
"""


TEXT_SEARCH_FUZZY_MULTI_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT DISTINCT tok AS term FROM t
  WHERE {" OR ".join(f"levenshtein(tok, '{q}') <= 1" for q in FUZZY_TERMS)}
)
SELECT doc_id, COUNT(*) AS n_hits
FROM t JOIN m ON t.tok = m.term
GROUP BY doc_id
"""


SNIPPET_WINDOW = 2  # tokens of context on each side of the first hit


def text_search_snippets(spark, sf_dir, terms: tuple[str, ...] = RANKED_TERMS,
                         k: int = RANKED_K, buckets: int = TOKEN_BUCKETS,
                         window: int = SNIPPET_WINDOW):
    """Ranked retrieval with snippets — the reference's
    SELECT→FETCH late materialization (ref src/server/engine.c select/
    fetch pipeline; SURVEY §2 FETCH) applied to search: ranking runs
    entirely on the index/norms artifacts (text_search_bm25), and
    document TEXT is fetched for exactly the k winners. The k doc_ids
    (a bounded, k-row driver collect — same boundary as the ANN query
    vectors) become a LITERAL IN predicate pushed into the documents
    scan, so parquet row-group stats skip everything but the k rows'
    groups — a point-gather, not a corpus scan. The snippet is the
    ±window tokens around the first occurrence of any query term; that
    position comes from the positional index (min over the terms'
    first postings positions), not from re-searching the text.
    Exact oracle: scan SQL with the same BM25 CTE + list_slice."""
    top = text_search_bm25(spark, sf_dir, terms, k, buckets)
    ids = [r["doc_id"] for r in top.select("doc_id").collect()]  # k rows
    firsts = (
        _index_postings(spark, sf_dir, terms, buckets)
        .filter(F.col("doc_id").isin(ids))  # k docs' postings only
        .select("doc_id", F.element_at("positions", 1).alias("p0"))
        .groupBy("doc_id")
        .agg(F.min("p0").cast("long").alias("pos"))
    )
    fetched = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))  # literal IN → row-group skip
        .select("doc_id", F.split("text", " ").alias("t"))
    )
    start1 = F.greatest(F.col("pos") - window + 1, F.lit(1))  # 1-based
    end1 = F.least(F.col("pos") + window + 1, F.size("t").cast("long"))
    return (
        top.join(F.broadcast(firsts), "doc_id")
        .join(F.broadcast(fetched), "doc_id")
        .select(
            "rank", "doc_id", "score_ppm", "pos",
            F.concat_ws(
                " ", F.slice("t", start1, end1 - start1 + 1)
            ).alias("snippet"))
    )


def _snippets_sql() -> str:
    pos_terms = ", ".join(
        f"NULLIF(list_position(t.tok, '{w}'), 0)" for w in RANKED_TERMS)
    # reuse the BM25 CTEs up to the ranked top-k, then slice the text
    head = TEXT_SEARCH_BM25_SQL.rpartition("SELECT CAST(ROW_NUMBER()")[0]
    return f"""
{head}, top AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT)
           AS rank, doc_id, score_ppm
  FROM s ORDER BY score_ppm DESC, doc_id LIMIT {RANKED_K}
), tokd AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
)
SELECT top.rank, top.doc_id, top.score_ppm,
       CAST(LEAST({pos_terms}) - 1 AS BIGINT) AS pos,
       array_to_string(list_slice(
         t.tok,
         GREATEST(LEAST({pos_terms}) - {SNIPPET_WINDOW}, 1),
         LEAST(LEAST({pos_terms}) + {SNIPPET_WINDOW}, len(t.tok))
       ), ' ') AS snippet
FROM top JOIN tokd t ON top.doc_id = t.doc_id
"""


TEXT_SEARCH_SNIPPETS_SQL = _snippets_sql()


PHRASE = ("join", "key")  # adjacent-token phrase; both tokens common
                          # (df ≈ 0.75·N) so the win is positional, not
                          # selectivity — the hard case for a phrase index


def text_search_phrase(spark, sf_dir, phrase: tuple[str, ...] = PHRASE,
                       buckets: int = TOKEN_BUCKETS):
    """Exact phrase search through the positional inverted index:
    docs where the phrase's tokens appear CONSECUTIVELY, with
    n_occurrences counting every (possibly overlapping) start position.
    Term i's postings contribute positions shifted by −i, and the
    phrase's start positions are the intersection of all shifted lists
    (row-local array_intersect — positions are per-(tok,doc) sorted
    arrays, so no positional explode). The |phrase| per-term branches
    each prune to their term's hash partition and join on doc_id;
    AQE broadcasts when a rare term makes one side small. Document
    text is never read. Exact oracle: the scan-path SQL checks
    tok[i..i+n-1] equality per start index — the same overlapping-
    occurrence semantics (delimiter-split SQL would undercount
    back-to-back occurrences, so the oracle indexes, not splits)."""
    # ONE store resolution + ONE bucket-id collect for the whole phrase
    # (per-term _index_postings calls would re-open the registry and
    # re-walk the source once per token on the hot search path); each
    # branch then filters its term from the shared pruned scan
    hits = _index_postings(
        spark, sf_dir, tuple(dict.fromkeys(phrase)), buckets
    ).select("tok", "doc_id", "positions")
    branches = []
    for i, term in enumerate(phrase):
        b = hits.filter(F.col("tok") == term).select(
            "doc_id",
            F.transform("positions", lambda x: x - i).alias(f"p{i}"),  # noqa: B023
        )
        branches.append(b)
    joined = branches[0]
    for i in range(1, len(phrase)):
        joined = joined.join(branches[i], "doc_id")
    starts = F.col("p0")
    for i in range(1, len(phrase)):
        starts = F.array_intersect(starts, F.col(f"p{i}"))
    return (
        joined.select("doc_id", F.size(starts).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
        .select("doc_id", F.col("n_occurrences").cast("long").alias("n_occurrences"))
    )


TEXT_SEARCH_PHRASE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
), starts AS (
  SELECT doc_id, tok, unnest(range(1, len(tok) - {len(PHRASE) - 1} + 1)) AS i
  FROM t
)
SELECT doc_id, COUNT(*) AS n_occurrences
FROM starts
WHERE {" AND ".join(f"tok[i + {j}] = '{w}'" for j, w in enumerate(PHRASE))}
GROUP BY doc_id
"""


RETRACT_ISIN_MAX = 64  # above this, the takedown anti-filter switches
                       # from an In(...) literal predicate to a
                       # broadcast anti-join (VERDICT r11 item 5): isin
                       # plan-pins best and is ideal for bounded sets,
                       # but a GDPR-scale batch (10⁶ ids) would compile
                       # a megaliteral predicate into the plan tree


def anti_filter_ids(df, col: str, ids):
    """The takedown anti-filter, scale-safe: drop every row whose
    ``col`` is in ``ids``. Small sets (≤ RETRACT_ISIN_MAX) stay the
    literal ``~isin`` predicate — it pushes to the scan and reads as a
    plain Filter in plan snapshots; larger sets become a broadcast
    LEFT ANTI join against a takedown-set DataFrame, so the predicate
    size is O(1) in the plan and the id set ships once per executor as
    a broadcast hash relation (the corpus side never shuffles on
    either path). The two paths are construction-equal by definition
    (same survivor set); pinned in pytest on the retraction builds. At
    true takedown-service scale the kill set would arrive as a TABLE —
    pass it straight to the anti-join seam instead of a Python list."""
    ids = sorted({int(i) for i in ids})
    if len(ids) <= RETRACT_ISIN_MAX:
        return df.filter(~F.col(col).isin(ids))
    kill = df.sparkSession.createDataFrame(
        [(i,) for i in ids], f"{col} long")
    return df.join(F.broadcast(kill), col, "left_anti")


def retract_token_index(spark, sf_dir, deleted_ids,
                        buckets: int = TOKEN_BUCKETS) -> tuple[str, str]:
    """Tombstone-style document RETRACTION from the index family — the
    DELETE leg the lifecycle was missing (build → probe → fold →
    streaming ADD existed; takedown/right-to-be-forgotten is the
    production reality this closes, and DELETE is a §2 operator the
    table layer already carries): drop every posting and norm row of
    ``deleted_ids`` WITHOUT re-tokenizing anything — one
    partition-parallel anti-filter pass over ids+counts rows, the
    Lucene applyDeletes/segment-rewrite shape. At 100 TB a takedown
    costs an index rewrite (bytes of ids and counts), never a corpus
    re-ingest; document text is not touched. The norms artifact takes
    the same pass: dl rows filtered, corpus stats (n_docs /
    total_tokens → BM25's avgdl) recomputed from the SURVIVORS, so a
    BM25 off the retracted pair normalizes against the post-takedown
    corpus, not a ghost of it.

    Registered under retraction-set-keyed params (md5 of the sorted id
    list) with the standard content-derived source version — the same
    takedown set on the same corpus reuses the artifact verbatim; the
    SOURCE index is NOT retired (it stays the canonical artifact — a
    retraction is a derived view, and other retraction sets derive
    from the same parent). Construction equality (retracted postings
    == a fresh build over corpus-minus-deleted) pinned in pytest."""
    import hashlib
    import os

    from kstore_spark.catalog import ArtifactStore

    ids = sorted({int(i) for i in deleted_ids})
    assert ids, "empty retraction set — nothing to do"
    tag = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()[:8]
    src = os.path.join(sf_dir, "documents.parquet")
    store = ArtifactStore()
    base_idx = token_index_dir(spark, sf_dir, buckets)
    base_norms = token_norms_dir(spark, sf_dir)

    params = f"b{buckets}p2r{tag}"
    version = ArtifactStore.source_version(src, params)

    def build_idx(out_dir: str) -> None:
        hist = (spark.read.option("basePath", base_idx).parquet(base_idx)
                .withColumn("bucket", F.col("bucket").cast("long")))
        (anti_filter_ids(hist, "doc_id", ids)
         .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))

    idx_dir = store.get_or_build(
        f"tokidx:{src}:{params}", version, build_idx, src=src)

    nparams = f"norms1r{tag}"
    nversion = ArtifactStore.source_version(src, nparams)

    def build_norms(out_dir: str) -> None:
        dl = anti_filter_ids(
            spark.read.parquet(os.path.join(base_norms, "dl")),
            "doc_id", ids)
        dl.write.mode("overwrite").parquet(os.path.join(out_dir, "dl"))
        (spark.read.parquet(os.path.join(out_dir, "dl"))
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("dl").alias("total_tokens"))
         .write.mode("overwrite").parquet(os.path.join(out_dir, "stats")))

    norms_dir = store.get_or_build(
        f"toknorms:{src}:{nparams}", nversion, build_norms, src=src)
    return idx_dir, norms_dir


RETRACT_IDS = (8, 45, 77, 200, 323)  # the fixed takedown set — 8/45/323
                                     # sit in the unretracted top ranks,
                                     # so the retraction visibly reshapes
                                     # the result, not just shrinks it


def text_search_retracted(spark, sf_dir,
                          deleted_ids: tuple[int, ...] = RETRACT_IDS,
                          terms: tuple[str, ...] = RANKED_TERMS,
                          k: int = RANKED_K, buckets: int = TOKEN_BUCKETS):
    """Ranked retrieval off the RETRACTED index — the driver-visible
    DELETE lifecycle: full build → takedown retraction
    (retract_token_index — index bytes only) → the same pruned-probe
    ranked search, which must neither resurface a deleted doc NOR
    score as if it still existed (per-term df is the postings-row
    count of the retracted partitions, so every idf shifts with the
    takedown — the subtle half of delete-correctness). Exact oracle:
    the full ranked SQL with the takedown set excluded BEFORE df is
    computed, mirroring the engine's survivor-derived scores."""
    idx_dir, _ = retract_token_index(spark, sf_dir, deleted_ids, buckets)
    hits = _pruned_postings(spark, idx_dir, terms, buckets)
    return _ranked_topk(hits.select("tok", "doc_id", "tf"), k)


def _ranked_retracted_sql(terms, k, ids) -> str:
    """_ranked_sql with the takedown set excluded in the tf CTE — df
    (and every downstream score) derives from survivors only, exactly
    like the retracted index's postings-row counts."""
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  WHERE doc_id NOT IN ({", ".join(map(str, sorted(ids)))})
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM t
  WHERE tok IN ({", ".join("'" + t + "'" for t in terms)})
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), s AS (
  SELECT doc_id, CAST(SUM((tf * 1000000) // df) AS BIGINT) AS score_ppm
  FROM tf JOIN df USING (tok) GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT) AS rank,
       doc_id, score_ppm
FROM s
ORDER BY score_ppm DESC, doc_id
LIMIT {k}
"""


TEXT_SEARCH_RETRACTED_SQL = _ranked_retracted_sql(
    RANKED_TERMS, RANKED_K, RETRACT_IDS)


def text_search_bm25_retracted(spark, sf_dir,
                               deleted_ids: tuple[int, ...] = RETRACT_IDS,
                               terms: tuple[str, ...] = RANKED_TERMS,
                               k: int = RANKED_K,
                               buckets: int = TOKEN_BUCKETS):
    """BM25 off the RETRACTED artifacts — the piece that makes
    delete-correctness TOTAL for the search family: the TF-IDF twin
    (text_search_retracted) already re-derives df from survivors; BM25
    additionally needs the corpus CONSTANTS (N, total_tokens → avgdl)
    to reflect the takedown, and they come from the retracted norms'
    recomputed 1-row stats table — which is the entire reason
    retract_token_index rewrites norms at all (a stale avgdl would
    misnormalize every surviving doc's length). Same pruned-probe +
    posting-resident-dl plan as text_search_bm25; exact oracle: the
    float-free BM25 scan SQL with the takedown excluded at the token
    level, so dl/stats/tf/df all derive from survivors in both
    engines."""
    import os

    idx_dir, norms_dir = retract_token_index(spark, sf_dir, deleted_ids,
                                             buckets)
    hits = _pruned_postings(spark, idx_dir, terms, buckets).select(
        "tok", "doc_id", "tf", "dl")
    stats = spark.read.parquet(os.path.join(norms_dir, "stats"))
    return _bm25_topk(hits, stats, k)


TEXT_SEARCH_BM25_RETRACTED_SQL = _bm25_sql(
    RANKED_TERMS, RANKED_K, not_in=RETRACT_IDS)


NEAR_TERMS = ("dup", "join")  # rare anchor + common term — the shape
                              # where proximity actually prunes
NEAR_SLOP = 5                 # max token distance (Lucene slop)


def text_search_near(spark, sf_dir, terms: tuple[str, str] = NEAR_TERMS,
                     slop: int = NEAR_SLOP, buckets: int = TOKEN_BUCKETS):
    """Proximity (slop) search through the positional inverted index —
    the Lucene `"a b"~slop` operator, the last classic positional
    query text_search_phrase's machinery didn't yet expose: docs where
    the two terms occur within ``slop`` tokens of each other IN ANY
    ORDER, with n_pairs counting every qualifying (pos_a, pos_b) pair.
    Same access path as the phrase search: two partition-pruned
    postings reads, one doc_id join (AQE broadcasts the rare term's
    side), then a row-local pair count over the two per-doc SORTED
    position arrays — O(|A|·|B|) on posting-list lengths, document
    text never read. Exact oracle: the scan-path SQL self-joins
    per-position rows with the same |i−j| ≤ slop bound (0- vs 1-based
    positions cancel in the difference)."""
    a, b = terms
    assert a != b, "proximity terms must differ (use phrase for repeats)"
    hits = _index_postings(
        spark, sf_dir, tuple(dict.fromkeys(terms)), buckets
    ).select("tok", "doc_id", "positions")
    pa = hits.filter(F.col("tok") == a).select(
        "doc_id", F.col("positions").alias("pa"))
    pb = hits.filter(F.col("tok") == b).select(
        "doc_id", F.col("positions").alias("pb"))
    n_pairs = F.aggregate(
        F.col("pa"), F.lit(0).cast("long"),
        lambda acc, x: acc + F.size(
            F.filter(F.col("pb"), lambda y: F.abs(x - y) <= F.lit(slop))))
    return (
        pa.join(pb, "doc_id")
        .select("doc_id", n_pairs.alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )


TEXT_SEARCH_NEAR_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
), p AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, tok[i] AS w
  FROM t, unnest(range(1, len(tok) + 1)) r(i)
)
SELECT a.doc_id, COUNT(*) AS n_pairs
FROM p a JOIN p b ON a.doc_id = b.doc_id
WHERE a.w = '{NEAR_TERMS[0]}' AND b.w = '{NEAR_TERMS[1]}'
  AND abs(a.i - b.i) <= {NEAR_SLOP}
GROUP BY a.doc_id
"""


QUERIES = {
    "text_tokens": text_tokens,
    "text_tokens_regex": text_tokens_regex,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_repetition": text_repetition,
    "pii_scrub": pii_scrub,
    "text_rarity": text_rarity,
    "text_heavy_hitters": text_heavy_hitters,
    "text_gopher_quality": text_gopher_quality,
    "text_search_indexed": text_search_indexed,
    "text_search_negation": text_search_negation,
    "text_search_prefix": text_search_prefix,
    "text_search_min_should_match": text_search_min_should_match,
    "text_search_ranked": text_search_ranked,
    "text_search_bm25": text_search_bm25,
    "text_search_bm25_incremental": text_search_bm25_incremental,
    "text_search_snippets": text_search_snippets,
    "text_search_fuzzy": text_search_fuzzy,
    "text_search_fuzzy_multi": text_search_fuzzy_multi,
    "text_search_fuzzy2": text_search_fuzzy2,
    "text_search_fuzzy2_multi": text_search_fuzzy2_multi,
    "text_search_fuzzy_ranked": text_search_fuzzy_ranked,
    "text_search_phrase": text_search_phrase,
    "text_search_near": text_search_near,
    "text_search_retracted": text_search_retracted,
    "text_search_bm25_retracted": text_search_bm25_retracted,
    "text_search_incremental": text_search_incremental,
    "lifecycle_fold_search": lifecycle_fold_search,
}

ORACLES = {
    "text_heavy_hitters": TEXT_HEAVY_HITTERS_SQL,
    "text_tokens": TEXT_TOKENS_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "text_tokens_regex": TEXT_TOKENS_REGEX_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "text_rarity": TEXT_RARITY_SQL,
    "text_gopher_quality": TEXT_GOPHER_SQL,
    # index path == scan path on the same corpus (postings are exact
    # per-doc term counts; conjunction = HAVING all terms)
    "text_search_indexed": TEXT_SEARCH_SQL,
    # prohibited clause: same index == scan identity; the anti-join
    # mirrors the NOT-IN subquery exactly (both sides integer counts)
    "text_search_negation": TEXT_SEARCH_NEGATION_SQL,
    # prefix: vocab-sidecar resolution == the LIKE scan's term set by
    # construction (the sidecar is derived from the same postings)
    "text_search_prefix": TEXT_SEARCH_PREFIX_SQL,
    # same index == scan identity; only the HAVING bound differs
    "text_search_min_should_match": TEXT_SEARCH_MSM_SQL,
    # index path == scan path: per-term df over the pruned postings is
    # exactly COUNT(*) per tok of the scan-side tf relation
    "text_search_ranked": TEXT_SEARCH_RANKED_SQL,
    # index+norms path == scan path under the shared integer formula
    "text_search_bm25": TEXT_SEARCH_BM25_SQL,
    # history artifacts ∪ increment reproduce full-corpus df/dl/N/
    # total_tokens for the query terms → full-corpus SQL verbatim
    "text_search_bm25_incremental": TEXT_SEARCH_BM25_SQL,
    # index-ranked top-k + k-row text fetch == scan-path CTE + slice
    "text_search_snippets": TEXT_SEARCH_SNIPPETS_SQL,
    # deletion-index candidates + exact levenshtein verify == the
    # oracle's brute levenshtein over the distinct-term relation
    # (SymSpell completeness at distance 1 is a set-intersection lemma)
    "text_search_fuzzy": TEXT_SEARCH_FUZZY_SQL,
    "text_search_fuzzy_multi": TEXT_SEARCH_FUZZY_MULTI_SQL,
    "text_search_fuzzy2": TEXT_SEARCH_FUZZY2_SQL,
    "text_search_fuzzy2_multi": TEXT_SEARCH_FUZZY2_MULTI_SQL,
    "text_search_fuzzy_ranked": TEXT_SEARCH_FUZZY_RANKED_SQL,
    "text_search_phrase": TEXT_SEARCH_PHRASE_SQL,
    # positions are 0-based in the index, 1-based in the SQL unnest —
    # the |i−j| ≤ slop bound only sees the difference
    "text_search_near": TEXT_SEARCH_NEAR_SQL,
    # the takedown set is excluded BEFORE df in both engines, so the
    # survivor-derived idf shift is part of the hash comparison
    "text_search_retracted": TEXT_SEARCH_RETRACTED_SQL,
    # ...and BM25's avgdl shift too: dl/stats/tf/df all derive from
    # survivors on both sides (the retracted norms' recomputed stats)
    "text_search_bm25_retracted": TEXT_SEARCH_BM25_RETRACTED_SQL,
    # history-index ∪ increment == full-corpus postings for the query
    # terms, so the full-corpus ranked SQL is the oracle verbatim
    "text_search_incremental": TEXT_SEARCH_RANKED_SQL,
    "lifecycle_fold_search": LIFECYCLE_FOLD_SEARCH_SQL,
}
