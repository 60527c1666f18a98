"""Corpus-trained n-gram language-model quality scoring.

The CCNet/Gopher-style pipeline stage the rest of the text suite lacks:
score each document by how well a statistical language model predicts
it, then filter/bucket on the score. Real pipelines train a KenLM on a
trusted corpus; no LM toolkit exists in this environment, so the model
here is the classic self-supervised bigram MLE estimated FROM the
corpus itself — the training pass is two grouped counts, which is the
part that matters at 100 TB (the trusted-corpus variant only changes
which frame the counts aggregate over).

Arithmetic discipline: the usual per-token log-probabilities are
replaced by conditional probabilities in exact integer ppm —
p(w2|w1) ≈ (1e6 · C(w1,w2)) div C(w1·) — and a document's score is the
integer mean over its bigrams. Monotone in the geometric/arithmetic
LM-quality ordering the float pipeline produces, but bit-identical in
every engine (the repo's float-free oracle discipline; ln() differs in
final ulps across libm implementations, floor(log) can flip).

Scale shape (all stages are plain DataFrame ops):
- bigram formation is ROW-LOCAL (transform over the token array — no
  posexplode+window over global token positions, which would shuffle
  every token of the corpus by (doc, pos));
- training = two groupBy counts over token keys — partial-aggregated
  map-side, shuffle carries (word, count) pairs, never text;
- scoring = one equi-join of the exploded bigrams against the
  vocabulary-bounded rate table (AQE broadcasts it while it fits,
  shuffle-joins beyond — no hard hint), then a per-doc partial agg.
- the exploded bigram frame feeds three consumers (two counts + the
  scoring join), so it is persisted once and freed after the (small)
  per-doc result materializes — same discipline as dedup_minhash_lsh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.tables import table

PPM = 1_000_000


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, formed
    row-locally inside the token array; docs with < 2 tokens drop out
    (they have no bigrams to score)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    pairs = F.expr(
        "transform(slice(t, 1, size(t) - 1),"
        " (x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))"
    )
    return (
        docs.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )


def _lm_score(bg: DataFrame, train: DataFrame) -> DataFrame:
    """Score ``bg``'s documents under the bigram MLE trained on
    ``train`` (both (doc_id, w1, w2) frames). Inner join against the
    rate table: only bigrams the model has seen contribute, and a doc
    with no in-vocabulary bigram drops out — identical semantics for
    the self-supervised (train == bg) and trusted-corpus variants."""
    bc = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    uc = train.groupBy("w1").agg(F.count(F.lit(1)).alias("uc"))
    rates = bc.join(uc, "w1").select(
        "w1", "w2", F.expr(f"({PPM} * bc) div uc").alias("p_ppm")
    )
    return (
        bg.join(rates, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppm").alias("s"),
        )
        .select(
            "doc_id", "n_bigrams", F.expr("s div n_bigrams").alias("lm_score_ppm")
        )
    )


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, lm_score_ppm): mean conditional bigram
    probability of the document under the corpus-trained bigram MLE,
    in exact integer ppm. High score = predictable, well-formed text;
    boilerplate scores high, keyboard-mash / OCR noise scores low —
    the filter threshold is applied downstream.

    NOTE the RETURNED frame stays persisted (the big exploded-bigram
    intermediate is freed here, but the small per-doc result is kept
    cached so callers can fan out over it); consumers that are done
    with it should ``unpersist()`` it — text_lm_buckets does."""
    bg = _doc_bigrams(spark, sf_dir).persist()
    res = _lm_score(bg, bg).persist()
    res.count()  # materialize the per-doc result, then free the big
    bg.unpersist()  # exploded bigram frame (3 consumers served)
    return res


# CCNet proper trains its LM on a TRUSTED corpus (Wikipedia), not on
# the corpus being scored; here the trusted set is the held-out
# doc_id < N slice of documents. Only the counts frame differs.
TRUSTED_MAX_DOC = 100


def text_lm_score_trusted(spark: SparkSession, sf_dir: str,
                          trusted_max_doc: int = TRUSTED_MAX_DOC) -> DataFrame:
    """text_lm_score with the bigram MLE trained ONLY on the trusted
    held-out slice (doc_id < trusted_max_doc) and scoring applied to the
    WHOLE corpus — the CCNet shape. Bigrams outside the trusted model's
    vocabulary drop out of the inner rate join, so noisy documents are
    scored on their trusted-covered mass (and all-noise docs drop out
    entirely). Same ppm oracle, counts restricted identically."""
    bg = _doc_bigrams(spark, sf_dir).persist()
    res = _lm_score(bg, bg.filter(F.col("doc_id") < trusted_max_doc)).persist()
    res.count()
    bg.unpersist()
    return res


N_BUCKETS = 3  # CCNet's head / middle / tail


def text_lm_buckets(spark: SparkSession, sf_dir: str,
                    n_buckets: int = N_BUCKETS, docs=None,
                    scored: DataFrame | None = None) -> DataFrame:
    """(doc_id, lang, bucket): CCNet's final step — per-language
    perplexity terciles (bucket 1 = head/most-predictable under the
    corpus LM, 3 = tail). NTILE over (lang ORDER BY score DESC, doc_id)
    is deterministic and identical across engines; pipelines keep head+
    middle or re-weight by bucket. One (lang) window pass over the
    k-per-doc score frame — the corpus-sized work is text_lm_score's;
    this adds a |docs|-row shuffle keyed by the language stratum. The
    returned |docs|-row frame stays cached (the corpus-sized score
    intermediate is released here); unpersist it when done.

    ``docs`` (a doc_id-bearing frame) restricts WHICH documents are
    bucketed: the LM stays corpus-trained (the trusted-corpus analog),
    but the terciles are computed over the restricted set, so a
    pipeline's tail cut removes a third of its SURVIVORS per language
    rather than a third of a set that includes already-deleted docs.

    ``scored`` — an already-materialized text_lm_score frame — lets a
    composition (curate_stages) train the corpus LM CONCURRENTLY with
    its other corpus passes (guide §2.6) instead of serially inside
    this call; ownership of its cache transfers here (released after
    the bucket materialization, same as the internally-built frame)."""
    from pyspark.sql.window import Window

    if scored is None:
        scored = text_lm_score(spark, sf_dir)
    bucketed = scored
    if docs is not None:
        bucketed = scored.join(docs.select("doc_id"), "doc_id", "left_semi")
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_score_ppm").desc(), F.col("doc_id"))
    res = (
        bucketed.join(langs, "doc_id")
        .select("doc_id", "lang", F.ntile(n_buckets).over(w).alias("bucket"))
        .persist()
    )
    res.count()  # materialize, then release text_lm_score's cached
    scored.unpersist()  # per-doc score frame (see its docstring note)
    return res


TEXT_LM_BUCKETS_SQL_TEMPLATE = """
WITH scored AS ({score_sql})
SELECT s.doc_id, d.lang,
       CAST(NTILE({n}) OVER (PARTITION BY d.lang
                             ORDER BY s.lm_score_ppm DESC, s.doc_id)
            AS INTEGER) AS bucket
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
"""


_LM_SCORE_SQL_TEMPLATE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
bg AS (
  SELECT doc_id, tok[i] AS w1, tok[i + 1] AS w2
  FROM (SELECT doc_id, tok, UNNEST(range(1, len(tok))) AS i FROM t)
),
tbg AS (SELECT * FROM bg {train_where}),
bc AS (SELECT w1, w2, COUNT(*) AS bc FROM tbg GROUP BY w1, w2),
uc AS (SELECT w1, COUNT(*) AS uc FROM tbg GROUP BY w1),
sc AS (
  SELECT bg.doc_id, ({PPM} * bc.bc) // uc.uc AS p_ppm
  FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1)
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS lm_score_ppm
FROM sc GROUP BY doc_id
""".replace("{PPM}", str(PPM))

TEXT_LM_SCORE_SQL = _LM_SCORE_SQL_TEMPLATE.format(train_where="")
TEXT_LM_SCORE_TRUSTED_SQL = _LM_SCORE_SQL_TEMPLATE.format(
    train_where=f"WHERE doc_id < {TRUSTED_MAX_DOC}")


QUERIES = {
    "text_lm_score": text_lm_score,
    "text_lm_score_trusted": text_lm_score_trusted,
    "text_lm_buckets": text_lm_buckets,
}

ORACLES = {
    "text_lm_score": TEXT_LM_SCORE_SQL,
    "text_lm_score_trusted": TEXT_LM_SCORE_TRUSTED_SQL,
    "text_lm_buckets": TEXT_LM_BUCKETS_SQL_TEMPLATE.format(
        score_sql=TEXT_LM_SCORE_SQL, n=N_BUCKETS),
}
