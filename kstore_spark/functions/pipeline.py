"""The composed curation pipeline as a first-class, oracle-checked query.

``examples/curate_corpus.py`` narrates the same nine stages with
per-stage survivor counts (and writes the partitioned training
streams); this module is the engine-level composition — no writes, and
the only session state it leaves behind is the persisted final frame
(component caches are released; see curate_survivors) — and carries
the full DuckDB oracle: every
stage's already-verified oracle SQL chained into ONE statement, so the
FINAL training-stream rows (split, shard, batch id, token count,
scrubbed text) hash-match an independent engine end to end. That is the
strongest correctness statement the engine makes: not "each operator is
right in isolation" but "the whole pipeline, survivor sets threaded
through all nine stages, is right".

Stages (identical to the example, same constants):
    1. exact dedup (min doc_id per distinct text)
    2. near-dup removal (MinHash-LSH pairs → connected components →
       keep cluster minimum; oracle uses the exact-Jaccard twin graph,
       set-equal at the shipped SFs — recall-1.0 pinned)
    3. benchmark decontamination (5-gram overlap, bench = doc_id < 20)
    4. quality: repetition flag + unidentifiable language
    4b. per-source quota over SURVIVORS (longest docs win)
    4c. corpus-LM tail-tercile cut over SURVIVORS (CCNet shape)
    5. boilerplate passage strip + re-dedup of now-identical docs
    6. PII scrub of the surviving cleaned text
    7. stratified 1-in-k sample per language over SURVIVORS
    8. leakage-safe split by stage-2 cluster representative
    9. token-budget packing of the scrubbed survivor text

Scale: the composition adds nothing beyond its stages — each stage's
shuffle/broadcast/persist discipline is documented and plan-pinned in
its own module; survivor sets thread through as doc_id-only semi-joins
(never the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.tables import table

CURATE_SAMPLE_EVERY = 2  # pipeline stratified-sample rate (1-in-2)


def curate_stages(spark: SparkSession, sf_dir: str,
                  sample_every: int = CURATE_SAMPLE_EVERY,
                  ) -> tuple[dict[str, DataFrame], list[DataFrame]]:
    """All pipeline stages as named frames, in stage order, plus the
    component caches. Stage keys mirror examples/curate_corpus.py's
    count labels; ``final`` is the training-stream frame (split, shard,
    batch_id, doc_id, lang, n_tokens, text). Construction triggers the
    component operators' own materializations (the LSH pair
    verification, the component iteration, the LM bucket build) but
    writes nothing.

    Cache contract: two component ops return PERSISTED frames the later
    stages re-read (the LSH pair graph feeds both stage 2 and the
    stage-8 split; the LM buckets feed stage 4c). They come back as the
    second tuple element — callers unpersist them once the frames they
    need are materialized (curate_survivors and the example both do),
    otherwise repeated invocations stack dead cache entries in the
    session."""
    from kstore_spark.functions.corpus import dedup_passages
    from kstore_spark.functions.dedup import (
        cluster_pairs, decontaminate_ngram, dedup_exact, dedup_minhash_lsh)
    from kstore_spark.functions.lm import N_BUCKETS, text_lm_buckets
    from kstore_spark.functions.sampling import (
        PACK_BUDGET, PACK_SHARDS, assign_split, sample_stratified,
        source_quota_cap)
    from kstore_spark.functions.text import (
        scrub_pii, text_langid, text_repetition)

    from concurrent.futures import ThreadPoolExecutor

    from kstore_spark.functions.lm import text_lm_score

    docs = table(spark, sf_dir, "documents")
    stages: dict[str, DataFrame] = {"input": docs}

    # The five corpus passes below (exact dedup, decontamination,
    # repetition, langid, LM scoring) are INDEPENDENT of the MinHash
    # pair graph — only their outputs meet in the survivor anti-joins.
    # Before r12 they all materialized serially inside stage 4c's
    # bucket count; now their doc_id sets are cached and materialized
    # from a small thread pool WHILE the main thread runs the
    # LSH + component chain, so the pair stages' straggler tails are
    # back-filled instead of idling 30 cores (guide §2.6). Values are
    # unchanged — this reorders no data, only job submission.
    # every frame this composition persists, in persist order — the
    # happy path hands the list to the caller to release; ANY failure
    # after the first persist releases them here instead of leaking
    # session-lifetime cache entries (ADVICE r12)
    caches: list[DataFrame] = []

    def _cached(df: DataFrame) -> DataFrame:
        df = df.persist()
        caches.append(df)
        return df

    keep1 = _cached(dedup_exact(spark, sf_dir).select("doc_id"))
    dirty = _cached(decontaminate_ngram(spark, sf_dir).select("doc_id"))
    rep = _cached(text_repetition(spark, sf_dir).filter(
        "flag_repetitive").select("doc_id"))
    unk = _cached(text_langid(spark, sf_dir).filter(
        F.col("pred_lang") == "unk").select("doc_id"))
    pool = ThreadPoolExecutor(max_workers=3)
    try:
        side_futs = [pool.submit(f.count) for f in (keep1, dirty, rep, unk)]
        # text_lm_score materializes eagerly inside the call (its own
        # persist+count) — submitting the CALL runs the LM training
        # concurrently too; text_lm_buckets receives the frame below
        scored_fut = pool.submit(text_lm_score, spark, sf_dir)

        # 1. exact dedup: canonical doc per distinct text
        keep = keep1
        stages["exact_dedup"] = keep

        # a side pass that died instantly (bad input, analysis error)
        # should abort BEFORE the expensive pair-graph work, not after
        # it (ADVICE r12): surface any already-failed future now
        for fut in side_futs:
            if fut.done():
                fut.result()

        # 2. near-dup removal: transitive clusters over the verified
        #    pair graph; keep each cluster's canonical minimum doc_id
        pairs = dedup_minhash_lsh(spark, sf_dir)  # persisted inside
        caches.append(pairs)
        # clusters feeds TWO distant consumers (the stage-2 anti-join
        # and the stage-8 split representative); persisted so the label
        # join over the fixed-point edges runs once (r12, guide §5)
        clusters = _cached(cluster_pairs(pairs))
        non_canonical = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")).select("doc_id")
        keep = keep.join(non_canonical, "doc_id", "left_anti")
        stages["near_dedup"] = keep

        # 3. benchmark decontamination
        keep = keep.join(dirty, "doc_id", "left_anti")
        stages["decontaminated"] = keep

        # 4. quality: drop repetitive + language-unidentifiable docs
        keep = (keep.join(rep, "doc_id", "left_anti")
                .join(unk, "doc_id", "left_anti"))
        for fut in side_futs:
            fut.result()  # surface any side-pass failure here
        scored = scored_fut.result()
        caches.append(scored)  # released by text_lm_buckets below, but
        # tracked so a failure in between cannot leak it (unpersist of
        # an already-released frame is a no-op)
    except BaseException:
        pool.shutdown(wait=True)
        for cached in caches:
            try:
                cached.unpersist()
            except Exception:
                pass
        raise
    finally:
        pool.shutdown(wait=True)
    try:
        # the stage-1..4 survivor chain (exact dedup's full-text groupBy
        # + four anti-joins) feeds BOTH sides of the quota stage (its
        # docs restriction and the semi-join back) and, through 4c's
        # eager count, would otherwise be recomputed branch-by-branch in
        # every downstream action. It is a doc_id-only frame — cache it
        # (r12, guide §1.2/§5: don't recompute the expensive chain to
        # re-derive a small set)
        keep = _cached(keep)
        stages["quality"] = keep

        # 4b. per-source quota over the SURVIVORS (longest docs win)
        quota = source_quota_cap(
            spark, sf_dir, docs=docs.join(keep, "doc_id", "left_semi")
        ).select("doc_id")
        keep = keep.join(quota, "doc_id", "left_semi")
        stages["source_quota"] = keep

        # 4c. LM tail-tercile cut over the SURVIVORS (corpus-trained LM
        #     — trained concurrently above, handed in as ``scored``)
        lm_buckets = text_lm_buckets(spark, sf_dir, docs=keep,
                                     scored=scored)  # persisted inside
        caches.append(lm_buckets)
        head_mid = lm_buckets.filter(
            F.col("bucket") < N_BUCKETS).select("doc_id")
        keep = keep.join(head_mid, "doc_id", "left_semi")
        stages["lm_quality"] = keep

        # 5. boilerplate strip; empty docs die; re-dedup identical docs
        cleaned = _cached(
            dedup_passages(spark, sf_dir)
            .join(keep, "doc_id", "left_semi")
            .filter(F.col("clean_text") != "")
            .groupBy("clean_text").agg(F.min("doc_id").alias("doc_id"))
            # cleaned's passage strip + full-text re-dedup feeds the PII
            # scrub AND (as doc_ids) the sampling/packing branches —
            # survivor-sized, cached so the clean_text groupBy runs once
        )
        keep = cleaned.select("doc_id")
        stages["boilerplate"] = keep

        # 6. PII scrub over the surviving cleaned text
        scrubbed = scrub_pii(
            cleaned.select("doc_id", F.col("clean_text").alias("text"))
        ).select("doc_id", F.col("clean").alias("text"),
                 "n_emails", "n_ips", "n_phones")
        stages["pii_scrubbed"] = scrubbed

        # 7. stratified sample over the SURVIVORS
        sampled = sample_stratified(
            spark, sf_dir, k=sample_every,
            docs=docs.select("doc_id", "lang").join(
                keep, "doc_id", "left_semi"),
        ).select("doc_id")
        keep = keep.join(sampled, "doc_id", "left_semi")
        stages["sampled"] = keep

        # 8+9. leakage-safe split + token-budget packing, fused onto ONE
        # survivor frame (r13, guide §2.4): the split decision is a
        # row-local CASE over the cluster representative and the packing
        # columns are a window over (shard, doc_id) — neither needs its
        # own doc_id-keyed join back onto the survivors. Attach rep (one
        # left join against the small cluster frame), compute split in
        # place, run the SAME pack window over the enriched frame, and
        # only the lang lookup remains a join. Two doc_id Exchanges
        # (packed⋈survivors and ⋈split) disappear; every output row is
        # identical — same survivor set, same window keys/order, same
        # CASE arithmetic.
        # survivors (the scrubbed text of the sampled set) feeds the
        # fused frame and the final text column — cache it so the three
        # regex scrub passes run once per row, not per branch
        survivors = _cached(scrubbed.join(keep, "doc_id", "left_semi"))
        from pyspark.sql.window import Window

        enriched = assign_split(
            survivors.join(clusters, "doc_id", "left")
            .select("doc_id", "text",
                    F.coalesce("cluster_id", "doc_id").alias("rep")),
            "rep",
        )
        # pack_token_budget's exact window, inlined so split/text ride
        # along (its docs= form projects them away); expressions shared
        # via the same constants — the oracle template pins the math
        pw = (Window.partitionBy("shard").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1))
        packed = (
            enriched.select(
                "doc_id", "split", "text",
                F.pmod("doc_id", F.lit(PACK_SHARDS)).alias("shard"),
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
            .withColumn("batch_id", F.floor(
                F.coalesce(F.sum("n_tokens").over(pw), F.lit(0))
                / PACK_BUDGET))
        )
        stages["final"] = (
            packed.join(docs.select("doc_id", "lang"), "doc_id")
            .select("split", "shard", "batch_id", "doc_id", "lang",
                    "n_tokens", "text")
        )
    except BaseException:
        for cached in caches:
            try:
                cached.unpersist()
            except Exception:
                pass
        raise
    # caches: everything persisted above, released by the caller once
    # its consumers are materialized (r12 adds the survivor-chain,
    # side-pass doc_id sets and text-bearing intermediates — same
    # ownership contract)
    return stages, caches


def curate_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the pipeline's final training-stream frame —
    persisted and materialized here so the component caches can be
    released before returning. Only the ~|survivors|-row result stays
    cached (quota-bounded — see PERF.md); the CALLER owns
    ``result.unpersist()`` if it invokes this repeatedly in one
    long-lived session (bench.py instead clearCache()s between runs)."""
    stages, caches = curate_stages(spark, sf_dir)
    final = stages["final"].persist()
    final.count()
    for cached in caches:
        cached.unpersist()
    return final


def _curate_sql() -> str:
    """Chain each stage's already-verified oracle SQL into one
    statement. Six stage oracles are embedded verbatim as derived
    tables (a WITH inside a derived table is legal DuckDB): the pair
    graph, decontamination, repetition, langid, LM score, and passage
    strip. The survivor-parameterized stages (quota, stratified sample,
    packing, the split decision) are instantiated from their modules'
    shared SQL TEMPLATES over the survivor relations — same text as the
    standalone oracles, different FROM — so neither copy can drift.
    The two clauses with no shareable template (the NTILE tercile cut,
    which must join the survivor set mid-template, and the PII chain
    over ``clean_text`` instead of ``text``) mirror
    lm.TEXT_LM_BUCKETS_SQL_TEMPLATE and text.PII_SCRUB_SQL
    respectively and reuse their modules' constants."""
    from kstore_spark.functions.corpus import DEDUP_PASSAGES_SQL
    from kstore_spark.functions.dedup import DECON_SQL, DEDUP_NGRAM_SQL
    from kstore_spark.functions.lm import N_BUCKETS, TEXT_LM_SCORE_SQL
    from kstore_spark.functions.sampling import (
        pack_token_budget_sql, sample_stratified_sql, source_quota_sql,
        split_case_sql)
    from kstore_spark.functions.text import (
        PII_EMAIL, PII_IPV4, PII_PHONE, TEXT_LANGID_SQL,
        TEXT_REPETITION_SQL)

    quota_sql = source_quota_sql(
        rel="(SELECT d.* FROM documents d JOIN keep4 k ON d.doc_id = k.doc_id)")
    samp_sql = sample_stratified_sql(
        rel="(SELECT d.doc_id, d.lang FROM documents d "
            "JOIN cleaned c ON d.doc_id = c.doc_id)",
        k=CURATE_SAMPLE_EVERY)
    pack_sql = pack_token_budget_sql(rel="surv")
    split_case = split_case_sql("COALESCE(c.cluster_id, s.doc_id)")

    return f"""
WITH RECURSIVE
pairs AS (SELECT * FROM ({DEDUP_NGRAM_SQL}) p),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
keep1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
keep2 AS (
  SELECT doc_id FROM keep1
  WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
),
dirty AS (SELECT doc_id FROM ({DECON_SQL}) x),
keep3 AS (SELECT doc_id FROM keep2 WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
rep_docs AS (SELECT doc_id FROM ({TEXT_REPETITION_SQL}) r WHERE flag_repetitive),
unk_docs AS (SELECT doc_id FROM ({TEXT_LANGID_SQL}) l WHERE pred_lang = 'unk'),
keep4 AS (
  SELECT doc_id FROM keep3
  WHERE doc_id NOT IN (SELECT doc_id FROM rep_docs)
    AND doc_id NOT IN (SELECT doc_id FROM unk_docs)
),
quota AS (SELECT doc_id FROM ({quota_sql}) q),
scored AS (SELECT doc_id, lm_score_ppm FROM ({TEXT_LM_SCORE_SQL}) s),
buck AS (
  SELECT s.doc_id,
         NTILE({N_BUCKETS}) OVER (PARTITION BY d.lang
                                  ORDER BY s.lm_score_ppm DESC, s.doc_id)
           AS bucket
  FROM scored s
  JOIN quota q ON s.doc_id = q.doc_id
  JOIN documents d ON d.doc_id = s.doc_id
),
keep5 AS (SELECT doc_id FROM buck WHERE bucket < {N_BUCKETS}),
cl AS (SELECT doc_id, clean_text FROM ({DEDUP_PASSAGES_SQL}) p),
cleaned AS (
  SELECT clean_text, MIN(doc_id) AS doc_id FROM cl
  WHERE doc_id IN (SELECT doc_id FROM keep5) AND clean_text <> ''
  GROUP BY clean_text
),
s1 AS (
  SELECT doc_id,
         regexp_replace(clean_text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM cleaned
),
s2 AS (SELECT doc_id, regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2 FROM s1),
scrubbed AS (
  SELECT doc_id, regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS text
  FROM s2
),
samp AS (SELECT doc_id FROM ({samp_sql}) s),
surv AS (SELECT sc.doc_id, sc.text FROM scrubbed sc JOIN samp USING (doc_id)),
spl AS (
  SELECT s.doc_id, {split_case} AS split
  FROM samp s LEFT JOIN clusters c ON s.doc_id = c.doc_id
),
packed AS (SELECT * FROM ({pack_sql}) p)
SELECT sp.split, p.shard, p.batch_id, p.doc_id, d.lang, p.n_tokens, s.text
FROM packed p
JOIN surv s ON p.doc_id = s.doc_id
JOIN spl sp ON p.doc_id = sp.doc_id
JOIN documents d ON p.doc_id = d.doc_id
"""


CURATE_SURVIVORS_SQL = _curate_sql()

QUERIES = {
    "curate_survivors": curate_survivors,
}

ORACLES = {
    "curate_survivors": CURATE_SURVIVORS_SQL,
}
