"""End-to-end corpus curation: the engine's north-star pipeline.

Composes the pipeline operators into the job a 100 TB training-data run
actually performs, start to finish:

    documents
      1. exact dedup          keep one doc per distinct text (digest
                              groupBy — 32-byte shuffle keys)
      2. near-dup removal     MinHash-LSH candidates, exact-Jaccard
                              verified, clustered into connected
                              components (transitivity); keep each
                              cluster's minimum doc_id
      3. decontamination      drop docs sharing a 5-gram with the
                              held-out benchmark set (broadcast join)
      4. quality filter       drop repetitive docs (duplicate-3-gram
                              flag) and docs whose language can't be
                              identified; cap each source at its
                              domain quota (longest docs win); cut
                              each language's worst perplexity tercile
                              under the corpus-trained bigram LM
      5. boilerplate strip    passages recurring across >= 3 docs are
                              removed from every doc; docs stripped to
                              nothing die, and docs that differed only
                              in boilerplate re-dedupe (min doc_id per
                              distinct cleaned text)
      6. PII scrub            emails / IPv4s / phone numbers redacted
                              from the surviving cleaned text (pure
                              JVM regexp chain)
      7. stratified sample    exact 1-in-k per language
      8. train/holdout split  decided per NEAR-DUP CLUSTER (stage-2
                              components), so near-duplicates can
                              never straddle the eval boundary
      9. sequence packing     shard + token-budget batch assignment
                              over the CLEANED, SCRUBBED text
      → parquet, partitioned by (split, shard) (one directory per
        training stream, batches contiguous within)

Every stage is a DataFrame transformation — the whole pipeline is ONE
lazy plan per stage boundary, scales with the cluster, and never
collects documents to the driver. Run:

    python examples/curate_corpus.py [sf_dir] [out_dir]

Stage survivor counts print at the end (one action per stage keeps the
demo readable; a production run would fuse straight through).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def curate(spark, sf_dir: str, out_dir: str, sample_every: int = 2) -> dict:
    """Run the full curation pipeline; returns per-stage survivor counts."""
    from kstore_spark.functions.corpus import dedup_passages
    from kstore_spark.functions.dedup import (
        cluster_pairs, decontaminate_ngram, dedup_exact, dedup_minhash_lsh)
    from kstore_spark.functions.lm import N_BUCKETS, text_lm_buckets
    from kstore_spark.functions.sampling import (
        assign_split, pack_token_budget, sample_stratified, source_quota_cap)
    from kstore_spark.functions.text import scrub_pii, text_langid, text_repetition
    from kstore_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    counts = {"input": docs.count()}

    # 1. exact dedup: canonical doc per distinct text
    keep = dedup_exact(spark, sf_dir).select("doc_id")
    counts["exact_dedup"] = keep.count()

    # 2. near-dup removal: cluster the verified pairs (transitive
    #    closure — a-b + b-c is ONE cluster) and keep only each
    #    cluster's canonical minimum doc_id
    clusters = cluster_pairs(dedup_minhash_lsh(spark, sf_dir))
    non_canonical = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    keep = keep.join(non_canonical, "doc_id", "left_anti")
    counts["near_dedup"] = keep.count()

    # 3. benchmark decontamination
    dirty = decontaminate_ngram(spark, sf_dir).select("doc_id")
    keep = keep.join(dirty, "doc_id", "left_anti")
    counts["decontaminated"] = keep.count()

    # 4. quality: drop repetitive docs and language-unidentifiable docs
    rep = text_repetition(spark, sf_dir).filter("flag_repetitive").select("doc_id")
    unk = text_langid(spark, sf_dir).filter(F.col("pred_lang") == "unk").select("doc_id")
    keep = keep.join(rep, "doc_id", "left_anti").join(unk, "doc_id", "left_anti")
    counts["quality"] = keep.count()

    # 4b. per-source quota: one crawler-friendly domain must not
    #     dominate the mixture — keep at most the QUOTA_PER_SOURCE
    #     longest SURVIVING docs per source (capping the raw corpus
    #     instead would fill quotas with docs earlier stages deleted)
    quota = source_quota_cap(
        spark, sf_dir, docs=docs.join(keep, "doc_id", "left_semi")
    ).select("doc_id")
    keep = keep.join(quota, "doc_id", "left_semi")
    counts["source_quota"] = keep.count()

    # 4c. LM-quality tail cut (CCNet): drop each language's lowest
    #     perplexity-score tercile among the SURVIVORS — the LM stays
    #     corpus-trained (trusted-corpus analog), the tercile boundary
    #     is computed over what still exists (docs too short to score —
    #     < 2 tokens — have no bucket and drop with the tail)
    head_mid = text_lm_buckets(spark, sf_dir, docs=keep).filter(
        F.col("bucket") < N_BUCKETS).select("doc_id")
    keep = keep.join(head_mid, "doc_id", "left_semi")
    counts["lm_quality"] = keep.count()

    # 5. boilerplate strip: cross-doc recurring passages removed; docs
    #    stripped empty die; docs now textually identical (they differed
    #    only in boilerplate) re-dedupe to the minimum doc_id
    cleaned = (
        dedup_passages(spark, sf_dir)
        .join(keep, "doc_id", "left_semi")
        .filter(F.col("clean_text") != "")
        .groupBy("clean_text").agg(F.min("doc_id").alias("doc_id"))
    )
    keep = cleaned.select("doc_id")
    counts["boilerplate"] = keep.count()

    # 6. PII scrub over the surviving cleaned text (counts stay on the
    #    frame for audit; the redacted column feeds everything below)
    scrubbed = scrub_pii(
        cleaned.select("doc_id", F.col("clean_text").alias("text"))
    ).select("doc_id", F.col("clean").alias("text"), "n_emails", "n_ips", "n_phones")
    counts["pii_scrubbed"] = scrubbed.count()

    # 7. stratified sample (per true language label, deterministic) —
    #    computed over the SURVIVORS so the exact 1-in-k holds per
    #    surviving stratum (sampling the raw corpus and intersecting
    #    would make the kept fraction depend on how earlier filters
    #    correlate with per-language rank)
    sampled = sample_stratified(
        spark, sf_dir, k=sample_every,
        docs=docs.select("doc_id", "lang").join(keep, "doc_id", "left_semi"),
    ).select("doc_id")
    keep = keep.join(sampled, "doc_id", "left_semi")
    counts["sampled"] = keep.count()

    # 8. leakage-safe split: reuse the stage-2 near-dup components —
    #    the split is a function of the CLUSTER representative, so two
    #    near-duplicate docs land on the same side by construction
    survivors = scrubbed.join(keep, "doc_id", "left_semi")
    with_rep = (
        survivors.join(clusters, "doc_id", "left")
        .select("doc_id", "text", F.coalesce("cluster_id", "doc_id").alias("rep"))
    )
    split = assign_split(with_rep, "rep").select("doc_id", "split")

    # 9. pack the survivors' cleaned, scrubbed text into token-budget
    #    training batches (packing after filtering keeps batch ids
    #    dense) and write, one directory per (split, shard) — each a
    #    replayable training stream
    packed = pack_token_budget(spark, sf_dir, docs=survivors)
    out = (
        packed.join(survivors.select("doc_id", "text"), "doc_id")
        .join(split, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("split", "shard", "batch_id", "doc_id", "lang", "n_tokens", "text")
    )
    out.write.mode("overwrite").partitionBy("split", "shard").parquet(out_dir)
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    from kstore_spark.session import get_spark

    counts = curate(get_spark("curate-corpus"), sf_dir, out_dir)
    for stage, n in counts.items():
        print(f"{stage}: {n}")


if __name__ == "__main__":
    main()
