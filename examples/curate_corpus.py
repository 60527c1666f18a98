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

def curate(spark, sf_dir: str, out_dir: str, sample_every: int = 2) -> dict:
    """Run the full curation pipeline; returns per-stage survivor counts.

    The stage composition lives in kstore_spark.functions.pipeline
    (``curate_stages`` — also the driver's oracle-checked
    ``curate_survivors`` entry, whose DuckDB oracle chains every
    stage's SQL into one statement); this example materializes each
    stage's survivor count and writes the final training streams,
    partitioned by (split, shard)."""
    from kstore_spark.functions.pipeline import curate_stages

    stages, caches = curate_stages(spark, sf_dir, sample_every=sample_every)
    counts = {name: df.count() for name, df in stages.items()
              if name != "final"}
    stages["final"].write.mode("overwrite").partitionBy(
        "split", "shard").parquet(out_dir)
    for cached in caches:
        cached.unpersist()
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
