"""examples/curate_corpus.py — the composed north-star pipeline: exact
dedup → MinHash near-dup removal → decontamination → quality filter →
passage-boilerplate strip → stratified sample → token-budget packing →
partitioned parquet."""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_curate_pipeline_end_to_end(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from curate_corpus import curate

    out_dir = str(tmp_path / "curated")
    counts = curate(spark, SF_DIR, out_dir, sample_every=2)

    # each stage only removes documents (PII scrub redacts, never drops)
    order = ["input", "exact_dedup", "near_dedup", "decontaminated",
             "quality", "source_quota", "lm_quality", "boilerplate",
             "pii_scrubbed", "sampled", "written"]
    vals = [counts[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["pii_scrubbed"] == counts["boilerplate"]
    assert counts["written"] == counts["sampled"] > 0

    out = spark.read.parquet(out_dir)
    # exact dedup survived the whole pipeline: texts are unique
    assert out.select("text").distinct().count() == counts["written"]
    # partitioned layout: split dirs at the top, one dir per shard inside
    splits = [d for d in os.listdir(out_dir) if d.startswith("split=")]
    assert set(splits) <= {"split=train", "split=holdout"} and splits
    shards = {d for s in splits for d in os.listdir(os.path.join(out_dir, s))
              if d.startswith("shard=")}
    assert len(shards) == out.select("shard").distinct().count() > 1
    # packing invariant holds on the written corpus
    bad = (
        out.groupBy("shard", "batch_id")
        .agg(F.sum("n_tokens").alias("toks"), F.max("n_tokens").alias("maxdoc"))
        .filter(F.col("toks") >= 2048 + F.col("maxdoc"))
        .count()
    )
    assert bad == 0
