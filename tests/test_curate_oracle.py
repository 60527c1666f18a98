"""End-to-end pipeline oracle: curate_survivors (the composed 9-stage
curation dataflow) must hash-match its chained DuckDB oracle, and the
output must satisfy the pipeline's semantic contracts (leakage-safe
split, PII-free text, dense packing)."""

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def test_curate_survivors_matches_chained_oracle(spark):
    from kstore_spark.functions.pipeline import (
        CURATE_SURVIVORS_SQL, curate_survivors)

    df = curate_survivors(spark, SF_DIR)
    got = sorted(tuple(r) for r in df.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    exp = sorted(con.execute(CURATE_SURVIVORS_SQL).fetchall())
    assert got == exp and len(got) > 0


def test_curate_survivors_contracts(spark):
    import re

    from kstore_spark.functions.dedup import dedup_minhash_lsh
    from kstore_spark.functions.text import PII_EMAIL, PII_IPV4, PII_PHONE
    from kstore_spark.functions.pipeline import curate_survivors

    rows = curate_survivors(spark, SF_DIR).collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}

    # leakage-safe: no surviving near-dup pair straddles the boundary
    for p in dedup_minhash_lsh(spark, SF_DIR).collect():
        a, b = p["doc_a"], p["doc_b"]
        if a in split_of and b in split_of:
            assert split_of[a] == split_of[b], (a, b)

    # PII-free: the scrubbed text matches none of the PII patterns
    pii = re.compile("|".join((PII_EMAIL, PII_IPV4, PII_PHONE)))
    assert not any(pii.search(r["text"]) for r in rows)

    # packing: n_tokens matches the shipped text; per shard, batch ids
    # start at 0 and are monotone in doc order (the prefix-sum
    # construction; a doc longer than the budget may skip ids)
    shard_batches = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        assert r["n_tokens"] == len(r["text"].split(" "))
        shard_batches.setdefault(r["shard"], []).append(r["batch_id"])
    for bids in shard_batches.values():
        assert bids[0] == 0
        assert bids == sorted(bids)
