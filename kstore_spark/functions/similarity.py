"""Similarity search over an embedding column (array<float>).

Three tiers:
- brute-force cosine top-k (the correctness baseline; JVM-side
  zip_with/aggregate — no Python in the loop)
- threshold near-duplicate pairs (brute force, float-free output)
- IVF (inverted-file) top-k (the 100 TB path: vectors are bucketed by
  nearest coarse-quantizer centroid; queries probe a few cells, so the
  cross product never materializes)

Determinism: cosine similarities are computed in double precision with a
sequential index-order fold — identical to DuckDB's list_cosine_similarity
over the double-cast list — and only ids/ranks are emitted (never floats),
with ties broken by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kstore_spark.tables import table

TOP_K = 5
N_QUERIES = 10          # vec_id < 10 play the query-vector role
NEAR_DUP_COS = 0.47     # sits in an empirical gap of the data (no pair
                        # within 5e-3 of the threshold at sf0.01)


def _emb(spark, sf_dir) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    # cast float[] → double[] once; all arithmetic stays JVM-side
    return e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def sim_topk_bruteforce(spark, sf_dir):
    """Top-k cosine neighbors for each query vector. The query side is
    tiny → broadcast; the big side streams. Ranks, not sims, are output."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )

SIM_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS s,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, v) DESC, e.vec_id ASC) AS rank
  FROM q, e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= {TOP_K}
"""


def embedding_neardup(spark, sf_dir):
    """All pairs with cosine > threshold. Brute force is the baseline;
    the LSH variant below is the scale path."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(_cosine(F.col("va"), F.col("vb")) > NEAR_DUP_COS)
        .select("vec_a", "vec_b")
    )

EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a, e b
WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.v, b.v) > {NEAR_DUP_COS}
"""


# -- IVF approximate nearest neighbor (scale path) ---------------------

N_CELLS = 16   # coarse-quantizer cells (√N-ish at corpus scale)
N_PROBE = 4    # cells searched per query


def _centroids(emb: DataFrame):
    """Deterministic coarse quantizer: the first N_CELLS vectors by id act
    as centroids (a production system would k-means; determinism matters
    more here and the IVF machinery is identical)."""
    return [
        (r["vec_id"], r["v"])
        for r in emb.filter(F.col("vec_id") < N_CELLS).orderBy("vec_id").collect()
    ]


def _nearest_cells(vcol, cents, n: int):
    """Array of the `n` cell ids with highest cosine to vcol, computed as
    a JVM sort over a literal-array of (sim, cell) structs."""
    scored = F.array(*[
        F.struct(
            _cosine(vcol, F.array(*[F.lit(x) for x in cv])).alias("s"),
            F.lit(cid).alias("cell"),
        )
        for cid, cv in cents
    ])
    return F.slice(F.reverse(F.array_sort(scored)), 1, n)


def sim_ann_ivf(spark, sf_dir, n_probe: int = N_PROBE):
    """IVF top-k: every vector is assigned to its nearest centroid cell;
    each query scans only its N_PROBE closest cells. At 100 TB the table
    is partitioned by cell, so a probe is a partition-pruned scan — the
    cross product never materializes. Probing all cells degenerates to
    exact brute force (pinned in tests); output schema matches
    sim_topk_bruteforce. Approximate by construction → rows-only driver
    check + recall gate in tests."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(emb)
    assigned = emb.withColumn("cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
    )
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.transform(_nearest_cells(F.col("qv"), cents, n_probe), lambda s: s["cell"])
        ).alias("cell"),
    )
    cands = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "embedding_neardup": embedding_neardup,
    "sim_ann_ivf": sim_ann_ivf,
}

ORACLES = {
    "sim_topk_bruteforce": SIM_TOPK_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    # sim_ann_ivf: approximate by construction → rows-only check +
    # recall/exactness gates in tests/test_pipeline_functions.py
}
