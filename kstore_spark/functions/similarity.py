"""Similarity search over an embedding column (array<float>).

Tiers:
- blocked-matmul cosine top-k (`sim_topk_matmul` — the PRIMARY exact
  path: Arrow-batched BLAS, ~50× less per-pair cost than the fold at
  scale; rank-identical to the fold, same DuckDB oracle)
- brute-force cosine top-k (`sim_topk_bruteforce` — the oracle-mirror
  baseline; JVM-side zip_with/aggregate, no Python in the loop, float
  math sequenced exactly like DuckDB's list_cosine_similarity)
- threshold near-duplicate pairs (brute force, float-free output)
- hyperplane-LSH near-dup + IVF top-k (the 100 TB paths: banded
  signatures / coarse-quantizer cells — the cross product never
  materializes)

Determinism: cosine similarities are computed in double precision with a
sequential index-order fold — identical to DuckDB's list_cosine_similarity
over the double-cast list — and only ids/ranks are emitted (never floats),
with ties broken by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kstore_spark.tables import one_slice_df, table

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


def _n_emb(spark, sf_dir) -> int:
    """Corpus vector count from the parquet FOOTER, driver-side — no
    Spark job. Exact for every consumer below because ``_emb`` is an
    unfiltered row-preserving projection of embeddings.parquet; used
    where a count only sizes a knob (the 1% re-rank pool, the fold
    boundary), absorbing the one remaining per-call action the shared
    prefix collect didn't (VERDICT r12 item 6, guide §1.2)."""
    import os

    from kstore_spark.tables import parquet_row_count

    return parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))


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


def sim_topk_matmul(spark, sf_dir, k: int = TOP_K):
    """Exact top-k by blocked matrix multiply — the PRIMARY exact-top-k
    path (round-3 swap, VERDICT r2 item 4; sim_topk_bruteforce's JVM fold
    stays as the oracle-mirror baseline). The (tiny, bounded) query
    matrix rides into a mapInArrow closure; each Arrow batch is reshaped
    zero-copy (fixed-width lists → one (n, dim) float view, no per-row
    Python objects), computes one X @ Qᵀ (BLAS) and emits only its
    batch-local top-k per query, so the shuffle into the final window is
    n_batches × queries × k rows. ~50× less per-pair cost than the JVM
    fold at 10× scale (PERF.md).

    Rank-exactness: scores are float64; BLAS pairwise summation differs
    from the fold's sequential order by ≲1e-15 relative, while the
    smallest adjacent-rank similarity gap in the testdata is 1.9e-5
    (sf0.01) — seven orders of magnitude of margin, so ranks are
    identical and the same DuckDB SQL is its exact oracle."""
    import numpy as np
    import pyarrow as pa

    emb = _emb(spark, sf_dir)
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    qids = np.array([r["vec_id"] for r in q_rows], dtype="int64")
    Q = np.stack([np.asarray(r["v"], dtype="float64") for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, s double"

    def run(batches):
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            flat = b.column("v").flatten().to_numpy(zero_copy_only=False)
            dim = flat.size // n
            if dim * n != flat.size:  # ragged lists would mis-reshape
                raise ValueError("embeddings are not fixed-width")
            X = flat.reshape(n, dim)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = Xn @ Qn.T                     # batch × queries
            top = min(k + 1, n)  # +1 headroom: the self pair is dropped
            qcol: list[int] = []
            ncol: list[int] = []
            scol: list[float] = []
            for j, qid in enumerate(qids):
                sel = np.argpartition(-S[:, j], top - 1)[:top]
                for i in sel:
                    if ids[i] != qid:
                        qcol.append(int(qid))
                        ncol.append(int(ids[i]))
                        scol.append(float(S[i, j]))
            yield pa.record_batch(
                [pa.array(qcol, "int64"), pa.array(ncol, "int64"),
                 pa.array(scol, "float64")],
                names=["query_id", "neighbor_id", "s"],
            )

    cands = emb.mapInArrow(run, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# -- random-hyperplane LSH near-duplicates (scale path) ----------------
#
# Signature bit j = sign(v · h_j) for seeded Gaussian hyperplanes h_j;
# P[bit match] = 1 - θ/π for angle θ. Bits are grouped into BANDS bands
# of ROWS bits; a pair is a candidate iff some band matches, then
# verified with EXACT cosine — so output ⊆ brute force by construction
# and only recall is probabilistic.
#
# Parameter math (recall = 1-(1-p^w)^b, candidate rate for random pairs
# = 1-(1-0.5^w)^b): the production near-dup regime (cos ≥ 0.95, p=0.9)
# needs only w=16,b=32 for recall 0.996 at a 5e-4 random-collision rate
# — a ~1000× pair-space cut (pinned by the perturbed-duplicates test).
# The synthetic table's 0.47 threshold (p=0.656) is a far weaker gap, so
# the default bands are wider-and-more (w=8,b=120, recall ≥0.98); with
# the fixed seed this attains 100% recall at sf0.01, letting the driver
# hash-check it against the brute-force oracle.

LSH_SEED = 7
LSH_BANDS = 120
LSH_ROWS = 8


def _hyperplane_band_hashes(emb: DataFrame, bands: int, rows: int, seed: int,
                            vec_col: str = "v") -> DataFrame:
    """(vec_id, sig: array<bigint>[bands]) — one Arrow-batched pandas_udf
    doing a single numpy matmul per batch (vectors never hit the driver;
    the hyperplane matrix is regenerated from the seed inside each
    executor — nothing is shuffled but (id, band-hash) pairs)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    def _sig(col):
        import numpy as np

        if len(col) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(col.to_numpy())
        H = np.random.default_rng(seed).standard_normal((bands * rows, X.shape[1]))
        bits = (X @ H.T) > 0                       # n × bands·rows
        weights = (1 << np.arange(rows)).astype("int64")
        vals = bits.reshape(len(X), bands, rows) @ weights   # n × bands
        return pd.Series(list(vals.astype("int64")))

    # module-level `from __future__ import annotations` stringifies type
    # hints, which pandas_udf's inference can't resolve — attach real ones
    _sig.__annotations__ = {"col": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(ArrayType(LongType()))(_sig)

    return emb.select("vec_id", sig_udf(F.col(vec_col)).alias("sig"))


def neardup_lsh_pairs(emb: DataFrame, threshold: float,
                      bands: int = LSH_BANDS, rows: int = LSH_ROWS,
                      seed: int = LSH_SEED) -> DataFrame:
    """Frame-level core of the hyperplane-LSH near-dup: ``emb`` is any
    (vec_id, v: array<double>) frame — the embeddings table, or derived
    vectors (e.g. multimodal payload features, functions/multimodal.py).
    The all-pairs cross join never materializes: the band self-join
    touches only colliding (band, hash) buckets, and verification reads
    just the candidate vectors."""
    sig = _hyperplane_band_hashes(emb, bands, rows, seed)
    # the signature fold (bands×rows dot products per vector) is the
    # expensive stage: cache it once so the self-join's two branches
    # read the cache instead of each re-deriving every signature
    banded = sig.select("vec_id", F.posexplode("sig").alias("band", "bh")).persist()
    a = banded.select(F.col("vec_id").alias("vec_a"), "band", "bh")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band", "bh")
    cands = (
        a.join(b, ["band", "bh"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    res = (
        cands.join(va, "vec_a").join(vb, "vec_b")
        .filter(_cosine(F.col("va"), F.col("vb")) > threshold)
        .select("vec_a", "vec_b")
        .persist()
    )
    res.count()  # materialize the (small) pair output, then free the
    banded.unpersist()  # band cache — only the result stays cached
    return res


def embedding_neardup_lsh(spark, sf_dir, threshold: float = NEAR_DUP_COS,
                          bands: int = LSH_BANDS, rows: int = LSH_ROWS,
                          seed: int = LSH_SEED):
    """Near-duplicate pairs via hyperplane LSH + exact-cosine verify over
    the embeddings table. Same output schema as embedding_neardup."""
    return neardup_lsh_pairs(_emb(spark, sf_dir), threshold, bands, rows, seed)


# -- IVF approximate nearest neighbor (scale path) ---------------------

N_CELLS = 16   # coarse-quantizer cells (√N-ish at corpus scale)
N_PROBE = 4    # cells searched per query


def _prefix_rows(emb: DataFrame, n: int):
    """ONE collect of the ``vec_id < n`` id-prefix as [(vec_id, v)]
    ascending — shared by every bounded-driver-state consumer (coarse
    centroids, PQ codebook samples, residual training samples, the
    query vectors). Before r12 each consumer ran its own driver job
    over the same tiny prefix, so a stored-ANN query paid 3-4 separate
    collects per invocation (guide §1.2: remove repeated passes —
    measured, the per-job overhead was the cost, not the rows)."""
    return [
        (r["vec_id"], r["v"])
        for r in emb.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    ]


def _centroids(emb: DataFrame, k: int = N_CELLS, rows=None):
    """Deterministic coarse quantizer: the first `k` vectors by id act
    as centroids (a production system would k-means; determinism matters
    more here and the IVF machinery is identical). The collect is
    bounded k×dim driver state — at the 100 TB operating point
    (√N ≈ 10⁴-10⁵ cells × 64 dims) that is tens of MB, which the
    driver holds fine; what must NOT hold it is the Catalyst plan
    (see _nearest_cells). ``rows`` (a _prefix_rows result covering at
    least k) skips the collect."""
    if rows is not None:
        return [(i, v) for i, v in rows if i < k]
    return _prefix_rows(emb, k)


def _nearest_cells(vcol, cents, n: int):
    """Array of the `n` (s, cell) structs with highest cosine to vcol,
    ties broken toward the higher cell id — same ordering contract as
    the pre-r6 JVM expression form.

    r6 rewrite (VERDICT r5 item 2): the centroid matrix travels to
    executors as a Spark BROADCAST ndarray consumed by one BLAS matmul
    per Arrow batch — NOT as plan literals. The previous form compiled
    an N_CELLS×dim literal struct array into the Catalyst expression
    tree: fine at 16 cells, but at a realistic coarse-quantizer size
    (√N ≈ 10⁴-10⁵ cells) that is a multi-hundred-MB plan that dies in
    compile/broadcast long before the data does. Measured at 4096
    cells the literal plan takes minutes to even compile while this
    path is matmul-bound (tools/probe_ivf_cells.py, PERF.md).

    Oracle safety: assignment margins (top-1 vs top-2 cell gap) are
    pinned > 1e-6 in tests at both small SFs, eight orders above the
    ~1e-15 summation-order noise between the BLAS matmul and the
    sequential cosine fold — so argmax/rank output is identical and
    the exact DuckDB oracles built on assignment
    (cluster_balanced_sample) are unaffected."""
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    # getActiveSession is per-thread — fall back to the (single, shared)
    # session so worker-thread callers don't see None
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    cells_desc, Cn = _cells_desc_matrix(cents)
    bc = spark.sparkContext.broadcast((cells_desc, Cn))
    take = min(n, len(cells_desc))

    def _nn(col):
        cdesc, cn = bc.value
        if len(col) == 0:
            return pd.Series([], dtype=object)
        import numpy as np

        X = np.stack(col.to_numpy())
        return pd.Series([
            [{"s": s, "cell": c} for s, c in row]
            for row in _nn_scores(X, cdesc, cn, take)
        ])

    _nn.__annotations__ = {"col": pd.Series, "return": pd.Series}
    udf = pandas_udf(ArrayType(StructType([
        StructField("s", DoubleType()), StructField("cell", LongType())])))(_nn)
    return udf(vcol)


def _cells_desc_matrix(cents):
    """(cells_desc, Cn): cell ids sorted DESCENDING plus the matching
    row-normalized centroid matrix — the precomputed half of the
    nearest-cell kernel, shared by the executor pandas_udf
    (_nearest_cells) and the driver-side bounded-query probe
    (_probe_cells). Descending id order + stable argsort is what makes
    similarity ties break toward the HIGHER cell id (the (s DESC,
    cell DESC) contract the oracles mirror)."""
    import numpy as np

    cells = np.asarray([cid for cid, _ in cents], dtype="int64")
    C = np.stack([np.asarray(cv, dtype="float64") for _, cv in cents])
    order = np.argsort(cells)[::-1]
    return cells[order], C[order] / np.linalg.norm(
        C[order], axis=1, keepdims=True)


def _nn_scores(X, cdesc, cn, take):
    """The ONE nearest-cell scoring core (r10-review rule: assignment
    kernels must never fork): normalized matmul + stable top-``take``.
    Returns per-row [(s, cell), ...] in (s DESC, cell DESC) order."""
    import numpy as np

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ cn.T                                       # batch × cells
    if take == 1:
        j = np.argmax(S, axis=1)                        # first max = high id
        return [[(float(S[i, ji]), int(cdesc[ji]))]
                for i, ji in enumerate(j)]
    idx = np.argsort(-S, axis=1, kind="stable")[:, :take]
    return [[(float(S[i, j]), int(cdesc[j])) for j in idx[i]]
            for i in range(len(X))]


def _probe_cells(q_rows, cents, n):
    """Driver-side probe list for a BOUNDED query set: the same
    _nn_scores kernel _nearest_cells runs on executors, applied to the
    already-collected [(vec_id, v)] query rows. An N_QUERIES-row probe
    does not need an Arrow stage, a centroid broadcast, and a scan
    subtree per query invocation (guide §4: the boundary itself was
    the cost — measured as one extra job + python-worker round-trip
    per ANN call). Returns [(vec_id, [cell, ...n]), ...]."""
    import numpy as np

    if not q_rows:
        return []
    X = np.stack([np.asarray(v, dtype="float64") for _, v in q_rows])
    cdesc, cn = _cells_desc_matrix(cents)
    take = min(n, len(cdesc))
    return [
        (qid, [c for _, c in row])
        for (qid, _), row in zip(q_rows, _nn_scores(X, cdesc, cn, take))
    ]


def kmeans_centroids(emb: DataFrame, k: int = N_CELLS, iters: int = 4):
    """Distributed Lloyd's k-means over the embedding frame: assignment
    is the same broadcast-matmul nearest-cell kernel IVF uses; the update step is
    one groupBy with 64 per-dimension averages; only the k×dim centroid
    matrix ever reaches the driver (bounded state, like cluster_pairs'
    label frame). Iteration count is fixed → deterministic plan shape;
    the centroids themselves are float averages, so anything built on
    them stays rows-only for the driver (the IVF recall/exactness gates
    in tests are centroid-agnostic)."""
    cents = [(r["vec_id"], r["v"]) for r in
             emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()]
    # dim from the seed collect — the separate first() was one more job
    # per training call for a value the k-row collect already holds (r12)
    dim = len(cents[0][1])
    for _ in range(iters):
        assigned = emb.withColumn(
            "cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
        rows = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col("v")[i]).alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        # empty cells keep their previous centroid (standard Lloyd's)
        new = {r["cell"]: [r[f"d{i}"] for i in range(dim)] for r in rows}
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


def sim_ann_ivf_kmeans(spark, sf_dir, n_probe: int = N_PROBE,
                       iters: int = 4):
    """IVF top-k with a k-means-trained coarse quantizer instead of the
    deterministic first-N cells — identical probe machinery, better cell
    balance on clustered data. Rows-only for the driver (float centroid
    training); full-probe == exact pinned in tests exactly like the
    base IVF."""
    emb = _emb(spark, sf_dir)
    cents = kmeans_centroids(emb, N_CELLS, iters)
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


def sim_ann_ivf(spark, sf_dir, n_probe: int = N_PROBE,
                n_cells: int = N_CELLS):
    """IVF top-k: every vector is assigned to its nearest centroid cell;
    each query scans only its N_PROBE closest cells. At 100 TB the table
    is partitioned by cell, so a probe is a partition-pruned scan — the
    cross product never materializes. Probing all cells degenerates to
    exact brute force (pinned in tests); output schema matches
    sim_topk_bruteforce. Approximate by construction → rows-only driver
    check + recall gate in tests. `n_cells` is a measured knob
    (tools/probe_ivf_cells.py benches assignment at ≥4k cells)."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(emb, n_cells)
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


def ivf_store_dir(spark, sf_dir, n_cells: int = N_CELLS,
                  max_vec: int | None = None) -> str:
    """Materialize the IVF layout sim_ann_ivf's docstring promises: the
    embedding table written ``partitionBy("cell")`` (nearest-centroid
    assignment), registered in the durable ArtifactStore keyed by the
    source's content-derived version + n_cells and reused across
    sessions (r6: registry-driven reuse replaces the /tmp+mtime
    sentinel — a kill mid-build leaves an unregistered orphan no second
    engine will reuse; catalog.ArtifactStore). At 100 TB this layout is
    the difference between "probe = scan everything then filter" and
    "probe = read n_probe/n_cells of the files" — partition pruning
    happens at LISTING time, before any IO. One batch write; a
    production pipeline runs it at ingest. With ``max_vec`` the store
    covers only vec_id < max_vec — the HISTORY store
    sim_ann_ivf_incremental probes (the first-n_cells centroid ids are
    inside any history, so centroids are history-deterministic)."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    params = f"c{n_cells}" + (f":d{max_vec}" if max_vec is not None else "")
    if max_vec is not None:  # history slice: appends must not invalidate
        version = ArtifactStore.source_version_bounded(
            src, params, "vec_id", max_vec)
    else:
        version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        emb = _emb(spark, sf_dir)
        if max_vec is not None:
            emb = emb.filter(F.col("vec_id") < max_vec)
        cents = _centroids(emb, n_cells)
        (emb.withColumn("cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
         .write.mode("overwrite").partitionBy("cell").parquet(out_dir))

    return store.get_or_build(f"ivf:{src}:{params}", version, build, src=src)


def compact_ivf_store(spark, sf_dir, old_min: int, new_min: int,
                      n_cells: int = N_CELLS) -> str:
    """Fold the embeddings increment into the IVF history store — the
    ANN twin of text.compact_token_index (VERDICT r6 item 5 generalized
    to the whole incremental family): advance the boundary from
    ``old_min`` to ``new_min`` by MERGING the existing cell-partitioned
    history store with the increment's query-kernel cell assignments
    (only old_min ≤ vec_id < new_min is read and assigned — history
    vectors are never re-assigned, re-read from source, or re-scored),
    registered as the d{new_min} store under the standard ArtifactStore
    contract with the SAME content-derived bounded version a
    from-scratch build gets — so sim_ann_ivf_incremental(new_min) is
    then served entirely from the folded store (empty increment branch)
    and later ivf_store_dir(max_vec=new_min) calls reuse it verbatim.
    Centroids are the first-n_cells ids (inside any history slice with
    new_min ≥ n_cells), so the merged assignment is bit-identical to a
    from-scratch build (pinned in tests). The superseded d{old_min}
    store is retired (tombstone + session-epoch GC)."""
    import os

    from kstore_spark.catalog import ArtifactStore

    assert new_min >= n_cells, "centroid ids must lie inside history"
    # ADVICE r7: the OLD boundary must satisfy the same bound — a
    # history store built at old_min < n_cells used a truncated
    # centroid set, so folding its assignments forward would silently
    # register a store that is NOT from-scratch-equal at new_min.
    assert old_min >= n_cells, (
        "history store predates a full centroid set — rebuild from "
        "scratch at new_min instead of folding")
    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    old_store = ivf_store_dir(spark, sf_dir, n_cells, max_vec=old_min)

    params = f"c{n_cells}:d{new_min}"
    version = ArtifactStore.source_version_bounded(
        src, params, "vec_id", new_min)

    def build(out_dir: str) -> None:
        emb = _emb(spark, sf_dir).filter(F.col("vec_id") < new_min)
        cents = _centroids(emb, n_cells)
        inc = (
            emb.filter(F.col("vec_id") >= old_min)
            .withColumn("cell",
                        _nearest_cells(F.col("v"), cents, 1)[0]["cell"]))
        hist = spark.read.parquet(old_store)
        hist = hist.withColumn(
            "cell", F.col("cell").cast(dict(inc.dtypes)["cell"]))
        (hist.unionByName(inc).write.mode("overwrite")
         .partitionBy("cell").parquet(out_dir))

    new_store = store.get_or_build(
        f"ivf:{src}:{params}", version, build, src=src)
    store.retire(f"ivf:{src}:c{n_cells}:d{old_min}")
    return new_store


def sim_ann_ivf_stored(spark, sf_dir, n_probe: int = N_PROBE,
                       n_cells: int = N_CELLS):
    """sim_ann_ivf against the cell-PARTITIONED store (ivf_store_dir):
    the probe join keys on the partition column, and because the probe
    side is broadcast, Spark inserts a DYNAMIC PARTITION PRUNING filter
    on the store scan — only the probed cells' files are read (plan-
    pinned in tests). Output is identical to sim_ann_ivf at equal
    n_probe (same centroids, same assignment — pinned)."""
    store = ivf_store_dir(spark, sf_dir, n_cells)
    data = spark.read.parquet(store)  # (vec_id, v, cell=partition col)
    cents = _centroids(_emb(spark, sf_dir), n_cells)
    q = _emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
    )
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.transform(_nearest_cells(F.col("qv"), cents, n_probe), lambda s: s["cell"])
        ).alias("cell"),
    )
    cands = data.join(F.broadcast(probes), "cell").filter(
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


IVF_INCR_MIN = 400  # vec_id >= this plays the "new embeddings increment"
                    # (same convention as dedup.INCR_NEW_MIN: the sf0.01
                    # driver table has ids 0..499 -> a 20% increment)


# Exact SQL oracle for the DETERMINISTIC IVF variants (r6 upgrade from
# rows-only): the whole pipeline — argmax cell assignment, top-n_probe
# cell selection, candidate ranking — is deterministic float comparison
# with every boundary pinned FAR above noise (assignment top1-top2 gap
# > 1e-6 and probe-boundary gap > 1.1e-3 in tests, vs ~1e-15
# matmul-vs-fold summation noise; neighbor ranks rest on the same
# 1.9e-5 margin as sim_topk's oracle), and tie-breaks (cell DESC on
# equal sim; neighbor_id ASC on equal score) are mirrored. kmeans stays
# rows-only: its centroids are trained float averages.
SIM_ANN_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {N_CELLS}
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell DESC
           ) AS rnk
    FROM e CROSS JOIN c)
  WHERE rnk = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell DESC
           ) AS rnk
    FROM q CROSS JOIN c)
  WHERE rnk <= {N_PROBE}
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
           ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id ASC
         ) AS rank
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= {TOP_K}
"""


def sim_ann_ivf_incremental(spark, sf_dir, n_probe: int = N_PROBE,
                            n_cells: int = N_CELLS,
                            new_min: int = IVF_INCR_MIN):
    """IVF top-k where only the INCREMENT (vec_id >= ``new_min``) is
    assigned at query time; the history rides its persisted
    cell-partitioned store (ivf_store_dir(max_vec=new_min)) — the
    production daily-ingest shape that completes the incremental
    family (dedup_minhash_incremental, dedup_substring_incremental →
    this): new embeddings arrive, yesterday's corpus is NOT
    re-assigned, re-read, or re-written.

    Candidates come from TWO branches unioned AFTER the probe join —
    history store ⋈ broadcast probes (dynamic partition pruning on the
    store scan, same plan as sim_ann_ivf_stored; a union before the
    join would defeat DPP) and increment-assigned frame ⋈ probes (the
    increment filter pushes to the scan, so only new vectors are read
    and assigned). Centroids are the first-n_cells ids — inside any
    history, so assignment is corpus-independent per row and the
    output EQUALS sim_ann_ivf over the full corpus at equal n_probe
    (exact, not probabilistic: gate row in
    plans/checks.approx_equivalence_checks + pytest pin)."""
    store = ivf_store_dir(spark, sf_dir, n_cells, max_vec=new_min)
    hist = spark.read.parquet(store)  # (vec_id, v, cell=partition col)
    emb = _emb(spark, sf_dir)
    cents = _centroids(emb, n_cells)
    inc = emb.filter(F.col("vec_id") >= new_min).withColumn(
        "cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
    )
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.transform(_nearest_cells(F.col("qv"), cents, n_probe),
                        lambda s: s["cell"])
        ).alias("cell"),
    )
    cands = (
        hist.join(F.broadcast(probes), "cell")
        .select("query_id", "qv", "vec_id", "v")
        .unionByName(
            inc.join(F.broadcast(probes), "cell")
            .select("query_id", "qv", "vec_id", "v"))
        .filter(F.col("vec_id") != F.col("query_id"))
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


def knn_graph_ivf(spark, sf_dir, k: int = TOP_K, n_probe: int = N_PROBE,
                  n_cells: int = N_CELLS):
    """The corpus SELF-kNN graph — every vector's top-``k`` cosine
    neighbors among its ``n_probe`` nearest IVF cells. This is the
    backbone artifact of embedding-based curation (SemDeDup's duplicate
    graph, density/diversity sampling, kNN classification all consume
    it); the existing ops query 10 vectors — a training pipeline needs
    the graph over ALL of them, which changes the right physical shape:

    - the all-pairs score matrix is N²·n_probe/n_cells — at √N cells
      that is N^1.5·n_probe scores, the IVF contract; it must be
      computed BLAS-blocked and never materialized as rows. Both sides
      are cogrouped by cell and each cell computes ONE members×probers
      matmul in Arrow batch space (applyInPandas over cogroup), emitting
      only its per-prober top-k — so what shuffles into the final
      re-rank window is N·n_probe·k rows, not N²·n_probe/n_cells.
    - per-cell top-k under the global order (s DESC, neighbor ASC) is
      lossless: a global top-k member has < k predecessors globally,
      hence < k within its own cell (the within-cell order is the
      restriction of the global order — members are id-sorted so the
      stable argsort inherits the ASC tie-break).
    - the unit of parallelism is the cell; at 100 TB the two knobs are
      n_cells ≈ √N (bounds per-cell members×probers work) and hot-cell
      splitting (cap members per task by sub-hashing the member side —
      same salting idiom as operators/skew.py) — noted, not needed at
      bench scale where AQE's skew handling covers the imbalance.

    Exactness: deterministic first-k centroids (same as sim_ann_ivf's
    exact-oracle upgrade), every rank boundary pinned far above BLAS-vs-
    fold summation noise (test_knn_graph_margins: probe-boundary AND
    adjacent-rank gaps over ALL vectors, both SFs), ties broken by
    neighbor id — so the DuckDB fold SQL is its exact oracle."""
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    cents = _centroids(emb, n_cells)
    assigned = emb.withColumn(
        "cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
    probes = emb.select(
        "vec_id", "v",
        F.explode(
            F.transform(_nearest_cells(F.col("v"), cents, n_probe),
                        lambda s: s["cell"])
        ).alias("cell"),
    )

    def cell_topk(members: pd.DataFrame, probers: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vec_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "s": pd.Series(dtype="float64"),
        })
        if members.empty or probers.empty:
            return empty
        mid = members["vec_id"].to_numpy()
        order = np.argsort(mid)  # id ASC ⇒ stable sort breaks s-ties low
        mid = mid[order]
        M = np.stack(members["v"].to_numpy())[order].astype("float64")
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        qid = probers["vec_id"].to_numpy()
        Q = np.stack(probers["v"].to_numpy()).astype("float64")
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        S = Qn @ Mn.T                       # probers × members (BLAS)
        S[qid[:, None] == mid[None, :]] = -np.inf  # self-mask
        take = min(k, S.shape[1])
        idx = np.argsort(-S, axis=1, kind="stable")[:, :take]
        rows_q: list[int] = []
        rows_n: list[int] = []
        rows_s: list[float] = []
        for i in range(S.shape[0]):
            for j in idx[i]:
                if np.isfinite(S[i, j]):    # drop the masked self slot
                    rows_q.append(int(qid[i]))
                    rows_n.append(int(mid[j]))
                    rows_s.append(float(S[i, j]))
        if not rows_q:
            return empty
        return pd.DataFrame({
            "vec_id": np.asarray(rows_q, dtype="int64"),
            "neighbor_id": np.asarray(rows_n, dtype="int64"),
            "s": np.asarray(rows_s, dtype="float64"),
        })

    part = (
        assigned.groupby("cell")
        .cogroup(probes.groupby("cell"))
        .applyInPandas(cell_topk, "vec_id long, neighbor_id long, s double")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


KNN_GRAPH_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {N_CELLS}
), ranked_cells AS (
  SELECT e.vec_id, e.v, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell DESC
         ) AS rnk
  FROM e CROSS JOIN c
), assigned AS (
  SELECT vec_id, v, cell FROM ranked_cells WHERE rnk = 1
), probes AS (
  SELECT vec_id, v AS qv, cell FROM ranked_cells WHERE rnk <= {N_PROBE}
), scored AS (
  SELECT p.vec_id, a.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id
           ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id ASC
         ) AS rank
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE a.vec_id <> p.vec_id
)
SELECT vec_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= {TOP_K}
"""


# -- product quantization (memory-compressed ANN) ----------------------
#
# The 100 TB memory lever IVF alone doesn't give: a 64-dim float64
# vector is 512 bytes; its PQ code is PQ_M bytes (one codebook index
# per subspace) — a 64× compression that lets a 10^10-vector corpus's
# codes fit where its vectors never could (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 — public
# method). Scoring approximates the dot product as a sum of per-
# subspace table lookups; candidates are then EXACTLY re-ranked with
# true cosine on the candidate set only, so precision is exact and
# only recall (which candidates make the cut) is approximate — the
# same verify-exactly discipline as the LSH/IVF paths, and with the
# re-rank pool widened to the whole corpus the op degenerates to brute
# force (the equivalence gate in plans/checks.py).

PQ_M = 8            # subspaces (dim 64 -> 8 dims each); code = 8 bytes
PQ_K = 16           # codewords per subspace (first-K deterministic,
                    # like _centroids — kmeans would tighten cells but
                    # determinism matters more here)
PQ_RERANK = 50      # re-rank floor; default pool = max(this, corpus/100)
                    # — a FIXED pool shrinks relatively as the corpus
                    # grows and recall collapses with it (measured on
                    # the 100× structureless replica: 0.22 at 50 vs
                    # 0.82 at 2000, same wall — PERF.md r6)


def _pq_codebooks(emb: DataFrame, m: int = PQ_M, k: int = PQ_K, rows=None):
    """(m, k, sub_dim) ndarray: codebook j = the j-th dim-slice of the
    first k vectors by id. Bounded driver state (m*k*sub_dim doubles),
    broadcast to executors — never in the plan (same rule as
    _nearest_cells). ``rows`` (a _prefix_rows result covering at least
    k) skips the collect."""
    import numpy as np

    if rows is None:
        rows = _prefix_rows(emb, k)
    X = np.stack([np.asarray(v, dtype="float64")
                  for i, v in rows if i < k])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    sub = dim // m
    return X.reshape(k, m, sub).transpose(1, 0, 2).copy()  # m × k × sub


def _pq_argmin_codes(X, books):
    """The ONE per-subspace nearest-codeword kernel (r10 review: the
    residual encoder had copy-pasted this loop — a tie-break or dtype
    fix in one copy would silently break the 'same encoding, one extra
    subtract' premise, the identical failure mode the r9 review fixed
    for the query kernel). ||x - c||^2 = ||x||^2 - 2x·c + ||c||^2;
    ||x||^2 is constant per row → argmin over (-2x·c + ||c||^2); ties →
    lower codeword id via argmin-first. (n, dim) batch → (n, m) int32."""
    import numpy as np

    m, k, sub = books.shape
    parts = X.reshape(len(X), m, sub)
    codes = np.empty((len(X), m), dtype="int32")
    for j in range(m):
        d = -2.0 * (parts[:, j, :] @ books[j].T) + (books[j] ** 2).sum(1)
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def _pq_code_udf(books):
    """The PQ encode boundary as ONE reusable (pandas_udf, broadcast)
    pair: v → array<int> code via the shared _pq_argmin_codes kernel
    against a broadcast of ``books``. Shared by pq_encode (batch
    ingest), pq_codebooks_kmeans (per-iteration Lloyd assignment — it
    unpersists the returned handle after its collect, ADVICE r10), and
    streaming.indexing.stream_vector_assignments (in-stream encode
    against the history's codebooks) — the r10-review rule that encode
    kernels must never fork. The broadcast's lifetime is the consumer's
    responsibility: batch/stream callers leave it tied to the returned
    plan (re-broadcastable on demand); loop callers release it per
    iteration."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    bc = spark.sparkContext.broadcast(books)

    def _enc(col):
        bks = bc.value
        if len(col) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(col.to_numpy())
        return pd.Series(list(_pq_argmin_codes(X, bks)))

    _enc.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(ArrayType(IntegerType()))(_enc), bc


def pq_encode(emb: DataFrame, books) -> DataFrame:
    """(vec_id, code: array<int>[m]) — nearest codeword per subspace by
    L2 (the PQ standard; ties → lower codeword id via argmin-first).
    One Arrow batch = m small matmuls; codes are the only thing wider
    than an id that ever shuffles."""
    enc, _ = _pq_code_udf(books)
    return emb.select("vec_id", enc(F.col("v")).alias("code"))


PQ_KMEANS_ITERS = 4  # fixed Lloyd iterations (deterministic plan shape,
                     # same discipline as kmeans_centroids' iters=4)

_KMEANS_DRIVER_VECS = 65_536  # below this MEASURED training-slice size
                              # the Lloyd loop runs driver-side on the
                              # collected matrix (≤ 32 MB at dim 64 —
                              # the same broadcast-build-side budget as
                              # the union-find cutover) instead of
                              # iters sequential corpus jobs. Training
                              # numerics are layout-dependent either
                              # way (the module's standing caveat: the
                              # distributed F.avg sums in partition
                              # order), and every declared query built
                              # on these books is widened-knobs exact
                              # — the driver twin only changes WHICH
                              # non-reproducible float average you
                              # get, and is itself the more
                              # reproducible one (vec_id-ordered sums).


def _pq_kmeans_driver(X, books, iters: int):
    """Driver-side twin of the distributed Lloyd loop below: the SAME
    _pq_argmin_codes assignment kernel on the collected (n, dim)
    matrix, mean-per-(subspace, codeword) update in vec_id order,
    empty codewords keep their previous value. Reachable only under
    the _KMEANS_DRIVER_VECS measured cutover; differential-pinned
    against the distributed path's fixed points in pytest (both are
    exact Lloyd — identical assignments whenever the float means
    agree to assignment precision)."""
    import numpy as np

    m, k, sub = books.shape
    parts = X.reshape(len(X), m, sub)
    for _ in range(iters):
        codes = _pq_argmin_codes(X, books)
        new = books.copy()
        for j in range(m):
            for c in range(k):
                mask = codes[:, j] == c
                if mask.any():
                    new[j, c] = parts[mask, j, :].mean(axis=0)
        books = new
    return books


def pq_codebooks_kmeans(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
                        iters: int = PQ_KMEANS_ITERS, rows=None,
                        n_vec: int | None = None):
    """k-means-REFINED PQ codebooks — distributed per-subspace Lloyd
    over the WHOLE corpus (the PQ twin of kmeans_centroids, same
    discipline): assignment is the shared _pq_argmin_codes Arrow
    kernel, with the encode projection carrying ``v`` alongside the
    code so the update step needs NO join (r10 review: the first cut
    joined pq_encode's (vec_id, code) back to emb — one avoidable
    full-corpus vec_id shuffle per iteration); the update slices each
    vector into its m subvectors JVM-side (posexplode of the code
    column + F.slice of the vector) and averages per
    (subspace, codeword) group; only the m×k×sub codebook tensor ever
    reaches the driver. Fixed-shape training like kmeans_centroids:
    init = _pq_codebooks' first-K sample, fixed iteration count, empty
    codewords keep their previous value (standard Lloyd's); the
    codewords themselves are distributed float AVERAGES, so — exactly
    like kmeans_centroids, and unlike the first-K sample — they are
    NOT bit-reproducible across partition layouts (do not key a
    persisted artifact on them without pinning the layout; everything
    built on them here is gate-protected independently of codebook
    values). The refinement adapts codewords to the actual subvector
    distribution — the standard recall lift over the first-K sample at
    identical query cost (codes stay m bytes; the LUT stays m×k)."""
    books = _pq_codebooks(emb, m, k, rows=rows)
    # SIZE-GATED strategy choice (r13, guide §1.2/§2: derive the plan
    # from the MEASURED input): a measured-small training slice runs
    # the whole loop driver-side — one collect instead of ``iters``
    # sequential assignment+update jobs whose cost was scheduling
    # latency, not data (the kmeans lifecycle trains on a 400-vector
    # history slice; each distributed round cost ~2 s of overhead for
    # microseconds of arithmetic). ``n_vec`` lets callers that know
    # the slice size driver-side (footer count / fold boundary) skip
    # the count() job too.
    import numpy as np

    n = n_vec if n_vec is not None else emb.count()
    if n < _KMEANS_DRIVER_VECS:
        X = np.array(
            [r["v"] for r in
             emb.select("vec_id", "v").orderBy("vec_id").collect()],
            dtype="float64")
        return _pq_kmeans_driver(X, books, iters)
    sub = books.shape[2]
    for _ in range(iters):
        enc, bc = _pq_code_udf(books)
        subv = (
            emb.select("v", enc(F.col("v")).alias("code"))  # no join
            .select(F.posexplode("code").alias("j", "c"), "v")
            .select("j", "c",
                    F.slice("v", F.col("j") * sub + 1, sub).alias("sv")))
        rows = (
            subv.groupBy("j", "c")
            .agg(*[F.avg(F.col("sv")[i]).alias(f"d{i}") for i in range(sub)])
            .collect()  # bounded: ≤ m×k rows of sub doubles
        )
        new = books.copy()
        for r in rows:
            new[r["j"], r["c"]] = [r[f"d{i}"] for i in range(sub)]
        books = new
        # the collect() above is the ONLY action that reads this
        # iteration's broadcast — release its executor blocks now
        # (ADVICE r10: gates + bench + tests share one long-lived JVM;
        # un-released per-iteration broadcasts accumulate). unpersist
        # (not destroy) keeps the handle rebroadcastable if a retry
        # ever re-reads it.
        bc.unpersist()
    return books


def sim_ann_pq_kmeans(spark, sf_dir, k: int = TOP_K,
                      rerank: int | None = None,
                      iters: int = PQ_KMEANS_ITERS):
    """sim_ann_pq with k-means-refined codebooks (pq_codebooks_kmeans)
    — identical scan/LUT/re-rank machinery and identical query cost;
    only the codebook training differs. Approximate like the parent:
    rerank ≥ corpus degenerates to brute force regardless of codebook
    quality (the gate row in plans/checks.py — candidate ORDER is all
    the books decide). The lift is pinned in pytest two ways: (a)
    quantization MSE strictly improves (Lloyd's monotone-distortion
    guarantee, deterministic), and (b) candidate-stage recall at equal
    m/rerank improves under a 100-query harness (+7-10 pts at sf0.01,
    +1-3 on the structureless-Gaussian replica) — the engine's own
    N_QUERIES=10 surface is too small to pin recall (50 truth pairs;
    ±1 pair flips the comparison, and it DOES flip at sf0.001)."""
    emb = _emb(spark, sf_dir)
    return sim_ann_pq(spark, sf_dir, k=k, rerank=rerank,
                      books=pq_codebooks_kmeans(
                          emb, iters=iters, n_vec=_n_emb(spark, sf_dir)))


def sim_ann_pq(spark, sf_dir, k: int = TOP_K, rerank: int | None = None,
               books=None):
    """PQ-compressed top-k: every vector is an m-byte code; per query a
    (m × PQ_K) lookup table of subspace dot products scores the whole
    corpus via table-lookup sums (JVM-side: the LUT rides a per-query
    broadcast-joined literal-free array, the score is one
    zip_with/aggregate over the code — no vectors read), the top
    ``rerank`` PQ scores become candidates, and candidates are
    re-ranked by EXACT cosine against the raw vectors (only the
    candidate vectors are fetched). Output schema == sim_topk_*.

    Scale shape: the scan reads (vec_id, code) — m bytes a row instead
    of 8·dim — so the scoring pass touches 64× less data than brute
    force; exact re-rank touches rerank×|queries| vectors. Recall is
    approximate (pinned in pytest ≥ 60% on the structureless Gaussian
    worst case + exact-precision by construction); with rerank ≥
    corpus the op IS brute force (equivalence gate row). The default
    re-rank pool scales with the corpus (1%, floor PQ_RERANK) so the
    operating point survives growth — re-ranking is cheap relative to
    the scan, so a bigger pool costs ~nothing (PERF.md r6)."""
    import numpy as np

    emb = _emb(spark, sf_dir)
    rows = _prefix_rows(emb, max(PQ_K, N_QUERIES))  # one collect for both
    if books is None:  # default deterministic first-K sample; callers
        books = _pq_codebooks(emb, rows=rows)  # may get kmeans books
    codes = pq_encode(emb, books)
    if rerank is None:
        rerank = max(PQ_RERANK, _n_emb(spark, sf_dir) // 100)

    q_rows = [(i, v) for i, v in rows if i < N_QUERIES]
    m, kw, sub = books.shape
    # per-query LUT: lut[q][j][c] = q_sub_j · codeword_c / |q| (cosine
    # numerator contribution; |x| is handled in the re-rank — PQ scores
    # only RANK candidates, so the un-normalized dot suffices and skew
    # from |x| is what the exact re-rank corrects)
    lut_rows = []
    for qid, v in q_rows:
        qv = np.asarray(v, dtype="float64")
        lut = np.einsum("js,jks->jk", qv.reshape(m, sub), books)
        lut_rows.append((qid, [[float(x) for x in row] for row in lut]))
    lut_df = one_slice_df(
        spark, lut_rows, "query_id long, lut array<array<double>>")

    scored = (
        codes.crossJoin(F.broadcast(lut_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("code", "lut", lambda c, row: row[c]),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("pq_s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_s"), F.asc("neighbor_id"))
    cands = scored.withColumn("crn", F.row_number().over(w)).filter(
        F.col("crn") <= rerank).select("query_id", "neighbor_id")

    # query vectors are already on the driver — broadcast side built
    # from them instead of a second emb scan (r12, guide §1.2)
    qv_df = one_slice_df(
        spark, [(qid, list(v)) for qid, v in q_rows],
        "query_id long, qv array<double>")
    nv_df = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    exact = (
        cands.join(F.broadcast(qv_df), "query_id").join(nv_df, "neighbor_id")
        .select("query_id", "neighbor_id",
                _cosine(F.col("qv"), F.col("nv")).alias("s"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# -- scalar quantization (SQ8) -----------------------------------------


def _sq8_bounds(emb: DataFrame):
    """Per-dimension (min, max) over the corpus — SQ8's entire
    training pass. Unlike the PQ trainers (float-average Lloyd
    sweeps, documented non-bit-reproducible across partition
    layouts), min/max are ORDER-INDEPENDENT aggregates: SQ8 codes are
    bit-identical however the data is partitioned. One corpus
    aggregate; 2×dim doubles of driver state."""
    dim = len(emb.select("v").first()["v"])
    row = emb.agg(
        *[F.min(F.col("v")[j]).alias(f"mn{j}") for j in range(dim)],
        *[F.max(F.col("v")[j]).alias(f"mx{j}") for j in range(dim)],
    ).first()
    mins = [float(row[f"mn{j}"]) for j in range(dim)]
    maxs = [float(row[f"mx{j}"]) for j in range(dim)]
    return mins, maxs


def sq8_encode(emb: DataFrame, mins, maxs) -> DataFrame:
    """(vec_id, code) with code[j] = clamp(floor((v_j − mn_j) ·
    255/(mx_j − mn_j)), 0, 255) — one codegen'd zip_with pass against
    two literal dim-arrays, no Python anywhere. Zero-span dimensions
    (constant across the corpus) encode 0 — the decode reproduces the
    constant from mn_j alone."""
    mn = F.array(*[F.lit(float(m)) for m in mins])
    scale = F.array(*[
        F.lit(255.0 / (maxs[j] - mins[j]) if maxs[j] > mins[j] else 0.0)
        for j in range(len(mins))])
    code = F.zip_with(
        F.zip_with("v", mn, lambda x, m: x - m), scale,
        lambda d, s: F.least(F.lit(255.0),
                             F.greatest(F.lit(0.0), F.floor(d * s))))
    return emb.select("vec_id", code.cast("array<int>").alias("code"))


def sim_ann_sq8(spark, sf_dir, k: int = TOP_K, rerank: int | None = None):
    """Scalar-quantized (SQ8) top-k — the FAISS IndexScalarQuantizer
    QT_8bit shape, the third compression family beside PQ and IVF+PQ:
    every dimension is affinely mapped to 8 bits using the per-dim
    corpus (min, max), dim bytes per vector, NO trained floats
    (bounds are exact order-independent aggregates — reproducible
    where Lloyd codebooks are not). Candidate ranking uses the affine
    identity q·v̂ = Σ_j w_j·c_j + const(q) with w_j = q_j·span_j/255
    — the per-query constant Σ_j q_j·(mn_j + span_j/510) is identical
    across candidates and cancels in ranking, so the score is ONE
    zip_with fold of the code against a broadcast per-query weight
    array (no decode materialized); exact cosine re-ranks the top
    ``rerank``. rerank ≥ corpus ⇒ brute force — the 20th equivalence
    gate; born pruned like the PQ family (approximate top-k at the
    default operating point), its standing evidence is the gate, the
    recall pytest, and its bench key.

    Scale shape: the scoring scan reads dim bytes a row (8× less than
    the double pipeline's vectors; PQ's m-byte codes are smaller
    still — SQ8 trades compression for zero training and higher
    fidelity per byte); re-rank fetches rerank×|queries| vectors."""
    emb = _emb(spark, sf_dir)
    mins, maxs = _sq8_bounds(emb)
    codes = sq8_encode(emb, mins, maxs)
    if rerank is None:
        rerank = max(PQ_RERANK, _n_emb(spark, sf_dir) // 100)

    spans = [(maxs[j] - mins[j]) / 255.0 for j in range(len(mins))]
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    w_rows = [
        (r["vec_id"],
         [float(r["v"][j]) * spans[j] for j in range(len(spans))])
        for r in q_rows]
    w_df = one_slice_df(spark, w_rows, "query_id long, w array<double>")

    scored = (
        codes.crossJoin(F.broadcast(w_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("code", "w", lambda c, wj: c * wj),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("sq_s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sq_s"),
                                               F.asc("neighbor_id"))
    cands = scored.withColumn("crn", F.row_number().over(w)).filter(
        F.col("crn") <= rerank).select("query_id", "neighbor_id")

    qv_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    nv_df = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("v").alias("nv"))
    exact = (
        cands.join(F.broadcast(qv_df), "query_id").join(nv_df, "neighbor_id")
        .select("query_id", "neighbor_id",
                _cosine(F.col("qv"), F.col("nv")).alias("s"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("s"),
                                                F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"))
    )


def sim_ann_ivf_pq(spark, sf_dir, k: int = TOP_K, n_probe: int = N_PROBE,
                   n_cells: int = N_CELLS, rerank: int | None = None,
                   books=None):
    """IVF + PQ composed (r9) — the FAISS-style production ANN shape
    (Jégou et al. 2011 §V, IVFADC minus the residual encoding — codes
    are over raw vectors so the SAME codebooks serve every cell, which
    keeps the codebook broadcast O(m·k·sub) instead of per-cell):
    the coarse quantizer prunes the corpus to the query's ``n_probe``
    nearest cells, PQ table-lookup scores rank ONLY those cells'
    m-byte codes, the top ``rerank`` become candidates, and candidates
    are re-ranked by exact cosine. Output schema == sim_topk_*.

    Scale shape: the scoring scan is cell-pruned AND 64×-compressed —
    at the ivf_store layout it reads n_probe/n_cells of the corpus's
    CODES (m bytes/row), the LUT rides a per-query broadcast, and the
    exact re-rank fetches rerank×|queries| raw vectors. Both
    approximation knobs degenerate independently: n_probe = n_cells ⇒
    sim_ann_pq; + rerank ≥ corpus ⇒ brute force (the equivalence gate
    in plans/checks.py runs exactly that composition). Recall floor on
    the structureless-Gaussian worst case pinned in pytest."""
    emb = _emb(spark, sf_dir)
    rows = _prefix_rows(emb, max(n_cells, PQ_K, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    if books is None:
        books = _pq_codebooks(emb, rows=rows)
    codes = pq_encode(emb, books).join(
        emb.select("vec_id",
                   _nearest_cells(F.col("v"), cents, 1)[0]["cell"]
                   .alias("cell")),
        "vec_id")
    return _ivf_pq_query(spark, emb, codes, cents, books, k, n_probe, rerank,
                         n_emb=_n_emb(spark, sf_dir),
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def _ivf_pq_query(spark, emb, codes, cents, books, k, n_probe, rerank,
                  n_emb=None,
                  residual: bool = False, q_rows=None):
    """The ONE IVF+PQ query kernel (r9 review: the in-memory and stored
    variants had diverging copies — a tie-break or LUT fix in one would
    silently invalidate the stored==in-memory gate's premise): per-query
    LUT (un-normalized subspace dots, same as sim_ann_pq), probed-cell
    explode broadcast-joined against the (vec_id, code, cell) frame,
    zip_with table-lookup scoring, top-``rerank`` candidates, exact
    cosine re-rank. Callers differ only in where ``codes`` comes from
    (computed inline vs read from the persisted inverted list).

    ``residual=True`` (r10, IVFADC proper): ``books``/``codes`` encode
    RESIDUALS v − centroid(cell(v)), so the candidate score becomes
    q·x̂ = q·c_cell + q·r̂ — the SAME raw-q LUT gives q·r̂ by linearity
    (lut[j][c] = q_subj · res_codeword_c), and q·c_cell rides the probe
    list as one extra double per (query, cell) row, computed JVM-side
    (zip_with/aggregate against a broadcast n_cells-row centroid
    frame). Identical candidate/re-rank machinery either way — the
    stored==in-memory premise extends to the residual variant free."""
    import numpy as np

    if rerank is None:
        # n_emb: the caller's driver-side footer count (exact when its
        # emb frame is the unfiltered corpus); only a filtered history
        # slice still pays the count() job
        rerank = max(PQ_RERANK,
                     (n_emb if n_emb is not None else emb.count()) // 100)

    if q_rows is None:  # callers with a _prefix_rows slice pass it in
        q_rows = _prefix_rows(emb, N_QUERIES)
    m, kw, sub = books.shape
    lut_rows = []
    for qid, v in q_rows:
        qv = np.asarray(v, dtype="float64")
        lut = np.einsum("js,jks->jk", qv.reshape(m, sub), books)
        lut_rows.append((qid, [[float(x) for x in row] for row in lut]))
    lut_df = one_slice_df(
        spark, lut_rows, "query_id long, lut array<array<double>>")
    # the query's probed cells (N_QUERIES × n_probe 2-int rows). r10
    # (ADVICE r9): broadcast this bare probe list for the cell-pruning
    # join and attach the LUT AFTERWARD with a second broadcast join on
    # query_id — the old `q.join(lut_df)` duplicated each query's full
    # m×k LUT once per probed cell inside the broadcast, inflating it
    # n_probe× (at the 10⁴-10⁵-cell / large-n_probe production point
    # that contradicted the "per-query broadcast" claim). Each LUT now
    # ships exactly once; the duplication happens only executor-side in
    # the joined stream, where it is a column reference, not bytes.
    # r12: the probe list is computed DRIVER-side from the collected
    # query rows via the SAME _nn_scores kernel the executor udf runs
    # (_probe_cells) — an N_QUERIES×n_probe list of ints does not need
    # an Arrow stage + centroid broadcast + scan subtree per query
    # invocation. The residual bias q·c_cell is a sequential left-to-
    # right fold, bit-identical to the zip_with/aggregate JVM fold it
    # replaces (float64 addition is deterministic given the order).
    probes = _probe_cells(q_rows, cents, n_probe)
    # STATIC partition pruning: the probed cells are driver-side ints
    # now, so the store scan carries a literal PartitionFilters IN-list
    # instead of the DPP subquery the old scan-derived probe side
    # induced — the planner no longer has to discover the pruning at
    # runtime, and the unprobed cell partitions are never even listed.
    # (Semantically a no-op: the cell equi-join below restricts to the
    # same set.) Plan-pinned in tests/test_pipeline_functions.py.
    probed_cells = sorted({int(c) for _, cl in probes for c in cl})
    codes = codes.filter(F.col("cell").isin(probed_cells))
    if residual:
        cent_map = {int(cid): cv for cid, cv in cents}
        q_tuples = []
        for (qid, v), (_, cell_list) in zip(q_rows, probes):
            for cell in cell_list:
                bias = 0.0
                for a, b in zip(v, cent_map[cell]):
                    bias += a * b
                q_tuples.append((qid, cell, bias))
        q = one_slice_df(
            spark, q_tuples, "query_id long, cell long, bias double")
    else:
        q = one_slice_df(
            spark,
            [(qid, cell) for qid, cell_list in probes
             for cell in cell_list],
            "query_id long, cell long")

    lut_sum = F.aggregate(
        F.zip_with("code", "lut", lambda c, row: row[c]),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (
        codes.join(F.broadcast(q), "cell")  # cell-pruned candidates
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), "query_id")  # one LUT per query
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            ((F.col("bias") + lut_sum) if residual else lut_sum)
            .alias("pq_s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_s"), F.asc("neighbor_id"))
    cands = scored.withColumn("crn", F.row_number().over(w)).filter(
        F.col("crn") <= rerank).select("query_id", "neighbor_id")

    # query vectors are already on the driver (q_rows) — build the
    # re-rank's broadcast side from them instead of a second emb scan
    qv_df = one_slice_df(
        spark, [(qid, list(v)) for qid, v in q_rows],
        "query_id long, qv array<double>")
    nv_df = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    exact = (
        cands.join(F.broadcast(qv_df), "query_id").join(nv_df, "neighbor_id")
        .select("query_id", "neighbor_id",
                _cosine(F.col("qv"), F.col("nv")).alias("s"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def _pq_res_codebooks(emb: DataFrame, cents, m: int = PQ_M, k: int = PQ_K,
                      rows=None):
    """(m, k, sub_dim) RESIDUAL codebooks — the IVFADC training set is
    v − centroid(cell(v)) instead of v (Jégou, Douze, Schmid 2011 §V:
    'the residual vector is encoded' — one codebook set shared across
    cells, which keeps the broadcast O(m·k·sub) like the raw variant).
    Deterministic training in the house style (_pq_codebooks), with one
    twist: the sample is the k vectors AFTER the centroid block
    (vec_id in [n_cells, n_cells+k)), because the first n_cells vectors
    ARE the coarse centroids — their own residuals are ≈0, which would
    train a near-zero codebook (measured at sf0.001: the degenerate
    sample LOSES to the raw variant at every rerank — 0.14 vs 0.38 at
    rerank=5 — while this sample wins at the default operating point:
    0.94 vs 0.90 at the rerank=50 floor, 0.92 vs 0.86 at sf0.01;
    pinned in tests/test_pipeline_functions.py).
    Falls back to the first-k rows if the corpus is too small to offset.
    Assignment here replicates _nearest_cells' contract driver-side
    (cosine, ties toward the HIGHER cell id) on k bounded rows."""
    import numpy as np

    n_cells = len(cents)
    # ``rows`` (a _prefix_rows result covering n_cells + k) skips the
    # collect — the slice below is exactly the filter it replaces
    prefix = rows
    if prefix is not None:
        rows = [(i, v) for i, v in prefix if n_cells <= i < n_cells + k]
    else:
        rows = [(r["vec_id"], r["v"]) for r in
                (emb.filter((F.col("vec_id") >= n_cells)
                            & (F.col("vec_id") < n_cells + k))
                 .orderBy("vec_id").collect())]
    if len(rows) < k:  # tiny corpus: reuse the raw variant's sample
        # ADVICE r10: this fallback trains on the centroid vectors
        # themselves (residuals ≈ 0 → a near-zero codebook, measured
        # LOSING to the raw variant at every rerank). Bounded store
        # slices refuse via the kind="res" floor assert; the unbounded
        # in-memory path stays runnable for tiny test frames but must
        # say so loudly — a silent degraded-recall index is the failure
        # mode (still gate-exact at widened knobs, hence a warning, not
        # an error).
        import warnings

        warnings.warn(
            f"residual-PQ training sample is degenerate: corpus has "
            f"only {len(rows)} vectors past the {n_cells} centroids "
            f"(need {k}); falling back to the first-{k} sample, which "
            "includes the centroids (residuals ~0) and measurably "
            "degrades candidate recall vs raw PQ",
            stacklevel=2)
        if prefix is not None:
            rows = [(i, v) for i, v in prefix if i < k]
        else:
            rows = [(r["vec_id"], r["v"]) for r in
                    emb.filter(F.col("vec_id") < k)
                    .orderBy("vec_id").collect()]
    X = np.stack([np.asarray(v, dtype="float64") for _, v in rows])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    cells = np.asarray([cid for cid, _ in cents], dtype="int64")
    C = np.stack([np.asarray(cv, dtype="float64") for _, cv in cents])
    order = np.argsort(cells)[::-1]  # descending id: argmax ties → higher id
    Cd = C[order]
    Cn = Cd / np.linalg.norm(Cd, axis=1, keepdims=True)
    best = np.argmax(X @ Cn.T, axis=1)  # query norm is rank-invariant
    res = X - Cd[best]
    sub = dim // m
    return res.reshape(k, m, sub).transpose(1, 0, 2).copy()  # m × k × sub


def pq_encode_res(emb: DataFrame, books, cents) -> DataFrame:
    """(vec_id, cell, code): nearest-cell assignment (the SAME JVM
    broadcast-matmul kernel every IVF path uses) + per-subspace argmin
    of the RESIDUAL v − centroid(cell) against the residual codebooks.
    One Arrow batch = one gather of centroids + m small matmuls; same
    shape/cost as pq_encode with one extra subtract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    cent_map = {int(cid): np.asarray(cv, dtype="float64")
                for cid, cv in cents}
    bc = spark.sparkContext.broadcast((books, cent_map))

    assigned = emb.select(
        "vec_id", "v",
        _nearest_cells(F.col("v"), cents, 1)[0]["cell"].alias("cell"))

    def _enc(v, cell):
        bks, cmap = bc.value
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy())
        Cm = np.stack([cmap[int(c)] for c in cell.to_numpy()])
        # residualize, then the SAME assignment kernel as pq_encode
        return pd.Series(list(_pq_argmin_codes(X - Cm, bks)))

    _enc.__annotations__ = {"v": pd.Series, "cell": pd.Series,
                            "return": pd.Series}
    enc = pandas_udf(ArrayType(IntegerType()))(_enc)
    return assigned.select(
        "vec_id", "cell", enc(F.col("v"), F.col("cell")).alias("code"))


def sim_ann_ivf_pq_res(spark, sf_dir, k: int = TOP_K,
                       n_probe: int = N_PROBE, n_cells: int = N_CELLS,
                       rerank: int | None = None):
    """The FULL IVFADC (r10 — VERDICT r9 item 6): sim_ann_ivf_pq with
    per-cell RESIDUAL encoding, the standard recall-per-byte win at
    fixed m (Jégou et al. 2011 §V — quantizing v − centroid removes
    the coarse component, so the same m·log2(k) bits describe a
    smaller-variance signal). Candidate score q·x̂ = q·c_cell + q·r̂:
    the bias is one broadcast-joined double per probe row, the LUT is
    the same one-per-query raw-q table (by linearity it yields q·r̂
    over residual codebooks), and cells/codes/re-rank are shared with
    the raw variant through the ONE _ivf_pq_query kernel. Output
    schema == sim_topk_*; both knobs degenerate to brute force exactly
    like the parents (gate row in plans/checks.py); recall ≥ the raw
    variant at equal m pinned in pytest."""
    emb = _emb(spark, sf_dir)
    rows = _prefix_rows(emb, max(n_cells + PQ_K, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = _pq_res_codebooks(emb, cents, rows=rows)
    codes = pq_encode_res(emb, books, cents)
    return _ivf_pq_query(spark, emb, codes, cents, books, k, n_probe,
                         rerank, n_emb=_n_emb(spark, sf_dir), residual=True,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def ivf_pq_store_dir(spark, sf_dir, n_cells: int = N_CELLS,
                     max_vec: int | None = None,
                     kind: str = "raw") -> str:
    """Materialize the FAISS inverted list exactly: (vec_id, code)
    written ``partitionBy("cell")`` — nearest-centroid cell + the
    PQ_M-byte code per vector, both computed ONCE at ingest. This is
    what moves sim_ann_ivf_pq's two query-time prep passes (full-corpus
    assignment + full-corpus Arrow encoding — 8.9 s of its 200k-vector
    cost, PERF.md r9) off the query path: a probe lists n_probe/n_cells
    of the partitions and reads m bytes a row. Standard ArtifactStore
    contract (content-derived version, crash-safe register-after-build,
    cross-session reuse) keyed by n_cells+PQ geometry. With ``max_vec``
    the store covers only vec_id < max_vec — the HISTORY slice the
    compaction fold advances (centroids AND codebooks are the first
    n_cells / PQ_K ids, so both are inside any history with
    max_vec ≥ max(n_cells, PQ_K) and the slice is history-
    deterministic, same argument as ivf_store_dir's).

    ``kind="res"`` (r10) stores RESIDUAL codes (pq_encode_res over
    _pq_res_codebooks) under a distinct params suffix — the IVFADC
    inverted list proper. Its determinism bound is stricter: the
    residual training sample is vec_id ∈ [n_cells, n_cells+PQ_K), so a
    bounded slice must satisfy max_vec ≥ n_cells + PQ_K — the guard
    below refuses a res-kind slice the sample doesn't fit in rather
    than silently falling back. compact_ivf_pq_store folds BOTH kinds
    (its kind="res" leg shares this floor; fold == from-scratch pinned
    in tests for each).

    ``kind="kmeans"`` (r11) runs the distributed Lloyd trainer
    (pq_codebooks_kmeans) at build time and persists the trained
    tensor as a ``_books`` sidecar next to the codes — see
    sim_ann_ivf_pq_kmeans_stored for why serving loads rather than
    retrains. Folding a kmeans store is NOT offered by
    compact_ivf_pq_store yet: it would be sound (encode the increment
    with the HISTORY's persisted books — no retraining), but fold ==
    from-scratch can't hold for it (a from-scratch build retrains on
    the widened slice), so it needs its own fold-vs-history-books
    equality pin first."""
    import os

    from kstore_spark.catalog import ArtifactStore

    assert kind in ("raw", "res", "kmeans"), kind
    # same precondition compact_ivf_pq_store asserts (r9 review: an
    # unguarded small slice died deep in _pq_codebooks with an opaque
    # reshape error — or worse, silently built a truncated-centroid
    # store under a full-geometry params string)
    floor = (n_cells + PQ_K) if kind == "res" else max(n_cells, PQ_K)
    assert max_vec is None or max_vec >= floor, (
        f"max_vec={max_vec} predates a full centroid/codebook set "
        f"(need >= {floor} for kind={kind})")
    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    suffix = {"raw": "", "res": ":res", "kmeans": ":km"}[kind]
    params = (f"c{n_cells}m{PQ_M}k{PQ_K}" + suffix
              + (f":d{max_vec}" if max_vec is not None else ""))
    if max_vec is not None:  # history slice: appends must not invalidate
        version = ArtifactStore.source_version_bounded(
            src, params, "vec_id", max_vec)
    else:
        version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        emb = _emb(spark, sf_dir)
        if max_vec is not None:
            emb = emb.filter(F.col("vec_id") < max_vec)
        rows = _prefix_rows(emb, n_cells + PQ_K)  # one collect for both
        cents = _centroids(emb, n_cells, rows=rows)
        if kind == "res":
            # ADVICE r10: the bounded slice refuses a degenerate
            # residual sample via the max_vec floor assert above, but
            # an UNBOUNDED tiny corpus slipped through to
            # _pq_res_codebooks' silent first-k fallback — a persisted
            # store must never be degraded silently, so apply the same
            # floor here (one count(), first build only; cache hits
            # skip build entirely).
            n = emb.count()
            if n < n_cells + PQ_K:
                raise ValueError(
                    f"corpus has {n} vectors; a kind='res' store needs "
                    f">= {n_cells + PQ_K} (centroids + a non-degenerate "
                    "residual training sample) — refusing to persist a "
                    "degraded-recall index")
            # pq_encode_res assigns cells itself (the residual depends
            # on the assignment) and returns (vec_id, cell, code)
            books = _pq_res_codebooks(emb, cents, rows=rows)
            frame = pq_encode_res(emb, books, cents)
        else:
            # ADVICE r11: kind="kmeans" inherited the unguarded
            # unbounded-tiny-corpus path the res kind was fixed for in
            # r10 — _pq_codebooks' first-K init reshape dies opaquely
            # (or under-fills) below PQ_K vectors, and kmeans refines
            # FROM that init. Same explicit refusal, same posture:
            # a persisted store must never degrade silently. Applies
            # to kind="raw" too (its sample is the same first-K).
            n = emb.count()
            if n < floor:
                raise ValueError(
                    f"corpus has {n} vectors; a kind='{kind}' store "
                    f"needs >= {floor} (full centroid set + the "
                    "first-K codebook init sample) — refusing to "
                    "persist a degraded-recall index")
            # kind="kmeans" (r11, VERDICT r10 item 4): TRAIN the
            # codebooks here — training is an ingest-time cost, like
            # centroid choice — and PERSIST the trained tensor as a
            # sidecar, because Lloyd's distributed float averages are
            # NOT bit-reproducible across partition layouts (the
            # pq_codebooks_kmeans docstring's standing caveat): serving
            # must READ the books, never re-derive them, or the codes
            # in this store and the query LUT silently disagree.
            books = (pq_codebooks_kmeans(emb, n_vec=n)
                     if kind == "kmeans"
                     else _pq_codebooks(emb, rows=rows))
            assigned = emb.select(
                "vec_id",
                _nearest_cells(F.col("v"), cents, 1)[0]["cell"].alias("cell"))
            frame = pq_encode(emb, books).join(assigned, "vec_id")
        frame.write.mode("overwrite").partitionBy("cell").parquet(out_dir)
        if kind == "kmeans":
            _write_pq_books(spark, out_dir, books)

    return store.get_or_build(f"ivfpq:{src}:{params}", version, build, src=src)


def _write_pq_books(spark, store_dir: str, books) -> None:
    """Persist the trained m×k×sub codebook tensor INSIDE the store
    artifact as a ``_books`` parquet sidecar — underscore-prefixed, so
    Spark's file index hides it from `spark.read.parquet(store_dir)`
    (the same convention that keeps _SUCCESS markers out of data;
    pinned in pytest). One row per (subspace, codeword); doubles
    round-trip bit-exactly through parquet, which is the whole point:
    the artifact, not retraining, is the source of truth."""
    import os

    rows = [(int(j), int(c), [float(x) for x in books[j, c]])
            for j in range(books.shape[0]) for c in range(books.shape[1])]
    # ONE-slice parallelize, not createDataFrame(...).coalesce(1): the
    # plain form parallelizes the rows into defaultParallelism Python
    # slices, and coalesce(1) then chains all of them into a single
    # task that round-trips the Python worker once PER SLICE — measured
    # 5-7 s of pure boundary latency for 128 rows at local[32] (r13,
    # guide §4: control how often the JVM↔Python boundary is paid).
    # One slice = one worker round trip = one tiny file, same bytes.
    (spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "j int, c int, w array<double>")
     .write.mode("overwrite").parquet(os.path.join(store_dir, "_books")))


def load_pq_books(spark, store_dir: str):
    """Read a ``_books`` sidecar back into the m×k×sub ndarray shape
    every PQ kernel consumes. Bounded driver state (m×k rows of sub
    doubles — the same tensor the trainer collects)."""
    import os

    import numpy as np

    rows = spark.read.parquet(os.path.join(store_dir, "_books")).collect()
    if not rows:
        raise ValueError(f"empty _books sidecar under {store_dir}")
    m = 1 + max(r["j"] for r in rows)
    k = 1 + max(r["c"] for r in rows)
    books = np.empty((m, k, len(rows[0]["w"])), dtype="float64")
    for r in rows:
        books[r["j"], r["c"]] = r["w"]
    return books


def compact_ivf_pq_store(spark, sf_dir, old_min: int, new_min: int,
                         n_cells: int = N_CELLS,
                         kind: str = "raw") -> str:
    """Fold the embeddings increment into the IVF+PQ inverted list —
    the incremental-family treatment (compact_token_index /
    compact_lsh_index / compact_ivf_store) extended to the r9 store:
    advance the boundary from ``old_min`` to ``new_min`` by MERGING the
    history's (vec_id, code, cell) rows with the increment's — only
    old_min ≤ vec_id < new_min is read, encoded, and assigned; history
    vectors are never re-read — registered under the SAME
    content-derived bounded version a from-scratch d{new_min} build
    gets (centroids = first n_cells ids, codebooks = first PQ_K ids,
    both inside any history with the guards below, so the merge is
    bit-identical to from-scratch — pinned in tests). The superseded
    d{old_min} store is retired (tombstone + session-epoch GC).

    ``kind="res"`` (r10) folds the RESIDUAL inverted list: the
    increment is residual-encoded with the history's codebooks
    (training sample vec_id ∈ [n_cells, n_cells+PQ_K) — inside any
    history satisfying the stricter res floor below, so fold ==
    from-scratch holds by the same argument; pinned in tests)."""
    import os

    from kstore_spark.catalog import ArtifactStore

    assert kind in ("raw", "res"), kind
    floor = (n_cells + PQ_K) if kind == "res" else max(n_cells, PQ_K)
    assert new_min >= floor, "centroid/codebook ids must lie inside history"
    assert old_min >= floor, (
        "history store predates a full centroid/codebook set — rebuild "
        "from scratch at new_min instead of folding")
    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    old_store = ivf_pq_store_dir(spark, sf_dir, n_cells, max_vec=old_min,
                                 kind=kind)

    suffix = ":res" if kind == "res" else ""
    params = f"c{n_cells}m{PQ_M}k{PQ_K}{suffix}:d{new_min}"
    version = ArtifactStore.source_version_bounded(
        src, params, "vec_id", new_min)

    def build(out_dir: str) -> None:
        emb = _emb(spark, sf_dir).filter(F.col("vec_id") < new_min)
        rows = _prefix_rows(emb, n_cells + PQ_K)  # one collect for both
        cents = _centroids(emb, n_cells, rows=rows)
        inc_emb = emb.filter(F.col("vec_id") >= old_min)
        if kind == "res":
            books = _pq_res_codebooks(emb, cents, rows=rows)
            inc = pq_encode_res(inc_emb, books, cents)
        else:
            books = _pq_codebooks(emb, rows=rows)
            inc = pq_encode(inc_emb, books).join(
                inc_emb.select(
                    "vec_id",
                    _nearest_cells(F.col("v"), cents, 1)[0]["cell"]
                    .alias("cell")),
                "vec_id")
        hist = spark.read.parquet(old_store)
        hist = hist.select(
            "vec_id", "code",
            F.col("cell").cast(dict(inc.dtypes)["cell"]).alias("cell"))
        (hist.unionByName(inc.select("vec_id", "code", "cell"))
         .write.mode("overwrite").partitionBy("cell").parquet(out_dir))

    new_store = store.get_or_build(
        f"ivfpq:{src}:{params}", version, build, src=src)
    store.retire(f"ivfpq:{src}:c{n_cells}m{PQ_M}k{PQ_K}{suffix}:d{old_min}")
    return new_store


def sim_ann_ivf_pq_stored(spark, sf_dir, k: int = TOP_K,
                          n_probe: int = N_PROBE, n_cells: int = N_CELLS,
                          rerank: int | None = None,
                          max_vec: int | None = None):
    """sim_ann_ivf_pq against the persisted inverted list
    (ivf_pq_store_dir): the probe join keys on the cell partition
    column with a broadcast probe side, so the store scan is
    dynamically partition-pruned to the probed cells' files, and those
    files carry m-byte codes instead of 8·dim-byte vectors — the
    query-time cost is n_probe/n_cells of a 64×-compressed column plus
    rerank×|queries| exact-re-rank vector fetches; assignment and
    encoding happened at ingest. Output identical to sim_ann_ivf_pq at
    equal knobs (same first-K centroids/codebooks — pinned), and with
    both knobs widened it degenerates to brute force (the stored gate
    in plans/checks.py). Same _ivf_pq_query kernel as the in-memory
    composition — only the (vec_id, code, cell) source differs, which
    is what makes the stored==in-memory gate meaningful."""
    emb = _emb(spark, sf_dir)
    if max_vec is not None:  # serve from a (possibly folded) history slice
        emb = emb.filter(F.col("vec_id") < max_vec)
    store = ivf_pq_store_dir(spark, sf_dir, n_cells, max_vec=max_vec)
    data = spark.read.parquet(store)  # (vec_id, code, cell=partition col)
    rows = _prefix_rows(emb, max(n_cells, PQ_K, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = _pq_codebooks(emb, rows=rows)
    return _ivf_pq_query(spark, emb, data, cents, books, k, n_probe, rerank,
                         n_emb=_n_emb(spark, sf_dir) if max_vec is None
                         else None,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def sim_ann_ivf_pq_res_stored(spark, sf_dir, k: int = TOP_K,
                              n_probe: int = N_PROBE,
                              n_cells: int = N_CELLS,
                              rerank: int | None = None,
                              max_vec: int | None = None):
    """sim_ann_ivf_pq_res against the persisted RESIDUAL inverted list
    (ivf_pq_store_dir kind="res") — the IVFADC serving shape proper:
    residual assignment+encoding at ingest, query-time cost =
    DPP-pruned m-byte-code partitions + the per-probe q·c_cell bias +
    rerank×|queries| exact fetches. Same ONE _ivf_pq_query kernel with
    residual=True — the stored==in-memory premise extends to the
    residual pair exactly as it did for the raw pair (pinned in
    pytest; both knobs widened degenerates to brute force through the
    STORED path — the 18th equivalence gate)."""
    emb = _emb(spark, sf_dir)
    if max_vec is not None:  # serve from a (possibly folded) history slice
        emb = emb.filter(F.col("vec_id") < max_vec)
    store = ivf_pq_store_dir(spark, sf_dir, n_cells, max_vec=max_vec,
                             kind="res")
    data = spark.read.parquet(store)  # (vec_id, code, cell=partition col)
    rows = _prefix_rows(emb, max(n_cells + PQ_K, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = _pq_res_codebooks(emb, cents, rows=rows)
    return _ivf_pq_query(spark, emb, data, cents, books, k, n_probe,
                         rerank,
                         n_emb=_n_emb(spark, sf_dir) if max_vec is None
                         else None,
                         residual=True,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def compact_ivf_pq_store_kmeans(spark, sf_dir, old_min: int, new_min: int,
                                n_cells: int = N_CELLS) -> str:
    """Fold the embeddings increment into the KMEANS inverted list —
    WITHOUT retraining: the history artifact's persisted ``_books``
    tensor encodes the increment (this is exactly what persisting
    bought — history codes and increment codes come from the SAME
    tensor, so the folded list is self-consistent), and the sidecar is
    carried verbatim into the folded artifact. Only old_min ≤ vec_id <
    new_min is read, encoded, and assigned; history vectors are never
    re-read. Centroids are the first n_cells ids — inside any history
    with old_min ≥ the floor — so the increment's assignments use the
    history store's exact quantizer.

    Unlike compact_ivf_pq_store (raw/res), this fold CANNOT register
    under the canonical d{new_min} content version: a from-scratch
    kind="kmeans" build at new_min would RETRAIN on the widened slice
    and produce legitimately different codes — two different artifacts
    under one content key would violate the store's version contract.
    The fold registers under LINEAGE-keyed params
    (``:km:d{new}<-d{old}``) instead, and its correctness pins are
    (a) folded rows == history rows ∪ increment-encoded-with-the-
    history-tensor (construction equality + books-carried-verbatim,
    pytest) and (b) a widened-knobs query off the folded store ==
    exact brute force (lifecycle_fold_ann_kmeans's SIM_TOPK oracle —
    true regardless of codebook values). The superseded d{old_min}
    store is retired like every fold's."""
    import os

    from kstore_spark.catalog import ArtifactStore

    floor = max(n_cells, PQ_K)
    assert old_min >= floor, "history must contain centroids + init sample"
    assert new_min >= old_min
    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    old_store = ivf_pq_store_dir(spark, sf_dir, n_cells, max_vec=old_min,
                                 kind="kmeans")
    params = f"c{n_cells}m{PQ_M}k{PQ_K}:km:d{new_min}<-d{old_min}"
    version = ArtifactStore.source_version_bounded(
        src, params, "vec_id", new_min)

    def build(out_dir: str) -> None:
        books = load_pq_books(spark, old_store)
        emb = _emb(spark, sf_dir).filter(F.col("vec_id") < new_min)
        cents = _centroids(emb, n_cells)  # first n_cells ids == history's
        inc_emb = emb.filter(F.col("vec_id") >= old_min)
        inc = pq_encode(inc_emb, books).join(
            inc_emb.select(
                "vec_id",
                _nearest_cells(F.col("v"), cents, 1)[0]["cell"]
                .alias("cell")),
            "vec_id")
        hist = spark.read.parquet(old_store)
        hist = hist.select(
            "vec_id", "code",
            F.col("cell").cast(dict(inc.dtypes)["cell"]).alias("cell"))
        (hist.unionByName(inc.select("vec_id", "code", "cell"))
         .write.mode("overwrite").partitionBy("cell").parquet(out_dir))
        _write_pq_books(spark, out_dir, books)

    new_store = store.get_or_build(
        f"ivfpq:{src}:{params}", version, build, src=src)
    store.retire(f"ivfpq:{src}:c{n_cells}m{PQ_M}k{PQ_K}:km:d{old_min}")
    return new_store


def sim_ann_ivf_pq_kmeans_stored(spark, sf_dir, k: int = TOP_K,
                                 n_probe: int = N_PROBE,
                                 n_cells: int = N_CELLS,
                                 rerank: int | None = None,
                                 max_vec: int | None = None):
    """IVF+PQ serving off the persisted KMEANS-trained inverted list
    (r11 — VERDICT r10 item 4, the production shape sim_ann_pq_kmeans's
    bench key was missing): ivf_pq_store_dir(kind="kmeans") trains the
    k-means codebooks ONCE at ingest (4 Lloyd corpus sweeps — +5.5 s of
    sim_ann_pq_kmeans's 8.25 s at 200k vectors, PERF.md r10, now off
    the query path like centroid choice) and persists both the
    cell-partitioned codes AND the trained codebook tensor (``_books``
    sidecar); the query loads the tensor (m×k bounded driver state),
    builds the per-query LUT from it, and runs the ONE _ivf_pq_query
    kernel over the DPP-pruned code partitions. Loading — never
    retraining — is what sidesteps the documented
    non-bit-reproducibility of distributed Lloyd averages: the codes in
    the store and the LUT at query time come from the SAME tensor by
    construction. stored == inline-at-the-same-books pinned in pytest;
    widened knobs degenerate to brute force AND equal-knobs output ==
    sim_ann_ivf_pq(books=<loaded>) — both halves of the 19th gate in
    plans/checks.py. Completes the training × residual × stored
    matrix: raw/res/kmeans each now have an ingest-time store and a
    gate-protected serving path."""
    emb = _emb(spark, sf_dir)
    if max_vec is not None:  # serve from a bounded history slice
        emb = emb.filter(F.col("vec_id") < max_vec)
    store = ivf_pq_store_dir(spark, sf_dir, n_cells, max_vec=max_vec,
                             kind="kmeans")
    data = spark.read.parquet(store)  # (vec_id, code, cell=partition col)
    rows = _prefix_rows(emb, max(n_cells, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = load_pq_books(spark, store)
    return _ivf_pq_query(spark, emb, data, cents, books, k, n_probe, rerank,
                         n_emb=_n_emb(spark, sf_dir) if max_vec is None
                         else None,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


ANN_FOLD_OLD_MIN = 400  # the ANN lifecycle entry's pre-fold boundary
                        # (the family's IVF_INCR_MIN operating point)


def lifecycle_fold_ann(spark, sf_dir, k: int = TOP_K):
    """The ANN store LIFECYCLE as one driver-visible, ORACLED op — the
    vector twin of text.lifecycle_fold_search: build the IVF+PQ
    inverted list at the vec_id < ANN_FOLD_OLD_MIN history boundary,
    FOLD the increment into it (compact_ivf_pq_store — only increment
    vectors are read/encoded/assigned), and answer a top-k query off
    the FOLDED store. The query runs with both approximation knobs
    widened (all cells probed, corpus-wide re-rank pool), which makes
    the answer EXACT brute-force top-k — so this lifecycle entry
    carries the plain SIM_TOPK SQL oracle while still exercising the
    real store artifacts end to end (a folded store with a wrong code,
    cell, or dropped/duplicated row CANNOT hash-match brute force).
    From-scratch-equality of the folded store itself is pinned in
    pytest; runs inside a session-scoped artifact base for the same
    retirement-hygiene reason as the text twin."""
    import os
    import tempfile

    from kstore_spark.catalog import artifact_base

    n_total = _n_emb(spark, sf_dir)  # footer count — no job
    base = os.path.join(
        tempfile.gettempdir(),
        f"kstore_fold_{spark.sparkContext.applicationId}")
    with artifact_base(base):
        # 1. the history boundary's inverted list
        ivf_pq_store_dir(spark, sf_dir, max_vec=ANN_FOLD_OLD_MIN)
        # 2. the fold advances the boundary to the full table: history
        #    contributes its built (vec_id, code, cell) rows verbatim
        compact_ivf_pq_store(spark, sf_dir, ANN_FOLD_OLD_MIN, n_total)
        # 3. the query reads the folded store; widened knobs ⇒ exact
        return sim_ann_ivf_pq_stored(
            spark, sf_dir, k=k, n_probe=N_CELLS, rerank=10**9,
            max_vec=n_total)


def lifecycle_fold_ann_res(spark, sf_dir, k: int = TOP_K):
    """lifecycle_fold_ann through the RESIDUAL store (r10 — completes
    the raw/residual lifecycle matrix): build the kind="res" inverted
    list at the history boundary, fold the increment
    (compact_ivf_pq_store kind="res" — only increment vectors are
    read, residual-encoded, and assigned), and answer a top-k query
    off the FOLDED residual store with both knobs widened ⇒ EXACT
    brute-force top-k, so the entry carries the plain SIM_TOPK oracle
    while exercising the residual store artifacts end to end (a folded
    store with a wrong residual code, bias, cell, or dropped row
    cannot hash-match brute force). Residual-fold determinism: the
    training sample vec_id ∈ [n_cells, n_cells+PQ_K) sits inside the
    ANN_FOLD_OLD_MIN=400 history (floor 32), same argument as the raw
    twin's; fold == from-scratch pinned in pytest."""
    import os
    import tempfile

    from kstore_spark.catalog import artifact_base

    n_total = _n_emb(spark, sf_dir)  # footer count — no job
    base = os.path.join(
        tempfile.gettempdir(),
        f"kstore_foldres_{spark.sparkContext.applicationId}")
    with artifact_base(base):
        ivf_pq_store_dir(spark, sf_dir, max_vec=ANN_FOLD_OLD_MIN,
                         kind="res")
        compact_ivf_pq_store(spark, sf_dir, ANN_FOLD_OLD_MIN, n_total,
                             kind="res")
        return sim_ann_ivf_pq_res_stored(
            spark, sf_dir, k=k, n_probe=N_CELLS, rerank=10**9,
            max_vec=n_total)


RETRACT_VEC_IDS = (107, 209, 343)  # the fixed takedown set — all three
                                   # sit in the UNRETRACTED top-k at
                                   # both driver SFs, so the takedown
                                   # visibly reshapes the ranking (ids
                                   # that never rank would make the
                                   # exclusion vacuous); kept clear of
                                   # the quantizer ids (< N_CELLS +
                                   # PQ_K) — retracting LIST rows is a
                                   # takedown, re-shaping the quantizer
                                   # is retraining (a different op)


def retract_ivf_pq_store(spark, sf_dir, deleted_ids,
                         n_cells: int = N_CELLS, kind: str = "raw") -> str:
    """Tombstone-style vector RETRACTION from the IVF+PQ inverted list
    — the ANN twin of text.retract_token_index (r11: with it, BOTH
    index families carry the DELETE leg): drop every (vec_id, code,
    cell) row of ``deleted_ids`` in one partition-parallel anti-filter
    rewrite — m-byte codes only, vectors never re-read, assignments
    never recomputed. The quantizer geometry (centroids, codebooks =
    ingest-time artifacts) deliberately survives the takedown — the
    Lucene posture: deletes drop rows, merges/retrains reshape
    structure — so the floor assert refuses a set that touches
    quantizer ids. Registered under retraction-set-keyed params; the
    parent store stays canonical (a retraction is a derived view).

    ALL THREE store kinds take the same pass (r12 — VERDICT r11 item
    3 lifted the kind="raw" assert): residual codes are still just
    m-byte rows (the residual geometry lives in the codebooks + the
    query-time q·c_cell bias, both untouched by a row drop), and the
    kmeans store's persisted ``_books`` sidecar is carried VERBATIM
    into the retracted artifact — serving loads the tensor from the
    store dir, so a takedown that dropped the sidecar would silently
    retrain at query time, the exact failure the sidecar exists to
    prevent. The anti-filter itself is text.anti_filter_ids: an isin
    literal for bounded sets, a broadcast anti-join past
    RETRACT_ISIN_MAX (GDPR-batch scale; both paths construction-equal,
    pinned in pytest)."""
    import hashlib
    import os

    from kstore_spark.catalog import ArtifactStore
    from kstore_spark.functions.text import anti_filter_ids

    assert kind in ("raw", "res", "kmeans"), kind
    ids = sorted({int(i) for i in deleted_ids})
    assert ids, "empty retraction set — nothing to do"
    # the res sample is vec_id ∈ [n_cells, n_cells+PQ_K) — same floor
    # logic as ivf_pq_store_dir's build guard (retracting a row that
    # DEFINES the persisted quantizer is retraining, not takedown)
    floor = (n_cells + PQ_K) if kind == "res" else max(n_cells, PQ_K)
    assert min(ids) >= floor, (
        f"retraction set touches quantizer ids (< {floor}) — that is "
        "retraining, not takedown")
    tag = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()[:8]
    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    parent = ivf_pq_store_dir(spark, sf_dir, n_cells, kind=kind)
    suffix = {"raw": "", "res": ":res", "kmeans": ":km"}[kind]
    params = f"c{n_cells}m{PQ_M}k{PQ_K}{suffix}:r{tag}"
    version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        data = (spark.read.option("basePath", parent).parquet(parent)
                .withColumn("cell", F.col("cell").cast("long")))
        (anti_filter_ids(data, "vec_id", ids)
         .write.mode("overwrite").partitionBy("cell").parquet(out_dir))
        if kind == "kmeans":
            _write_pq_books(spark, out_dir, load_pq_books(spark, parent))

    return store.get_or_build(f"ivfpq:{src}:{params}", version, build,
                              src=src)


def sim_ann_retracted(spark, sf_dir, k: int = TOP_K,
                      deleted_ids: tuple[int, ...] = RETRACT_VEC_IDS,
                      n_cells: int = N_CELLS):
    """Top-k off the RETRACTED inverted list — the driver-visible ANN
    DELETE lifecycle: full store build → takedown retraction
    (retract_ivf_pq_store — code bytes only) → query. Runs with both
    approximation knobs WIDENED, so the answer is EXACT brute-force
    top-k over the survivors and the entry carries a plain
    SIM_TOPK-minus-takedown SQL oracle (a retracted store that
    resurfaces a deleted vector, drops a survivor, or corrupts a code
    cannot hash-match). The re-rank still fetches raw vectors from the
    full embeddings table BY ID — candidates come from the retracted
    store, so deleted ids never enter the pool; quantizer artifacts
    are shared with the parent (takedown ≠ retrain)."""
    emb = _emb(spark, sf_dir)
    store = retract_ivf_pq_store(spark, sf_dir, deleted_ids, n_cells)
    data = spark.read.parquet(store)
    rows = _prefix_rows(emb, max(n_cells, PQ_K, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = _pq_codebooks(emb, rows=rows)
    return _ivf_pq_query(spark, emb, data, cents, books, k,
                         n_cells, 10**9,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def sim_ann_retracted_kmeans(spark, sf_dir, k: int = TOP_K,
                             deleted_ids: tuple[int, ...] = RETRACT_VEC_IDS,
                             n_cells: int = N_CELLS):
    """Top-k off the retracted KMEANS-trained inverted list (r12 —
    VERDICT r11 item 3): the takedown lifecycle against the store
    you'd actually serve from in production — kind="kmeans" build
    (tensor trained at ingest, persisted as the ``_books`` sidecar) →
    retraction (retract_ivf_pq_store, code rows anti-filtered, sidecar
    carried verbatim) → serve by LOADING the tensor from the RETRACTED
    artifact. Knobs widened ⇒ exact brute-force top-k over survivors,
    so the entry carries the same SIM_TOPK-minus-takedown SQL oracle
    as the raw twin — true regardless of codebook values, which is
    what makes a kmeans-kind entry oracle-able at all (the trained
    floats are not bit-reproducible; the EXACT answer is). A carried
    sidecar that was dropped, re-derived, or row-corrupted cannot
    hash-match: the codes in the store and the query LUT would
    disagree and the widened rerank would still save it — so the
    construction-equality pin (sidecar bytes == parent's) lives in
    pytest alongside this entry's oracle."""
    emb = _emb(spark, sf_dir)
    store = retract_ivf_pq_store(spark, sf_dir, deleted_ids, n_cells,
                                 kind="kmeans")
    data = spark.read.parquet(store)
    rows = _prefix_rows(emb, max(n_cells, N_QUERIES))
    cents = _centroids(emb, n_cells, rows=rows)
    books = load_pq_books(spark, store)
    return _ivf_pq_query(spark, emb, data, cents, books, k,
                         n_cells, 10**9,
                         q_rows=[(i, v) for i, v in rows if i < N_QUERIES])


def _sim_topk_retracted_sql(ids) -> str:
    """SIM_TOPK_SQL with the takedown set excluded from the CANDIDATE
    side only (queries keep their role — a deleted doc can still be
    someone's query upstream; it just can't be returned)."""
    not_in = ", ".join(map(str, sorted(ids)))
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, v) DESC,
                                     e.vec_id ASC) AS rank
  FROM q, e
  WHERE e.vec_id <> q.query_id AND e.vec_id NOT IN ({not_in})
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= {TOP_K}
"""


def lifecycle_fold_ann_kmeans(spark, sf_dir, k: int = TOP_K):
    """The KMEANS store LIFECYCLE as one driver-visible, ORACLED op
    (r11 — completes the raw/res/kmeans lifecycle matrix): build the
    kind="kmeans" inverted list at the history boundary (training the
    codebooks ON THE HISTORY and persisting the tensor), FOLD the
    increment into it with compact_ivf_pq_store_kmeans — the increment
    is encoded with the history's PERSISTED tensor, no retraining, the
    sidecar carried verbatim — and answer a top-k query off the FOLDED
    store with both knobs widened ⇒ EXACT brute-force top-k, so the
    entry carries the plain SIM_TOPK oracle while exercising the full
    train-at-ingest → persist → fold-without-retraining → load-and-
    serve path end to end (a folded store with a wrong code, a
    re-derived-instead-of-loaded tensor, a dropped/duplicated row, or
    a leaked sidecar row cannot hash-match brute force). Construction
    equality of the folded rows and the carried tensor are pinned in
    pytest; session-scoped artifact base like the other lifecycles."""
    import os
    import tempfile

    from kstore_spark.catalog import artifact_base

    emb = _emb(spark, sf_dir)
    n_total = _n_emb(spark, sf_dir)  # footer count — no job
    base = os.path.join(
        tempfile.gettempdir(),
        f"kstore_foldkm_{spark.sparkContext.applicationId}")
    with artifact_base(base):
        ivf_pq_store_dir(spark, sf_dir, max_vec=ANN_FOLD_OLD_MIN,
                         kind="kmeans")
        folded = compact_ivf_pq_store_kmeans(
            spark, sf_dir, ANN_FOLD_OLD_MIN, n_total)
        data = spark.read.parquet(folded)
        books = load_pq_books(spark, folded)
        rows = _prefix_rows(emb, max(N_CELLS, N_QUERIES))
        cents = _centroids(emb, rows=rows)
        return _ivf_pq_query(spark, emb, data, cents, books, k,
                             N_CELLS, 10**9,
                             q_rows=[(i, v) for i, v in rows
                                     if i < N_QUERIES])


# -- cosine range search (radius query) --------------------------------

RANGE_COS = 0.30        # sits in an empirical gap of the query-corpus
                        # cosine distribution (no (query, neighbor)
                        # cosine within 4.5e-4 of the threshold at
                        # sf0.001/sf0.01 — pinned in
                        # test_range_threshold_margins), eight orders
                        # above cross-engine summation noise
RANGE_PRUNE_EPS = 1e-6  # pruning slack ≫ double acos/cos rounding —
                        # only ever WIDENS the probe, never the result


def sim_range_search(spark, sf_dir, threshold: float = RANGE_COS):
    """Cosine RANGE search (radius query): every corpus vector with
    cos(q, x) >= threshold, per query — the query-set twin of
    embedding_neardup's all-pairs threshold scan and the third member
    of the similarity query-type matrix (top-k / MMR-diversified /
    range; the reference's SELECT_RANGE is the 1-D ancestor of this
    shape, ref src/common/include/operators.h:9-56 SELECT semantics).
    Brute baseline: broadcast the bounded query side, ONE corpus scan,
    JVM-side cosine filter — no shuffle and no window (a range query
    has no rank to compute, so it is strictly cheaper than top-k).
    Exact SQL oracle: a filter decision flips only if an exact cosine
    lands within engine summation noise (~1e-15) of the threshold; the
    data margin is pinned 11 orders above that."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(_cosine(F.col("qv"), F.col("v")) >= threshold)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


SIM_RANGE_SEARCH_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
)
SELECT query_id, e.vec_id AS neighbor_id
FROM q, e
WHERE e.vec_id <> q.query_id
  AND list_cosine_similarity(qv, v) >= {RANGE_COS}
"""


def ivf_cellstats_dir(spark, sf_dir, n_cells: int = N_CELLS) -> str:
    """Per-cell ANGULAR RADIUS sidecar of the IVF-Flat store
    (ivf_store_dir — the cell-partitioned vector layout): for each
    cell, the minimum over members of cos(angle(u, ĉ)) (u, ĉ unit
    vectors), i.e. the cosine of the cell's widest member angle,
    persisted as an n_cells-row artifact under the standard
    ArtifactStore contract. One aggregate over the already-built store
    at ingest; range search reads it to prune cells EXACTLY (see
    sim_range_search_pruned — spherical triangle inequality, not a
    probability bound). Keyed separately from the store so existing
    registered stores stay valid; content-versioned against the same
    source, so appends version both apart together."""
    import os

    from kstore_spark.catalog import ArtifactStore

    src = os.path.join(sf_dir, "embeddings.parquet")
    store = ArtifactStore()
    params = f"cs{n_cells}"
    version = ArtifactStore.source_version(src, params)

    def build(out_dir: str) -> None:
        emb = _emb(spark, sf_dir)
        cents = _centroids(emb, n_cells)
        cent_df = one_slice_df(
            spark, [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
            "cell long, cv array<double>")
        data = spark.read.parquet(ivf_store_dir(spark, sf_dir, n_cells))
        (data.withColumn("cell", F.col("cell").cast("long"))
         .join(F.broadcast(cent_df), "cell")
         .groupBy("cell")
         .agg(F.min(_cosine(F.col("v"), F.col("cv"))).alias("min_ucos"))
         .coalesce(1).write.mode("overwrite").parquet(out_dir))

    return store.get_or_build(f"ivfstats:{src}:{params}", version, build,
                              src=src)


def _range_probe_frame(spark, sf_dir, q, threshold: float,
                       n_cells: int = N_CELLS):
    """The surviving (query_id, cell) probe list of
    sim_range_search_pruned — the bound computation factored out so
    the pruning pins can count survivors on the exact frame the op
    joins (tests assert bound validity via pruned==brute AND that
    pruning bites on clustered corpora)."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(emb, n_cells)
    cent_df = one_slice_df(
        spark, [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
        "cell long, cv array<double>")
    stats = (spark.read.parquet(ivf_cellstats_dir(spark, sf_dir, n_cells))
             .join(cent_df, "cell"))

    def _clamp(x):
        return F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x))

    theta_qc = F.acos(_clamp(_cosine(F.col("qv"), F.col("cv"))))
    r_c = F.acos(_clamp(F.col("min_ucos")))
    bound = F.cos(F.greatest(F.lit(0.0), theta_qc - r_c))
    return (
        q.crossJoin(F.broadcast(stats))
        .filter(bound >= F.lit(threshold - RANGE_PRUNE_EPS))
        .select("query_id", "cell")
    )


def sim_range_search_pruned(spark, sf_dir, threshold: float = RANGE_COS,
                            n_cells: int = N_CELLS):
    """Range search off the IVF-Flat store with EXACT cell pruning —
    unlike the top-k family (where bounded probes are an approximation
    traded against recall), a range query admits a LOSSLESS index
    bound: for any member u of cell c, the spherical triangle
    inequality gives angle(q̂, u) >= angle(q̂, ĉ) − r_c (r_c = the
    cell's widest member angle, persisted at ingest by
    ivf_cellstats_dir), so cos(q, x) <= cos(max(0, θ_qc − r_c)). A
    cell whose bound falls below threshold − eps cannot contain a
    qualifying vector and its files are never read: the surviving
    (query, cell) probe list is broadcast, the store scan is
    partition-pruned to surviving cells (same DPP shape as
    sim_ann_ivf_stored), and survivors get the exact cosine filter —
    output IDENTICAL to the brute twin on every input (pinned on the
    testdata, on planted clustered corpora, and per-seed in the
    embeddings fuzzer), so it shares the exact SQL oracle.

    Scale shape: the bound grid is |queries|×n_cells rows computed
    JVM-side against two broadcast n_cells-row frames (centroids +
    radii); pruning bites when the corpus is CLUSTERED (cells tighter
    than the threshold angle) — on near-uniform random data radii
    approach 90° and the bound keeps every cell, which is honest:
    no exact method can prune uniform data, and the fallback cost is
    the brute twin's one scan. The eps slack only ever KEEPS an extra
    cell (widens reads), never drops one — correctness does not
    depend on float rounding in acos/cos."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    probe = _range_probe_frame(spark, sf_dir, q, threshold, n_cells)
    data = (spark.read.parquet(ivf_store_dir(spark, sf_dir, n_cells))
            .withColumn("cell", F.col("cell").cast("long")))
    return (
        data.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .filter(_cosine(F.col("qv"), F.col("v")) >= threshold)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


# -- cluster-balanced (diversity) sampling -----------------------------

_MIX, _MIX_MOD = 2654435761, 2**32  # Knuth multiplicative hash (2^32/φ)


def cluster_balanced_sample(spark, sf_dir):
    """Diversity sampling over embedding-space clusters (the D4-style
    curation step): assign every vector to its nearest quantizer cell,
    then keep ceil(sqrt(n)) vectors per cell — α=0.5 power sampling,
    which upweights small/rare clusters relative to proportional
    sampling (a head cluster of 10k contributes 100, a tail cluster of
    4 contributes 2). Within-cell selection ranks by a Knuth-mix of
    vec_id — deterministic, engine-agnostic, no RNG (same idiom as
    shuffle_shards).

    Scale shape: assignment is the same broadcast-matmul nearest-cell
    kernel IVF uses (centroids ride a Spark broadcast — no join, no
    shuffle of vectors); the only shuffle keys are (cell) for the
    count/rank windows. Exact oracle: assignment margins are pinned
    far above the matmul-vs-fold summation noise (top1-top2 gap >
    1e-6 vs ~1e-15 — the same rank-margin basis as sim_topk_matmul's
    oracle), the argmax tie-break (higher cell id on equal sim) is
    mirrored, and everything after assignment is integer arithmetic. ceil(sqrt(n)) is exact for
    any conceivable n (doubles are exact to 2^53; sqrt of a perfect
    square is exact under IEEE)."""
    emb = _emb(spark, sf_dir)
    cents = _centroids(emb)
    assigned = emb.select(
        "vec_id", _nearest_cells(F.col("v"), cents, 1)[0]["cell"].alias("cell"))
    mix = (F.col("vec_id") * F.lit(_MIX)) % F.lit(_MIX_MOD)
    sized = assigned.select(
        "vec_id", "cell",
        F.count(F.lit(1)).over(Window.partitionBy("cell")).alias("n"),
        F.row_number().over(
            Window.partitionBy("cell").orderBy(mix.asc(), F.col("vec_id").asc())
        ).alias("rn"),
    )
    return (
        sized.filter(F.col("rn") <= F.ceil(F.sqrt(F.col("n"))).cast("long"))
        .select("vec_id", "cell")
    )


CLUSTER_BALANCED_SAMPLE_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {N_CELLS}
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell DESC
           ) AS rnk
    FROM e CROSS JOIN c)
  WHERE rnk = 1
), sized AS (
  SELECT vec_id, cell,
         COUNT(*) OVER (PARTITION BY cell) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY cell
           ORDER BY (vec_id * {_MIX}) % {_MIX_MOD}, vec_id
         ) AS rn
  FROM assigned
)
SELECT vec_id, cell FROM sized WHERE rn <= CAST(CEIL(SQRT(n)) AS BIGINT)
"""


# -- MMR result diversification ----------------------------------------

MMR_POOL = 20            # relevance pool per query (top-pool by cosine)
MMR_LAMBDA_PPM = 700_000  # λ in ppm: 0.7·relevance − 0.3·redundancy


def sim_mmr_diversify(spark, sf_dir, k: int = TOP_K, pool: int = MMR_POOL,
                      lam_ppm: int = MMR_LAMBDA_PPM):
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998) over the top-``pool`` cosine candidates — the
    standard de-redundancy pass between retrieval and a RAG context
    window (without it, near-duplicate passages crowd out coverage):
    greedily pick k docs maximizing λ·rel(d) − (1−λ)·max_{s∈selected}
    sim(d, s), ties toward the lower doc id. All scoring is INTEGER
    ppm arithmetic (rel/sim = floor(10⁶·cosine), row-local in both
    engines; λ·rel − (1−λ)·max_sim products stay < 2⁶³), so the greedy
    path is exactly reproducible and the oracle is the same greedy
    UNROLLED into k SQL steps (_mmr_sql — house pattern: iterative-but-
    k-bounded ops get k chained CTEs, like the BPE merge table gets a
    reference loop). ppm boundary safety is pinned in pytest: no pool
    cosine lands within 10⁻⁶ of an integer ppm, eight orders above the
    engines' summation-order noise.

    Scale shape: pool selection is one brute-force top-pool pass here
    (the oracle-grade twin); at index-backed scale the pool comes from
    sim_ann_ivf_pq_stored's DPP-pruned probe — MMR only ever sees
    pool rows per query. The pairwise grid is pool²·|queries| rows
    built by one query_id-keyed self-join of the pool (vectors ride
    pool rows, never the corpus), and the greedy runs per-query in ONE
    applyInPandas group — bounded pool² state, queries scale out."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("doc_id"), "v",
        _cosine(F.col("qv"), F.col("v")).alias("s"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    pool_df = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .select("query_id", "doc_id", "v",
                F.floor(F.lit(1_000_000.0) * F.col("s")).cast("long")
                .alias("rel_ppm")))
    return _mmr_over_pool(pool_df, k, lam_ppm)


def _mmr_over_pool(pool_df, k: int, lam_ppm: int):
    """The MMR pairwise grid + per-query greedy over an arbitrary
    (query_id, doc_id, v, rel_ppm) pool frame — shared by the
    brute-force-pool oracle twin and the index-served composition so
    a tie-break or ppm fix in one cannot silently diverge the other
    (the _ivf_pq_query single-kernel discipline)."""
    import pandas as pd

    a = pool_df.select("query_id", F.col("doc_id").alias("doc_a"),
                       F.col("rel_ppm").alias("rel_a"),
                       F.col("v").alias("va"))
    b = pool_df.select("query_id", F.col("doc_id").alias("doc_b"),
                       F.col("v").alias("vb"))
    # LEFT join so a degenerate pool of exactly one doc still yields a
    # (doc_a, rel_a, doc_b=null) row — an inner join's empty pair group
    # would make applyInPandas emit NOTHING for that query while the
    # SQL oracle's sel1 still returns the lone doc (ADVICE r11). Pools
    # of ≥2 docs get the identical rows as the inner join (every doc_a
    # has at least one partner, so no null rows are added).
    grid = (
        a.alias("ga").join(
            b.alias("gb"),
            [F.col("ga.query_id") == F.col("gb.query_id"),
             F.col("ga.doc_a") != F.col("gb.doc_b")],
            "left")
        .select(F.col("ga.query_id").alias("query_id"), "doc_a", "rel_a",
                "doc_b",
                F.floor(F.lit(1_000_000.0)
                        * _cosine(F.col("va"), F.col("vb"))).cast("long")
                .alias("sim_ppm")))

    return _mmr_greedy_from_grid(grid, k, lam_ppm)


def _mmr_greedy_from_grid(grid, k: int, lam_ppm: int):
    """The per-query Carbonell–Goldstein greedy over a prepared
    (query_id, doc_a, rel_a, doc_b, sim_ppm) pairwise grid — factored
    out of _mmr_over_pool (r12) so pools whose similarity is NOT
    embedding cosine (rag_context_diverse's token-Jaccard chunks) run
    the IDENTICAL selection loop: integer ppm scores, ties toward the
    lower doc key, single-doc pools emit rank 1 via the grid's null
    partner row. State per query is pool²-bounded, corpus-independent."""
    import pandas as pd

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel, sim = {}, {}
        for da, r, db, sp in zip(pdf["doc_a"], pdf["rel_a"],
                                 pdf["doc_b"], pdf["sim_ppm"]):
            rel[int(da)] = int(r)
            if not pd.isna(db):  # single-doc pools carry a null partner
                sim[(int(da), int(db))] = int(sp)
        remaining, selected = sorted(rel), []
        inv = 1_000_000 - lam_ppm
        for _ in range(min(k, len(remaining))):
            best = None
            for d in remaining:
                if selected:
                    ms = max(sim[(d, s2)] for s2 in selected)
                    score = lam_ppm * rel[d] - inv * ms
                else:
                    score = lam_ppm * rel[d]  # step 1 ≡ pure rel argmax
                if (best is None or score > best[0]
                        or (score == best[0] and d < best[1])):
                    best = (score, d)
            selected.append(best[1])
            remaining.remove(best[1])
        return pd.DataFrame({
            "query_id": [qid] * len(selected),
            "doc_id": selected,
            "rank": list(range(1, len(selected) + 1))})

    return grid.groupBy("query_id").applyInPandas(
        greedy, "query_id long, doc_id long, rank int")


def sim_mmr_diversify_indexed(spark, sf_dir, k: int = TOP_K,
                              pool: int = MMR_POOL,
                              lam_ppm: int = MMR_LAMBDA_PPM,
                              n_cells: int = N_CELLS,
                              n_probe: int | None = None,
                              rerank: int | None = None):
    """MMR served off the PERSISTED inverted list (r12 — VERDICT r11
    item 4: the docstring's own scale path, now an exercised, oracled
    composition): the candidate pool comes from
    sim_ann_ivf_pq_stored's partition-pruned probe of the ingest-time
    store — candidate GENERATION reads m-byte codes from the probed
    cell partitions, never a corpus×queries vector cross-product (the
    brute twin's BroadcastNestedLoopJoin; plan-pinned absent here) —
    then pool relevances are re-derived as exact ppm cosines on the
    pool·|queries| gathered rows and the SAME _mmr_over_pool grid +
    greedy runs. Default knobs are WIDENED (all cells probed,
    corpus-wide re-rank) so the pool is EXACTLY the brute twin's
    top-pool set and the entry inherits the unrolled-greedy _mmr_sql
    oracle verbatim; production knobs (n_probe, rerank) trade pool
    recall for probe cost exactly like every ANN serving path —
    indexed == brute at widened knobs is also pinned in pytest."""
    ranked = sim_ann_ivf_pq_stored(
        spark, sf_dir, k=pool,
        n_probe=n_cells if n_probe is None else n_probe,
        n_cells=n_cells,
        rerank=10**9 if rerank is None else rerank)
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pool_df = (
        ranked.select("query_id", F.col("neighbor_id").alias("doc_id"))
        .join(emb.select(F.col("vec_id").alias("doc_id"), "v"), "doc_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "doc_id", "v",
                F.floor(F.lit(1_000_000.0)
                        * _cosine(F.col("qv"), F.col("v"))).cast("long")
                .alias("rel_ppm")))
    return _mmr_over_pool(pool_df, k, lam_ppm)


def _mmr_sql(k: int = TOP_K, pool: int = MMR_POOL,
             lam: int = MMR_LAMBDA_PPM) -> str:
    """The MMR greedy unrolled into k chained CTE steps (k is a fixed
    engine constant, so the oracle is static SQL): sel1 = pure-rel
    argmax; sel{t} = argmax over the not-yet-selected pool of
    λ·rel − (1−λ)·max(sim to selected), integer ppm throughout, ties
    toward the lower doc id — term for term the Spark greedy."""
    inv = 1_000_000 - lam
    sql = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, e.vec_id AS doc_id, e.v,
         list_cosine_similarity(qv, e.v) AS s,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, e.v) DESC,
                                     e.vec_id ASC) AS rn
  FROM q, e WHERE e.vec_id <> q.query_id
), pool AS (
  SELECT query_id, doc_id, v,
         CAST(FLOOR(1000000 * s) AS BIGINT) AS rel
  FROM scored WHERE rn <= {pool}
), sims AS (
  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
         CAST(FLOOR(1000000 * list_cosine_similarity(a.v, b.v)) AS BIGINT)
           AS sp
  FROM pool a JOIN pool b
    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
), sel1 AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id ASC) AS rn
    FROM pool) WHERE rn = 1
)"""
    for t in range(2, k + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT query_id, doc_id FROM sel{i}" for i in range(1, t))
        sql += f""", all{t - 1} AS (
  {prev_union}
), sel{t} AS (
  SELECT query_id, doc_id FROM (
    SELECT x.query_id, x.doc_id,
           ROW_NUMBER() OVER (PARTITION BY x.query_id
                              ORDER BY x.score DESC, x.doc_id ASC) AS rn
    FROM (
      SELECT p.query_id, p.doc_id,
             {lam} * p.rel - {inv} * MAX(s.sp) AS score
      FROM pool p
      JOIN sims s ON s.query_id = p.query_id AND s.da = p.doc_id
      JOIN all{t - 1} sel
        ON sel.query_id = s.query_id AND sel.doc_id = s.db
      WHERE NOT EXISTS (SELECT 1 FROM all{t - 1} z
                        WHERE z.query_id = p.query_id
                          AND z.doc_id = p.doc_id)
      GROUP BY p.query_id, p.doc_id, p.rel
    ) x) WHERE rn = 1
)"""
    sql += "\n" + "\nUNION ALL ".join(
        f"SELECT query_id, doc_id, CAST({t} AS INTEGER) AS rank FROM sel{t}"
        for t in range(1, k + 1))
    return sql


# -- semantic dedup (SemDeDup-style) -----------------------------------


def _semantic_prune(ids: DataFrame, pairs: DataFrame) -> DataFrame:
    """SemDeDup's cluster-then-prune shape over an arbitrary (vec_a,
    vec_b) near-dup pair frame: connected components via
    dedup.cluster_pairs (star contraction over the sparse edge set —
    the corpus-scale frame is never shuffled), min vec_id kept as the
    component representative."""
    from kstore_spark.functions.dedup import cluster_pairs

    edges = pairs.select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    clusters = cluster_pairs(edges).withColumnRenamed("doc_id", "vec_id")
    rep = F.coalesce("cluster_id", "vec_id")
    return (
        ids.join(clusters, "vec_id", "left")
        .select(
            "vec_id", rep.alias("rep_id"),
            (F.col("vec_id") == rep).alias("keep"),
        )
    )


def decontaminate_semantic(spark, sf_dir, threshold: float = NEAR_DUP_COS,
                           eval_max: int = N_QUERIES):
    """SEMANTIC decontamination (r8): remove training vectors whose
    embedding is cosine-≥ ``threshold`` to ANY eval/benchmark vector —
    the paraphrase-robust complement of the lexical
    decontaminate_ngram/bloom (a reworded test question shares no
    13-gram but keeps its embedding). Eval set = vec_id < eval_max
    (the repo's query-role convention). Output: surviving corpus
    vec_ids.

    Scale shape — the same broadcast posture as decontaminate_ngram:
    the eval set is the SMALL side (a benchmark suite: 10²-10⁵
    vectors), broadcast once; the corpus streams through one row-local
    max-cosine filter pass (no corpus shuffle; the distinct on
    contaminated ids is over the small kill set). At very large eval
    sets swap the fold for the _nearest_cells-style BLAS batch kernel —
    the seam is the same _cosine expression. The 0.47 threshold sits in
    the testdata's pinned empirical sim gap, so the float comparison is
    engine-stable (same guarantee embedding_neardup rides; fuzzer
    re-checks on random Gaussians where DuckDB's
    list_cosine_similarity matches bit-for-bit)."""
    emb = _emb(spark, sf_dir)
    ev = emb.filter(F.col("vec_id") < eval_max).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("ev"))
    corpus = emb.filter(F.col("vec_id") >= eval_max)
    contaminated = (
        corpus.join(F.broadcast(ev))
        .filter(_cosine(F.col("v"), F.col("ev")) >= threshold)
        .select("vec_id").distinct()
    )
    # broadcast the kill set too (bounded by contamination, tiny by
    # assumption): without the hint the anti-join statically plans as
    # SortMergeJoin and SHUFFLES THE CORPUS — the exact shuffle this
    # op's design avoids (map-side anti, same posture as
    # decontaminate_ngram's broadcast kill set; plan-pinned)
    return corpus.join(F.broadcast(contaminated), "vec_id",
                       "left_anti").select("vec_id")


DECONTAMINATE_SEMANTIC_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), ev AS (
  SELECT vec_id AS eval_id, v AS evv FROM e WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id, v FROM e WHERE vec_id >= {N_QUERIES}
), hits AS (
  SELECT DISTINCT c.vec_id FROM c, ev
  WHERE list_cosine_similarity(c.v, ev.evv) >= {NEAR_DUP_COS}
)
SELECT vec_id FROM c WHERE vec_id NOT IN (SELECT vec_id FROM hits)
"""


def dedup_semantic(spark, sf_dir, threshold: float = NEAR_DUP_COS):
    """Semantic deduplication: connected components over the
    embedding-cosine near-dup graph; the minimum vec_id of each
    component is kept as the representative, everything else in the
    component is dropped (SemDeDup's cluster-then-prune shape). The
    pair graph comes from the hyperplane-LSH path with exact-cosine
    verification — the 100 TB route, and since LSH output == brute
    force at this threshold (recall 1.0 at sf0.01, pinned in tests),
    the brute-force SQL is its exact oracle.

    NOTE (VERDICT r3): the synthetic 0.47 threshold is the WORST CASE
    for hyperplane LSH (per-bit collision p≈0.66 ⇒ weak band
    selectivity ⇒ near-quadratic candidate growth) — this entry is kept
    as the stress case; `dedup_semantic_strong` below is the benched
    headline at the production operating point (cos ≥ 0.9). r6: the
    bench key for this stress tier was retired (VERDICT r5 item 4,
    same treatment as dedup_ngram_jaccard) — it remains a driver /
    pytest oracle entry only."""
    pairs = embedding_neardup_lsh(spark, sf_dir, threshold)
    return _semantic_prune(_emb(spark, sf_dir).select("vec_id"), pairs)


# -- strong-gap semantic dedup (the production operating point) --------

STRONG_COS = 0.9          # production near-dup threshold (SemDeDup regime)
STRONG_BANDS = 32         # w=16/b=32 (VERDICT r3 item 4): a random band
STRONG_ROWS = 16          # collision needs 16 matching sign bits ⇒ p≈2⁻¹⁶
                          # for uncorrelated vectors — ~1000× candidate cut
STRONG_OFFSET = 1_000_000  # planted-duplicate id namespace
STRONG_EVERY = 10         # plant a duplicate for every 10th vector


def _planted_corpus(spark, sf_dir) -> DataFrame:
    """The embeddings table plus a planted duplicate (vec_id+OFFSET,
    2·v) for every STRONG_EVERY-th vector. A scaled copy has cosine 1
    with its source and — decisive for determinism — an IDENTICAL
    hyperplane signature (sign(H·2v) = sign(H·v)), so the LSH path
    recalls every planted pair BY CONSTRUCTION, not empirically. The
    testdata background tops out at cos 0.60 (sf0.1), so at the 0.9
    threshold the planted pairs are the exact answer with a 0.3
    margin in BOTH engines."""
    base = _emb(spark, sf_dir)
    planted = base.filter(F.col("vec_id") % STRONG_EVERY == 0).select(
        (F.col("vec_id") + F.lit(STRONG_OFFSET)).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(2.0)).alias("v"),
    )
    return base.unionByName(planted)


def dedup_semantic_strong(spark, sf_dir):
    """Semantic dedup at the PRODUCTION operating point: near-dups at
    cos ≥ 0.9 over a corpus with planted duplicates, hyperplane LSH at
    w=16/b=32. Unlike the 0.47 stress case, band selectivity here is
    strong (a 16-bit band match for a background pair at cos ≤ 0.6
    has p ≤ 0.597¹⁶ ≈ 2.6e-4), so candidate volume stays near-linear
    in corpus size — this is the benched headline for the semantic
    path. Output == the brute-force SQL oracle exactly: planted pairs
    share their source's signature (guaranteed candidates), candidates
    are verified with exact cosine, and no background pair reaches the
    threshold."""
    corpus = _planted_corpus(spark, sf_dir)
    pairs = neardup_lsh_pairs(
        corpus, STRONG_COS, STRONG_BANDS, STRONG_ROWS, LSH_SEED)
    return _semantic_prune(corpus.select("vec_id"), pairs)


DEDUP_SEMANTIC_STRONG_SQL = f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + {STRONG_OFFSET},
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)
  FROM embeddings WHERE vec_id % {STRONG_EVERY} = 0
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM corpus a, corpus b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.v, b.v) > {STRONG_COS}
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
clusters AS (
  SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
)
SELECT c2.vec_id,
       COALESCE(cl.cluster_id, c2.vec_id) AS rep_id,
       c2.vec_id = COALESCE(cl.cluster_id, c2.vec_id) AS keep
FROM corpus c2 LEFT JOIN clusters cl ON c2.vec_id = cl.node
"""


DEDUP_SEMANTIC_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({EMBEDDING_NEARDUP_SQL}) AS p
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
clusters AS (
  SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
)
SELECT e.vec_id,
       COALESCE(c.cluster_id, e.vec_id) AS rep_id,
       e.vec_id = COALESCE(c.cluster_id, e.vec_id) AS keep
FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.node
"""


def knn_label_vote(spark, sf_dir, k: int = TOP_K):
    """k-NN label classification over the embedding space: each query
    vector (vec_id < N_QUERIES) gets the MAJORITY label of its top-k
    exact cosine neighbors (ties → smallest label) plus the vote count
    — the label-quality / eval-contamination audit a labeled embedding
    table supports. Output (query_id, label, n_votes).

    Scale shape: neighbors come from sim_topk_matmul (blocked BLAS —
    the primary exact top-k path, flat to 200k vectors per PERF.md);
    the vote is a |queries|×k groupBy + one window over |queries| rows.
    The label join touches the 2-column (vec_id, label) projection
    only — AQE broadcasts it while it fits."""
    nbrs = sim_topk_matmul(spark, sf_dir, k)
    labels = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        nbrs.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "label", "n_votes")
    )


KNN_LABEL_VOTE_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, v) DESC,
                                     e.vec_id ASC) AS rank
  FROM q, e WHERE e.vec_id <> q.query_id
), votes AS (
  SELECT query_id, label, COUNT(*) AS n_votes
  FROM scored WHERE rank <= {TOP_K}
  GROUP BY query_id, label
)
SELECT query_id, label, n_votes
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label ASC) AS rn
      FROM votes)
WHERE rn = 1
"""


HYBRID_KEYWORD = "vector"  # token-filter predicate for hybrid_search


def hybrid_search(spark, sf_dir, keyword: str = HYBRID_KEYWORD,
                  k: int = TOP_K):
    """Pre-filtered vector search (the RAG 'hybrid retrieval' shape):
    exact cosine top-k per query vector, restricted to documents whose
    token list contains ``keyword``. Output (query_id, doc_id, rank) —
    ranks only, ties by doc_id, same determinism basis as sim_topk.

    Scale shape: the coarse `text CONTAINS keyword` predicate is a
    plain string filter Spark pushes into the parquet scan
    (PushedFilters: StringContains — pinned in test_plans.py), the
    exact token test runs on that superset's survivors only, and the
    candidate id set reaches the embeddings scan as a LEFT SEMI join
    AQE broadcasts while the filter is selective. Queries broadcast;
    scoring touches |candidates| vectors, never the corpus."""
    docs = table(spark, sf_dir, "documents")
    cand = (
        docs.filter(F.col("text").contains(keyword))  # pushed to scan
        .filter(F.array_contains(F.split("text", " "), keyword))
        .select(F.col("doc_id").alias("vec_id"))
    )
    return _hybrid_topk(spark, sf_dir, cand, k)


def _hybrid_topk(spark, sf_dir, cand, k):
    """Shared hybrid tail: restrict embeddings to the candidate ids
    (LeftSemi), broadcast the queries, exact cosine per-query top-k."""
    emb = _emb(spark, sf_dir)
    cvec = emb.join(cand, "vec_id", "left_semi")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = cvec.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id", F.col("vec_id").alias("doc_id"),
        _cosine(F.col("qv"), F.col("v")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


def hybrid_search_indexed(spark, sf_dir, keyword: str = HYBRID_KEYWORD,
                          k: int = TOP_K):
    """hybrid_search with the keyword stage served by the persisted
    inverted text index instead of a corpus text scan: the keyword's
    postings partition is the candidate id set directly (postings are
    exact token membership — the same predicate hybrid_search applies
    after its coarse contains pre-filter), so at query time NO document
    text is read at all and the keyword cost is one pruned ids-only
    partition read. Output — and therefore the SQL oracle — is
    hybrid_search's verbatim."""
    from kstore_spark.functions.text import TOKEN_BUCKETS, _index_postings

    cand = _index_postings(
        spark, sf_dir, (keyword,), TOKEN_BUCKETS
    ).select(F.col("doc_id").alias("vec_id"))
    return _hybrid_topk(spark, sf_dir, cand, k)


_CE_MOD = 2147483647   # portable char-fold base for the fake scorer
_CE_SCALE = 1_000_000


def _ce_fake_score(query: str, text: str) -> int:
    """Deterministic stand-in for a cross-encoder forward pass: 31-ary
    code-point fold of 'query text' mod 2³¹−1, folded to [0, 10⁶) —
    portable (same value from Python ord() and DuckDB ascii()), so the
    whole rerank stage stays exactly oracle-checkable. A real model
    replaces THIS function only; the Spark-side plumbing (Arrow batch
    shape, schema, k-bounded fetch) is what the op pins down."""
    acc = 0
    for ch in query + " " + text:
        acc = (acc * 31 + ord(ch)) % _CE_MOD
    return acc % _CE_SCALE


def rerank_cross_encoder(spark, sf_dir, k: int | None = None):
    """Cross-encoder reranking — the final stage of a production
    retrieval stack (bi-encoder/BM25 recall → cross-encoder precision):
    take the BM25 top-k, fetch the k texts via the pushed literal-IN
    point-gather (same late-materialization boundary as
    text_search_snippets), and score each (query, doc) PAIR in an
    Arrow-batched ``mapInPandas`` — the model-shaped boundary: a real
    cross-encoder would tokenize and run its forward pass per batch
    right there (no such model ships in this environment, so the scorer
    is the deterministic fake above — the environment-mandated stub
    posture, same as multimodal's _fake_decode — which keeps the stage
    exactly DuckDB-oracled instead of untestable). Python touches k
    rows per query, never the corpus. Output re-ranked by
    (rerank_score DESC, doc_id)."""
    import pandas as pd

    from kstore_spark.functions.text import (
        RANKED_K, RANKED_TERMS, text_search_bm25)
    from kstore_spark.tables import table

    k = RANKED_K if k is None else k
    query = " ".join(RANKED_TERMS)
    top = text_search_bm25(spark, sf_dir, k=k)
    ids = [r["doc_id"] for r in top.select("doc_id").collect()]  # k rows
    fetched = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))  # literal IN → row-group skip
        .select("doc_id", "text")
    )

    def score(batches):
        for b in batches:
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "rerank_score": [_ce_fake_score(query, t)
                                 for t in b["text"]],
            })

    scored = fetched.mapInPandas(score, "doc_id long, rerank_score long")
    w = Window.orderBy(F.desc("rerank_score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))  # k rows only
        .select("rank", "doc_id", "rerank_score")
    )


def _rerank_sql() -> str:
    from kstore_spark.functions.text import (
        RANKED_K, RANKED_TERMS, TEXT_SEARCH_BM25_SQL)

    head = TEXT_SEARCH_BM25_SQL.rpartition("SELECT CAST(ROW_NUMBER()")[0]
    q = " ".join(RANKED_TERMS)
    folded = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len('{q} ' || text) + 1), "
        f"i -> CAST(ascii(substr('{q} ' || text, CAST(i AS INT), 1)) "
        f"AS BIGINT))), (acc, c) -> (acc * 31 + c) % {_CE_MOD}) "
        f"% {_CE_SCALE}")
    return f"""
{head}, top AS (
  SELECT doc_id FROM s ORDER BY score_ppm DESC, doc_id LIMIT {RANKED_K}
), scored AS (
  SELECT top.doc_id, CAST({folded} AS BIGINT) AS rerank_score
  FROM top JOIN documents ON top.doc_id = documents.doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rerank_score DESC, doc_id) AS INT)
         AS rank, doc_id, rerank_score
FROM scored
ORDER BY rerank_score DESC, doc_id
"""


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def hybrid_search_rrf(spark, sf_dir, k: int = TOP_K, rrf_k: int = RRF_K):
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009
    — the fusion Elasticsearch/Vespa ship as their hybrid default):
    fuse the corpus BM25 keyword ranking (index+norms artifacts,
    RANKED_TERMS query) with each query vector's exact cosine top-k;
    rrf_ppm = Σ_lists 10⁶ div (rrf_k + rank), a doc absent from a list
    contributes 0. Both input rankings are integer-exact here, so the
    fused score — and the DuckDB oracle — are exact too (the usual
    float-sum fusion headache disappears in fixed point). Plan shape:
    the BM25 list is k rows (broadcast everywhere), the cosine side is
    the blocked-BLAS top-k, the fusion is a k-bounded full-outer join
    per query — nothing corpus-sized moves. The keyword side is
    query-independent (one shared text query), so its cost is paid
    once for all N_QUERIES vectors."""
    from kstore_spark.functions.text import text_search_bm25

    cos = sim_topk_matmul(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("cos_rank"))
    bm = text_search_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm_rank"))
    qids = _emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"))
    bm_q = qids.join(F.broadcast(bm))
    fused = (
        cos.join(bm_q, ["query_id", "doc_id"], "full")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id", "doc_id",
            (F.coalesce(F.expr(f"1000000 div ({rrf_k} + cos_rank)"), F.lit(0))
             + F.coalesce(F.expr(f"1000000 div ({rrf_k} + bm_rank)"),
                          F.lit(0))).cast("long").alias("rrf_ppm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_ppm"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_ppm",
                F.col("rank").cast("int").alias("rank"))
    )


def _hybrid_rrf_sql() -> str:
    from kstore_spark.functions.text import (
        RANKED_K, TEXT_SEARCH_BM25_SQL)

    head = TEXT_SEARCH_BM25_SQL.rpartition("SELECT CAST(ROW_NUMBER()")[0]
    return f"""
{head}, bmtop AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS INT)
           AS bm_rank, doc_id
  FROM s ORDER BY score_ppm DESC, doc_id LIMIT {RANKED_K}
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), cosr AS (
  SELECT query_id, doc_id, rank AS cos_rank FROM (
    SELECT query_id, e.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY list_cosine_similarity(qv, v) DESC,
                                       e.vec_id ASC) AS rank
    FROM q, e WHERE e.vec_id <> q.query_id)
  WHERE rank <= {TOP_K}
), bmq AS (
  SELECT query_id, doc_id, bm_rank FROM q, bmtop
), fused AS (
  SELECT COALESCE(cosr.query_id, bmq.query_id) AS query_id,
         COALESCE(cosr.doc_id, bmq.doc_id) AS doc_id,
         COALESCE(1000000 // ({RRF_K} + cos_rank), 0)
           + COALESCE(1000000 // ({RRF_K} + bm_rank), 0) AS rrf_ppm
  FROM cosr FULL JOIN bmq
    ON cosr.query_id = bmq.query_id AND cosr.doc_id = bmq.doc_id
)
SELECT query_id, doc_id, rrf_ppm, rank FROM (
  SELECT query_id, doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rrf_ppm DESC, doc_id) AS INT)
           AS rank
  FROM fused WHERE doc_id <> query_id)
WHERE rank <= {TOP_K}
"""


HYBRID_SEARCH_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT e.vec_id, e.v FROM e JOIN documents d ON e.vec_id = d.doc_id
  WHERE list_contains(string_split(d.text, ' '), '{HYBRID_KEYWORD}')
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT query_id, c.vec_id AS doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, c.v) DESC,
                                     c.vec_id ASC) AS rank
  FROM q, c WHERE c.vec_id <> q.query_id
)
SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= {TOP_K}
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_matmul": sim_topk_matmul,
    "knn_label_vote": knn_label_vote,
    "hybrid_search": hybrid_search,
    "hybrid_search_indexed": hybrid_search_indexed,
    "hybrid_search_rrf": hybrid_search_rrf,
    "rerank_cross_encoder": rerank_cross_encoder,
    "embedding_neardup": embedding_neardup,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "sim_ann_ivf": sim_ann_ivf,
    "sim_ann_ivf_kmeans": sim_ann_ivf_kmeans,
    "sim_ann_ivf_incremental": sim_ann_ivf_incremental,
    "knn_graph_ivf": knn_graph_ivf,
    "sim_ann_pq": sim_ann_pq,
    "sim_ann_sq8": sim_ann_sq8,
    "sim_ann_pq_kmeans": sim_ann_pq_kmeans,
    "sim_ann_ivf_pq": sim_ann_ivf_pq,
    "sim_ann_ivf_pq_res": sim_ann_ivf_pq_res,
    "sim_ann_ivf_pq_res_stored": sim_ann_ivf_pq_res_stored,
    "sim_ann_ivf_pq_stored": sim_ann_ivf_pq_stored,
    "sim_ann_ivf_pq_kmeans_stored": sim_ann_ivf_pq_kmeans_stored,
    "lifecycle_fold_ann": lifecycle_fold_ann,
    "lifecycle_fold_ann_res": lifecycle_fold_ann_res,
    "lifecycle_fold_ann_kmeans": lifecycle_fold_ann_kmeans,
    "sim_mmr_diversify": sim_mmr_diversify,
    "sim_mmr_diversify_indexed": sim_mmr_diversify_indexed,
    "sim_ann_retracted": sim_ann_retracted,
    "sim_ann_retracted_kmeans": sim_ann_retracted_kmeans,
    "sim_range_search": sim_range_search,
    "sim_range_search_pruned": sim_range_search_pruned,
    "dedup_semantic": dedup_semantic,
    "decontaminate_semantic": decontaminate_semantic,
    "dedup_semantic_strong": dedup_semantic_strong,
    "cluster_balanced_sample": cluster_balanced_sample,
}

ORACLES = {
    "sim_topk_bruteforce": SIM_TOPK_SQL,
    # the ANN lifecycle queries the FOLDED store with both knobs
    # widened — exact brute force by the degeneration theorem, so the
    # plain top-k SQL is its oracle (see lifecycle_fold_ann)
    "lifecycle_fold_ann": SIM_TOPK_SQL,
    # the residual lifecycle is exact for the same widened-knobs reason
    "lifecycle_fold_ann_res": SIM_TOPK_SQL,
    # the kmeans lifecycle too: whatever the trained tensor, widened
    # knobs make every vector an exact-re-rank candidate
    "lifecycle_fold_ann_kmeans": SIM_TOPK_SQL,
    # MMR: integer-ppm greedy, unrolled into k CTE steps — pool ranks
    # ride the pinned cosine margins, ppm floors are boundary-pinned
    "sim_mmr_diversify": _mmr_sql(),
    # the index-served composition's widened-knobs pool == the brute
    # twin's top-pool set (degeneration theorem), so the SAME unrolled
    # greedy is its exact oracle (r12, VERDICT r11 item 4)
    "sim_mmr_diversify_indexed": _mmr_sql(),
    # ANN takedown: widened knobs ⇒ exact brute force over survivors
    "sim_ann_retracted": _sim_topk_retracted_sql(RETRACT_VEC_IDS),
    # the kmeans-store takedown degenerates to the SAME exact answer —
    # whatever the trained tensor, widened knobs re-rank every
    # surviving candidate exactly (r12, VERDICT r11 item 3)
    "sim_ann_retracted_kmeans": _sim_topk_retracted_sql(RETRACT_VEC_IDS),
    # range search: a filter decision flips only if an exact cosine
    # lands within ~1e-15 of the threshold; the data margin is pinned
    # at 4.5e-4 (test_range_threshold_margins) — exact SQL oracle
    "sim_range_search": SIM_RANGE_SEARCH_SQL,
    # the pruned path drops only cells PROVABLY below the threshold
    # (spherical triangle inequality + keep-only eps slack) — output
    # identical to the brute twin on every input, same oracle
    "sim_range_search_pruned": SIM_RANGE_SEARCH_SQL,
    # same SQL is the matmul path's EXACT oracle: float64 ranks are
    # identical to the fold's (summation-order noise ~1e-15 vs a 1.9e-5
    # minimum adjacent-rank gap at sf0.01) and only ids/ranks are output
    "sim_topk_matmul": SIM_TOPK_SQL,
    # the vote aggregates the same exact top-k ranks → integer counts
    "knn_label_vote": KNN_LABEL_VOTE_SQL,
    # same cosine fold / ranks-only basis as sim_topk; the keyword
    # filter is exact set membership in both engines
    "hybrid_search": HYBRID_SEARCH_SQL,
    # index path == scan path (postings are exact token membership)
    "hybrid_search_indexed": HYBRID_SEARCH_SQL,
    # both fused rankings are integer-exact → so is the fusion
    "hybrid_search_rrf": _hybrid_rrf_sql(),
    # fake-scorer fold is code-point arithmetic → portable, exact
    "rerank_cross_encoder": _rerank_sql(),
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    # embedding_neardup_lsh verifies candidates with EXACT cosine, so its
    # output ⊆ brute force; at sf0.01 the seeded bands attain 100% recall
    # (pinned in tests), making the brute-force SQL its exact oracle.
    "embedding_neardup_lsh": EMBEDDING_NEARDUP_SQL,
    # dedup_semantic builds on the LSH pairs, which equal brute force at
    # the default threshold (recall 1.0 at sf0.01) — exact oracle
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "decontaminate_semantic": DECONTAMINATE_SEMANTIC_SQL,
    # strong-gap variant: recall 1.0 BY CONSTRUCTION (planted scaled
    # copies share their source's hyperplane signature) + exact-cosine
    # verify + 0.3 cosine margin ⇒ brute-force SQL is the exact oracle
    "dedup_semantic_strong": DEDUP_SEMANTIC_STRONG_SQL,
    # knn_graph_ivf: same deterministic-IVF exact-oracle basis as
    # sim_ann_ivf, extended to all-vectors queries; per-cell top-k is
    # lossless under the global (s DESC, id ASC) order and every rank/
    # probe boundary over ALL vectors is margin-pinned in
    # test_knn_graph_margins
    "knn_graph_ivf": KNN_GRAPH_IVF_SQL,
    # cluster_balanced_sample: assignment rides the bit-equal cosine
    # fold (same basis as sim_topk_bruteforce's oracle) with the argmax
    # tie-break mirrored; everything downstream is integer arithmetic
    "cluster_balanced_sample": CLUSTER_BALANCED_SAMPLE_SQL,
    # sim_ann_ivf / _incremental (r6 upgrade from rows-only): the
    # APPROXIMATION is deterministic — argmax assignment + top-n_probe
    # cell selection + candidate ranking, every float boundary pinned
    # far above noise (see SIM_ANN_IVF_SQL comment) — so the same SQL
    # reproduces the approximate output exactly. The incremental
    # variant equals the base at equal n_probe (per-row assignment,
    # history-deterministic centroids — pinned), so it carries the
    # same SQL. sim_ann_ivf_kmeans stays rows-only (float centroid
    # training) with its equivalence gate.
    "sim_ann_ivf": SIM_ANN_IVF_SQL,
    "sim_ann_ivf_incremental": SIM_ANN_IVF_SQL,
}
