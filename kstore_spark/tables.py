"""Loaders for the driver's TPC-H-ish testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under the sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (LTZ) whatever the
    parquet stored. The driver's testdata has shipped three encodings
    across rounds: TIMESTAMP(NANOS) (read as bigint under nanosAsLong),
    TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ), and plain
    TIMESTAMP. Every reader — batch ``table()``, the streaming file
    source, incremental rollups — goes through this ONE helper so a
    future encoding change is a one-line fix, not a per-module hunt
    (mirrors the reference's single column_open for all access paths,
    storage.c:306-448).

    Session timezone is pinned UTC (session.py), so NTZ → LTZ is a pure
    type re-tag with identical epoch values — oracles stay equal because
    DuckDB treats the same microseconds as UTC too.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # nanosAsLong read path: truncate ns → µs exactly like DuckDB's
        # TIMESTAMP_NS → TIMESTAMP cast. Integer division — float would
        # lose precision at 1e18 ns.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # watermarks / window() / unix-epoch casts all need LTZ
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file or directory, read from the
    file FOOTER metadata driver-side — no Spark job. Parquet footers
    record the exact per-file row count, so on an immutable input this
    equals ``spark.read.parquet(path).count()``; query paths use it to
    absorb the per-call count() job that only sized a knob (guide
    §1.2: the job's scheduling latency was the cost, not the rows).
    Computed fresh from the input files on every call — nothing is
    memoized across invocations."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_")))
    return pq.ParquetFile(path).metadata.num_rows


def one_slice_df(spark: SparkSession, rows, schema) -> DataFrame:
    """createDataFrame for BOUNDED driver-built row lists (query
    vectors, LUTs, centroid tables, driver union-find labels): one
    RDD slice instead of defaultParallelism slices. The plain form
    splits even a 10-row list into 32 Python-worker partitions — every
    downstream task pays one JVM↔Python round trip per slice it reads
    (a coalesce(1) consumer pays all 32 SERIALLY — measured 5-7 s for
    128 rows at local[32]; r13, guide §4). One slice = one round trip;
    values and schema are identical."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet may store TIMESTAMP(NANOS), which the vectorized
        # reader rejects; set defensively (runtime-settable) so sessions
        # not built by kstore_spark.session.get_spark work too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() can be used."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
