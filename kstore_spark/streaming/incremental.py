"""Incrementally-maintained rollup: the production pattern for keeping an
aggregate table fresh over an ever-growing event log.

    file source (new files discovered per run)
      → watermark → tumbling-window aggregate
      → append-mode parquet sink, checkpointed

Each ``availableNow`` run processes ONLY files not seen by the checkpoint,
carries window state forward, and appends windows the watermark has
closed. Run it from cron/Airflow and the rollup table stays current with
bounded work per run — no full recomputation, exactly-once sink writes.

State/scale: the state store holds one row per open (window, event_type);
the watermark closes and evicts them, so state is O(window_cardinality),
independent of history length.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_incremental_rollup(
    spark: SparkSession,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> None:
    """One incremental maintenance run (call repeatedly as data arrives)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    some_file = next(
        os.path.join(events_dir, f) for f in sorted(os.listdir(events_dir))
        if f.endswith(".parquet")
    )
    schema = spark.read.parquet(some_file).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    from kstore_spark.tables import normalize_events_ts

    stream = normalize_events_ts(stream)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")  # only watermark-closed windows are written
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — refusing to "
            "return a silently-partial result"
        )


def read_rollup(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
