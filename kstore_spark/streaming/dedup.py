"""Streaming deduplication over the events stream.

Two variants of stateful exact dedup (the streaming face of
functions/dedup.py's batch operators):

- ``stream_dedup_counts``: ``dropDuplicates`` on (user_id, event_type)
  then per-type counts — first-touch semantics over the whole backfill.
  State is one entry per distinct key (bounded by key cardinality, NOT
  input volume), which is the right tool for availableNow backfills and
  finite key domains. Exactly SQL-expressible → DuckDB oracle.
- ``stream_dedup_within_watermark``: ``dropDuplicatesWithinWatermark``
  — the infinite-stream variant; state is bounded by the watermark
  horizon instead of the key domain, at the cost of re-admitting a key
  whose duplicates arrive after the horizon passes. Admission depends on
  watermark progression, so it has no closed-form SQL oracle; its
  containment properties are pinned in tests (every key counted at
  least once; never fewer than the global-distinct count).

Both run as real Structured Streaming queries (availableNow → memory
sink), same staging trick as windows.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.streaming.windows import _events_stream


def _run_to_table(agg: DataFrame, prefix: str) -> str:
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — refusing to "
            "return a silently-partial result"
        )
    return name


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch per-key dedup, counted per event_type."""
    stream = _events_stream(spark, sf_dir)
    deduped = stream.dropDuplicates(["user_id", "event_type"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_first"))
    name = _run_to_table(agg, "stream_dedup")
    return spark.table(name).select("event_type", "n_first")


STREAM_DEDUP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_first
FROM events GROUP BY event_type
"""


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded dedup (production infinite-stream variant):
    state holds only keys inside the 1h event-time horizon."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_admitted"))
    name = _run_to_table(agg, "stream_dedup_wm")
    return spark.table(name).select("event_type", "n_admitted")


QUERIES = {
    "stream_dedup_counts": stream_dedup_counts,
}

ORACLES = {
    "stream_dedup_counts": STREAM_DEDUP_SQL,
}
