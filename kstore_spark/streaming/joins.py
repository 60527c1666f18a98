"""Stream-stream interval join: purchase attribution against signups.

The reference has no streaming (SURVEY.md §2.8); this extends the
streaming surface with the canonical hard case — joining two unbounded
streams. Each purchase is joined to every signup by the same user within
the preceding 7 days:

    purchases ⋈ signups ON user_id
        AND signup.ts <= purchase.ts <= signup.ts + 7 days

Both sides carry event-time watermarks and the join condition bounds the
two event times against each other, which is exactly what lets Spark
expire state: a signup older than (watermark - 7 days) can never match a
future purchase and is evicted. State is O(events inside the watermark
horizon), not O(stream length). Stream-stream inner joins emit in append
mode only — each match is emitted once, when both sides have arrived.

Here the backlog is one parquet file, so availableNow processes it in a
single micro-batch and the watermark never drops backfill rows — the
result equals the batch interval join, which is the DuckDB oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.streaming.windows import _events_stream


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to all same-user signups in the prior 7 days,
    computed by an actual stream-stream join (not a batch rewrite)."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    signups = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
    ).select("purchase_id", "user_id", "signup_id")
    name = f"stream_ij_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — refusing to "
            "return a silently-partial result"
        )
    return spark.table(name)


STREAM_INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id
FROM events p JOIN events s
  ON p.user_id = s.user_id
 AND s.ts <= p.ts AND p.ts <= s.ts + INTERVAL 7 DAY
WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
"""


QUERIES = {
    "stream_interval_join": stream_interval_join,
}

ORACLES = {
    "stream_interval_join": STREAM_INTERVAL_JOIN_SQL,
}
