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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.streaming.dedup import _run_to_table


def stream_interval_join(spark: SparkSession, sf_dir: str,
                         backfill_chunks: int = 8) -> DataFrame:
    """Purchases attributed to all same-user signups in the prior 7 days,
    computed by an actual stream-stream join (not a batch rewrite).
    Backfills replay through ts-range-chunked staging (same r5 guard as
    stream_range_join): in a single availableNow batch the watermark
    never advances, so signup state for the whole corpus accumulates
    with zero eviction; chunked, state is bounded by the 7-day horizon
    over the replay. Output-identical (range chunks cannot be late)."""
    from kstore_spark.streaming.windows import _events_stream_chunked

    purchases = (
        _events_stream_chunked(spark, sf_dir, backfill_chunks)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    signups = (
        _events_stream_chunked(spark, sf_dir, backfill_chunks)
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
    return spark.table(_run_to_table(joined, "stream_ij", output_mode="append"))


STREAM_INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id
FROM events p JOIN events s
  ON p.user_id = s.user_id
 AND s.ts <= p.ts AND p.ts <= s.ts + INTERVAL 7 DAY
WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
"""


RANGE_WINDOW_S = 3600  # batch twin's attribution window (plans/ranges.py)


STREAM_RJ_BACKFILL_CHUNKS = 8


def stream_range_join(spark: SparkSession, sf_dir: str,
                      window_s: int = RANGE_WINDOW_S,
                      backfill_chunks: int = STREAM_RJ_BACKFILL_CHUNKS) -> DataFrame:
    """KEYLESS stream-stream interval join: every purchase matched to
    every click (ANY user) in the preceding hour — the streaming twin of
    plans/ranges.events_range_join.

    The bin trick is what makes this expressible at all: Spark
    partitions stream-stream join state by the join's EQUALITY keys, so
    a purely-inequality condition has no key to co-partition on. Mapping
    clicks to their time bin and exploding each purchase window onto its
    two covered bins manufactures that equality key; the exact boundary
    predicate rides on top, and because it bounds the two event times
    against each other, the watermark can evict state (a click older
    than watermark - window can never match a future purchase). State
    per bin is one watermark-horizon's worth of events — skewed hot bins
    are ordinary hot state keys. Append mode: each matched pair emits
    exactly once, when both sides have arrived.

    r5 backfill guard (VERDICT r4): watermark-driven state eviction only
    happens BETWEEN micro-batches, so a whole-corpus backfill arriving
    as one availableNow batch kept every event in state at once — the
    r4 probe never finished a 10× backfill in 25 min (vs 1.8 s for the
    batch twin). Both sides now replay through ts-range-chunked staging
    (``backfill_chunks`` micro-batches, maxFilesPerTrigger=1), so the
    watermark advances per chunk and state holds ~one chunk + horizon.
    Output-identical (range chunks can't make a row late); large
    backfills remain the batch twin's job — this guard makes the
    streaming op survive one, not excel at it."""
    from kstore_spark.plans.ranges import _US, micros_bin, time_bin
    from kstore_spark.streaming.windows import _events_stream_chunked

    w_us = window_s * _US
    purchases = (
        _events_stream_chunked(spark, sf_dir, backfill_chunks)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
        .withColumn(
            "bin",
            F.explode(F.sequence(
                micros_bin(f"unix_micros(p_ts) - {w_us:d}", w_us),
                time_bin("p_ts", w_us),
            )),
        )
    )
    clicks = (
        _events_stream_chunked(spark, sf_dir, backfill_chunks)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
        .withColumn("cbin", time_bin("c_ts", w_us))
    )
    joined = purchases.join(
        clicks,
        (F.col("bin") == F.col("cbin"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id")
    # parquet sink, not memory: pair multiplicity is quadratic in event
    # density per window — the memory sink put all 55M 10×-backfill
    # pairs in driver heap and OOM'd (see _run_to_parquet)
    from kstore_spark.streaming.dedup import _run_to_parquet

    return _run_to_parquet(joined, "stream_rj")


STREAM_RANGE_JOIN_SQL = f"""
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.ts > p.ts - INTERVAL {RANGE_WINDOW_S} SECONDS AND c.ts <= p.ts
"""


QUERIES = {
    "stream_interval_join": stream_interval_join,
    "stream_range_join": stream_range_join,
}

ORACLES = {
    "stream_interval_join": STREAM_INTERVAL_JOIN_SQL,
    "stream_range_join": STREAM_RANGE_JOIN_SQL,
}
