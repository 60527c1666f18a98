"""Keyless range (interval-containment) join via bin bucketing.

The reference has no join beyond single-key equijoins (SURVEY.md §2
FETCH/joins; reference include/db_operators.h defines hash/sort/tree/
loop over one int key) — a time-range join is part of this engine's
extension surface, and it is the canonical case where a naive Spark
plan collapses: a join whose ONLY predicate is an inequality compiles
to BroadcastNestedLoopJoin / CartesianProduct — O(|points| ×
|intervals|) pairs evaluated, a non-starter at 100 TB.

The scale formulation is the binned range join (the same technique
Databricks ships as its range-join optimization): pick a bin width W,
map every point to bin floor(ts / W) and every interval to the bins it
overlaps (span/W + 1 consecutive bins — exactly 2 when the interval
length equals W). The bin id becomes an EQUI-join key, so the plan is
an ordinary shuffled hash/sort-merge join whose candidate multiset is
bounded by bin co-residency, and the exact predicate filters candidates
after the join. Cost: each interval is duplicated (span/W + 1)×, each
point 1× — a constant-factor map-side expansion instead of a cross
product, and every downstream property (AQE, skew splitting, partial
aggregation) applies unchanged.

Bin-width choice at scale: W ≈ the typical interval length minimizes
(duplication factor) × (per-bin candidate density); a heavily skewed
hot bin (e.g. everything on one flash-sale hour) is an ordinary
skewed-key equi-join, which AQE's skew-join splitting already handles —
that is precisely why reducing the range join TO an equi-join is the
right move, rather than hand-rolled interval partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.tables import table

_US = 1_000_000
RANGE_WINDOW_S = 3600  # attribution window = bin width (1 hour)


def micros_bin(micros_sql: str, w_us: int):
    """Bin id = floor(micros / w_us) computed in pure integer arithmetic.

    ``pmod`` yields the non-negative remainder, so ``micros - pmod`` is
    the greatest multiple of ``w_us`` <= micros and the DIV is exact —
    floor semantics hold for negative (pre-epoch) timestamps too, with
    no double-precision round-trip (the repo's float-free discipline;
    double floor(x/w) is only safe while micros fits in 53 bits).
    ``micros_sql`` is a SQL expression producing integer microseconds.
    Shared by the batch and streaming range joins.
    """
    return F.expr(
        f"((({micros_sql}) - pmod(({micros_sql}), {w_us:d})) DIV {w_us:d})")


def time_bin(ts_name: str, w_us: int):
    """Floor-division bin id of a timestamp column (by name)."""
    return micros_bin(f"unix_micros({ts_name})", w_us)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: int,
) -> DataFrame:
    """Equi-join ``points`` to ``intervals`` on co-resident time bins.

    Returns the candidate frame (all columns of both inputs) where the
    point's bin falls inside the interval's covered bin range; the
    caller applies its exact boundary predicate on top. Candidates are
    a superset of true matches by construction (a point inside
    [start, end] is always inside a covered bin), so exactness is
    decided solely by the caller's filter.
    """
    for side, frame in (("points", points), ("intervals", intervals)):
        if "_bin" in frame.columns:
            raise ValueError(
                f"binned_range_join: {side} frame already has a '_bin' "
                "column — it would be silently overwritten and dropped; "
                "rename it first")
    shared = sorted(set(points.columns) & set(intervals.columns))
    if shared:
        raise ValueError(
            "binned_range_join: points and intervals share column(s) "
            f"{shared} — the equi-join would emit ambiguous duplicates "
            "that break the caller's exact-predicate filter; rename or "
            "drop them on one side first")
    w_us = bin_width_s * _US
    pt = points.withColumn("_bin", time_bin(point_ts, w_us))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(time_bin(start_ts, w_us), time_bin(end_ts, w_us))),
    )
    return pt.join(iv, "_bin").drop("_bin")


def events_range_join(spark: SparkSession, sf_dir: str,
                      window_s: int = RANGE_WINDOW_S) -> DataFrame:
    """Purchase ⇐ click attribution with NO join key: every purchase
    aggregated over ALL clicks (any user) in the preceding hour —
    n_clicks + the latest click id. The keyless inequality predicate is
    what makes the naive plan a nested-loop cross product; the binned
    rewrite keeps it an equi-join (asserted nested-loop-free in
    tests/test_plans.py). Purchases with no click in window are kept
    with n_clicks = 0 (left re-join on the interval side).
    """
    ev = table(spark, sf_dir, "events")
    # the purchases projection feeds both the binned join and the final
    # zero-match re-join — persist the (small) 3-column frame so the
    # second consumer reads the cache instead of re-scanning events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr(f"INTERVAL {window_s} SECONDS")).alias("w_start"),
    ).persist()
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    cands = binned_range_join(
        clicks, purchases, "c_ts", "w_start", "p_ts", window_s
    )
    matched = (
        cands.filter((F.col("c_ts") > F.col("w_start")) & (F.col("c_ts") <= F.col("p_ts")))
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.max("click_id").alias("last_click_id"),
        )
    )
    res = (
        purchases.join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce("n_clicks", F.lit(0).cast("long")).alias("n_clicks"),
            "last_click_id",
        )
        .persist()
    )
    res.count()  # materialize the per-purchase result, then release the
    # purchases cache (a lazy return would pin it for the session)
    purchases.unpersist()
    return res


EVENTS_RANGE_JOIN_SQL = f"""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_clicks,
       MAX(c.event_id) AS last_click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.ts > p.ts - INTERVAL {RANGE_WINDOW_S} SECONDS AND c.ts <= p.ts
GROUP BY p.event_id
"""


QUERIES = {
    "events_range_join": events_range_join,
}

ORACLES = {
    "events_range_join": EVENTS_RANGE_JOIN_SQL,
}
