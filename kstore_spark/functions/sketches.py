"""Sketch-based approximate aggregates over the ``events`` table.

At 100 TB, COUNT(DISTINCT) and exact percentiles are the two aggregates
whose exact form stops scaling first (both need all distinct values /
all rows of a group co-located). Spark ships mergeable sketches for
each — HyperLogLog++ and KLL-style quantile digests — that aggregate in
fixed memory per partition and merge map-side, so the shuffle carries
|groups| sketches instead of |rows| values:

- ``events_distinct_users``      exact per-type distinct users (oracled)
- ``events_approx_distinct``     HLL++ twin, rsd=2% (rows-only check;
                                 relative-error gate in pytest)
- ``events_approx_quantiles``    per-type p50/p90/p99 of ``value`` via
                                 percentile_approx (rows-only check;
                                 absolute-rank-error gate in pytest)

The approximate twins are deliberately NOT given SQL oracles: sketch
internals are engine-specific (Spark HLL++ vs DuckDB's approx_count_
distinct implementation differ legitimately). Correctness is pinned by
the exact twin + error-bound tests instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kstore_spark.tables import table

HLL_RSD = 0.02            # target relative standard deviation for HLL++
PCTL_ACCURACY = 10_000    # percentile_approx accuracy knob (1/eps)
QUANTILES = (0.5, 0.9, 0.99)


def events_distinct_users(spark, sf_dir):
    """Exact distinct users per event type — the oracled baseline the
    sketch twin is measured against. Exact COUNT(DISTINCT) expands to
    two aggregations (dedup, then count); fine at bench scale, the
    thing the HLL twin exists to replace at 100 TB."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def events_approx_distinct(spark, sf_dir, rsd: float = HLL_RSD):
    """HLL++ distinct users per event type: constant memory per group
    (2% rsd ⇒ ~KB-scale registers), partial-aggregated map-side, so the
    shuffle is |event_types| sketches however many rows flow in."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def events_approx_quantiles(spark, sf_dir, accuracy: int = PCTL_ACCURACY):
    """Mergeable quantile digest of event values per type: p50/p90/p99
    in one pass, error bounded by 1/accuracy of rank — the scale path
    for percentiles (the exact row_number median in
    plans/extended.py::median_price_by_segment needs a full sort per
    group)."""
    ev = table(spark, sf_dir, "events")
    q = F.percentile_approx("value", F.array(*[F.lit(p) for p in QUANTILES]), accuracy)
    return ev.groupBy("event_type").agg(
        q.getItem(0).alias("p50"),
        q.getItem(1).alias("p90"),
        q.getItem(2).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


QUERIES = {
    "events_distinct_users": events_distinct_users,
    "events_approx_distinct": events_approx_distinct,
    "events_approx_quantiles": events_approx_quantiles,
}

ORACLES = {
    "events_distinct_users": EVENTS_DISTINCT_USERS_SQL,
    # approx twins: engine-specific sketches — rows-only driver check,
    # error bounds pinned in tests/test_sketches.py
}
