"""Error-bound gates for the sketch aggregates (functions/sketches.py).

The approx twins have no SQL oracle by design (sketch internals are
engine-specific), so correctness is pinned here against the exact,
oracled twin: HLL++ within its configured rsd, percentile_approx within
its rank-error guarantee.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact(spark):
    from kstore_spark.functions.sketches import events_distinct_users

    return {r["event_type"]: (r["n_users"], r["n_events"])
            for r in events_distinct_users(spark, SF_DIR).collect()}


def test_approx_distinct_within_rsd(spark, exact):
    """HLL++ estimate per group within 5x the configured 2% rsd of the
    exact count (sparse-mode HLL is exact at small cardinalities, so the
    slack is for the dense-mode transition); exact row counts ride along
    untouched."""
    from kstore_spark.functions.sketches import events_approx_distinct

    got = {r["event_type"]: (r["n_users_approx"], r["n_events"])
           for r in events_approx_distinct(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for etype, (n_exact, n_events) in exact.items():
        n_approx, n_events_approx = got[etype]
        assert n_events_approx == n_events
        assert abs(n_approx - n_exact) <= max(1, 0.10 * n_exact)


def test_approx_quantiles_rank_error(spark, exact):
    """percentile_approx guarantees rank error <= n/accuracy: for each
    reported quantile, the fraction of group values <= it must sit
    within [p - eps, p + eps] (eps = 1/accuracy + one-value slack)."""
    from kstore_spark.functions.sketches import (
        PCTL_ACCURACY, QUANTILES, events_approx_quantiles)
    from kstore_spark.tables import table

    rows = events_approx_quantiles(spark, SF_DIR).collect()
    ev = table(spark, SF_DIR, "events")
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
        n = r["n_events"]
        eps = 1.0 / PCTL_ACCURACY + 1.0 / n
        for p, col in zip(QUANTILES, ("p50", "p90", "p99")):
            n_le = ev.filter(
                (F.col("event_type") == r["event_type"])
                & (F.col("value") <= r[col])
            ).count()
            assert p - eps <= n_le / n <= p + eps, (r["event_type"], col)
