"""events_gapfill / events_funnel invariants at sf0.001 (value parity vs
DuckDB runs in tools/check_oracle.py at sf0.01)."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_gapfill_grid_is_dense_and_mass_preserving(spark):
    from kstore_spark.plans.analytics import events_gapfill
    from kstore_spark.tables import table

    out = events_gapfill(spark, SF_DIR)
    rows = out.collect()
    ev = table(spark, SF_DIR, "events")

    # complete grid: |hours in [min,max]| x |types|, exactly once each
    n_types = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.date_trunc("hour", F.min("ts")), F.date_trunc("hour", F.max("ts"))
    ).first()
    n_hours = int((hi - lo).total_seconds() // 3600) + 1
    assert len(rows) == n_hours * n_types
    assert len({(r["hour"], r["event_type"]) for r in rows}) == len(rows)

    # gap-filling actually filled gaps, and no events were lost
    assert any(r["n"] == 0 for r in rows)
    assert sum(r["n"] for r in rows) == ev.count()


def test_funnel_counts_shrink_and_anchor(spark):
    from kstore_spark.plans.analytics import events_funnel
    from kstore_spark.tables import table

    got = {r["step"]: r["n_users"] for r in events_funnel(spark, SF_DIR).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] >= got[2] >= got[3] > 0  # ordered-step containment
    ev = table(spark, SF_DIR, "events")
    signup_users = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id").distinct().count()
    )
    assert got[1] == signup_users


def test_gapfill_locf_carries_last_observation(spark):
    from kstore_spark.plans.analytics import events_gapfill_locf

    rows = events_gapfill_locf(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert any(not r["observed"] for r in rows)  # gaps exist
    for seq in by_type.values():
        seq.sort(key=lambda r: r["hour"])
        last = None
        for r in seq:
            if r["observed"]:
                last = r["mean_micro"]
                assert last is not None
            else:
                # carried value == most recent observation (NULL before
                # the type's first observation)
                assert r["mean_micro"] == last


def test_top_paths_mass_and_topk_prefix(spark):
    """The full path table's mass is Σ_user max(0, n_u − 2) (every
    consecutive triple counted exactly once), and the shipped top-k is
    the deterministic prefix of the full ordering."""
    from kstore_spark.plans.analytics import PATH_K, events_top_paths
    from kstore_spark.tables import table

    full = events_top_paths(spark, SF_DIR, k=1_000_000_000).collect()
    per_user = table(spark, SF_DIR, "events").groupBy("user_id").count()
    expected = sum(max(0, r["count"] - 2) for r in per_user.collect())
    assert sum(r["n_paths"] for r in full) == expected
    assert all(r["e1"] and r["e2"] and r["e3"] for r in full)

    order = sorted(
        ((-r["n_paths"], r["e1"], r["e2"], r["e3"]) for r in full))
    top = events_top_paths(spark, SF_DIR).collect()
    assert len(top) == min(PATH_K, len(full))
    got = [(-r["n_paths"], r["e1"], r["e2"], r["e3"]) for r in top]
    assert got == order[: len(top)]


def test_cumulative_users_mass_and_monotone(spark):
    """Daily new-user counts sum to the distinct-user total, the
    cumulative series is that same running total, and its last value
    equals COUNT(DISTINCT user_id)."""
    from kstore_spark.plans.analytics import events_cumulative_users
    from kstore_spark.tables import table

    rows = sorted(events_cumulative_users(spark, SF_DIR).collect(),
                  key=lambda r: r["day"])
    n_users = (table(spark, SF_DIR, "events")
               .select("user_id").distinct().count())
    assert sum(r["n_new_users"] for r in rows) == n_users
    assert rows[-1]["n_cumulative_users"] == n_users
    run = 0
    for r in rows:
        run += r["n_new_users"]
        assert r["n_cumulative_users"] == run


def test_windowed_funnel_contained_in_unwindowed(spark):
    """The windowed funnel's step counts are bounded above by the
    unwindowed funnel's at every step (tightening the filter can only
    lose users), share step 1 exactly, and shrink down the funnel."""
    from kstore_spark.plans.analytics import (
        events_funnel, events_funnel_windowed)

    free = {r["step"]: r["n_users"] for r in events_funnel(spark, SF_DIR).collect()}
    win = {r["step"]: r["n_users"]
           for r in events_funnel_windowed(spark, SF_DIR).collect()}
    assert set(win) == {1, 2, 3}
    assert win[1] == free[1]
    assert win[2] <= free[2] and win[3] <= free[3]
    assert win[1] >= win[2] >= win[3] >= 0
    # a 1-second window must collapse conversions to (almost) nothing
    tiny = {r["step"]: r["n_users"]
            for r in events_funnel_windowed(spark, SF_DIR, hours=0).collect()}
    assert tiny[2] == 0 and tiny[3] == 0


def test_ab_conversion_bounds(spark):
    """Per arm: converted ⊆ exposed, the ppm rate is the exact floor
    division, and every distinct user appears in at least one arm."""
    from pyspark.sql import functions as F

    from kstore_spark.plans.analytics import events_ab_conversion
    from kstore_spark.tables import table

    rows = events_ab_conversion(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_users"]
        assert r["conv_ppm"] == (1_000_000 * r["n_converted"]) // r["n_users"]
    ev = table(spark, SF_DIR, "events")
    total = ev.select("user_id").distinct().count()
    per_arm_union = (
        ev.select((F.get_json_object("props", "$.k").cast("long") % 2)
                  .alias("arm"), "user_id")
        .select("user_id").distinct().count()
    )
    assert per_arm_union == total
    assert sum(r["n_users"] for r in rows) >= total  # arms may overlap
