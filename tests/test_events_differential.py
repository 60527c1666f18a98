"""Randomized differential testing for the events analytics surface —
the surface the round-2 testdata encoding change broke. Seeded random
event streams with planted edge cases (timestamp TIES within a user,
single-event users, users missing funnel steps, empty-type buckets,
null-ish JSON props) run through every self-contained events operator
in Spark AND its DuckDB oracle on the same parquet file.
"""

from __future__ import annotations

import datetime
import json
import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SEEDS = (5, 19)
TYPES = ("signup", "view", "purchase", "click")


def _gen_events(seed: int):
    rng = random.Random(seed)
    base = 1_700_000_000_000_000  # epoch µs
    rows = []
    eid = 0
    for user in range(12):
        n = rng.choice((1, 2, 6, 30))
        ts = base
        for _ in range(n):
            # gaps straddle the 30-min sessionization boundary; 0-gaps
            # plant exact timestamp ties within a user
            ts += rng.choice((0, 1, 60, 1799, 1800, 1801, 7200)) * 1_000_000
            props = json.dumps({"k": rng.randrange(100)}) \
                if rng.random() < 0.7 else "{}"
            # value ∈ [0,1) is LOAD-BEARING (ADVICE r9): the attribution
            # models split cents with Spark `div` (truncate toward zero)
            # vs DuckDB `//` (floor) — identical only for cents >= 0.
            # test_events_value_nonnegative_invariant pins the same
            # invariant on the driver's real testdata; a generator that
            # starts emitting refunds must switch both engines to an
            # explicit floor first.
            rows.append((eid, ts, user, rng.choice(TYPES),
                         rng.random(), props))
            eid += 1
    return rows


def _write(dirpath, rows):
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }),
        f"{dirpath}/events.parquet",
    )


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


_OPS = ("events_by_type", "events_hourly", "events_sessionize",
        "events_gapfill", "events_gapfill_locf", "events_funnel",
        "events_user_overlap", "events_asof", "events_json_extract",
        "events_distinct_users", "events_range_join", "events_retention",
        "events_anomaly_hours", "events_top_paths",
        "events_cumulative_users", "events_funnel_windowed",
        # "{}" props (~30% of rows) exercise the NULL-arm bucket and
        # the null-safe join
        "events_ab_conversion",
        # last-touch attribution (r8): planted 0-gap timestamp ties
        # exercise the (ts, event_id) tie-break; 1-event users exercise
        # the 'direct' bucket; random doubles pin the row-local
        # cents truncation
        "events_attribution",
        # credit-horizon variant: the fuzzer's 7200 s gaps land on both
        # sides of the 24 h bound only via accumulation across events —
        # the lapse-to-direct branch still fires on 1-event users
        "events_attribution_windowed",
        # linear multi-touch (r9): multi-touch users split cents across
        # n horizon touches — random n exercises the integer-division
        # remainder drop in both engines; touchless purchases the
        # 'direct' full-credit branch
        "events_attribution_linear",
        # first-touch (r9): the acquisition-credit twin — same window,
        # FIRST-seen state; diverges from last-touch exactly on users
        # whose first and last touches differ, which the fuzzer plants
        # by construction on any ≥2-touch user
        "events_attribution_first",
        # U-shaped 40/20/40 (r9): random horizon-touch counts exercise
        # every weight branch (n=1 full, n=2 half/half, n≥3 ends+middles
        # with the truncating middle split) and the (sec, event_id)
        # first/last tie-break
        "events_attribution_position")


@pytest.mark.parametrize("seed", SEEDS)
def test_events_ops_differential(spark, tmp_path, seed):
    from kstore_spark.functions import sketches
    from kstore_spark.plans import analytics, extended, ranges

    queries = {**analytics.QUERIES, **extended.QUERIES, **sketches.QUERIES,
               **ranges.QUERIES}
    oracles = {**analytics.ORACLES, **extended.ORACLES, **sketches.ORACLES,
               **ranges.ORACLES}

    d = tmp_path / f"events{seed}"
    d.mkdir()
    _write(str(d), _gen_events(seed))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    for op in _OPS:
        df = queries[op](spark, str(d))
        got = _rowset(df.columns, [tuple(r) for r in df.collect()])
        res = con.execute(oracles[op])
        exp = _rowset([c[0] for c in res.description], res.fetchall())
        assert got == exp, f"{op} diverged at seed {seed}"


def test_events_value_nonnegative_invariant():
    """ADVICE r9: the attribution ppm splits use Spark `div`
    (truncate toward zero) where the DuckDB oracle uses `//` (floor);
    they agree iff cents >= 0. The non-negativity of events.value was
    documented but unguarded — pin it on every driver testdata scale.
    If a future testdata drop adds refunds (negative values), this
    fails loudly and both engines must move to an explicit floor."""
    import glob

    import pyarrow.compute as pc

    paths = sorted(glob.glob("/root/testdata/sf*/events.parquet"))
    # a silent empty glob would leave the invariant unenforced — fail
    # loudly so a relocated testdata root gets noticed, not skipped
    assert paths, "no /root/testdata/sf*/events.parquet found"
    for p in paths:
        t = pq.read_table(p, columns=["value"])
        mn = pc.min(t["value"]).as_py()
        assert mn is not None and mn >= 0.0, (p, mn)
