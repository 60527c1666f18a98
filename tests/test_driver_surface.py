"""Smoke test over the FULL driver surface (VERDICT r2 item 2).

Round 2 shipped a bench-killing regression (events.parquet changed its
timestamp encoding; only one read path handled it) that no test caught,
because no test ran every ``queries()`` entry against the driver's
actual testdata. This is that test: every entry — batch and streaming —
must at least produce one row-batch at sf0.001 without raising. It is
the Spark analogue of the reference's run-every-golden discipline
(reference test.sh:24-43 runs all challenge scripts on every invocation,
no sampling window).

Deliberately rows-only: value correctness is the DuckDB oracle's job
(CORRECTNESS_r{N}.json); this test only guarantees "no queries() entry
can ship unrunnable".
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    fn = _QUERIES[name]
    # Streaming entries run to completion internally (availableNow →
    # memory sink) and return a batch DataFrame, so one code path works
    # for the whole surface.
    rows = fn(spark, SF_DIR).limit(1).collect()
    assert rows is not None  # ≥0 rows with a materializable schema


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.limit(1).collect() is not None


def test_oracle_keys_subset_of_queries():
    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert o <= q, f"oracle-only keys: {sorted(o - q)}"


def test_priority_window_invariants():
    """ADVICE r9: nothing guarded the 50-entry _PRIORITY window — a
    typo'd name was silently skipped (``if k in merged``) and an
    arbitrary tail entry filled the verification slot instead of the
    planned one. Pin the invariants: exactly 50 names, no duplicates,
    every name resolves in queries() AND oracle_sql(), and the window
    actually occupies the first 50 slots of both dicts."""
    pri = entrymod._PRIORITY
    assert len(pri) == 50
    assert len(set(pri)) == 50, "duplicate _PRIORITY entries"
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(pri) <= set(q), f"unresolved in queries(): {sorted(set(pri) - set(q))}"
    assert set(pri) <= set(o), f"unresolved in oracle_sql(): {sorted(set(pri) - set(o))}"
    assert list(q)[:50] == pri
    assert list(o)[:50] == pri
    assert not (set(pri) & entrymod._PRUNED), "pruned entry in window"


def _newest_green(max_round):
    """newest driver-green round per entry, from the committed
    CORRECTNESS_r*.json files with round <= max_round."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest = {}
    rounds_seen = []
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rounds_seen.append(rnd)
        if rnd > max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            # hash_match where an oracle ran; rows_match for the weaker
            # rows-only form the driver records without oracle_sql
            if row.get("hash_match", row.get("rows_match")):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, max(rounds_seen)


def test_priority_window_staleness():
    """VERDICT r11 wrong #1: for four rounds the window chased the
    wrong "oldest cohort" (r8, then r9) while 28 entries' newest
    driver-green row sat at r7, because the rotation notes were
    arithmetic-from-memory instead of computed from the committed
    CORRECTNESS files. Make the stalest-first policy mechanical:

    1. Recompute newest-green per entry over files <= the declared
       evidence basis (``_WINDOW_BASIS_ROUND``) and assert no
       non-suite-covered surface entry OUTSIDE the window is staler
       than every windowed entry that has history — i.e. the window
       really contains the globally stalest cohort at build time.
    2. Assert the basis lags the newest committed file by at most one
       round (the driver writes r{N} only after the r{N} window is
       final), so a window that stops rotating fails the suite the
       following round.

    Entries with NO history (landed post-window, queued for the next
    rotation per the land-late pattern) are exempt from (1) — their
    forcing function is the queue note plus this test next round."""
    from kstore_spark.plans import kparity

    newest, max_on_disk = _newest_green(entrymod._WINDOW_BASIS_ROUND)
    assert max_on_disk - entrymod._WINDOW_BASIS_ROUND <= 1, (
        f"window basis r{entrymod._WINDOW_BASIS_ROUND} is stale: "
        f"CORRECTNESS_r{max_on_disk:02d}.json is committed — rotate "
        "the window and bump _WINDOW_BASIS_ROUND"
    )
    suite_covered = set().union(*kparity._SUITES.values())
    surface = set(entrymod.queries())
    window = set(entrymod._PRIORITY)
    floor = min(newest[k] for k in window if k in newest)
    stale_outside = sorted(
        k
        for k in surface - window - suite_covered
        if k in newest and newest[k] < floor
    )
    assert not stale_outside, (
        f"entries outside the window are staler (< r{floor}, the "
        f"window's own floor): {stale_outside}"
    )
