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
