"""bench.py stdout contract (VERDICT r9 item 1).

Round 9's bench artifact came back ``parsed: null``: bench printed ONE
JSON line whose 78-key ``queries`` map grew past the driver's ~2,000-char
stdout tail, so the line's head (with ``metric``/``value``) was cut and
the round had no driver-side bench number. The r10 contract is: full map
to an early line + BENCH_FULL.json; FINAL line compact and bounded.
These tests pin the bound so key growth can never silently break the
driver channel again.
"""

from __future__ import annotations

import json

import bench


def _fake_times(n: int) -> dict:
    times = {f"some_long_headline_benchmark_key_{i:04d}": round(0.1 + i, 3)
             for i in range(n)}
    for a in ("hash", "sort", "tree", "loop"):
        times[f"kstore_perftest_{a}"] = 0.987
    return times


def test_compact_line_bounded_at_current_and_future_scale():
    # 78 keys broke r9; pin headroom to 500 keys with long names.
    for n in (78, 200, 500):
        line = bench.compact_line(_fake_times(n), 12345.678,
                                  "/root/testdata/sf0.1")
        assert len(line) < 1900, (n, len(line))


def test_compact_line_carries_gate_keys_and_total():
    times = _fake_times(90)
    line = bench.compact_line(times, 123.456, "/root/testdata/sf0.1")
    d = json.loads(line)
    assert d["metric"] == "total_bench_seconds"
    assert d["value"] == 123.456
    assert d["unit"] == "sec"
    assert d["n_keys"] == len(times)
    for a in ("hash", "sort", "tree", "loop"):
        assert f"kstore_perftest_{a}" in d["queries"]
    # top-5 expensive keys ride along for at-a-glance drift checks
    top5 = sorted(times, key=lambda k: -times[k])[:5]
    for k in top5:
        assert k in d["queries"]


def test_compact_line_is_valid_single_line_json():
    line = bench.compact_line(_fake_times(78), 1.0, "sf")
    assert "\n" not in line
    json.loads(line)


def test_compact_line_degrades_instead_of_dying_on_overflow():
    """ADVICE r10: an oversized compact line must DEGRADE (drop the
    queries block, keep metric/value/n_keys/full_map) — raising after
    the full map already printed would recreate the r9 parsed:null
    failure this contract exists to prevent."""
    times = _fake_times(60)
    # absurd key names blow the top-5 block past the 1900-char bound
    times["k" * 4000] = 99999.0
    line = bench.compact_line(times, 1.0, "sf")
    assert len(line) < 1900
    d = json.loads(line)
    assert d["metric"] == "total_bench_seconds"
    assert d["n_keys"] == len(times)
    assert d["full_map"] == "BENCH_FULL.json"


def test_every_bench_key_has_standing_evidence():
    """Registry hygiene (r10): a bench key whose name matches nothing
    in the evidence registries is either a typo or an op timed without
    any correctness trail. Every headline key must be (a) a driver
    oracled entry, (b) a pruned approximate entry (gate-evidenced via
    approx_equivalence_checks), or (c) directly gate-named in
    plans.checks.GATES (e.g. sim_ann_ivf_stored, which is benched and
    gated but was never a driver row). kstore_perftest_* keys are the
    baseline-gated reference workload, produced outside this dict."""
    import __spark_entry__ as entrymod
    from kstore_spark.plans import checks

    evidenced = (set(entrymod.queries()) | entrymod._PRUNED
                 | set(checks.GATES))
    unknown = set(bench.headline_queries()) - evidenced
    assert not unknown, f"bench keys with no evidence trail: {sorted(unknown)}"


def test_every_bench_key_has_plan_baseline():
    """Drift-adjudication hygiene (r12, VERDICT r11 item 7): every
    bench key — headline AND the four kstore_perftest_* reference
    keys — must have a committed plan snapshot under tools/plans/
    NAMED EXACTLY LIKE the key, so `tools/adjudicate_drift.py <key>`
    diffs against a baseline instead of silently writing a fresh one
    (the r11 gap: perftest tree/loop had none and hash/sort hid under
    a different prefix)."""
    import os

    plans = os.path.join(os.path.dirname(__file__), "..", "tools", "plans")
    keys = set(bench.headline_queries()) | {
        f"kstore_perftest_{a}" for a in ("hash", "sort", "tree", "loop")}
    missing = sorted(k for k in keys
                     if not os.path.exists(os.path.join(plans, f"{k}.txt")))
    assert not missing, f"bench keys with no plan baseline: {missing}"
