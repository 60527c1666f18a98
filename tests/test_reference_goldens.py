"""Run the reference's own challenge scripts VERBATIM against their
vendored .expected goldens (tests/golden/README.md for provenance).

Comparison rule mirrors the reference's test.sh:24-43: exact stdout
diff, falling back to line-sorted diff (result sets are order-
insensitive; formatting is not)."""

import os
import re

import pytest

from kstore_spark.engine import Engine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _read(name: str) -> str:
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()




def _golden_eq(got: str, expected: str) -> bool:
    g = [ln for ln in got.strip().split("\n") if ln]
    e = [ln for ln in expected.strip().split("\n") if ln]
    return g == e or sorted(g) == sorted(e)


def _normalize_tuples(text: str) -> str:
    # reference client prints "(575250,498194)"; ours matches — strip
    # any whitespace inside tuples so formatting cannot mask a value diff
    return re.sub(r"\s+", "", text)


def test_p3challenge_verbatim(spark, tmp_path):
    from tests.golden.challenge_data import write_csvs

    write_csvs(tmp_path)
    # load_dir ≈ the reference client's --loaddir: scripts run VERBATIM
    e = Engine(spark, str(tmp_path / "db"), load_dir=str(tmp_path))
    e.run_script(_read("p3_load.txt"))
    out = e.run_script(_read("p3challenge.txt"))
    expected = _read("p3challenge.expected")
    assert _golden_eq(_normalize_tuples(out), _normalize_tuples(expected))


def test_p4challenge_stages_verbatim(spark, tmp_path):
    """p4c-0 load + the six staged scripts, one engine session, each
    stage's output diffed against its golden in order."""
    from tests.golden.challenge_data import write_csvs

    write_csvs(tmp_path)
    e = Engine(spark, str(tmp_path / "db"), load_dir=str(tmp_path))
    e.run_script(_read("p4_load.txt"))
    for stage in range(1, 7):
        out = e.run_script(_read(f"p4c-{stage}.txt"))
        expected = _read(f"p4c-{stage}.expected")
        assert _golden_eq(_normalize_tuples(out), _normalize_tuples(expected)), (
            f"stage p4c-{stage}: got {out!r}, want {expected!r}"
        )


def test_p4challenge_composed_single_script(spark, tmp_path):
    """The reference's COMPOSED p4challenge.txt (reference p4challenge/
    p4challenge.txt — all six stages in one script: 5 inserts, a ranged
    delete, two ranged updates, and the six-tuple re-query sequence)
    run as ONE Engine.run_script call. This is the variant that
    exercises env/mutation interleaving inside a single session — bind
    names like ta_fetch are reassigned across stages while mutations
    shift positions under them (VERDICT r3 item 6)."""
    from tests.golden.challenge_data import write_csvs

    write_csvs(tmp_path)
    e = Engine(spark, str(tmp_path / "db"), load_dir=str(tmp_path))
    e.run_script(_read("p4_load.txt"))
    out = e.run_script(_read("p4challenge.txt"))
    expected = _read("p4challenge.expected")
    assert _golden_eq(_normalize_tuples(out), _normalize_tuples(expected)), (
        f"composed p4challenge: got {out!r}, want {expected!r}"
    )


def test_p4challenge_survives_restart_between_stages(spark, tmp_path):
    """Same staged run, but a fresh Engine (catalog re-open) before each
    stage — the reference keeps state server-side across client
    invocations; here durability rides on catalog.json + Parquet."""
    from tests.golden.challenge_data import write_csvs

    write_csvs(tmp_path)
    db = str(tmp_path / "db")
    Engine(spark, db, load_dir=str(tmp_path)).run_script(_read("p4_load.txt"))
    for stage in range(1, 7):
        out = Engine(spark, db).run_script(_read(f"p4c-{stage}.txt"))
        expected = _read(f"p4c-{stage}.expected")
        assert _golden_eq(_normalize_tuples(out), _normalize_tuples(expected)), (
            f"stage p4c-{stage} after reopen: got {out!r}, want {expected!r}"
        )
