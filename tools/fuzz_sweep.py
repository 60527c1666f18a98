"""Extended-seed differential sweep — run every Spark-vs-DuckDB fuzz
family on FRESH seeds beyond the committed pytest parametrization (the
r6 practice: the fixed seeds pin regressions; fresh seeds hunt for
input shapes the fixed corpora never show).

Usage: python tools/fuzz_sweep.py [seed ...]   (defaults below)

Reuses the test modules' own generators and assertions verbatim — a
divergence raises exactly as it would under pytest.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

DEFAULT_SEEDS = (101, 211, 307, 401, 503, 601)


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or list(DEFAULT_SEEDS)

    from kstore_spark.session import get_spark

    spark = get_spark("fuzz-sweep")
    spark.range(1).count()

    import test_events_differential as te
    import test_random_differential as tr
    import test_text_differential as tt
    import test_tpch_differential as tp

    families = (
        ("text", tt.test_text_ops_differential),
        ("corpus", tt.test_corpus_ops_differential),
        ("embeddings", tt.test_embedding_ops_differential),
        ("events", te.test_events_ops_differential),
        ("tpch", tp.test_tpch_ops_differential),
        ("mutation", tr.test_random_mutation_sequence_matches_duckdb),
    )
    base = pathlib.Path(tempfile.mkdtemp(prefix="fuzz_sweep_"))
    failures = []
    for seed in seeds:
        for name, fn in families:
            d = base / f"{name}_{seed}"
            d.mkdir(parents=True)
            t0 = time.time()
            try:
                fn(spark, d, seed)
                print(f"ok    {name} seed={seed} [{time.time() - t0:.1f}s]",
                      flush=True)
            except Exception as exc:  # report, keep sweeping
                failures.append((name, seed))
                print(f"FAIL  {name} seed={seed}: {exc}", flush=True)
    print(f"\n{len(failures)} failures" +
          (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
