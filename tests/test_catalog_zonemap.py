"""Catalog zone maps: per-segment [min, max] of ``val`` recorded from
Parquet footers at write time, used by ``Catalog.read(column, lo, hi)``
to drop non-overlapping segments BEFORE Spark plans the scan.

This is the catalog-level complement of Parquet row-group pruning (which
only helps after listing + task planning) and the Spark equivalent of
the reference's sorted-index/b+tree skip-scan (storage.c:928-1049,
462-560): a select touches only the segments whose value range can
match. Results are pruning-independent — the caller still applies the
predicate.
"""

from pyspark.sql import functions as F

from kstore_spark.catalog import Catalog
from kstore_spark.engine import Engine
from kstore_spark.operators.types import POS, VAL


def _seg_df(spark, lo, hi, pos0):
    return (
        spark.range(lo, hi)
        .select(
            (F.col("id") - lo + pos0).cast("long").alias(POS),
            F.col("id").cast("int").alias(VAL),
        )
    )


def test_read_prunes_disjoint_segments(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "db"))
    cat.create("c", "sorted")
    for i, (lo, hi) in enumerate([(0, 100), (1000, 1100), (2000, 2100)]):
        cat.append_segment("c", _seg_df(spark, lo, hi, i * 100), rows=100)
    m = cat.meta("c")
    assert len(m["segments"]) == 3
    assert all(m["stats"][s] is not None for s in m["segments"])

    full = cat.read("c")
    pruned = cat.read("c", lo=1050, hi=1060)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # every surviving file belongs to the one overlapping segment
    assert all("/c/" in f for f in pruned.inputFiles())
    got = sorted(r[VAL] for r in pruned.filter(F.col(VAL).between(1050, 1060)).collect())
    assert got == list(range(1050, 1061))

    # point lookup prunes to one segment too
    point = cat.read("c", lo=2050, hi=2050)
    assert len(point.inputFiles()) <= len(pruned.inputFiles())
    assert [r[VAL] for r in point.filter(F.col(VAL) == 2050).collect()] == [2050]


def test_no_stats_means_no_pruning(spark, tmp_path):
    """A segment without a zone map must always be scanned."""
    cat = Catalog(spark, str(tmp_path / "db"))
    cat.create("c", "unsorted")
    cat.append_segment("c", _seg_df(spark, 0, 50, 0), rows=50)
    with cat._locked():
        cat.meta("c")["stats"] = {}  # simulate a pre-zonemap catalog
        cat._save()
    # read() never filters rows (the caller applies the predicate) —
    # without stats the bounded read must scan every file
    assert cat.read("c", lo=9999, hi=9999).count() == 50
    assert len(cat.read("c", lo=9999, hi=9999).inputFiles()) == len(cat.read("c").inputFiles())


def test_engine_select_uses_pruned_scan(spark, tmp_path):
    """End-to-end: a select over a mutated (detached, multi-segment)
    column returns the same result the reference would, and the pruned
    scan reads fewer files than the column holds."""
    eng = Engine(spark, str(tmp_path / "db"))
    eng.run_script('create(zc,"unsorted")\n')
    for v in (5, 500_000, 900_000):  # three single-row delta segments
        eng.run_script(f"insert(zc,{v})\n")
    out = eng.run_script("s=select(zc,500000,500000)\nf=fetch(zc,s)\nprint(f)\n")
    assert out.strip() == "500000"
    # the pruned read plans fewer files than the full column scan
    full_files = len(eng.catalog.read("zc").inputFiles())
    pruned_files = len(eng.catalog.read("zc", lo=500_000, hi=500_000).inputFiles())
    assert pruned_files < full_files


def test_zonemap_survives_reopen_and_compaction(spark, tmp_path):
    db = str(tmp_path / "db")
    cat = Catalog(spark, db)
    cat.create("c", "sorted")
    for i in range(3):
        cat.append_segment("c", _seg_df(spark, i * 1000, i * 1000 + 10, i * 10), rows=10)
    reopened = Catalog(spark, db)
    m = reopened.meta("c")
    assert set(m.get("stats", {})) == set(m["segments"])
    # force a compaction: stats map must track the merged segment set
    reopened._COMPACT_MIN = 2
    reopened.append_segment("c", _seg_df(spark, 5000, 5010, 30), rows=10)
    m = reopened.meta("c")
    assert set(m["stats"]) == set(m["segments"])
    assert reopened.read("c", lo=5000, hi=5005).filter(F.col(VAL) == 5001).count() == 1


def test_group_segments_pruned_on_select(spark, tmp_path):
    """Group storage (the default path): two loads create two group
    segments with disjoint value ranges; a value select prunes to the
    matching segment BEFORE the scan, and the provenance chain (sibling
    fetch off the filtered frame) stays correct."""
    e = Engine(spark, str(tmp_path / "db"))
    for name, rows in (
        ("a.csv", [(i, i + 10_000) for i in range(100)]),
        ("b.csv", [(i + 500_000, i + 510_000) for i in range(100)]),
    ):
        p = tmp_path / name
        with open(p, "w") as f:
            f.write("ga,gb\n")
            f.writelines(f"{x},{y}\n" for x, y in rows)
        e.run_script(f'create(ga,"unsorted")\ncreate(gb,"unsorted")\nload("{p}")')

    grp = e.catalog.groups[e.catalog.meta("ga")["group"]]
    assert len(grp["segments"]) == 2
    assert all(grp["stats"][s]["ga"] is not None for s in grp["segments"])

    pruned = e.catalog.group_prov("ga", lo=500_005, hi=500_005).frame
    full = e.catalog.group_prov("ga").frame
    assert len(pruned.inputFiles()) < len(full.inputFiles())

    # end-to-end through the engine: select on ga, fetch sibling gb
    out = e.run_script("s=select(ga,500005,500005)\nf=fetch(gb,s)\nprint(f)")
    assert out.strip() == "510005"
    # a select with no matching segment is provably empty, zero files
    out2 = e.run_script("s2=select(ga,999999)\nf2=fetch(ga,s2)\nc=count(f2)\nprint(c)")
    assert out2.strip() == "0"


def test_pruned_files_flat_in_segment_count(spark, tmp_path):
    """The PERF.md scale-curve invariant (round 5): a zone-mapped range
    read lists ONE segment's files however many disjoint segments the
    column has — listing cost is what grows at 100 TB, and pruning
    must remove it, not just the row-group scan. Compaction is disabled
    to model large immutable segments (the compaction-bounds-churn
    invariant is pinned separately below)."""
    cat = Catalog(spark, str(tmp_path / "db"))
    cat._COMPACT_MIN = 10**9
    cat.create("c", "sorted")
    counts = {}
    for n_target in (4, 16, 48):
        while len(cat.meta("c")["segments"]) < n_target:
            i = len(cat.meta("c")["segments"])
            cat.append_segment("c", _seg_df(spark, i * 1000, i * 1000 + 100, i * 100),
                               rows=100)
        pruned = cat.read("c", lo=5, hi=7)  # inside segment 0 only
        counts[n_target] = len(pruned.inputFiles())
        assert len(cat.read("c").inputFiles()) >= n_target  # full listing grows
        assert [r[VAL] for r in pruned.filter(F.col(VAL).between(5, 7)).collect()] \
            == [5, 6, 7]
    # flat: same file count at 4, 16, and 48 segments
    assert len(set(counts.values())) == 1, counts


def test_compaction_bounds_live_segment_count(spark, tmp_path):
    """Size-tiered compaction folds small segments 8-at-a-time, so many
    tiny appends settle at a bounded live segment count (the probe
    measured 512 appends → ~16 live) — results unchanged."""
    cat = Catalog(spark, str(tmp_path / "db"))
    cat.create("c", "unsorted")
    for i in range(24):
        cat.append_segment("c", _seg_df(spark, i * 1000, i * 1000 + 50, i * 50),
                           rows=50)
    live = len(cat.meta("c")["segments"])
    assert live <= 10, live  # 24 appends, >=2 folds of 8
    got = sorted(r[VAL] for r in cat.read("c").collect())
    assert got == sorted(v for i in range(24) for v in range(i * 1000, i * 1000 + 50))
