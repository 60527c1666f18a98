"""Round-2 catalog behaviors: concurrent writers, snapshot isolation
across mutations, segment compaction, load reparent guard, all-JVM pos
assignment, and kill-and-reopen recovery.

Mirrors the reference's storage-lock serialization (storage.c:314,1115;
server.c:967-1006) and graceful-restart durability (assts/p2.txt:21-26)
on the Spark/Parquet substrate.
"""

import os
import threading

import pytest

from kstore_spark.catalog import Catalog, with_pos
from kstore_spark.engine import Engine


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


# -- concurrent writers ------------------------------------------------

def test_two_engines_compose_catalog_changes(spark, tmp_path):
    """Two Engines opened over one db_dir before either writes: each
    mutates a different column; BOTH mutations must be durable (without
    the locked reload, the second _save would clobber the first)."""
    db = str(tmp_path / "db")
    e1 = Engine(spark, db)
    e2 = Engine(spark, db)  # loads (empty) catalog before e1 writes
    e1.run_script('create(ca,"unsorted")\ninsert(ca,11)')
    e2.run_script('create(cb,"unsorted")\ninsert(cb,22)')  # stale in-memory view
    e3 = Engine(spark, db)  # fresh open sees the composed catalog
    assert e3.run_script("s=select(ca)\nf=fetch(ca,s)\nprint(f)") == "11"
    assert e3.run_script("s=select(cb)\nf=fetch(cb,s)\nprint(f)") == "22"


def test_threaded_engines_interleaved_inserts(spark, tmp_path):
    """Interleaved insert bursts from two threads/Engines on different
    columns: every row durable, positions dense per column."""
    db = str(tmp_path / "db")
    e1, e2 = Engine(spark, db), Engine(spark, db)
    e1.run_script('create(ta,"unsorted")')
    e2.run_script('create(tb,"unsorted")')
    errs = []

    def burst(eng, col, base):
        try:
            for i in range(5):
                eng.run_script(f"insert({col},{base + i})")
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    th1 = threading.Thread(target=burst, args=(e1, "ta", 100))
    th2 = threading.Thread(target=burst, args=(e2, "tb", 200))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs
    e3 = Engine(spark, db)
    out_a = e3.run_script("s=select(ta)\nf=fetch(ta,s)\nprint(f)").split("\n")
    out_b = e3.run_script("s=select(tb)\nf=fetch(tb,s)\nprint(f)").split("\n")
    assert sorted(map(int, out_a)) == [100, 101, 102, 103, 104]
    assert sorted(map(int, out_b)) == [200, 201, 202, 203, 204]


def test_same_column_inserts_from_two_engines_get_distinct_pos(spark, tmp_path):
    """Insert into the SAME column from two Engines: the locked
    read-modify-write must hand out distinct positions."""
    db = str(tmp_path / "db")
    e1, e2 = Engine(spark, db), Engine(spark, db)
    e1.run_script('create(sc,"unsorted")')
    e1.run_script("insert(sc,1)")
    e2.run_script("insert(sc,2)")  # e2's catalog was loaded before row 1
    e1.run_script("insert(sc,3)")
    e3 = Engine(spark, db)
    out = e3.run_script("s=select(sc)\nf=fetch(sc,s)\nprint(f)").split("\n")
    assert sorted(map(int, out)) == [1, 2, 3]  # no pos collision lost a row


# -- snapshot isolation across mutations (ADVICE high) -----------------

def test_bound_variable_survives_mutation_of_its_source(spark, tmp_path):
    """s=select(c); f=fetch(c,s); update(...); print(f) — the lazily
    bound vector must still read its pre-mutation snapshot (old segments
    are tombstoned, not deleted)."""
    e = Engine(spark, str(tmp_path / "db"))
    csv = tmp_path / "a.csv"
    _write_csv(csv, ["ka", "kb"], [(1, 10), (2, 20), (3, 30)])
    e.run_script(f'create(ka,"unsorted")\ncreate(kb,"unsorted")\nload("{csv}")')
    out = e.run_script(
        "s=select(ka)\nf=fetch(kb,s)\n"
        "u=select(ka,2)\nupdate(u,kb,999)\n"
        "print(f)"
    )
    # snapshot: values as of the fetch's bind time
    assert out.split("\n") == ["10", "20", "30"]
    # fresh read sees the mutation
    out2 = e.run_script("s2=select(ka,2)\nf2=fetch(kb,s2)\nprint(f2)")
    assert out2 == "999"


def test_second_mutation_round_on_detached_columns(spark, tmp_path):
    """The ADVICE crash scenario: mutate, re-select, mutate again —
    the second round reads segments the first round replaced."""
    e = Engine(spark, str(tmp_path / "db"))
    csv = tmp_path / "b.csv"
    _write_csv(csv, ["ma", "mb"], [(1, 10), (2, 20), (3, 30), (4, 40)])
    e.run_script(f'create(ma,"unsorted")\ncreate(mb,"unsorted")\nload("{csv}")')
    e.run_script("d=select(ma,1)\ndelete(d,ma,mb)")
    out = e.run_script(
        "p=select(mb,0,25)\nupdate(p,ma,7)\n"
        "s=select(ma)\nf=fetch(ma,s)\nprint(f)"
    )
    assert sorted(out.split("\n")) == ["3", "4", "7"]


# -- compaction + insert batching --------------------------------------

def test_insert_burst_compacts_segments(spark, tmp_path):
    """20 single-row inserts on a standalone column must not leave 20
    segments (size-tiered compaction folds the small ones)."""
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script('create(bc,"unsorted")')
    for i in range(20):
        e.run_script(f"insert(bc,{i})")
    m = e.catalog.meta("bc")
    assert len(m["segments"]) < 12  # 20 without compaction
    out = e.run_script("s=select(bc)\nf=fetch(bc,s)\nprint(f)").split("\n")
    assert [int(x) for x in out] == list(range(20))  # pos order preserved


def test_group_insert_writes_one_segment_per_op(spark, tmp_path):
    """A full-width insert into a loaded group appends ONE group segment
    (not one tiny per-column segment each) and keeps the group alive."""
    e = Engine(spark, str(tmp_path / "db"))
    csv = tmp_path / "g.csv"
    _write_csv(csv, ["ga", "gb", "gc"], [(1, 2, 3), (4, 5, 6)])
    e.run_script(
        f'create(ga,"unsorted")\ncreate(gb,"unsorted")\ncreate(gc,"unsorted")\nload("{csv}")'
    )
    before = len(e.catalog.groups["g_ga_gb_gc"]["segments"])
    e.run_script("insert(ga,7,gb,8,gc,9)")
    m = e.catalog.meta("ga")
    assert m["group"] == "g_ga_gb_gc"  # still grouped, not detached
    assert m["segments"] == []
    after = len(e.catalog.groups["g_ga_gb_gc"]["segments"])
    assert after == before + 1
    out = e.run_script("s=select(ga,7)\nf=fetch(gc,s)\nprint(f)")
    assert out == "9"


# -- load reparent guard (ADVICE medium) -------------------------------

def test_load_overlapping_column_set_raises(spark, tmp_path):
    """load (a,b) then load (a,c): reparenting a to a new group would
    orphan its g_a_b rows — must raise, not silently drop."""
    from kstore_spark.catalog import CatalogError

    e = Engine(spark, str(tmp_path / "db"))
    csv1, csv2, csv3 = tmp_path / "x1.csv", tmp_path / "x2.csv", tmp_path / "x3.csv"
    _write_csv(csv1, ["xa", "xb"], [(1, 2)])
    _write_csv(csv2, ["xc", "xd"], [(3, 4)])
    _write_csv(csv3, ["xa", "xc"], [(5, 6)])  # next_pos-aligned (both 1)
    e.run_script(
        "\n".join(f'create(x{c},"unsorted")' for c in "abcd")
        + f'\nload("{csv1}")\nload("{csv2}")'
    )
    with pytest.raises(Exception) as ei:
        e.run_script(f'load("{csv3}")')
    assert "orphan" in str(ei.value) or isinstance(ei.value, CatalogError)
    # original rows untouched in both groups
    assert e.run_script("s=select(xa)\nf=fetch(xb,s)\nprint(f)") == "2"
    assert e.run_script("s=select(xc)\nf=fetch(xd,s)\nprint(f)") == "4"


# -- all-JVM pos assignment (verdict #3) -------------------------------

def test_with_pos_is_all_jvm_and_dense(spark, tmp_path):
    pdf_path = str(tmp_path / "wp.parquet")
    spark.range(0, 10_000).selectExpr("id * 3 as v").write.parquet(pdf_path)
    df = spark.read.parquet(pdf_path)
    out = with_pos(df, offset=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ExistingRDD" not in plan
    rows = out.select("v", "pos").collect()
    assert len(rows) == 10_000
    poses = sorted(r["pos"] for r in rows)
    assert poses == list(range(5, 10_005))  # dense, offset applied


def test_with_pos_preserves_input_order(spark, tmp_path):
    """Single known-order file: pos must follow file order exactly."""
    csv = tmp_path / "ord.csv"
    order = [9, 3, 7, 1, 8, 2, 6, 0, 5, 4]
    _write_csv(csv, ["v"], [(x,) for x in order])
    df = spark.read.option("header", True).schema("v int").csv(str(csv))
    rows = with_pos(df).orderBy("pos").collect()
    assert [r["v"] for r in rows] == order


def test_with_pos_empty_frame(spark):
    df = spark.createDataFrame([], "v int")
    assert with_pos(df).count() == 0


# -- kill-and-reopen recovery (verdict gap #3) -------------------------

def test_restart_after_mutations_recovers_store(spark, tmp_path):
    """Build a multi-segment, post-mutation store; 'restart' by opening
    fresh Engine objects (new Catalog loads from disk only)."""
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    csv = tmp_path / "r.csv"
    _write_csv(csv, ["ra", "rb"], [(i, i * 10) for i in range(50)])
    e.run_script(f'create(ra,"unsorted")\ncreate(rb,"unsorted")\nload("{csv}")')
    e.run_script("insert(ra,50,rb,500)")
    e.run_script("d=select(ra,0,9)\ndelete(d,ra,rb)")
    e.run_script("u=select(ra,20,29)\nupdate(u,rb,1234)")
    expected = e.run_script("s=select(ra)\nf=fetch(rb,s)\nprint(f)")
    del e
    e2 = Engine(spark, db)  # fresh open: catalog.json + parquet only
    assert e2.run_script("s=select(ra)\nf=fetch(rb,s)\nprint(f)") == expected
    assert "1234" in expected and "500" in expected
