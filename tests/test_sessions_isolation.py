"""Multi-session behavior: the reference serves concurrent clients
against shared storage (threadpool + per-column rwlocks, SURVEY.md §3).
Here, sessions are separate Engine instances over one db_dir: variable
environments are isolated, data is shared, and a reader holding a plan
built before a copy-on-write mutation still sees a consistent snapshot.
"""

import pytest

from kstore_spark.engine import Engine, EngineError


def _mk(spark, tmp_path, name="db"):
    return Engine(spark, str(tmp_path / name))


def test_env_isolation_data_sharing(spark, tmp_path):
    a = _mk(spark, tmp_path)
    a.run_script('create(ca,"unsorted")\ninsert(ca,1)\ninsert(ca,2)\ninsert(ca,3)')
    b = Engine(spark, str(tmp_path / "db"))  # second session, same db
    # data visible across sessions
    assert b.run_script("s=select(ca)\nf=fetch(ca,s)\nprint(f)").split("\n") == ["1", "2", "3"]
    # but environments are private
    with pytest.raises(EngineError, match="undefined variable"):
        a.run_script("print(f)")


def test_snapshot_across_mutation(spark, tmp_path):
    a = _mk(spark, tmp_path)
    a.run_script('create(sa,"unsorted")\n' + "\n".join(f"insert(sa,{v})" for v in (10, 20, 30)))
    b = Engine(spark, str(tmp_path / "db"))
    b.run_script("s=select(sa,15,35)\nf=fetch(sa,s)")  # plan built pre-mutation
    a.run_script("d=select(sa,20,20)\ndelete(d,sa)")   # COW rewrite
    # a (the mutator) sees the new state
    assert a.run_script("s2=select(sa)\nf2=fetch(sa,s2)\nprint(f2)").split("\n") == ["10", "30"]
    # b, re-reading the catalog fresh, also sees committed state
    b2 = Engine(spark, str(tmp_path / "db"))
    assert b2.run_script("s=select(sa)\nf=fetch(sa,s)\nprint(f)").split("\n") == ["10", "30"]


def test_sixteen_concurrent_clients(spark, tmp_path):
    """The reference's server shape: 16 concurrent clients over one
    store (server.c threadpool + storage lock). Eight writers insert
    into private columns while eight readers run the select→fetch→avg
    chain over a shared column; every write must be durable and every
    read consistent (no torn catalog, no lost update)."""
    import threading

    db = str(tmp_path / "db")
    setup = Engine(spark, db)
    setup.run_script(
        'create(shared,"unsorted")\n'
        + "\n".join(f"insert(shared,{v})" for v in (10, 20, 30, 40))
    )
    for i in range(8):
        setup.run_script(f'create(w{i},"unsorted")')

    errs, reads = [], []

    def writer(i):
        try:
            e = Engine(spark, db)
            for k in range(3):
                e.run_script(f"insert(w{i},{100 * i + k})")
        except Exception as exc:
            errs.append(("w", i, exc))

    def reader(i):
        try:
            e = Engine(spark, db)
            out = e.run_script("s=select(shared)\nf=fetch(shared,s)\na=avg(f)\nprint(a)")
            reads.append(out)
        except Exception as exc:
            errs.append(("r", i, exc))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)] + [
        threading.Thread(target=reader, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert reads == ["25"] * 8  # (10+20+30+40)/4, truncating
    check = Engine(spark, db)
    for i in range(8):
        out = check.run_script(f"s=select(w{i})\nf=fetch(w{i},s)\nprint(f)")
        assert sorted(map(int, out.split("\n"))) == [100 * i, 100 * i + 1, 100 * i + 2]
