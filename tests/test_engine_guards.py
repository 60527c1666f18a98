"""Round-2 engine error semantics and provenance fixes.

- DBEDIVZERO / empty-avg guards are embedded in the op's expression and
  fire inside the observing action (no extra probe job); results that
  are never observed still error eagerly (reference per-op semantics,
  aggregate.c:18-22, 80-84).
- Cross-provenance math on misaligned vectors raises DBEINTERMDIFFLEN
  instead of silently intersecting (reference aggregate.c:100-115).
- A vector fetched with a join's RIGHT half carries right-half positions
  into later joins/mutations (ValVec.source_pos).
"""

import duckdb
import pytest

from kstore_spark.engine import Engine, EngineError


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "db"))


def _load(engine, tmp_path, name, header, rows):
    csv = tmp_path / f"{name}.csv"
    _write_csv(csv, header, rows)
    engine.run_script(
        "\n".join(f'create({c},"unsorted")' for c in header) + f'\nload("{csv}")'
    )


# -- division by zero ---------------------------------------------------

def test_division_by_zero_observed_raises(engine, tmp_path):
    _load(engine, tmp_path, "d", ["da", "db"], [(10, 2), (20, 0), (30, 5)])
    with pytest.raises(EngineError, match="DBEDIVZERO"):
        engine.run_script(
            "s=select(da)\nfa=fetch(da,s)\nfb=fetch(db,s)\nq=div(fa,fb)\nprint(q)"
        )


def test_division_by_zero_unobserved_still_raises(engine, tmp_path):
    """Assigned but never printed/consumed: the reference errors at the
    op itself, so the engine probes eagerly for unobserved results."""
    _load(engine, tmp_path, "e", ["ea", "eb"], [(10, 0)])
    with pytest.raises(EngineError, match="DBEDIVZERO"):
        engine.run_script(
            "s=select(ea)\nfa=fetch(ea,s)\nfb=fetch(eb,s)\nq=div(fa,fb)"
        )


def test_division_no_zero_divisor_ok(engine, tmp_path):
    _load(engine, tmp_path, "f", ["fa", "fb"], [(10, 2), (21, 3)])
    out = engine.run_script(
        "s=select(fa)\nva=fetch(fa,s)\nvb=fetch(fb,s)\nq=div(va,vb)\nprint(q)"
    )
    assert out.split("\n") == ["5", "7"]


def test_division_by_zero_via_tuple_raises(engine, tmp_path):
    _load(engine, tmp_path, "g", ["ga", "gb"], [(10, 0)])
    with pytest.raises(EngineError, match="DBEDIVZERO"):
        engine.run_script(
            "s=select(ga)\nva=fetch(ga,s)\nvb=fetch(gb,s)\nq=div(va,vb)\ntuple(va,q)"
        )


# -- empty avg ----------------------------------------------------------

def test_avg_empty_observed_raises(engine):
    engine.run_script('create(av,"unsorted")')
    with pytest.raises(EngineError, match="DBEDIVZERO"):
        engine.run_script("s=select(av)\nf=fetch(av,s)\na=avg(f)\nprint(a)")


def test_avg_empty_unobserved_still_raises(engine):
    engine.run_script('create(aw,"unsorted")')
    with pytest.raises(EngineError, match="DBEDIVZERO"):
        engine.run_script("s=select(aw)\nf=fetch(aw,s)\na=avg(f)")


def test_avg_nonempty_ok(engine):
    engine.run_script('create(ax,"unsorted")\ninsert(ax,1)\ninsert(ax,2)')
    out = engine.run_script("s=select(ax)\nf=fetch(ax,s)\na=avg(f)\nprint(a)")
    assert out == "1"


# -- misaligned math ----------------------------------------------------

def test_misaligned_math_raises_difflen(engine, tmp_path):
    """Operands fetched via different selects (different position sets):
    the reference raises DBEINTERMDIFFLEN; silently intersecting on pos
    would quietly drop rows."""
    _load(engine, tmp_path, "h", ["ha", "hb"], [(1, 10), (2, 20), (3, 30), (4, 40)])
    with pytest.raises(EngineError, match="DBEINTERMDIFFLEN"):
        engine.run_script(
            "s1=select(ha,1,2)\nf1=fetch(hb,s1)\n"
            "s2=select(ha,2,4)\nf2=fetch(hb,s2)\n"
            "m=add(f1,f2)\nprint(m)"
        )


def test_same_positions_different_selects_ok(engine, tmp_path):
    """Two selects that resolve to the SAME position set align fine."""
    _load(engine, tmp_path, "i", ["ia", "ib"], [(1, 10), (2, 20), (3, 30)])
    out = engine.run_script(
        "s1=select(ia,1,3)\nf1=fetch(ib,s1)\n"
        "s2=select(ib,5,35)\nf2=fetch(ia,s2)\n"
        "m=add(f1,f2)\nprint(m)"
    )
    assert out.split("\n") == ["11", "22", "33"]


# -- right-half fetch provenance (ADVICE medium) ------------------------

def test_three_way_join_via_right_half_fetch(engine, tmp_path):
    """t ⋈ u on ta=ua, then (u.ub) ⋈ v on ub=va, then fetch u.uc via the
    second join's LEFT half — which carries positions of table u. With
    the keys[0] bug this silently fetched with t positions."""
    t_rows = [(1, 0), (2, 0), (3, 0)]
    u_rows = [(1, 100, 7), (2, 200, 8), (3, 300, 9), (4, 400, 10)]
    v_rows = [(100, 0), (300, 0)]
    _load(engine, tmp_path, "t3", ["ta", "tb"], t_rows)
    _load(engine, tmp_path, "u3", ["ua", "ub", "uc"], u_rows)
    _load(engine, tmp_path, "v3", ["va", "vb"], v_rows)
    out = engine.run_script(
        "st=select(ta)\nft=fetch(ta,st)\n"
        "su=select(ua)\nfu=fetch(ua,su)\n"
        "tid,uid=hashjoin(ft,fu)\n"
        "fub=fetch(ub,uid)\n"
        "sv=select(va)\nfv=fetch(va,sv)\n"
        "jl,jr=hashjoin(fub,fv)\n"
        "fuc=fetch(uc,jl)\n"
        "sm=sum(fuc)\nprint(sm)"
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE t(ta INT, tb INT); CREATE TABLE u(ua INT, ub INT, uc INT); "
            "CREATE TABLE v(va INT, vb INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", t_rows)
    con.executemany("INSERT INTO u VALUES (?, ?, ?)", u_rows)
    con.executemany("INSERT INTO v VALUES (?, ?)", v_rows)
    expected = con.sql(
        "SELECT SUM(u.uc) FROM t JOIN u ON t.ta=u.ua JOIN v ON u.ub=v.va"
    ).fetchone()[0]
    assert out == str(expected)  # 7 + 9 = 16


def test_delete_via_right_half_positions(engine, tmp_path):
    """delete with a join's right-half vector must delete the RIGHT
    table's rows."""
    _load(engine, tmp_path, "p", ["pa"], [(1,), (2,)])
    _load(engine, tmp_path, "q", ["qa", "qb"], [(2, 20), (3, 30)])
    engine.run_script(
        "sp=select(pa)\nfp=fetch(pa,sp)\n"
        "sq=select(qa)\nfq=fetch(qa,sq)\n"
        "lp,rq=hashjoin(fp,fq)\n"
        "fqv=fetch(qb,rq)\n"
        "delete(fqv,qa,qb)"
    )
    out = engine.run_script("s=select(qa)\nf=fetch(qb,s)\nprint(f)")
    assert out == "30"  # row (2,20) matched the join and was deleted
