"""End-to-end DSL engine tests.

Strategy mirrors the reference's golden/e2e layer (SURVEY.md §5): run DSL
scripts over small deterministic CSVs and check outputs — plus a
differential oracle (DuckDB) for the p3challenge-shaped join query, the
same role MySQL played for the reference (p4challenge/p4challenge.sql).
"""

import random

import duckdb
import pytest

from kstore_spark.engine import Engine

random.seed(42)


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "db"))


@pytest.fixture(scope="module")
def challenge_csvs(tmp_path_factory):
    """t(ta..td), u(ua..ud) — the reference's challenge fixture shape
    (FIXTURES.md fixture 1), deterministic values."""
    d = tmp_path_factory.mktemp("csv")
    rng = random.Random(42)
    t_rows = [
        (rng.randint(0, 50), rng.choice([1000, rng.randint(0, 2000)]),
         rng.randint(0, 1_000_000), rng.randint(0, 1_000_000))
        for _ in range(500)
    ]
    u_rows = [
        (rng.randint(0, 50), rng.randint(0, 1_000_000),
         rng.randint(0, 1_000_000), rng.choice([9500, rng.randint(0, 20_000_000)]))
        for _ in range(300)
    ]
    _write_csv(d / "t.csv", ["ta", "tb", "tc", "td"], t_rows)
    _write_csv(d / "u.csv", ["ua", "ub", "uc", "ud"], u_rows)
    return str(d / "t.csv"), str(d / "u.csv")


def _load_challenge(engine, challenge_csvs, stypes=("unsorted",) * 8):
    t_csv, u_csv = challenge_csvs
    cols = ["ta", "tb", "tc", "td", "ua", "ub", "uc", "ud"]
    script = "\n".join(
        f'create({c},"{st}")' for c, st in zip(cols, stypes)
    ) + f'\nload("{t_csv}")\nload("{u_csv}")'
    engine.run_script(script)


def test_select_fetch_print(engine, spark, tmp_path):
    _write_csv(tmp_path / "a.csv", ["xa", "xb"], [(1, 10), (2, 20), (3, 30), (2, 40)])
    engine.run_script(
        f'create(xa,"unsorted")\ncreate(xb,"unsorted")\nload("{tmp_path / "a.csv"}")'
    )
    out = engine.run_script("v=select(xa,2)\nf=fetch(xb,v)\nprint(f)")
    assert out.split("\n") == ["20", "40"]  # ascending position order
    out = engine.run_script("print(v)")
    assert out.split("\n") == ["1", "3"]
    out = engine.run_script("r=select(xb,15,35)\nfetch(xa,r)")
    assert out.split("\n") == ["2", "3"]


def test_avg_truncates_like_c(engine, spark, tmp_path):
    # assts/p3.txt: insert 1 and 2 → avg prints 1 (integer division)
    engine.run_script('create(a,"unsorted")\ninsert(a,1)\ninsert(a,2)')
    out = engine.run_script("s=select(a)\nf=fetch(a,s)\nprint_avg=avg(f)\nprint(print_avg)")
    assert out == "1"


def test_agg_empty_identities(engine, spark, tmp_path):
    engine.run_script('create(e,"unsorted")')
    out = engine.run_script("s=select(e)\nf=fetch(e,s)\nmn=min(f)\nmx=max(f)\nprint(mn)\nprint(mx)")
    assert out.split("\n") == [str(2**31 - 1), str(-(2**31))]


def test_math_c_semantics(engine, spark, tmp_path):
    _write_csv(tmp_path / "m.csv", ["ma", "mb"], [(7, 2), (-7, 2), (7, -2), (2**31 - 1, 1)])
    engine.run_script(
        f'create(ma,"unsorted")\ncreate(mb,"unsorted")\nload("{tmp_path / "m.csv"}")'
    )
    out = engine.run_script(
        "s=select(ma)\nfa=fetch(ma,s)\nfb=fetch(mb,s)\nq=div(fa,fb)\nprint(q)"
    )
    # C division truncates toward zero: -7/2 = -3, 7/-2 = -3
    assert out.split("\n") == ["3", "-3", "-3", str(2**31 - 1)]
    out = engine.run_script("p=add(fa,fb)\nprint(p)")
    # INT32_MAX + 1 wraps to INT32_MIN
    assert out.split("\n") == ["9", "-5", "5", str(-(2**31))]
    out = engine.run_script("m=mul(fa,fb)\nprint(m)")
    assert out.split("\n") == ["14", "-14", "-14", str(2**31 - 1)]


def test_storage_type_equivalence(spark, tmp_path, challenge_csvs):
    """Same query, all three storage types → identical results
    (reference p2 tests, FIXTURES.md fixture 4)."""
    outs = []
    for i, st in enumerate(("unsorted", "sorted", "b+tree")):
        e = Engine(spark, str(tmp_path / f"db{i}"))
        _load_challenge(e, challenge_csvs, stypes=(st,) * 8)
        outs.append(e.run_script("v=select(tb,900,1100)\nf=fetch(td,v)\nprint(f)"))
    assert outs[0] == outs[1] == outs[2]


JOIN_SCRIPT = """
tb_select=select(tb,1000)
ta_fetch=fetch(ta,tb_select)
ud_select=select(ud,9000,9000000)
ua_fetch=fetch(ua,ud_select)
t_id,u_id={algo}join(ta_fetch,ua_fetch)
td_fetch=fetch(td,t_id)
td_avg=avg(td_fetch)
uc_fetch=fetch(uc,u_id)
uc_avg=avg(uc_fetch)
tuple(td_avg,uc_avg)
"""

ORACLE_SQL = """
SELECT CAST(AVG_T AS BIGINT) || ',' || CAST(AVG_U AS BIGINT) FROM (
  SELECT TRUNC(SUM(t.td) / COUNT(*)) AS AVG_T, TRUNC(SUM(u.uc) / COUNT(*)) AS AVG_U
  FROM 't.csv' t, 'u.csv' u
  WHERE t.ta = u.ua AND t.tb = 1000 AND u.ud BETWEEN 9000 AND 9000000
)
"""


@pytest.mark.parametrize("algo", ["hash", "sort", "tree", "loop"])
def test_p3challenge_shape_vs_duckdb(spark, tmp_path, challenge_csvs, algo):
    """The reference's canonical p3challenge query (FIXTURES.md fixture 1)
    against a DuckDB oracle; all four join algorithms must agree."""
    t_csv, u_csv = challenge_csvs
    e = Engine(spark, str(tmp_path / "db"))
    _load_challenge(e, challenge_csvs)
    out = e.run_script(JOIN_SCRIPT.format(algo=algo))
    expected = duckdb.sql(
        ORACLE_SQL.replace("'t.csv'", f"'{t_csv}'").replace("'u.csv'", f"'{u_csv}'")
    ).fetchone()[0]
    assert out == f"({expected})"


def test_mutations_p4_shape(spark, tmp_path, challenge_csvs):
    """Insert → delete-by-range → update-by-range, re-running the join
    query after each stage, all checked against DuckDB applying the same
    mutations (the reference's p4challenge staged goldens)."""
    t_csv, u_csv = challenge_csvs
    e = Engine(spark, str(tmp_path / "db"))
    _load_challenge(e, challenge_csvs)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE t AS SELECT * FROM '{t_csv}'")
    con.sql(f"CREATE TABLE u AS SELECT * FROM '{u_csv}'")

    def check():
        got = e.run_script(JOIN_SCRIPT.format(algo="hash"))
        exp = con.sql(
            "SELECT CAST(TRUNC(SUM(t.td)/COUNT(*)) AS BIGINT) || ',' || "
            "CAST(TRUNC(SUM(u.uc)/COUNT(*)) AS BIGINT) "
            "FROM t, u WHERE t.ta=u.ua AND t.tb=1000 AND u.ud BETWEEN 9000 AND 9000000"
        ).fetchone()[0]
        assert got == f"({exp})"

    check()
    e.run_script("insert(ta,5,tb,1000,tc,1,td,777777)")
    con.sql("INSERT INTO t VALUES (5,1000,1,777777)")
    check()
    e.run_script("d=select(td,0,99999)\ndelete(d,ta,tb,tc,td)")
    con.sql("DELETE FROM t WHERE td BETWEEN 0 AND 99999")
    check()
    e.run_script("uu=select(ub,500001,2147483647)\nupdate(uu,uc,10000)")
    con.sql("UPDATE u SET uc=10000 WHERE ub BETWEEN 500001 AND 2147483647")
    check()


def test_tuple_multi_vector(engine, spark, tmp_path):
    _write_csv(tmp_path / "z.csv", ["za", "zb"], [(1, 10), (5, 50), (3, 30)])
    engine.run_script(
        f'create(za,"unsorted")\ncreate(zb,"unsorted")\nload("{tmp_path / "z.csv"}")'
    )
    out = engine.run_script("s=select(za)\nfa=fetch(za,s)\nfb=fetch(zb,s)\ntuple(fa,fb)")
    assert out.split("\n") == ["(1,10)", "(5,50)", "(3,30)"]
