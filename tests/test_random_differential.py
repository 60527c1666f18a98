"""Randomized differential testing: a seeded random sequence of
mutations (insert / delete-by-range / update-by-range) interleaved with
query checks, mirrored step-for-step into DuckDB — the fuzz analogue of
the staged p4 goldens. Catches interaction bugs no hand-written fixture
pins (mutation-on-mutation, empty ranges, duplicate keys, whole-column
deletes)."""

import random

import duckdb
import pytest

from kstore_spark.engine import Engine

N_STEPS = 24
V = 900  # value domain; small so int32 sums can't wrap (C-sum == SQL SUM)


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def _check(e, con):
    """Compare the canonical join-agg query and per-column aggregates."""
    # per-column count/sum/min/max over ka (skip min/max sentinels when empty)
    cnt, s = con.sql("SELECT COUNT(ka), COALESCE(SUM(ka),0) FROM t").fetchone()
    out = e.run_script("q=select(ka)\nf=fetch(ka,q)\nc=count(f)\nprint(c)")
    assert out == str(cnt)
    out = e.run_script("sm=sum(f)\nprint(sm)")
    assert out == str(s)
    if cnt:
        mn, mx = con.sql("SELECT MIN(kb), MAX(kb) FROM t").fetchone()
        out = e.run_script("q2=select(kb)\nf2=fetch(kb,q2)\nmn=min(f2)\nmx=max(f2)\nprint(mn)\nprint(mx)")
        assert out.split("\n") == [str(mn), str(mx)]
    # join query with duplicates multiplicity
    row = con.sql(
        "SELECT COUNT(*), COALESCE(SUM(t.kb),0), COALESCE(SUM(u.lb),0) "
        "FROM t, u WHERE t.ka = u.la"
    ).fetchone()
    out = e.run_script(
        "sa=select(ka)\nfa=fetch(ka,sa)\n"
        "sb=select(la)\nfb=fetch(la,sb)\n"
        "ti,ui=hashjoin(fa,fb)\n"
        "jb=fetch(kb,ti)\njc=fetch(lb,ui)\n"
        "c=count(jb)\ns1=sum(jb)\ns2=sum(jc)\nprint(c)\nprint(s1)\nprint(s2)"
    )
    assert out.split("\n") == [str(row[0]), str(row[1]), str(row[2])]


@pytest.mark.parametrize("seed", [7, 2026])
def test_random_mutation_sequence_matches_duckdb(spark, tmp_path, seed):
    rng = random.Random(seed)
    t_rows = [(rng.randrange(V), rng.randrange(V)) for _ in range(150)]
    u_rows = [(rng.randrange(V), rng.randrange(V)) for _ in range(100)]
    _write_csv(tmp_path / "t.csv", ["ka", "kb"], t_rows)
    _write_csv(tmp_path / "u.csv", ["la", "lb"], u_rows)

    e = Engine(spark, str(tmp_path / f"db{seed}"), load_dir=str(tmp_path))
    e.run_script(
        "\n".join(f'create({c},"unsorted")' for c in ("ka", "kb", "la", "lb"))
        + '\nload("t.csv")\nload("u.csv")'
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE t(ka INT, kb INT); CREATE TABLE u(la INT, lb INT)")
    con.executemany("INSERT INTO t VALUES (?,?)", t_rows)
    con.executemany("INSERT INTO u VALUES (?,?)", u_rows)

    _check(e, con)
    for step in range(N_STEPS):
        table, (c1, c2) = rng.choice([("t", ("ka", "kb")), ("u", ("la", "lb"))])
        kind = rng.choice(["insert", "delete", "update"])
        if kind == "insert":
            v1, v2 = rng.randrange(V), rng.randrange(V)
            e.run_script(f"insert({c1},{v1},{c2},{v2})")
            con.sql(f"INSERT INTO {table} VALUES ({v1},{v2})")
        elif kind == "delete":
            lo = rng.randrange(V)
            hi = min(lo + rng.randrange(V // 4), V - 1)
            sel = rng.choice([c1, c2])
            e.run_script(f"d=select({sel},{lo},{hi})\ndelete(d,{c1},{c2})")
            con.sql(f"DELETE FROM {table} WHERE {sel} BETWEEN {lo} AND {hi}")
        else:
            lo = rng.randrange(V)
            hi = min(lo + rng.randrange(V // 4), V - 1)
            sel, tgt = (c1, c2) if rng.random() < 0.5 else (c2, c1)
            val = rng.randrange(V)
            e.run_script(f"p=select({sel},{lo},{hi})\nupdate(p,{tgt},{val})")
            con.sql(f"UPDATE {table} SET {tgt}={val} WHERE {sel} BETWEEN {lo} AND {hi}")
        if step % 6 == 5:
            _check(e, con)
    _check(e, con)
