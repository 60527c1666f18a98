"""Parser unit tests — modeled on the reference's parse_test.c strategy
(one case per grammar production + rejection cases), written fresh."""

import pytest

from kstore_spark.parser import ParseError, parse_line, parse_script


def test_create():
    op = parse_line('create(ta,"unsorted")')
    assert op.kind == "create" and op.args == {"column": "ta", "stype": "unsorted"}
    assert parse_line('create(x,"b+tree")').args["stype"] == "b+tree"
    assert parse_line('create(x,"sorted")').args["stype"] == "sorted"


def test_create_rejects_bad_type():
    with pytest.raises(ParseError):
        parse_line('create(x,"zorted")')


def test_load():
    assert parse_line('load("/tmp/foo.csv")').args == {"path": "/tmp/foo.csv"}


def test_select_forms():
    a = parse_line("select(ta)")
    assert a.kind == "select" and a.args["mode"] == "all" and a.assign == ()
    v = parse_line("v=select(ta,42)")
    assert v.args == {"column": "ta", "mode": "value", "value": 42} and v.assign == ("v",)
    r = parse_line("v=select(ta,-5,10)")
    assert r.args["low"] == -5 and r.args["high"] == 10


def test_fetch():
    op = parse_line("f=fetch(tb,v)")
    assert op.kind == "fetch" and op.args == {"column": "tb", "posvar": "v"}


def test_insert_multi_column():
    op = parse_line("insert(a,0,b,1,c,-2)")
    assert op.args["pairs"] == [("a", 0), ("b", 1), ("c", -2)]


def test_insert_odd_args_rejected():
    with pytest.raises(ParseError):
        parse_line("insert(a,0,b)")


def test_delete_update():
    d = parse_line("delete(t1,c,d,e,f)")
    assert d.args == {"posvar": "t1", "columns": ["c", "d", "e", "f"]}
    u = parse_line("update(t1,c,7)")
    assert u.args == {"posvar": "t1", "column": "c", "value": 7}


def test_aggs_and_math():
    assert parse_line("x=avg(v)").args == {"fn": "avg", "var": "v"}
    assert parse_line("min(v)").assign == ()
    m = parse_line("z=div(a,b)")
    assert m.args == {"fn": "div", "left": "a", "right": "b"}


def test_joins():
    op = parse_line("l,r=hashjoin(fa,fb)")
    assert op.kind == "join" and op.assign == ("l", "r") and op.args["algorithm"] == "hash"
    for kw in ("sortjoin", "treejoin", "loopjoin"):
        assert parse_line(f"a,b={kw}(x,y)").kind == "join"
    with pytest.raises(ParseError):
        parse_line("l=hashjoin(a,b)")  # must bind two vars


def test_tuple_print():
    assert parse_line("tuple(a,b,c)").args["vars"] == ["a", "b", "c"]
    assert parse_line("print(v)").args["var"] == "v"


def test_garbage_rejected():
    for bad in ["selec(ta)", "select(ta,1,2,3)", "fetch(ta)", "bogus", "tuple()"]:
        with pytest.raises(ParseError):
            parse_line(bad)


def test_script_skips_blank_and_comments():
    ops = parse_script("\n-- comment\nv=select(ta)\n\nprint(v)\n")
    assert [o.kind for o in ops] == ["select", "print"]


def test_explain_verb():
    op = parse_line("explain(v)")
    assert op.kind == "explain" and op.args["var"] == "v"


def test_round_trip_serialization():
    from kstore_spark.parser import op_to_string

    lines = [
        'create(ta,"b+tree")', 'load("/x/y.csv")', "insert(a,1,b,-2)",
        "delete(p,c,d)", "update(p,c,7)", "v=select(ta)", "v=select(ta,3)",
        "v=select(ta,-1,9)", "f=fetch(tb,v)", "m=avg(f)", "z=div(f,g)",
        "l,r=hashjoin(a,b)", "l,r=saltjoin(a,b)", "tuple(a,b)", "print(v)",
        "explain(v)",
    ]
    for line in lines:
        op = parse_line(line)
        assert op_to_string(op) == line, line
        assert parse_line(op_to_string(op)) == op
