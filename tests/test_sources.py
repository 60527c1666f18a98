"""Source-format extensions: load() ingests parquet and JSON-lines with
the same row-aligned group semantics as CSV."""

from kstore_spark.engine import Engine


def test_load_parquet(spark, tmp_path):
    import pandas as pd

    pd.DataFrame({"pa": [5, 6, 7], "pb": [50, 60, 70]}).to_parquet(tmp_path / "t.parquet")
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script(
        f'create(pa,"unsorted")\ncreate(pb,"unsorted")\nload("{tmp_path / "t.parquet"}")'
    )
    out = e.run_script("v=select(pa,6,7)\nf=fetch(pb,v)\nprint(f)")
    assert out.split("\n") == ["60", "70"]


def test_load_jsonl(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"ja": 1, "jb": 10}\n{"ja": 2, "jb": 20}\n')
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script(f'create(ja,"unsorted")\ncreate(jb,"unsorted")\nload("{p}")')
    out = e.run_script("v=select(ja,2)\nf=fetch(jb,v)\nprint(f)")
    assert out == "20"


def test_load_orc(spark, tmp_path):
    src = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "oa int, ob int")
    src.write.orc(str(tmp_path / "t.orc"))
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script(
        f'create(oa,"unsorted")\ncreate(ob,"unsorted")\nload("{tmp_path / "t.orc"}")'
    )
    out = e.run_script("v=select(oa,2,3)\nf=fetch(ob,v)\nprint(f)")
    assert sorted(out.split("\n")) == ["20", "30"]


def test_load_tsv(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("ta\ttb\n1\t100\n2\t200\n")
    e = Engine(spark, str(tmp_path / "db"))
    e.run_script(f'create(ta,"unsorted")\ncreate(tb,"unsorted")\nload("{p}")')
    out = e.run_script("v=select(ta,2)\nf=fetch(tb,v)\nprint(f)")
    assert out == "200"
