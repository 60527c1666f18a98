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
