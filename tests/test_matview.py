"""Incrementally-maintained materialized aggregate over a catalog column:
refresh work bounded by new data; mutations invalidate and rebuild."""

from pyspark.sql import functions as F

from kstore_spark.engine import Engine
from kstore_spark.streaming.matview import MatView


def _expected(engine, column, width=100):
    df = engine.catalog.read(column)
    return {
        r["bucket"]: (r["n"], r["s"]) for r in df.groupBy(
            F.floor(F.col("val") / width).cast("long").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast("long")).alias("s"),
        ).collect()
    }


def _got(view):
    return {r["bucket"]: (r["n"], r["s"]) for r in view.read().collect()}


def test_matview_incremental_and_invalidation(spark, tmp_path):
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    e.run_script('create(mv,"unsorted")')
    for v in (5, 105, 205, 15):
        e.run_script(f"insert(mv,{v})")

    view = MatView(spark, db, "mv", str(tmp_path / "view"))
    view.refresh()
    assert _got(view) == _expected(e, "mv")
    first_rows = view.last_batch_rows
    assert first_rows == 4

    # incremental: a second refresh after 2 inserts touches ONLY new rows
    e.run_script("insert(mv,110)")
    e.run_script("insert(mv,9)")
    view.refresh()
    assert view.last_batch_rows == 2  # not 6 — no rescan of old segments
    assert _got(view) == _expected(e, "mv")

    # no-op refresh processes nothing
    view.refresh()
    assert view.last_batch_rows == 0

    # a delete rewrites segments → view invalidates and rebuilds, correct
    e.run_script("d=select(mv,100,120)\ndelete(d,mv)")
    view.refresh()
    assert _got(view) == _expected(e, "mv")

    # after the rebuild, maintenance is incremental again
    e.run_script("insert(mv,310)")
    view.refresh()
    assert view.last_batch_rows == 1
    assert _got(view) == _expected(e, "mv")
