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


def test_matview_custom_key_and_aggs(spark, tmp_path):
    """Parameterized view: key = val % 3, aggs = count/min/max — the
    min/max merge path (merge(min_a, min_b), not sum) across refreshes."""
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    e.run_script('create(gv,"unsorted")')
    for v in (5, 7, 12, 301, 44):
        e.run_script(f"insert(gv,{v})")

    view = MatView(
        spark, db, "gv", str(tmp_path / "view"),
        key="val % 3",
        aggs={"n": ("count", None), "mn": ("min", "val"), "mx": ("max", "val")},
    )

    def expected():
        df = e.catalog.read("gv")
        return {
            r["bucket"]: (r["n"], r["mn"], r["mx"])
            for r in df.groupBy(
                F.expr("val % 3").cast("long").alias("bucket")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.min("val").alias("mn"),
                F.max("val").alias("mx"),
            ).collect()
        }

    def got():
        return {
            r["bucket"]: (r["n"], r["mn"], r["mx"])
            for r in view.read().collect()
        }

    assert got() == {}  # pre-refresh read: empty frame, right columns
    assert view.read().columns == ["bucket", "n", "mn", "mx"]
    view.refresh()
    assert got() == expected()

    # incremental merge must take min/max of (old, new), not re-sum:
    # 1 beats the existing min in bucket 1; 400 beats the max in bucket 1
    e.run_script("insert(gv,1)")
    e.run_script("insert(gv,400)")
    view.refresh()
    assert view.last_batch_rows == 2
    assert got() == expected()

    # non-mergeable agg kinds are rejected up front
    import pytest

    with pytest.raises(ValueError, match="not mergeable"):
        MatView(spark, db, "gv", str(tmp_path / "v2"),
                aggs={"a": ("avg", "val")})


def test_matview_over_group_column(spark, tmp_path):
    """A group-covered column streams its load group's full-width
    segments; a single-column insert detaches the column (the source
    dir moves), which the view detects and rebuilds against."""
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    csv = tmp_path / "g.csv"
    with open(csv, "w") as f:
        f.write("ga,gb\n")
        for a, b in ((5, 1), (105, 2), (205, 3), (15, 4)):
            f.write(f"{a},{b}\n")
    e.run_script(f'create(ga,"unsorted")\ncreate(gb,"unsorted")\nload("{csv}")')

    view = MatView(spark, db, "ga", str(tmp_path / "view"))
    view.refresh()
    assert view.last_batch_rows == 4
    assert _got(view) == _expected(e, "ga")

    # a second aligned load appends group segments → incremental
    csv2 = tmp_path / "g2.csv"
    with open(csv2, "w") as f:
        f.write("ga,gb\n110,5\n9,6\n")
    e.run_script(f'load("{csv2}")')
    view.refresh()
    assert view.last_batch_rows == 2
    assert _got(view) == _expected(e, "ga")

    # cross-column rollup: key over the sibling dimension column gb,
    # aggregates over ga (aliased val) — no join, columns are row-aligned
    roll = MatView(
        spark, db, "ga", str(tmp_path / "roll"),
        key="gb % 2",
        aggs={"n": ("count", None), "s": ("sum", "cast(val as long)")},
    )
    assert roll.read().collect() == []  # empty pre-refresh read plans OK
    roll.refresh()
    rows = {r["bucket"]: (r["n"], r["s"]) for r in roll.read().collect()}
    # (ga,gb) = (5,1),(105,2),(205,3),(15,4),(110,5),(9,6):
    # even gb → ga {105,15,9}; odd gb → ga {5,205,110}
    assert rows == {0: (3, 129), 1: (3, 320)}

    # single-column insert detaches ga from the group: source moves from
    # data/_group_*/ to data/ga/ → view invalidates, rebuilds, stays right
    e.run_script("insert(ga,305)")
    view.refresh()
    assert view.last_batch_rows == 7  # full rebuild over the new layout
    assert _got(view) == _expected(e, "ga")

    # the cross-column view CANNOT follow a detach (gb is gone from the
    # detached source) — refresh resets and fails loudly, not silently
    import pytest

    with pytest.raises(Exception):
        roll.refresh()


def test_matview_join_column_multi_column_expressions(spark, tmp_path):
    """Round-3 (ROADMAP r2 #3 leftover): a view whose key/agg span TWO
    detached columns — new rows of the streamed column pos-join against
    the partner column's overlapping segments; rows whose partner value
    has not arrived yet wait in a bounded pending buffer."""
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    e.run_script('create(mvx,"unsorted")\ncreate(mvy,"unsorted")')
    for vx, vy in [(5, 1), (105, 1), (205, 2), (15, 2)]:
        e.run_script(f"insert(mvx,{vx})")
        e.run_script(f"insert(mvy,{vy})")

    # rollup of mvx grouped by the PARTNER column's value
    view = MatView(
        spark, db, "mvx", str(tmp_path / "view"),
        key="cast(mvy as long)",
        aggs={"n": ("count", None), "s": ("sum", "cast(val as long)")},
        join_column="mvy",
    )

    def expected():
        x = e.catalog.read("mvx").select("pos", F.col("val").alias("x"))
        y = e.catalog.read("mvy").select("pos", F.col("val").alias("y"))
        return {
            r["bucket"]: (r["n"], r["s"])
            for r in x.join(y, "pos")
            .groupBy(F.col("y").cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("x").cast("long")).alias("s"))
            .collect()
        }

    view.refresh()
    assert _got(view) == expected() == {1: (2, 110), 2: (2, 220)}

    # mvx grows ahead of mvy: the new row has no partner → it pends,
    # the view stays consistent with the JOINED prefix
    e.run_script("insert(mvx,300)")
    view.refresh()
    assert _got(view) == expected() == {1: (2, 110), 2: (2, 220)}

    # the partner value arrives; a refresh with NO new mvx data must
    # drain the pending buffer through the join
    e.run_script("insert(mvy,3)")
    view.refresh()
    assert _got(view) == expected() == {1: (2, 110), 2: (2, 220), 3: (1, 300)}

    # incremental after the catch-up: one new aligned pair, one new row
    e.run_script("insert(mvx,7)\ninsert(mvy,1)")
    view.refresh()
    assert view.last_batch_rows == 1
    assert _got(view) == expected() == {1: (3, 117), 2: (2, 220), 3: (1, 300)}

    # a mutation on the JOIN column rewrites its segments → the view
    # must detect staleness and rebuild correctly
    e.run_script("d=select(mvy,2,2)\ndelete(d,mvy)")
    view.refresh()
    assert _got(view) == expected()
    assert 2 not in _got(view)


def test_matview_join_column_invalidation_on_streamed_mutation(spark, tmp_path):
    """VERDICT r3 item 8: a join view must invalidate and rebuild on a
    mutation of EITHER source column. The sibling test covers the join
    column; this one mutates the STREAMED column (segment rewrite moves
    rows under the checkpoint) and then updates it, checking the rebuilt
    view each time."""
    db = str(tmp_path / "db")
    e = Engine(spark, db)
    e.run_script('create(jx,"unsorted")\ncreate(jy,"unsorted")')
    for vx, vy in [(5, 1), (105, 1), (205, 2), (15, 2), (300, 3)]:
        e.run_script(f"insert(jx,{vx})")
        e.run_script(f"insert(jy,{vy})")

    view = MatView(
        spark, db, "jx", str(tmp_path / "view"),
        key="cast(jy as long)",
        aggs={"n": ("count", None), "s": ("sum", "cast(val as long)")},
        join_column="jy",
    )

    def expected():
        x = e.catalog.read("jx").select("pos", F.col("val").alias("x"))
        y = e.catalog.read("jy").select("pos", F.col("val").alias("y"))
        return {
            r["bucket"]: (r["n"], r["s"])
            for r in x.join(y, "pos")
            .groupBy(F.col("y").cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("x").cast("long")).alias("s"))
            .collect()
        }

    view.refresh()
    assert _got(view) == expected() == {1: (2, 110), 2: (2, 220), 3: (1, 300)}

    # DELETE on the streamed column: its segments are rewritten; the
    # manifest notices an ingested segment is no longer live → rebuild
    e.run_script("d=select(jx,105,105)\ndelete(d,jx)")
    view.refresh()
    assert _got(view) == expected()
    assert _got(view)[1] == (1, 5)

    # UPDATE on the streamed column: same rewrite path, new values must
    # land in the rebuilt aggregate
    e.run_script("u=select(jx,205,205)\nupdate(u,jx,206)")
    view.refresh()
    assert _got(view) == expected()
    assert _got(view)[2] == (2, 221)


def test_matview_join_column_requires_detached_source(spark, tmp_path):
    """ADVICE r3: the pending buffer persists the 2-column COLUMN_SCHEMA,
    so a group-covered streamed column under a join view must be refused
    loudly (its siblings would break the drain-path union), not fail
    later or lose sibling values."""
    import pytest

    db = str(tmp_path / "db")
    e = Engine(spark, db)
    csv = tmp_path / "g.csv"
    with open(csv, "w") as f:
        f.write("gva,gvb\n5,1\n105,2\n")
    e.run_script(f'create(gva,"unsorted")\ncreate(gvb,"unsorted")\nload("{csv}")')
    e.run_script('create(jz,"unsorted")\ninsert(jz,7)')

    view = MatView(
        spark, db, "gva", str(tmp_path / "view"),
        key="cast(jz as long)", join_column="jz",
    )
    with pytest.raises(ValueError, match="group-covered"):
        view.refresh()
