"""Epoch-based tombstone GC: a replaced segment is deleted only when no
LIVE session could still hold a lazy DataFrame over it. A session can
reference a segment only if it opened before the segment was tombstoned,
so the GC barrier is the oldest start time among live sessions (liveness
= registering pid exists; dead sessions' epoch files are swept).

Replaces the round-2 wall-clock TTL (ROADMAP #6): no more deleting under
a >1h-lived session, no more waiting out the TTL when nobody is reading.
"""

import json
import os
import subprocess
import time

from pyspark.sql import functions as F

from kstore_spark.catalog import Catalog
from kstore_spark.operators.types import POS, VAL


def _df(spark, vals, pos0=0):
    return spark.createDataFrame(
        [(pos0 + i, v) for i, v in enumerate(vals)], f"{POS} long, {VAL} int"
    )


def _seg_dirs(db, col):
    base = os.path.join(db, "data", col)
    return sorted(os.listdir(base)) if os.path.isdir(base) else []


def test_gc_waits_for_live_sessions_then_reclaims(spark, tmp_path):
    db = str(tmp_path / "db")
    c1 = Catalog(spark, db)  # live session that could hold old snapshots
    c1.create("c", "unsorted")
    c1.append_segment("c", _df(spark, [1, 2, 3]), rows=3)
    old_segs = set(_seg_dirs(db, "c"))

    c2 = Catalog(spark, db)
    c2.replace("c", _df(spark, [9, 9, 9]))  # tombstones the old segment
    assert c2.tombstones

    # c1 (same pid, live) opened before the tombstone → a fresh open must
    # NOT delete the old segment out from under it
    c3 = Catalog(spark, db)
    assert old_segs < set(_seg_dirs(db, "c"))
    assert c3.tombstones

    for c in (c1, c2, c3):
        c.close()
    time.sleep(0.01)  # let the clock advance past the float tombstone ts
    c4 = Catalog(spark, db)
    try:
        assert not c4.tombstones
        assert not (old_segs & set(_seg_dirs(db, "c")))
        # store still reads correctly after the reclaim
        assert sorted(r[VAL] for r in c4.read("c").collect()) == [9, 9, 9]
    finally:
        c4.close()


def test_tombstone_epoch_keeps_subsecond_precision(monkeypatch, spark, tmp_path):
    """int(time.time()) truncation moved a tombstone up to 1 s earlier
    than the replace, so a session opened in the same wall-second but
    before the replace (start 1000.2 < real tombstone 1000.9 → stored
    1000) failed the ts < barrier guard and lost its live snapshot."""
    import kstore_spark.catalog as catmod

    c = Catalog(spark, str(tmp_path / "db"))
    try:
        monkeypatch.setattr(catmod.time, "time", lambda: 1000.9)
        c._tombstone("data/c/x")
        assert c.tombstones[-1][1] == 1000.9  # not truncated to 1000
    finally:
        monkeypatch.undo()
        c.close()


def test_dead_sessions_are_swept(spark, tmp_path):
    db = str(tmp_path / "db")
    c1 = Catalog(spark, db)
    c1.create("c", "unsorted")
    c1.append_segment("c", _df(spark, [1]), rows=1)
    c1.replace("c", _df(spark, [2]))
    c1.close()

    # a crashed session: valid epoch file, pid no longer exists
    p = subprocess.Popen(["true"])
    p.wait()
    dead = os.path.join(db, ".sessions", "deadbeef.json")
    with open(dead, "w") as f:
        json.dump({"pid": p.pid, "start": 0.0}, f)

    c2 = Catalog(spark, db)
    try:
        assert not os.path.exists(dead)  # swept
        assert not c2.tombstones  # dead session didn't pin the barrier
    finally:
        c2.close()


def test_close_is_idempotent_and_engine_delegates(spark, tmp_path):
    from kstore_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "db"))
    e.run_script('create(gx,"unsorted")\ninsert(gx,7)\n')
    sess = e.catalog._session_file
    assert os.path.exists(sess)
    e.close()
    e.close()
    assert not os.path.exists(sess)
