"""Incremental rollup maintenance: two runs over a growing event log must
(a) process each file exactly once (checkpoint), and (b) produce exactly
the batch aggregate restricted to watermark-closed windows."""

import shutil

import duckdb
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001/events.parquet"


def test_incremental_rollup_two_runs(spark, tmp_path):
    from kstore_spark.streaming.incremental import read_rollup, run_incremental_rollup

    events_dir = tmp_path / "events"
    sink = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()

    # split the events log into two arrival batches by time
    con = duckdb.connect()
    mid, hi = con.sql(
        f"SELECT median(ts), max(ts) FROM '{SRC}'"
    ).fetchone()
    con.sql(
        f"COPY (SELECT * FROM '{SRC}' WHERE ts <= TIMESTAMP '{mid}') "
        f"TO '{events_dir}/batch1.parquet' (FORMAT PARQUET)"
    )

    run_incremental_rollup(spark, str(events_dir), sink, ckpt)
    n_after_first = read_rollup(spark, sink).count()
    assert n_after_first > 0

    con.sql(
        f"COPY (SELECT * FROM '{SRC}' WHERE ts > TIMESTAMP '{mid}') "
        f"TO '{events_dir}/batch2.parquet' (FORMAT PARQUET)"
    )
    run_incremental_rollup(spark, str(events_dir), sink, ckpt)

    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in read_rollup(spark, sink).collect()
    }
    # second run appended more closed windows (batch-1 windows closed by
    # batch-2's watermark advance)
    assert len(got) > n_after_first

    # expectation: full batch aggregate, limited to windows closed by the
    # final watermark (max ts - 1h, window end <= watermark)
    from kstore_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    exp = {
        (r["hour"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if (max_ts - r["hour"]).total_seconds() - 3600 >= 3600
    }
    for k, v in exp.items():
        assert got.get(k) == v, k
    # and nothing in the sink is wrong (subset check the other way: every
    # sink row matches the batch aggregate)
    batch_all = {
        (r["hour"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k, v in got.items():
        assert batch_all[k] == v, k
