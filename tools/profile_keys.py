"""Per-key profiling harness for the optimization rounds (guide §1).

Runs a chosen subset of bench keys with the Spark event log enabled and
a per-key job description, then attributes every job/stage/task to its
key and prints a breakdown: jobs, stages, tasks, sum of task run time,
and wall time between the key's first job submission and last job
completion. This is the stand-in for the Spark UI (disabled in the
bench session) that guide §1.1/§7.1 tell us to read first.

Usage: python tools/profile_keys.py [sf_dir] key [key ...]
       python tools/profile_keys.py [sf_dir] --runs 2 key ...

Timing methodology matches bench.py (cold cache, full materialization
via count()) so the numbers line up with BENCH_FULL.json; the event log
additionally shows WHERE the time goes.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")


def build_spark(evdir: str):
    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("kstore-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )


def run_keys(spark, sf_dir: str, keys: list[str], runs: int) -> dict[str, float]:
    import bench

    fns = bench.headline_queries()
    sc = spark.sparkContext
    walls: dict[str, float] = {}
    for key in keys:
        fn = fns[key]
        best = float("inf")
        for i in range(runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"{key}#run{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        sc.setJobDescription(None)
        walls[key] = round(best, 3)
    return walls


def parse_eventlog(evdir: str):
    """Aggregate the (single) event log: per job-description-prefix ->
    jobs, stages, tasks, task run time, wall."""
    files = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    path = files[-1]
    if os.path.isdir(path):  # eventlog v2 writes a rolling dir
        inner = sorted(glob.glob(os.path.join(path, "events*")))
        paths = inner
    else:
        paths = [path]
    job_desc: dict[int, str] = {}
    stage_desc: dict[int, str] = {}
    agg: dict[str, dict] = {}

    def bucket(desc: str) -> dict:
        return agg.setdefault(desc, {
            "jobs": 0, "stages": 0, "tasks": 0, "task_ms": 0,
            "gc_ms": 0, "first": float("inf"), "last": 0.0,
            "stage_wall_ms": 0,
        })

    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", "???")
            desc = desc.split("#run")[0]
            jid = ev["Job ID"]
            job_desc[jid] = desc
            b = bucket(desc)
            b["jobs"] += 1
            b["first"] = min(b["first"], ev.get("Submission Time", 0))
            for sid in ev.get("Stage IDs", []):
                stage_desc[sid] = desc
        elif et == "SparkListenerJobEnd":
            desc = job_desc.get(ev["Job ID"], "???")
            b = bucket(desc)
            b["last"] = max(b["last"], ev.get("Completion Time", 0))
        elif et == "SparkListenerStageCompleted":
            si = ev.get("Stage Info", {})
            desc = stage_desc.get(si.get("Stage ID"), "???")
            b = bucket(desc)
            b["stages"] += 1
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            if sub and com:
                b["stage_wall_ms"] += com - sub
        elif et == "SparkListenerTaskEnd":
            desc = stage_desc.get(ev.get("Stage ID"), "???")
            b = bucket(desc)
            b["tasks"] += 1
            tm = ev.get("Task Metrics") or {}
            b["task_ms"] += tm.get("Executor Run Time", 0)
            b["gc_ms"] += tm.get("JVM GC Time", 0)
    return agg


def main():
    import shutil
    import tempfile

    args = [a for a in sys.argv[1:]]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = args[1:] if args and os.path.isdir(args[0]) else args

    evdir = tempfile.mkdtemp(prefix="kstore_evlog_")
    spark = build_spark(evdir)
    spark.range(1).count()
    walls = run_keys(spark, sf_dir, keys, runs)
    spark.stop()

    agg = parse_eventlog(evdir)
    shutil.rmtree(evdir, ignore_errors=True)
    print(f"{'key':34s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s} "
          f"{'tasks':>6s} {'task_s':>7s} {'stgwall':>7s} {'gc_s':>5s}")
    for key in keys:
        b = agg.get(key)
        if not b:
            print(f"{key:34s} (no events)")
            continue
        span = (b["last"] - b["first"]) / 1000 if b["last"] else 0
        print(f"{key:34s} {walls.get(key, 0):7.3f} {b['jobs']:5d} "
              f"{b['stages']:6d} {b['tasks']:6d} {b['task_ms']/1000:7.2f} "
              f"{b['stage_wall_ms']/1000:7.2f} {b['gc_ms']/1000:5.2f}")
    other = agg.get("???")
    if other:
        print(f"{'(unattributed)':34s} {'':7s} {other['jobs']:5d} "
              f"{other['stages']:6d} {other['tasks']:6d} "
              f"{other['task_ms']/1000:7.2f}")


if __name__ == "__main__":
    main()
