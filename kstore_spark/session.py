"""SparkSession factory.

Local testing runs on ``local[N]`` (single JVM); the configuration is
chosen so the same code scales to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
- shuffle partitions sized for the local core count; on a real cluster the
  AQE coalescer makes the static number mostly irrelevant
- ANSI mode OFF: the reference has C integer semantics (wraparound,
  truncating division, no overflow errors) — see operators/cints.py
- Arrow enabled for the Pandas-UDF paths (similarity / multimodal ops)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kstore-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # deterministic epoch math for NTZ↔LTZ timestamp conversions
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode driver JVM IS the executor: all N task threads share
        # its unified memory. 8g/32 threads = 250 MB/core starved the
        # 1000x dedup probe into UNABLE_TO_ACQUIRE_MEMORY (PERF.md r6);
        # 24g ≈ 0.75 GB/core matches the documented 128 GiB box while
        # leaving room for 32 Arrow/pandas Python workers outside the JVM
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # NOTE: adaptive.coalescePartitions.initialPartitionNum was tried
        # here (8×cores) for finer big-shuffle spills and REVERTED: the
        # per-stage planning overhead taxed iterative ops 60%+
        # (dedup_keep_best_lsh's star contraction runs many tiny stages)
        # while the 1000× probes complete on the memory sizing alone
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
