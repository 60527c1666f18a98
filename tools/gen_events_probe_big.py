"""Big-factor EVENTS replica for 1000×-scale probes of the events
analytics family (the documents/embeddings twin is
gen_scale_probe_big.py).

Usage: python tools/gen_events_probe_big.py [out_dir] [factor] [src_dir]
       (defaults: /tmp/sfev1000  10  /tmp/sf10 — 10M × 10 = 100M rows)

ONE crossJoin plan (events × range(factor)), like the docs generator:
- event_id / user_id shifted per replica with strides far above the
  source key space, so per-user series and funnels stay within a
  replica and every per-user/per-path cardinality scales linearly;
- ts offset by replica × 32 days so the hourly/daily grids grow
  linearly too (an unshifted ts would pile every replica into the
  same hours and quietly turn the window/gapfill ops sublinear);
- event_type / value / props ride along unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

EVENT_STRIDE = 10_000_000_000
USER_STRIDE = 1_000_000_000
DAY_SHIFT = 32  # days between replica time ranges (> source span)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfev1000"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf10"

    from kstore_spark.session import get_spark
    from kstore_spark.tables import table

    spark = get_spark("gen-events-big")
    ev = table(spark, src, "events")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * EVENT_STRIDE).alias("event_id"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.col("rep") * F.lit(DAY_SHIFT * 86_400_000_000)
        ).alias("ts"),
        (F.col("user_id") + F.col("rep") * USER_STRIDE).alias("user_id"),
        "event_type", "value", "props",
    )
    big.write.mode("overwrite").parquet(f"{out}/events.parquet")
    n = spark.read.parquet(f"{out}/events.parquet").count()
    print(f"{out}/events.parquet: {n} rows ({factor}x of {src})")


if __name__ == "__main__":
    main()
