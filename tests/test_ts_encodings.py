"""Timestamp-encoding regression matrix (VERDICT r2 item 6).

The driver's events.parquet has shipped three different physical ts
encodings across rounds — TIMESTAMP(NANOS) (Spark reads bigint under
nanosAsLong), TIMESTAMP(MICROS) without timezone (TIMESTAMP_NTZ), and
tz-tagged TIMESTAMP (LTZ). Round 2 broke because only one read path
handled the second. This matrix writes the SAME logical events in all
three encodings and asserts both the batch loader and a real streaming
query produce identical results on each — so the next encoding change
is caught in-tree, not by a dead bench.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N = 300
ENCODINGS = ("ns_bigint", "us_ntz", "us_ltz")


def _write_events(dirpath: str, encoding: str) -> None:
    rng = np.random.default_rng(11)
    # epochs spread over ~6 hours so hourly windows have >1 bucket
    epoch_us = (1_700_000_000_000_000
                + np.sort(rng.integers(0, 6 * 3600 * 1_000_000, N)))
    if encoding == "ns_bigint":
        ts = pa.array(epoch_us * 1000, type=pa.timestamp("ns"))
    elif encoding == "us_ntz":
        ts = pa.array(epoch_us, type=pa.timestamp("us"))
    else:  # us_ltz
        ts = pa.array(epoch_us, type=pa.timestamp("us", tz="UTC"))
    t = pa.table({
        "event_id": pa.array(np.arange(N)),
        "ts": ts,
        "user_id": pa.array(rng.integers(0, 10, N)),
        "event_type": pa.array(rng.choice(["click", "view", "buy"], N)),
        "value": pa.array(rng.random(N)),
        "props": pa.array(["{}"] * N),
    })
    pq.write_table(t, f"{dirpath}/events.parquet")


@pytest.fixture(scope="module")
def enc_dirs(tmp_path_factory):
    out = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"events_{enc}")
        _write_events(str(d), enc)
        out[enc] = str(d)
    return out


@pytest.mark.parametrize("enc", ENCODINGS)
def test_batch_loader_normalizes(spark, enc_dirs, enc):
    from kstore_spark.tables import table

    df = table(spark, enc_dirs[enc], "events")
    assert dict(df.dtypes)["ts"] == "timestamp"  # LTZ, whatever the file
    # identical epoch values across encodings (UTC session timezone)
    epochs = [r[0] for r in
              df.select(df.ts.cast("long")).orderBy("event_id").collect()]
    assert len(epochs) == N
    if not hasattr(test_batch_loader_normalizes, "_ref"):
        test_batch_loader_normalizes._ref = epochs
    assert epochs == test_batch_loader_normalizes._ref


@pytest.mark.parametrize("enc", ENCODINGS)
def test_streaming_runs_on_encoding(spark, enc_dirs, enc):
    """A real watermarked streaming aggregation must run on every
    encoding and agree with the batch groupBy."""
    from pyspark.sql import functions as F

    from kstore_spark.streaming.windows import stream_hourly_counts
    from kstore_spark.tables import table

    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in stream_hourly_counts(spark, enc_dirs[enc]).collect()
    }
    exp = {
        (r["hour"], r["event_type"]): r["n"]
        for r in table(spark, enc_dirs[enc], "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp and len(got) >= 3
