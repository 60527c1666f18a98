"""Incrementally-maintained materialized aggregate over a CATALOG column
— the engine-side "continuous aggregate" (hypertable-rollup pattern).

A ``MatView`` keeps ``count/sum per value bucket`` for one column fresh
across insert bursts with work bounded by the NEW data, not the column
size:

- The column's segment directory doubles as a file-streaming source;
  each ``refresh()`` is an ``availableNow`` run whose checkpoint
  remembers which segment files have been ingested.
- ``foreachBatch`` computes a partial aggregate of just the new rows
  and merges it into the sink by bucket (count/sum are associative, so
  merge = union → re-aggregate over |buckets| rows, never a rescan).
- Rows are filtered to the catalog's LIVE segment set (via
  ``input_file_name``): the engine tombstones replaced segments on disk
  for snapshot readers, and those must never enter the view.
- The sink swap is atomic (write a fresh generation dir, flip a pointer
  file), so readers never see a half-merged view.

Mutations other than insert (delete/update/compaction) REWRITE segments;
the view records the live-segment manifest it has ingested, and a
``refresh()`` that finds a previously-ingested segment no longer live
declares the view invalid and rebuilds (checkpoint + generations wiped,
everything re-streamed, still filtered to live files) — correct always,
incremental for the append-only workload this pattern exists for.

Scope: detached (own-segment) columns — the state every column reaches
after its first single-column insert. At 100 TB: per-refresh work is
(new segments) + (bucket cardinality); state is the checkpoint file log
and the |buckets|-row sink, both bounded.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.operators.mutations import COLUMN_SCHEMA


class MatView:
    def __init__(self, spark: SparkSession, db_dir: str, column: str,
                 view_dir: str, bucket_width: int = 100):
        self.spark = spark
        self.db_dir = db_dir
        self.column = column
        self.view_dir = view_dir
        self.bucket_width = bucket_width
        os.makedirs(view_dir, exist_ok=True)
        self.last_batch_rows = 0  # live rows processed by the latest refresh

    # -- paths ---------------------------------------------------------
    @property
    def _source_glob(self) -> str:
        return os.path.join(self.db_dir, "data", self.column, "*")

    @property
    def _checkpoint(self) -> str:
        return os.path.join(self.view_dir, "checkpoint")

    @property
    def _manifest(self) -> str:
        return os.path.join(self.view_dir, "manifest.json")

    def _gen_path(self, gen: int) -> str:
        return os.path.join(self.view_dir, f"agg_gen{gen}")

    def _current_gen(self) -> int:
        p = os.path.join(self.view_dir, "CURRENT")
        if os.path.exists(p):
            with open(p) as f:
                return int(f.read().strip())
        return -1

    def _set_gen(self, gen: int) -> None:
        tmp = os.path.join(self.view_dir, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, os.path.join(self.view_dir, "CURRENT"))

    # -- live-segment manifest -----------------------------------------
    def _live_segments(self) -> list[str]:
        """Live segment dir names for the column, per catalog.json."""
        with open(os.path.join(self.db_dir, "catalog.json")) as f:
            meta = json.load(f)
        m = meta["columns"][self.column]
        if m["group"] is not None:
            raise NotImplementedError(
                "MatView covers detached columns; group-covered columns "
                "share storage — detach (any single-column insert) first"
            )
        return list(m["segments"])

    def _invalidated(self, live: list[str]) -> bool:
        if not os.path.exists(self._manifest):
            return False
        with open(self._manifest) as f:
            seen = set(json.load(f))
        return bool(seen - set(live))  # an ingested segment was replaced

    def _reset(self) -> None:
        for sub in list(os.listdir(self.view_dir)):
            p = os.path.join(self.view_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)

    # -- maintenance -----------------------------------------------------
    def refresh(self) -> None:
        """Ingest unseen live segment files and merge into the view;
        rebuild from scratch if an ingested segment was rewritten."""
        live = self._live_segments()
        if self._invalidated(live):
            self._reset()

        live_re = "/(" + "|".join(live) + ")/" if live else "$^"
        bucket = (F.floor(F.col("val") / self.bucket_width)).cast("long")
        stream = (
            self.spark.readStream.schema(COLUMN_SCHEMA)
            .option("maxFilesPerTrigger", 1000)
            .parquet(self._source_glob)
        )
        self.last_batch_rows = 0

        def merge(batch_df: DataFrame, batch_id: int) -> None:
            # drop rows from tombstoned (non-live) segment files — they
            # exist on disk only for snapshot readers
            rows = batch_df.filter(F.input_file_name().rlike(live_re))
            n_rows = rows.count()
            self.last_batch_rows += n_rows
            if n_rows == 0:
                return
            part = rows.groupBy(bucket.alias("bucket")).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("val").cast("long")).alias("s"),
            )
            gen = self._current_gen()
            if gen >= 0:
                cur = self.spark.read.parquet(self._gen_path(gen))
                part = (
                    cur.unionByName(part)
                    .groupBy("bucket")
                    .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
                )
            nxt = gen + 1
            part.write.mode("overwrite").parquet(self._gen_path(nxt))
            self._set_gen(nxt)  # atomic pointer flip — readers never torn
            if gen >= 0:
                shutil.rmtree(self._gen_path(gen), ignore_errors=True)

        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", self._checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("matview refresh did not finish within 300s")
        with open(self._manifest, "w") as f:
            json.dump(sorted(live), f)

    def read(self) -> DataFrame:
        gen = self._current_gen()
        if gen < 0:
            return self.spark.createDataFrame([], "bucket long, n long, s long")
        return self.spark.read.parquet(self._gen_path(gen))
