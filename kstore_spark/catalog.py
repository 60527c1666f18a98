"""Persistent column catalog.

The reference's only persistent object is a named int32 column with a
storage type and a monotonically increasing next-tuple-id (reference:
src/server/include/storage.h:21-30). Tables exist only as user-aligned
column groups. We mirror that catalog shape, replacing 4 KiB-page files
with Parquet:

    db_dir/
      catalog.json                 — {name: {stype, next_pos, segments}}
      data/<column>/<segment>/     — Parquet, schema (pos: long, val: int)

Design for scale:
- **Segmented append**: ``insert`` writes a new small segment instead of
  rewriting the column (the reference appends in place). Reads union all
  segments — Spark's multi-path Parquet scan.
- **Copy-on-write mutation**: ``delete``/``update`` write one consolidated
  new segment and atomically swap the segment list (readers of the old
  version are unaffected — snapshot isolation like Delta/Iceberg, scaled
  down).
- **Sorted storage types**: columns created "sorted"/"b+tree" are written
  range-partitioned and sorted by value, so Parquet row-group min/max and
  page-index pruning give the same skip-scan the reference's sorted index
  and b+tree provide (storage.c:928-1049, 462-560). Results are identical
  across storage types by construction; only the physical layout differs.
- ``pos`` is assigned once at ingest via per-partition offsets
  (zipWithIndex: count pass + offset pass — both distributed); it is dense,
  stable, and never recomputed. ``monotonically_increasing_id`` is NOT
  used (non-dense, not stable across rewrites).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.operators.mutations import COLUMN_SCHEMA
from kstore_spark.operators.types import POS, VAL

STYPES = ("unsorted", "sorted", "b+tree")


class CatalogError(KeyError):
    pass


class Catalog:
    def __init__(self, spark: SparkSession, db_dir: str):
        self.spark = spark
        self.db_dir = db_dir
        self.path = os.path.join(db_dir, "catalog.json")
        os.makedirs(os.path.join(db_dir, "data"), exist_ok=True)
        self.columns: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.columns = json.load(f)["columns"]

    # -- persistence ---------------------------------------------------
    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"columns": self.columns}, f, indent=1)
        os.replace(tmp, self.path)  # atomic catalog swap

    def _segment_dir(self, column: str) -> str:
        seg = uuid.uuid4().hex[:12]
        return os.path.join(self.db_dir, "data", column, seg)

    # -- DDL -----------------------------------------------------------
    def create(self, column: str, stype: str = "unsorted") -> None:
        if stype not in STYPES:
            raise ValueError(f"unknown storage type {stype!r}")
        if column in self.columns:
            return  # idempotent, like the reference (storage.c:195-304)
        self.columns[column] = {"stype": stype, "next_pos": 0, "segments": []}
        self._save()

    def exists(self, column: str) -> bool:
        return column in self.columns

    def meta(self, column: str) -> dict:
        try:
            return self.columns[column]
        except KeyError:
            raise CatalogError(f"no such column: {column}") from None

    # -- read ----------------------------------------------------------
    def read(self, column: str) -> DataFrame:
        meta = self.meta(column)
        paths = [os.path.join(self.db_dir, "data", column, s) for s in meta["segments"]]
        if not paths:
            return self.spark.createDataFrame([], schema=COLUMN_SCHEMA)
        return self.spark.read.schema(COLUMN_SCHEMA).parquet(*paths)

    # -- write ---------------------------------------------------------
    def _write_segment(self, column: str, df: DataFrame) -> str:
        meta = self.meta(column)
        out = df.select(F.col(POS).cast("long"), F.col(VAL).cast("int"))
        if meta["stype"] in ("sorted", "b+tree"):
            # physical ordering by value ⇒ Parquet min/max row-group &
            # page-index pruning ≈ the reference's sorted index / b+tree
            npart = max(1, out.sparkSession.sparkContext.defaultParallelism // 4)
            out = out.repartitionByRange(npart, VAL).sortWithinPartitions(VAL)
        seg_dir = self._segment_dir(column)
        out.write.mode("overwrite").parquet(seg_dir)
        return os.path.basename(seg_dir)

    def append_segment(self, column: str, df: DataFrame, rows: int) -> None:
        """Append rows already carrying correct pos; advances next_pos."""
        meta = self.meta(column)
        seg = self._write_segment(column, df)
        meta["segments"].append(seg)
        meta["next_pos"] += rows
        self._save()

    def replace(self, column: str, df: DataFrame) -> None:
        """Copy-on-write: consolidate the column into one new segment and
        swap it in; next_pos is preserved (deletes never renumber)."""
        meta = self.meta(column)
        old = list(meta["segments"])
        seg = self._write_segment(column, df)
        meta["segments"] = [seg]
        self._save()
        for s in old:  # old versions are unreachable after the swap
            shutil.rmtree(os.path.join(self.db_dir, "data", column, s), ignore_errors=True)

    def next_pos(self, column: str) -> int:
        return self.meta(column)["next_pos"]


def with_pos(df: DataFrame, offset: int = 0) -> DataFrame:
    """Assign dense, stable row ids 0..n-1 (+offset) in input order.

    Implemented with RDD zipWithIndex: one distributed count pass to
    compute per-partition offsets, one map pass to stamp ids — no global
    sort, no single-partition window. This is the scalable way to reify
    the reference's implicit positional row id at 100 TB.
    """
    cols = df.columns
    rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + offset))
    out_schema = df.schema.add(POS, "long", False)
    return df.sparkSession.createDataFrame(rdd, schema=out_schema)
