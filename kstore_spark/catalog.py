"""Persistent column catalog with table-group storage.

The reference's only persistent object is a named int32 column with a
storage type and a monotonically increasing next-tuple-id (reference:
src/server/include/storage.h:21-30); "tables" exist only as user-aligned
column groups loaded together (README.md:182-188). We keep the
column-level catalog surface but store each *load group* as one Parquet
table (pos + all columns of the file):

    db_dir/
      catalog.json                — {columns: {...}, groups: {...}}
      data/_group_<gid>/<seg>/    — full-width Parquet (pos, colA, colB…)
      data/<column>/<seg>/        — per-column Parquet (pos, val) after a
                                    column is detached by a mutation

Why groups: aligned columns that were loaded together are exactly the
columns queries correlate positionally. Storing them row-aligned in one
Parquet means select→fetch chains over one table become a single scan
with predicate pushdown + column pruning (see operators/types.Prov),
instead of per-column self-joins on pos. This is the difference between
O(1) and O(#columns) shuffles per query — decisive at 100 TB.

Mutation model (copy-on-write):
- ``insert``/``delete``/``update`` on a column first *detaches* it —
  its data is materialized into per-column segments and the group stops
  covering it. Other group members are unaffected.
- ``delete`` keeps surviving pos values (no renumbering); ``insert``
  appends a tiny delta segment (the multi-path Parquet scan unions it).
- The catalog JSON swap is atomic; readers of the old version keep
  their snapshot (Delta/Iceberg-style, scaled down).

Storage types: "sorted"/"b+tree" columns are written range-partitioned
and sorted by value so Parquet min/max + page-index pruning supplies the
reference's sorted-index/b+tree skip-scan (storage.c:928-1049, 462-560).
Group segments are written sorted by pos; a per-column sorted projection
is added for sorted/b+tree members at detach time only (results are
storage-type-independent by construction — reference p2 tests).

``pos`` is assigned once at ingest via zipWithIndex (per-partition count
pass + offset pass, both distributed — no global sort, no
monotonically_increasing_id non-density).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstore_spark.operators.mutations import COLUMN_SCHEMA
from kstore_spark.operators.types import POS, VAL, Prov

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
        self.groups: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                meta = json.load(f)
            self.columns = meta["columns"]
            self.groups = meta.get("groups", {})

    # -- persistence ---------------------------------------------------
    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"columns": self.columns, "groups": self.groups}, f, indent=1)
        os.replace(tmp, self.path)  # atomic catalog swap

    def _new_segment_dir(self, owner: str) -> str:
        return os.path.join(self.db_dir, "data", owner, uuid.uuid4().hex[:12])

    # -- DDL -----------------------------------------------------------
    def create(self, column: str, stype: str = "unsorted") -> None:
        if stype not in STYPES:
            raise ValueError(f"unknown storage type {stype!r}")
        if column in self.columns:
            return  # idempotent, like the reference (storage.c:195-304)
        self.columns[column] = {
            "stype": stype, "next_pos": 0, "segments": [], "group": None,
        }
        self._save()

    def exists(self, column: str) -> bool:
        return column in self.columns

    def meta(self, column: str) -> dict:
        try:
            return self.columns[column]
        except KeyError:
            raise CatalogError(f"no such column: {column}") from None

    # -- bulk load (group path) ----------------------------------------
    def load_group(self, df: DataFrame, cols: list[str], offset: int, rows: int) -> None:
        """Append one row-aligned file (already carrying pos) as a group
        segment shared by all its columns."""
        gid = "g_" + "_".join(sorted(cols))
        grp = self.groups.setdefault(gid, {"columns": sorted(cols), "segments": []})
        if grp["columns"] != sorted(cols):
            raise CatalogError(f"group {gid} column set mismatch")
        seg_dir = self._new_segment_dir(f"_group_{gid}")
        out = df.select(F.col(POS).cast("long"), *[F.col(c).cast("int") for c in cols])
        out.sortWithinPartitions(POS).write.mode("overwrite").parquet(seg_dir)
        grp["segments"].append(os.path.basename(seg_dir))
        for c in cols:
            m = self.meta(c)
            if m["segments"] and m["group"] is None:
                raise CatalogError(f"load into detached column {c} unsupported mid-life")
            m["group"] = gid
            m["next_pos"] = offset + rows
        self._save()

    def _group_df(self, gid: str) -> DataFrame:
        grp = self.groups[gid]
        paths = [
            os.path.join(self.db_dir, "data", f"_group_{gid}", s)
            for s in grp["segments"]
        ]
        return self.spark.read.parquet(*paths)

    def group_prov(self, column: str) -> Prov | None:
        """Late-materialization provenance for a column still covered by
        its load group: the full-width frame + base→frame name mapping."""
        m = self.meta(column)
        gid = m["group"]
        if gid is None:
            return None
        grp = self.groups[gid]
        return Prov(frame=self._group_df(gid), cols={c: c for c in grp["columns"]})

    # -- read ----------------------------------------------------------
    def read(self, column: str) -> DataFrame:
        m = self.meta(column)
        parts: list[DataFrame] = []
        if m["group"] is not None:
            parts.append(
                self._group_df(m["group"]).select(F.col(POS), F.col(column).alias(VAL))
            )
        if m["segments"]:
            paths = [os.path.join(self.db_dir, "data", column, s) for s in m["segments"]]
            parts.append(self.spark.read.schema(COLUMN_SCHEMA).parquet(*paths))
        if not parts:
            return self.spark.createDataFrame([], schema=COLUMN_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- write ---------------------------------------------------------
    def _write_column_segment(self, column: str, df: DataFrame) -> str:
        m = self.meta(column)
        out = df.select(F.col(POS).cast("long"), F.col(VAL).cast("int"))
        if m["stype"] in ("sorted", "b+tree"):
            # physical ordering by value ⇒ Parquet min/max row-group &
            # page-index pruning ≈ the reference's sorted index / b+tree
            npart = max(1, out.sparkSession.sparkContext.defaultParallelism // 4)
            out = out.repartitionByRange(npart, VAL).sortWithinPartitions(VAL)
        seg_dir = self._new_segment_dir(column)
        out.write.mode("overwrite").parquet(seg_dir)
        return os.path.basename(seg_dir)

    def detach(self, column: str) -> None:
        """Materialize a group-covered column into its own segments (first
        mutation on it). Group siblings keep their shared storage."""
        m = self.meta(column)
        if m["group"] is None:
            return
        current = self._group_df(m["group"]).select(
            F.col(POS), F.col(column).alias(VAL)
        )
        seg = self._write_column_segment(column, current)
        m["segments"] = [seg]
        m["group"] = None
        self._save()

    def append_segment(self, column: str, df: DataFrame, rows: int) -> None:
        """Append rows already carrying correct pos; advances next_pos."""
        self.detach(column)
        m = self.meta(column)
        seg = self._write_column_segment(column, df)
        m["segments"].append(seg)
        m["next_pos"] += rows
        self._save()

    def replace(self, column: str, df: DataFrame) -> None:
        """Copy-on-write rewrite: consolidate into one new segment and
        swap; next_pos preserved (deletes never renumber)."""
        m = self.meta(column)
        was_grouped = m["group"] is not None
        old = list(m["segments"])
        seg = self._write_column_segment(column, df)
        m["segments"] = [seg]
        m["group"] = None
        self._save()
        if not was_grouped:
            for s in old:  # unreachable after the swap
                shutil.rmtree(
                    os.path.join(self.db_dir, "data", column, s), ignore_errors=True
                )

    def next_pos(self, column: str) -> int:
        return self.meta(column)["next_pos"]


def with_pos(df: DataFrame, offset: int = 0) -> DataFrame:
    """Assign dense, stable row ids 0..n-1 (+offset) in input order.

    Implemented with RDD zipWithIndex: one distributed count pass to
    compute per-partition offsets, one map pass to stamp ids — no global
    sort, no single-partition window. This is the scalable way to reify
    the reference's implicit positional row id at 100 TB.
    """
    rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1] + offset))
    out_schema = df.schema.add(POS, "long", False)
    return df.sparkSession.createDataFrame(rdd, schema=out_schema)
