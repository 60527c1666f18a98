"""Incrementally-maintained materialized aggregate over a CATALOG column
— the engine-side "continuous aggregate" (hypertable-rollup pattern).

A ``MatView`` keeps a keyed aggregate for one column fresh across insert
bursts with work bounded by the NEW data, not the column size. The view
definition is parameterizable: ``key`` is any SQL expression over the
column's ``(pos, val)`` rows (default: ``floor(val / bucket_width)``),
and ``aggs`` maps output names to MERGEABLE aggregate specs —
``("count", None)``, ``("sum"|"min"|"max", <sql expr>)`` — so partials
from new segments merge into the sink without rescanning (count/sum
merge by sum, min/max by min/max; avg derives as s/n on read). Default
``{"n": count, "s": sum(val)}`` is the round-1 behavior:

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

Scope: both storage layouts — a detached column streams its own
(pos, val) segments; a group-covered column streams its load group's
full-width segments with its own column aliased ``val`` and the
aligned sibling columns still visible, so ``key``/``aggs`` expressions
may span the group (e.g. key over a dimension column, sums over the
fact column — a multi-column rollup with no join, the columns are
stored row-aligned). A detach (first single-column insert) moves the
source directory, which the manifest detects as invalidation → rebuild
against the new layout. At 100 TB:
per-refresh work is (new segments) + (bucket cardinality); state is the
checkpoint file log and the |buckets|-row sink, both bounded.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstore_spark.operators.mutations import COLUMN_SCHEMA

# partial-aggregate builder and merge function per mergeable agg kind:
# the merge runs over |keys| partial rows (union of sink + new partial),
# never over source rows, so every kind here must satisfy
# agg(a ∪ b) == merge(agg(a), agg(b))
_AGG_KINDS = {
    "count": (lambda e: F.count(F.lit(1)), F.sum),
    "sum": (lambda e: F.sum(F.expr(e)), F.sum),
    "min": (lambda e: F.min(F.expr(e)), F.min),
    "max": (lambda e: F.max(F.expr(e)), F.max),
}

_DEFAULT_AGGS = {"n": ("count", None), "s": ("sum", "cast(val as long)")}


class MatView:
    def __init__(self, spark: SparkSession, db_dir: str, column: str,
                 view_dir: str, bucket_width: int = 100,
                 key: str | None = None,
                 aggs: dict[str, tuple[str, str | None]] | None = None):
        self.spark = spark
        self.db_dir = db_dir
        self.column = column
        self.view_dir = view_dir
        self.bucket_width = bucket_width
        self.key = key or f"floor(val / {bucket_width})"
        self.aggs = aggs or _DEFAULT_AGGS
        for name, (kind, _) in self.aggs.items():
            if kind not in _AGG_KINDS:
                raise ValueError(
                    f"agg {name!r}: {kind!r} is not mergeable "
                    f"(supported: {sorted(_AGG_KINDS)})"
                )
        os.makedirs(view_dir, exist_ok=True)
        self.last_batch_rows = 0  # live rows processed by the latest refresh

    def _partial(self, rows: DataFrame) -> DataFrame:
        """Aggregate source rows → one partial row per key."""
        key = F.expr(self.key).cast("long").alias("bucket")
        cols = [_AGG_KINDS[k][0](e).alias(n) for n, (k, e) in self.aggs.items()]
        return rows.groupBy(key).agg(*cols)

    def _merge_partials(self, frames: DataFrame) -> DataFrame:
        """Merge sink ∪ new partials over |keys| rows."""
        cols = [_AGG_KINDS[k][1](n).alias(n) for n, (k, _) in self.aggs.items()]
        return frames.groupBy("bucket").agg(*cols)

    # -- paths ---------------------------------------------------------
    def _source_glob(self, src_dir: str) -> str:
        return os.path.join(self.db_dir, "data", src_dir, "*")

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
    def _source_info(self) -> tuple[str, list[str], list[str] | None]:
        """(source dir under data/, live segment names, group columns or
        None) for the column, per catalog.json. A group-covered column
        streams from its group's full-width segments; a detached column
        from its own."""
        with open(os.path.join(self.db_dir, "catalog.json")) as f:
            meta = json.load(f)
        m = meta["columns"][self.column]
        if m["group"] is not None:
            gid = m["group"]
            grp = meta["groups"][gid]
            return f"_group_{gid}", list(grp["segments"]), list(grp["columns"])
        return self.column, list(m["segments"]), None

    def _source_shape(self, gcols: list[str] | None):
        """(file schema, row projection) for the source layout."""
        if gcols is None:
            return COLUMN_SCHEMA, lambda df: df
        # group segments are full-width (pos, colA, colB, …). Alias this
        # view's column as ``val`` (so detached-column specs work
        # unchanged) and KEEP the sibling columns: key/agg expressions
        # may reference any aligned column — a dimension rollup of the
        # fact group in one view, no join (columns are row-aligned)
        schema = T.StructType(
            [T.StructField("pos", T.LongType(), nullable=False)]
            + [T.StructField(c, T.IntegerType()) for c in gcols]
        )
        siblings = [c for c in gcols
                    if c != self.column and c not in ("pos", "val")]
        return schema, lambda df: df.select(
            "pos", F.col(self.column).alias("val"), *siblings)

    def _invalidated(self, src_dir: str, live: list[str]) -> bool:
        if not os.path.exists(self._manifest):
            return False
        with open(self._manifest) as f:
            seen = json.load(f)
        if seen.get("src") != src_dir:
            return True  # column detached from (or joined) a group —
            # the file-stream source moved; the checkpoint is meaningless
        return bool(set(seen["segments"]) - set(live))  # segment rewritten

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
        src_dir, live, gcols = self._source_info()
        if self._invalidated(src_dir, live):
            self._reset()

        live_re = "/(" + "|".join(live) + ")/" if live else "$^"
        schema, to_rows = self._source_shape(gcols)
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .parquet(self._source_glob(src_dir))
        )
        self.last_batch_rows = 0

        def merge(batch_df: DataFrame, batch_id: int) -> None:
            # drop rows from tombstoned (non-live) segment files — they
            # exist on disk only for snapshot readers
            rows = to_rows(batch_df.filter(F.input_file_name().rlike(live_re)))
            n_rows = rows.count()
            self.last_batch_rows += n_rows
            if n_rows == 0:
                return
            part = self._partial(rows)
            gen = self._current_gen()
            if gen >= 0:
                cur = self.spark.read.parquet(self._gen_path(gen))
                part = self._merge_partials(cur.unionByName(part))
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
            json.dump({"src": src_dir, "segments": sorted(live)}, f)

    def read(self) -> DataFrame:
        gen = self._current_gen()
        if gen < 0:
            # empty frame with the view's schema (derived from the agg
            # spec over an empty source — plan-only, no job runs)
            _, live, gcols = self._source_info()
            schema, to_rows = self._source_shape(gcols)
            return self._partial(to_rows(self.spark.createDataFrame([], schema)))
        return self.spark.read.parquet(self._gen_path(gen))
