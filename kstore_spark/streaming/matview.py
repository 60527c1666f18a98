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
                 aggs: dict[str, tuple[str, str | None]] | None = None,
                 join_column: str | None = None):
        self.spark = spark
        self.db_dir = db_dir
        self.column = column
        self.view_dir = view_dir
        self.bucket_width = bucket_width
        self.key = key or f"floor(val / {bucket_width})"
        self.aggs = aggs or _DEFAULT_AGGS
        # Multi-column views over DETACHED columns (the group-covered
        # case needs no join — siblings arrive row-aligned in the same
        # segment files): ``join_column`` names a second detached column
        # whose value at the same pos is exposed under its own name to
        # ``key``/``aggs`` expressions. Each batch of new rows is
        # pos-joined against only the join column's overlapping segment
        # files (Parquet-footer pos ranges prune the rest), and rows
        # whose pos has no match yet (the columns grow independently)
        # persist in a pending buffer until the partner value arrives —
        # state is bounded by the columns' length skew, not their size.
        self.join_column = join_column
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

    def _join_info(self) -> tuple[str, list[str]]:
        """(dir under data/, live segments) for the join column; the
        join column must be detached — a column in the SAME group as
        ``column`` is already visible to expressions without a join,
        and cross-layout joins would hide that cheaper path."""
        with open(os.path.join(self.db_dir, "catalog.json")) as f:
            meta = json.load(f)
        m = meta["columns"][self.join_column]
        if m["group"] is not None:
            raise ValueError(
                f"join_column {self.join_column!r} is group-covered; "
                "group siblings are row-aligned in the streamed segments "
                "— reference the column directly in key/aggs instead"
            )
        return self.join_column, list(m["segments"])

    @property
    def _pending_dir(self) -> str:
        return os.path.join(self.view_dir, "pending")

    def _join_frame(self, lo: int, hi: int, live: list[str]) -> DataFrame:
        """The join column's (pos, <name>) rows restricted to segment
        FILES whose footer pos-range overlaps [lo, hi] — driver-side
        metadata pruning (the engine's zone-map idea applied to pos,
        which is monotone within a segment, so pruning is tight)."""
        from kstore_spark.catalog import Catalog

        src, _ = self._join_info()
        files = []
        base = os.path.join(self.db_dir, "data", src)
        for seg in live:
            seg_dir = os.path.join(base, seg)
            rng = Catalog._segment_stats_cols(seg_dir, ["pos"])["pos"]
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                continue  # no pos overlap — skip the whole segment
            files.append(seg_dir)
        if not files:
            return self.spark.createDataFrame([], COLUMN_SCHEMA).select(
                "pos", F.col("val").alias(self.join_column))
        return (
            self.spark.read.schema(COLUMN_SCHEMA).parquet(*files)
            .select("pos", F.col("val").alias(self.join_column))
        )

    def _invalidated(self, src_dir: str, live: list[str]) -> bool:
        if not os.path.exists(self._manifest):
            return False
        with open(self._manifest) as f:
            seen = json.load(f)
        if seen.get("src") != src_dir:
            return True  # column detached from (or joined) a group —
            # the file-stream source moved; the checkpoint is meaningless
        if set(seen["segments"]) - set(live):
            return True  # segment rewritten
        if self.join_column is not None:
            _, jlive = self._join_info()
            # a join-column segment this view already CONSUMED was
            # rewritten (delete/update/compaction) → merged values may
            # be stale → rebuild. New join segments are NOT invalidation:
            # the pending buffer picks their rows up incrementally.
            if set(seen.get("join_segments", [])) - set(jlive):
                return True
        return False

    def _reset(self) -> None:
        for sub in list(os.listdir(self.view_dir)):
            p = os.path.join(self.view_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)

    # -- pending buffer (join views only) --------------------------------
    def _current_pending(self) -> int:
        p = os.path.join(self.view_dir, "PENDING")
        if os.path.exists(p):
            with open(p) as f:
                return int(f.read().strip())
        return -1

    def _pending_path(self, gen: int) -> str:
        return os.path.join(self.view_dir, f"pending_gen{gen}")

    def _set_pending(self, gen: int) -> None:
        tmp = os.path.join(self.view_dir, "PENDING.tmp")
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, os.path.join(self.view_dir, "PENDING"))

    def _with_join(self, rows: DataFrame) -> DataFrame:
        """Union new rows with the pending buffer, pos-join against the
        join column's overlapping segments, re-buffer the unmatched
        remainder. Returns the matched rows with the join column's
        value exposed under its own name."""
        pg = self._current_pending()
        if pg >= 0:
            rows = rows.unionByName(
                self.spark.read.schema(COLUMN_SCHEMA)
                .parquet(self._pending_path(pg))
            )
        bounds = rows.agg(
            F.min("pos").alias("lo"), F.max("pos").alias("hi")).first()
        _, jlive = self._join_info()
        if bounds["lo"] is None:
            b = self._join_frame(0, -1, [])
        else:
            b = self._join_frame(bounds["lo"], bounds["hi"], jlive)
        # matched must be MATERIALIZED before the old pending generation
        # is deleted — it lazily reads those files through `rows`
        matched = rows.join(b, "pos").localCheckpoint(eager=True)
        unmatched = rows.join(b.select("pos"), "pos", "left_anti")
        npg = pg + 1
        unmatched.write.mode("overwrite").parquet(self._pending_path(npg))
        self._set_pending(npg)
        if pg >= 0:
            shutil.rmtree(self._pending_path(pg), ignore_errors=True)
        return matched

    # -- maintenance -----------------------------------------------------
    def _ingest(self, rows: DataFrame) -> None:
        """Join (if configured) + partial-aggregate + merge into the
        sink. Shared by the stream's foreachBatch and the post-stream
        pending retry."""
        if self.join_column is not None:
            rows = self._with_join(rows)
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

    def refresh(self) -> None:
        """Ingest unseen live segment files and merge into the view;
        rebuild from scratch if an ingested segment was rewritten."""
        src_dir, live, gcols = self._source_info()
        if self.join_column is not None and gcols is not None:
            # ADVICE r3: the pending buffer persists/reads the 2-column
            # COLUMN_SCHEMA — a group-covered source would carry sibling
            # columns into the drain-path union (throw) or silently lose
            # them. A group-covered column doesn't need the join anyway:
            # its siblings arrive row-aligned in the same segment files.
            raise ValueError(
                f"column {self.column!r} is group-covered; join_column "
                "views require a detached source — reference the group "
                "siblings directly in key/aggs instead"
            )
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
            self._ingest(
                to_rows(batch_df.filter(F.input_file_name().rlike(live_re))))

        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", self._checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("matview refresh did not finish within 300s")
        if self.join_column is not None and self._current_pending() >= 0:
            # the join column may have grown while this column did not —
            # the stream then fires no batch, but buffered rows may now
            # have partners: retry them against the current join segments
            self._ingest(self.spark.createDataFrame([], COLUMN_SCHEMA))
        manifest = {"src": src_dir, "segments": sorted(live)}
        if self.join_column is not None:
            manifest["join_segments"] = sorted(self._join_info()[1])
        with open(self._manifest, "w") as f:
            json.dump(manifest, f)

    def read(self) -> DataFrame:
        gen = self._current_gen()
        if gen < 0:
            # empty frame with the view's schema (derived from the agg
            # spec over an empty source — plan-only, no job runs)
            _, live, gcols = self._source_info()
            schema, to_rows = self._source_shape(gcols)
            rows = to_rows(self.spark.createDataFrame([], schema))
            if self.join_column is not None:
                rows = rows.withColumn(
                    self.join_column, F.lit(None).cast("int"))
            return self._partial(rows)
        return self.spark.read.parquet(self._gen_path(gen))
