"""Fetch: positional gather — read a column's values at a list of positions.

Reference semantics (src/server/storage.c:1298-1387): for each id in the
position list (duplicates preserved, alignment preserved), emit the value
of the column at that position. The reference sorts ids for sequential IO
and then RESTORES the original id-array order (storage.c:1324-1366) so two
fetches with the two halves of a join output stay row-aligned.

Spark realization, two paths:

1. **Late-materialization fast path**: the position list carries Prov —
   the filtered/joined table frame that produced it — and the fetched
   column is reachable in that frame. The gather is then a *projection*
   of the frame: no join, no shuffle; Catalyst fuses filter + projection
   into the original Parquet scan (column pruning keeps IO minimal).
   This mirrors what the reference's fetch does physically (it re-reads
   the base column), but costs zero extra passes.

2. **Fallback**: an inner equi-join of the position list against the
   column on ``pos``. Alignment is structural — the output keeps the
   position list's key columns. Catalyst/AQE broadcasts the small side;
   this is the distributed analogue of sort-gather-unsort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstore_spark.operators.types import POS, VAL, PosList, Prov, ValVec


def fetch(col_df: DataFrame, ids: PosList, pos_col: str = POS, val_col: str = VAL,
          source_col: str | None = None) -> ValVec:
    """fetch(C, PosVar) → value vector aligned to the position list's keys."""
    prov = ids.prov
    if prov is not None and source_col is not None and source_col in prov.cols:
        fcol = prov.cols[source_col]
        out = prov.frame.select(*ids.keys, F.col(fcol).alias(VAL))
        return ValVec(out, keys=ids.keys, source_col=source_col, prov=prov,
                      source_pos=ids.pos_col)

    base = col_df.select(F.col(pos_col).alias("__b_pos"), F.col(val_col).alias(VAL))
    joined = ids.df.join(base, on=F.col(ids.pos_col) == F.col("__b_pos"), how="inner")
    out = joined.select(*[F.col(k) for k in ids.keys], F.col(VAL))
    return ValVec(out, keys=ids.keys, source_col=source_col, source_pos=ids.pos_col)
