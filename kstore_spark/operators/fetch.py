"""Fetch: positional gather — read a column's values at a list of positions.

Reference semantics (src/server/storage.c:1298-1387): for each id in the
position list (duplicates preserved, alignment preserved), emit the value
of the column at that position. The reference sorts ids for sequential IO
and then RESTORES the original id-array order (storage.c:1324-1366) so two
fetches with the two halves of a join output stay row-aligned.

Spark realization: an inner equi-join of the position list against the
column on ``pos``. Alignment is preserved structurally — the output keeps
the position list's alignment-key columns, so later zips re-join on those
keys instead of relying on row order. The join shuffles both sides by
pos (or broadcasts the position list when small), which is exactly the
distributed analogue of the reference's sort-gather-unsort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstore_spark.operators.types import POS, VAL, PosList, ValVec


def fetch(col_df: DataFrame, ids: PosList, pos_col: str = POS, val_col: str = VAL,
          source_col: str | None = None) -> ValVec:
    """fetch(C, PosVar) → value vector aligned to the position list's keys."""
    base = col_df.select(F.col(pos_col).alias("__b_pos"), F.col(val_col).alias(VAL))
    joined = ids.df.join(base, on=F.col(ids.pos_col) == F.col("__b_pos"), how="inner")
    out = joined.select(*[F.col(k) for k in ids.keys], F.col(VAL))
    return ValVec(out, keys=ids.keys, source_col=source_col)
