"""Selection operators: predicate over one column → position list.

Reference semantics (src/common/parser.c:103-129, assts/p2.txt:50-59):
selects return POSITIONS, not values; range predicates are closed
intervals [lo, hi] inclusive on both ends.

The reference picks one of three access paths by storage type (full scan /
binary search on sorted index / b+tree descend — storage.c:1123-1137). In
Spark all three collapse into a single declarative ``filter``: Catalyst
pushes the predicate into the Parquet scan, and for sorted-written columns
row-group min/max + page-index pruning provides the same skip-scan
acceleration. One logical implementation, storage-type-equivalent results
by construction.

When the column is covered by a table group (catalog group storage), the
select carries a ``Prov`` — the *filtered group frame* — so downstream
fetches over sibling columns become projections of this same scan instead
of pos-joins (late materialization; see operators/types.Prov).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kstore_spark.operators.types import POS, VAL, PosList, Prov


def _from_prov(prov: Prov, column: str, pred) -> PosList:
    fcol = prov.cols[column]
    filtered = prov.frame.filter(pred(F.col(fcol))) if pred else prov.frame
    return PosList(
        filtered.select(POS), prov=Prov(frame=filtered, cols=prov.cols)
    )


def select_all(col_df: DataFrame, pos_col: str = POS,
               prov: Prov | None = None, column: str | None = None) -> PosList:
    """Every live position. select(C)."""
    if prov is not None and column in prov.cols:
        return _from_prov(prov, column, None)
    return PosList(col_df.select(F.col(pos_col).alias(POS)))


def select_value(col_df: DataFrame, value, pos_col: str = POS, val_col: str = VAL,
                 prov: Prov | None = None, column: str | None = None) -> PosList:
    """Positions where val == value. select(C, x)."""
    if prov is not None and column in prov.cols:
        return _from_prov(prov, column, lambda c: c == F.lit(value))
    return PosList(
        col_df.filter(F.col(val_col) == F.lit(value)).select(F.col(pos_col).alias(POS))
    )


def select_range(col_df: DataFrame, lo, hi, pos_col: str = POS, val_col: str = VAL,
                 prov: Prov | None = None, column: str | None = None) -> PosList:
    """Positions where lo <= val <= hi (both inclusive). select(C, lo, hi)."""
    if prov is not None and column in prov.cols:
        return _from_prov(prov, column, lambda c: c.between(F.lit(lo), F.lit(hi)))
    return PosList(
        col_df.filter(F.col(val_col).between(F.lit(lo), F.lit(hi)))
        .select(F.col(pos_col).alias(POS))
    )


def select_where(col_df: DataFrame, predicate: Column, pos_col: str = POS) -> PosList:
    """Generalized select for engine-internal use."""
    return PosList(col_df.filter(predicate).select(F.col(pos_col).alias(POS)))
