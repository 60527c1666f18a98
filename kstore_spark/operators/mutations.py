"""Mutations: insert / delete / update as copy-on-write DataFrame transforms.

Reference semantics:
- insert(c1,v1,c2,v2,...): one row appended across columns at the next
  position (src/server/storage.c:1617-1653); positions grow monotonically.
- delete(PosVar, c1..cn): tombstone the rows at those positions; surviving
  rows KEEP their original positions — no renumbering (storage.c:1753-1854,
  tombstone 0xDEADBEEF). Duplicate ids in PosVar are idempotent.
- update(PosVar, C, val): set value at those positions (storage.c:1655-1751).

Spark realization: columns are immutable Parquet; a mutation produces a new
DataFrame (and the catalog atomically swaps the column's current version —
see kstore_spark.catalog). These transforms are pure so they compose lazily;
at scale each is one shuffle-free broadcast-anti-join / broadcast-left-join
when the position set is small (the common case), falling back to a
shuffled join for huge position sets — Catalyst/AQE picks automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstore_spark.operators.types import POS, VAL, PosList

COLUMN_SCHEMA = T.StructType([
    T.StructField(POS, T.LongType(), nullable=False),
    T.StructField(VAL, T.IntegerType(), nullable=True),
])


def single_row(spark: SparkSession, pos: int, value: int) -> DataFrame:
    return spark.createDataFrame([Row(pos=pos, val=value)], schema=COLUMN_SCHEMA)


def apply_insert(col_df: DataFrame, spark: SparkSession, pos: int, value: int) -> DataFrame:
    """Append one value at the given (catalog-assigned) position."""
    return col_df.unionByName(single_row(spark, pos, value))


def apply_delete(col_df: DataFrame, ids: PosList) -> DataFrame:
    """Remove rows whose pos is in the position list (idempotent w.r.t.
    duplicates — anti-join naturally ignores them). Survivors keep pos."""
    dd = ids.df.select(F.col(ids.pos_col).alias("__d_pos")).distinct()
    return col_df.join(dd, on=F.col(POS) == F.col("__d_pos"), how="left_anti")


def apply_update(col_df: DataFrame, ids: PosList, value: int) -> DataFrame:
    """Set val = value at every pos in the position list."""
    ud = ids.df.select(F.col(ids.pos_col).alias("__u_pos")).distinct()
    return (
        col_df.join(ud, on=F.col(POS) == F.col("__u_pos"), how="left")
        .select(
            F.col(POS),
            F.when(F.col("__u_pos").isNotNull(), F.lit(value).cast("int"))
            .otherwise(F.col(VAL))
            .alias(VAL),
        )
    )
