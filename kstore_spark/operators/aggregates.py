"""Aggregates: value vector → 1-element vector, C int semantics.

Reference semantics (src/server/aggregate.c:9-97):
    min → identity INT_MAX on empty input
    max → identity INT_MIN on empty input
    sum → int32 accumulation with C wraparound
    avg → truncating integer division sum/count (avg({1,2}) == 1,
          assts/p3.txt:26-39); empty input is a DBEDIVZERO error
    count → vector length

All are global (no GROUP BY exists in the reference DSL — grouped
aggregation is an extension, see kstore_spark.plans). Spark realization:
a single partial-aggregated ``agg`` — map-side combine then a one-row
reduce; no full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstore_spark.operators.cints import INT32_MAX, INT32_MIN, c_div, wrap32
from kstore_spark.operators.types import VAL, ValVec


def _scalar(df: DataFrame, col) -> DataFrame:
    return df.agg(col.alias(VAL))


def agg_min(v: ValVec) -> DataFrame:
    return _scalar(v.df, F.coalesce(F.min(VAL), F.lit(INT32_MAX)).cast("int"))


def agg_max(v: ValVec) -> DataFrame:
    return _scalar(v.df, F.coalesce(F.max(VAL), F.lit(INT32_MIN)).cast("int"))


def agg_sum(v: ValVec) -> DataFrame:
    # long-sum then wrap to int32: identical to C int accumulation for any
    # number of wraparounds because addition mod 2^32 is associative.
    return _scalar(v.df, wrap32(F.coalesce(F.sum(F.col(VAL).cast("long")), F.lit(0))))


def agg_count(v: ValVec) -> DataFrame:
    return _scalar(v.df, F.count(F.lit(1)).cast("long"))


def agg_avg(v: ValVec) -> DataFrame:
    # wrapped int32 sum divided by count, truncating toward zero — the
    # reference divides its int32 accumulator by n (aggregate.c:80-84).
    # The empty-vector DBEDIVZERO error (aggregate.c:80-84) is embedded
    # in the expression: it fires lazily inside the action that observes
    # the result, with no separate emptiness-probe job.
    s = wrap32(F.coalesce(F.sum(F.col(VAL).cast("long")), F.lit(0)))
    n = F.count(F.lit(1))
    guarded = F.when(
        n == 0,
        F.raise_error(F.lit("DBEDIVZERO: avg of empty vector")).cast("int"),
    ).otherwise(c_div(s, n).cast("int"))
    return _scalar(v.df, guarded)
