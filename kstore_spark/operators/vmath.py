"""Elementwise math over two aligned value vectors, C int32 semantics.

Reference semantics (src/server/aggregate.c:100-182, assts/p3.txt:41-57):
add/sub/mul/div zip two equal-length vectors positionally; lengths must
match (DBEINTERMDIFFLEN); division is integer division truncating toward
zero; zero divisor is DBEDIVZERO.

Spark realization: an equi-join on the vectors' shared alignment keys
(see operators/types.py) — both vectors derive from the same select or
the same join output, so the keys match rows exactly the way the
reference's implicit array index does. This keeps the zip fully
distributed: co-partitioned by key, no global row numbering.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from kstore_spark.operators import cints
from kstore_spark.operators.types import VAL, ValVec


class AlignmentError(ValueError):
    """Vectors with different provenance cannot be zipped (DBEINTERMDIFFLEN)."""


def _zip(l: ValVec, r: ValVec, op: Callable[[Column, Column], Column]) -> ValVec:
    if l.keys != r.keys:
        raise AlignmentError(
            f"cannot zip vectors with alignment keys {l.keys} vs {r.keys}; "
            "math operands must derive from the same select or join"
        )
    # late-materialization fast path: both vectors project one shared
    # frame → the zip is column arithmetic on that frame, no self-join
    if (
        l.prov is not None and r.prov is not None
        and l.prov.frame is r.prov.frame
        and l.source_col in l.prov.cols and r.source_col in r.prov.cols
    ):
        frame = l.prov.frame
        out = frame.select(
            *l.keys,
            op(F.col(l.prov.cols[l.source_col]), F.col(r.prov.cols[r.source_col])).alias(VAL),
        )
        return ValVec(out, keys=l.keys, prov=l.prov)

    lf = l.df.select(*l.keys, F.col(VAL).alias("__l"))
    rf = r.df.select(*r.keys, F.col(VAL).alias("__r"))
    out = lf.join(rf, on=list(l.keys), how="inner").select(
        *l.keys, op(F.col("__l"), F.col("__r")).alias(VAL)
    )
    return ValVec(out, keys=l.keys)


def vec_add(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_add)


def vec_sub(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_sub)


def vec_mul(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_mul)


def vec_div(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_div)
