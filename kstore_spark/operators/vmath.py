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

    # Cross-provenance fallback: the operands came from different selects
    # or joins, so their key sets may differ. The reference raises
    # DBEINTERMDIFFLEN on length mismatch (aggregate.c:100-115); a silent
    # inner join would *intersect* mismatched vectors and quietly drop
    # rows. Full-outer join + a lazy raise_error on any unmatched row
    # keeps the check fully distributed (no eager count jobs) and fires
    # the moment the result is observed.
    lf = l.df.select(*l.keys, F.col(VAL).alias("__l"), F.lit(1).alias("__lm"))
    rf = r.df.select(*r.keys, F.col(VAL).alias("__r"), F.lit(1).alias("__rm"))
    misaligned = F.col("__lm").isNull() | F.col("__rm").isNull()
    guarded = F.when(
        misaligned,
        F.raise_error(F.lit(
            "DBEINTERMDIFFLEN: math operands are not aligned "
            "(different position sets / lengths)"
        )).cast("int"),
    ).otherwise(op(F.col("__l"), F.col("__r")))
    out = lf.join(rf, on=list(l.keys), how="full_outer").select(
        *l.keys, guarded.alias(VAL)
    )
    return ValVec(out, keys=l.keys)


def vec_add(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_add)


def vec_sub(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_sub)


def vec_mul(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, cints.c_mul)


def _div_guarded(lc: Column, rc: Column) -> Column:
    """C division with the reference's DBEDIVZERO check embedded in the
    expression (aggregate.c:18-22): the error fires lazily, inside
    whatever action finally observes the result — no separate scan-the-
    divisor probe job. CaseWhen evaluates branches per-row, so the
    raise_error only triggers on an actual zero divisor."""
    return F.when(
        rc.cast("long") == 0,
        F.raise_error(F.lit("DBEDIVZERO: division by zero")).cast("int"),
    ).otherwise(cints.c_div(lc, rc))


def vec_div(l: ValVec, r: ValVec) -> ValVec:
    return _zip(l, r, _div_guarded)
