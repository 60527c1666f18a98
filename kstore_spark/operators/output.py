"""Output ops: tuple() zip-and-print, print(), bare-op streaming.

Reference semantics:
- ``tuple(v1,...,vn)`` zips n equal-length value vectors and prints each
  row as ``(a,b,...)`` (src/server/server.c:656-701, client.c:106-128).
- ``print(v)``: value vector → one int per line; position list → one id
  per line (client.c:44-86).
- Result-set comparison is order-insensitive (test.sh:24-43), but we print
  in ascending alignment-key order so single-vector output matches the
  reference's ascending-position order exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstore_spark.operators.types import VAL, PosList, ValVec
from kstore_spark.operators.vmath import AlignmentError


def zip_vectors(vecs: list[ValVec]) -> DataFrame:
    """Positional zip of n vectors → DataFrame(c0..c{n-1}), aligned rows.

    Scalars (1-row DataFrames from aggregates, keys=()) are cross-joined —
    the reference zips a 1-element vector with itself in tuple(a_avg,b_avg).
    """
    scalars = [v for v in vecs if not v.keys]
    keyed = [v for v in vecs if v.keys]
    out: DataFrame | None = None
    if keyed:
        keys = keyed[0].keys
        for v in keyed[1:]:
            if v.keys != keys:
                raise AlignmentError(f"tuple() vectors have mismatched keys {v.keys} vs {keys}")
        shared = (
            all(
                v.prov is not None
                and v.prov.frame is keyed[0].prov.frame
                and v.source_col in v.prov.cols
                for v in keyed
            )
            if keyed[0].prov is not None
            else False
        )
        if shared:
            # all vectors project one frame → a single select, no joins
            frame = keyed[0].prov.frame
            out = frame.select(
                *keys,
                *[F.col(v.prov.cols[v.source_col]).alias(f"c{i}") for i, v in enumerate(keyed)],
            )
        else:
            frames = [
                v.df.select(*keys, F.col(VAL).alias(f"c{i}")) for i, v in enumerate(keyed)
            ]
            out = reduce(lambda a, b: a.join(b, on=list(keys), how="inner"), frames)
        out = out.orderBy(*keys).select(*[f"c{i}" for i in range(len(keyed))])
    for i, v in enumerate(scalars):
        sdf = v.df.select(F.col(VAL).alias(f"s{i}"))
        out = sdf if out is None else out.crossJoin(sdf)
    return out


def format_tuple_rows(rows) -> str:
    return "\n".join("(" + ",".join(str(x) for x in row) + ")" for row in rows)


def format_vector(v: ValVec) -> str:
    if v.keys:
        rows = v.df.orderBy(*v.keys).select(VAL).collect()
    else:
        rows = v.df.collect()
    return "\n".join(str(r[0]) for r in rows)


def format_poslist(p: PosList) -> str:
    rows = p.df.orderBy(*p.keys).select(p.pos_col).collect()
    return "\n".join(str(r[0]) for r in rows)
